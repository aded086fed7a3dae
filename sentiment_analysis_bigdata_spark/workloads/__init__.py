"""Query registry: every SURVEY §2 operator exposed as a named query with a
DuckDB-oracle SQL twin (where SQL-expressible).

Each module defines ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame``. ``__spark_entry__.py``
aggregates them into the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_bigdata_spark.workloads import (
    affinity_q,
    dedup_sim,
    evaluation_q,
    modern_q,
    graph_q,
    relational_q,
    relational_q2,
    relational_q3,
    relational_q4,
    relational_q5,
    relational_q6,
    relational_q7,
    relational_q8,
    scale_q,
    temporal_q,
    text_q,
    train_q,
    warehouse_q,
)

SparkQuery = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    relational_q,
    relational_q2,
    relational_q3,
    relational_q4,
    relational_q5,
    relational_q6,
    relational_q7,
    relational_q8,
    text_q,
    dedup_sim,
    affinity_q,
    modern_q,
    temporal_q,
    train_q,
    warehouse_q,
    evaluation_q,
    graph_q,
    scale_q,
]


def all_queries() -> dict[str, SparkQuery]:
    out: dict[str, SparkQuery] = {}
    for m in _MODULES:
        for name, (fn, _sql) in m.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        for name, (_fn, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
