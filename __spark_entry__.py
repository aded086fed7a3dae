"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the north-star
extensions, backed by the ``sentiment_analysis_bigdata_spark`` engine.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine importable when the driver runs this file from /root/repo
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentiment_analysis_bigdata_spark import workloads  # noqa: E402
from sentiment_analysis_bigdata_spark.workloads.text_q import (  # noqa: E402
    q_token_topk_nostop,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: scan → clean → tokenize →
    stopword-filter → explode → aggregate → top-k over ``documents``
    (SURVEY §7 Phase 0)."""
    return q_token_topk_nostop(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north star)."""
    return workloads.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return workloads.all_oracles()
