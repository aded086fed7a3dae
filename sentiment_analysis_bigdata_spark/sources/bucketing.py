"""Bucketed tables: pre-shuffled storage for co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem) is
shuffling both sides on the key. Writing both tables bucketed by that key
(``bucketBy(n, key)`` + ``sortBy``) moves the shuffle to write time — every
subsequent join/aggregation on the key reads co-located buckets and plans
with ZERO Exchange on either side (asserted in tests/test_bucketing.py).

Spark requires bucketed data to live in a table catalog (metastore tracks
bucket spec), so these helpers wrap ``saveAsTable``; the session's
``spark.sql.warehouse.dir`` decides physical placement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) table.

    Drops any previous table AND its orphaned warehouse location first —
    a managed-table location can outlive the (session-local) catalog entry,
    and saveAsTable refuses to reuse it.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = os.path.join(urlparse(warehouse).path or warehouse, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)

    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_by)
    if sort:
        w = w.sortBy(bucket_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — no shuffle.

    Both tables must have the same bucket count on ``key``. The plan is
    SortMergeJoin over FileScans with no Exchange (bucket pruning applies
    to equality filters on the key, too).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
