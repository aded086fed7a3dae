"""Funnel analysis: per-key staged event sequencing (stage N counts only
if it happens strictly after the key's stage N-1), the canonical
product-analytics query (signup → click → purchase).

One shuffle total: every stage is an unordered whole-partition
``min(when(...))`` window over the same key, so Catalyst chains the Window
nodes behind a single Exchange; the final per-key collapse reuses the same
partitioning. No ordered window, no global sort, no join — at 100 TB the
cost is one repartition of the (pre-projected) event stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per key: ``<stage>_ts`` = earliest event of that type
    strictly after the key's previous stage timestamp (null once a stage is
    missed), plus ``stages_completed``.

    The strict ``>`` ordering makes the funnel sequential, not just a
    per-type min — a purchase before the first signup does not count.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(key_col)
    df = events.select(key_col, type_col, ts_col)
    prev: str | None = None
    for stage in stages:
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(f"{prev}_ts"))
        df = df.withColumn(f"{stage}_ts", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = stage
    per_key = df.groupBy(key_col).agg(
        *[F.first(f"{s}_ts").alias(f"{s}_ts") for s in stages]
    )
    completed = sum(
        (F.col(f"{s}_ts").isNotNull()).cast("int") for s in stages
    )
    return per_key.withColumn("stages_completed", completed)
