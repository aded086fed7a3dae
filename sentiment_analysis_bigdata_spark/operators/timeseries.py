"""Time-series regularization: resample irregular events onto a fixed grid
with forward fill — the standard prep step before windowed feature
extraction or model training on event streams.

Pure Catalyst expressions end to end: per-key bounds → ``sequence`` grid →
explode → left join observed buckets → ``last(ignorenulls)`` window for the
carry-forward. No Python in the path; one shuffle for the per-key agg and
one for the window (same key, so AQE can reuse the partitioning). Grid
cardinality is (span/step) rows per key — bounded by the key's own span,
never global min/max (a single old key would otherwise explode every key's
grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """(key, bucket, value, observed): one row per ``step`` bucket between
    each key's first and last event, value = last observation at or before
    the bucket (forward fill), ``observed`` = whether the bucket itself had
    an event. Bucket's observed value = the event with max (ts, tiebreak by
    arrival order within identical ts is irrelevant for unique timestamps).
    """
    bucket = F.date_trunc("hour" if step == "1 hour" else "minute", F.col(ts_col))
    hourly = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(F.max_by(value_col, ts_col).alias("obs_v"))
    )
    bounds = hourly.groupBy("key").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr(f"interval {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(hourly, ["key", "bucket"], "left")
    w = Window.partitionBy("key").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.last("obs_v", ignorenulls=True).over(w).alias(value_col),
        F.col("obs_v").isNotNull().alias("observed"),
    )
