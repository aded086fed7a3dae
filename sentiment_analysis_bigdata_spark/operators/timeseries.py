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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_STEP_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _step_seconds(step: str) -> int:
    """'15 minutes' → 900. Whole-second steps only (grid is epoch-aligned)."""
    parts = step.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in _STEP_UNIT_SECONDS:
        raise ValueError(
            f"unsupported step {step!r}: expected '<n> "
            f"{'|'.join(sorted(set(_STEP_UNIT_SECONDS)))}'"
        )
    return int(parts[0]) * _STEP_UNIT_SECONDS[parts[1]]


def _floor_to_step(ts: Column, step_s: int) -> Column:
    """Epoch-aligned bucket: floor(unix_seconds / step) * step, as timestamp."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / step_s).cast("bigint") * step_s
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation holds until
    the next one, so its weight is the interval it was in force; the last
    observation of a key carries no weight (nothing follows it). Keys with
    a single event fall back to that event's value.

    One window over (key order by ts) for the lead — a single shuffle on
    the key, no global sort; the weighted-sum aggregation reuses the same
    partitioning.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # microsecond precision: unix_timestamp truncates to whole seconds, which
    # skews weights for sub-second event spacing
    dt_us = F.unix_micros(F.lead(ts_col, 1).over(w)) - F.unix_micros(F.col(ts_col))
    weighted = events.select(
        key_col,
        F.col(value_col).alias("v"),
        (dt_us / F.lit(1_000_000.0)).alias("dt"),
        F.first(value_col).over(w).alias("first_v"),
    )
    return weighted.groupBy(key_col).agg(
        F.when(
            F.sum("dt") > 0, F.sum(F.col("v") * F.col("dt")) / F.sum("dt")
        )
        .otherwise(F.first("first_v"))
        .alias("twap"),
        F.count(F.lit(1)).alias("n_events"),
    )


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
    # floor to the step WIDTH (not just hour/minute truncation): for e.g.
    # '15 minutes' every observed bucket must land on the epoch-aligned
    # step grid, or the left join below would silently drop it
    bucket = _floor_to_step(F.col(ts_col), _step_seconds(step))
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


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition estimates over per-key event
    sequences: (from_state, to_state, n, p) with p = n / Σ n(from_state)
    — the behavior-model / session-simulation primitive.

    One shuffle on the key: successor extraction is a lead window over
    (ts, tiebreak) inside each key partition; the transition count is a
    state²-bounded aggregation (partial map-side combine), and the row
    normalizer joins back on the state-cardinality from_state key. The
    deterministic tiebreak column makes same-timestamp ordering (and so
    the counts) engine-independent.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    steps = events.select(
        F.col(state_col).alias("from_state"),
        F.lead(state_col).over(w).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("tot"))
    return counts.join(totals, "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("p"),
    )
