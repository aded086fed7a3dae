"""Slowly-changing-dimension (type 2) history build.

Given an append-only change/event stream ``(key, attrs..., ts)``, produce
the SCD2 interval table: one row per (key, attribute-state) run with
``valid_from`` / ``valid_to`` / ``is_current`` — the standard warehouse
construct for "what was this entity's state at time T" joins.

Distributed shape: ONE shuffle (partition by key), two windows over the
same (key, ts) ordering — change detection via ``lag``, interval close via
``lead`` — so Catalyst plans a single Exchange + single Sort feeding both.
Never a self-join, never a global sort; per-key history lives in one
partition, which holds at 100 TB because key cardinality ≫ executor count
and per-key run counts are bounded.

Determinism: rows are ordered by (ts, tiebreak) — callers must pass a
tiebreak column (e.g. an event id) when timestamps can collide, or runs
within a tie are engine-dependent.

Reference parity: none (the reference has no temporal surface); this is a
north-star warehouse operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change stream into SCD2 validity intervals.

    A new interval starts at the first row per key and whenever any
    tracked attribute differs from the previous row's value (null-safe
    comparison). ``valid_to`` is the next interval's ``valid_from`` (null
    for the open/current interval)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    is_first = F.row_number().over(w) == 1

    starts = df.withColumn("__new_run", (is_first | changed).cast("int")).filter(
        F.col("__new_run") == 1
    )

    order2 = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w2 = Window.partitionBy(*key_cols).orderBy(*order2)
    return (
        starts.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols,
            *attr_cols,
            "valid_from",
            "valid_to",
            "is_current",
        )
    )


def asof_state(
    history: DataFrame,
    keys_ts: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 table: for each (key, ts) probe
    row, the attribute state whose [valid_from, valid_to) interval covers
    ts. An equi join on the key plus an interval filter — broadcast the
    probe side when small, else a shuffle join on key."""
    return keys_ts.alias("p").join(
        history.alias("h"),
        [F.col(f"p.{k}") == F.col(f"h.{k}") for k in key_cols]
        + [
            F.col("h.valid_from") <= F.col(f"p.{ts_col}"),
            F.col("h.valid_to").isNull()
            | (F.col(f"p.{ts_col}") < F.col("h.valid_to")),
        ],
        "left",
    )


def cdc_apply(
    cdc: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply an insert/update/delete change stream to produce the final
    table state — the CDC-merge half of a MERGE INTO, as one relational
    pass: per key keep the HIGHEST-sequence change (row_number over the
    key partition), then drop keys whose final operation is a delete.

    ONE shuffle on the key; no base-table self-join and no sequential
    replay — the change log can be arbitrarily long per key and the plan
    shape does not change. ``seq_col`` must be a total order per key
    (a log offset / commit LSN); ties would make the survivor
    engine-dependent, so callers with tie-prone sequences must composite
    a tiebreak into ``seq_col`` first (same contract as
    :func:`scd2_history`).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        cdc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(op_col) != "D")
    )
