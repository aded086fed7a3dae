"""Incremental aggregate maintenance: keep a keyed aggregate STATE table
and fold in deltas without rescanning history — the materialized-view
upkeep pattern every warehouse rollup runs on.

The trick is the standard one: maintain MERGEABLE partials (count, sum,
min, max — and by extension avg = sum/count, plus the sketch partials
the HLL/CMS operators provide), never finalized values. Then

    new_state = combine(state ∪ partial_agg(delta))

is a union + one aggregation whose input is |state| + |delta-partials|
rows — key-cardinality, NOT history-cardinality. At 100 TB the raw
history is written once and never re-read; the state table is what
serves queries (`finalize` derives avg-style columns at read time).

Deletions/updates are out of scope by design: min/max are not mergeable
under retraction (the documented limitation of every partial-agg MV
scheme; retraction needs the full per-key history or a sketch like a
heap-of-k). Append-only streams — logs, events, training corpora — are
exactly where this applies.

Reference parity: none; north-star warehouse extension alongside the
hourly→daily rollup (workloads/temporal_q.py) and the streaming upsert
sink (streaming/jobs.py), which maintain keyed LATEST-row state the same
append-only way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# spec: (out_col, src_col, fn) with fn ∈ {"count", "sum", "min", "max"}
_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)).cast("bigint"),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
# how two partials of the same column combine
_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def partial_agg(
    df: DataFrame, keys: list[str], specs: list[tuple[str, str, str]]
) -> DataFrame:
    """One aggregation pass → the keyed partial-state frame for ``df``."""
    return df.groupBy(*keys).agg(
        *[_PARTIAL[fn](F.col(src) if src != "*" else None).alias(out)
          for out, src, fn in specs]
    )


def merge_states(
    keys: list[str],
    specs: list[tuple[str, str, str]],
    *states: DataFrame,
) -> DataFrame:
    """Fold partial-state frames into one: union (by name) + a single
    combine aggregation. Associative and commutative — any grouping of
    deltas produces the identical state, which is what the oracle checks
    (merged incrementals ≡ one direct aggregate over everything)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        *[_COMBINE[fn](F.col(out_col)).alias(out_col) for out_col, _, fn in specs]
    )


def finalize(
    state: DataFrame, derived: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Read-time derivations over the state, e.g. ``{"avg_price":
    ("sum_price", "n")}`` adds avg columns as sum/count — the only
    non-mergeable aggregates users actually ask for, recovered for free."""
    out = state
    for name, (sum_col, cnt_col) in (derived or {}).items():
        out = out.withColumn(
            name,
            F.when(
                F.col(cnt_col) > 0, F.col(sum_col) / F.col(cnt_col)
            ),
        )
    return out


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed snapshot diff: per row-key, classify ``added`` / ``removed``
    / ``changed`` (any compare column differs, null-safely) — the
    validation step behind CDC reconciliation, backfill verification, and
    "what did this pipeline change" reports.

    One full-outer equi join on the key; change detection compares the
    two sides' compare-columns with null-safe equality, so NULL → value
    and value → NULL both count as changes. Unchanged rows are dropped
    (at 100 TB they are the overwhelming majority — the output is
    delta-sized, and the join is the only shuffle).

    Returns key columns + (change, n_changed_cols).
    """
    o = old.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(key_cols)],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(key_cols)],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    keys = [f"__k{i}" for i in range(len(key_cols))]
    j = o.join(n, keys, "full_outer")
    diff_flags = [
        (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).cast("int")
        for c in compare_cols
    ]
    n_diff = sum(diff_flags[1:], diff_flags[0]) if diff_flags else F.lit(0)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(n_diff > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.col(f"__k{i}").alias(k) for i, k in enumerate(key_cols)],
            "change",
            F.when(F.col("change") == "changed", n_diff)
            .otherwise(F.lit(0))
            .alias("n_changed_cols"),
        )
    )
