"""Runtime (dynamic) join filtering: min/max key-bound pushdown.

When a fact-dimension join's dimension side is *filtered and selective*,
the fact scan can be pre-pruned by the dimension's surviving key range
before the join executes: a k-row aggregate of the dim keys (1 tiny job),
then `fact.filter(key BETWEEN lo AND hi)` — a predicate simple enough to
push into the parquet scan, where row-group min/max statistics (and
partition values, if partitioned by the key) skip data the join would
discard anyway. This is the same idea as Spark's own runtime row-group
filtering / DPP, made explicit so it applies to any key expression and is
visible in the plan.

Semantically a no-op: the join result is identical with or without the
bound filter — which is exactly what the DuckDB oracle checks (the oracle
runs the PLAIN join; the engine runs the filtered one).

The driver-side action is one row (min, max) — within the bounded-collect
policy (OPERATORS.md S6). For non-contiguous keys a left-semi join on the
distinct dim keys is the tighter filter (already first-class:
``relational.semi_join``); min/max wins when the dim side's keys cluster
in a narrow range, because BETWEEN pushes into the scan while a semi join
cannot. ``broadcast_dim`` defaults to False — the dim side is usually
SF-scaled, so AQE owns the join strategy unless the caller knows the side
is bounded (SCALING.md "broadcast policy").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_bounds(dim: DataFrame, key: str) -> tuple:
    """One-row aggregate of the dimension's surviving key range."""
    row = dim.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    return row.lo, row.hi


def runtime_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Join fact to a (filtered) dimension with the fact side pre-pruned to
    the dim's key range. Empty dim → empty result without scanning fact.

    Only fact-preserving-free join types are accepted: the pre-prune (and
    the empty-dim short-circuit) drops fact rows outside the dim key range,
    which is a no-op for ``inner``/``left_semi`` but would silently drop
    unmatched fact rows for left/outer joins — so those raise."""
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            "runtime_filtered_join prunes the fact side by the dim key "
            f"range, which only preserves semantics for inner/left_semi "
            f"joins; got how={how!r}"
        )
    lo, hi = minmax_bounds(dim, dim_key)
    if lo is None:
        pruned = fact.filter(F.lit(False))
    else:
        pruned = fact.filter(F.col(fact_key).between(F.lit(lo), F.lit(hi)))
    d = F.broadcast(dim) if broadcast_dim else dim
    return pruned.join(d, pruned[fact_key] == d[dim_key], how)
