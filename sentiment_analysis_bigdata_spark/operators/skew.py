"""Skew-mitigation operators for hot keys (SURVEY §7.7: 'salted aggs for
skewed tokens (stopword-like hot keys)').

At 100 TB a handful of hot keys (stopwords, null-ish defaults, bot users)
can pin a single reducer. Two standard remedies, expressed declaratively:

- ``salted_agg``: two-phase aggregation — add a random salt to the key,
  pre-aggregate on (key, salt) so each hot key spreads over ``salt``
  reducers, then aggregate the partials. Works for any decomposable
  aggregate (sum/count/min/max; avg via sum+count).
- ``salted_broadcast_left``: for joins where the build side is small but
  the probe side has hot keys, broadcast is the fix; for big-big joins
  with a skewed left, replicate the right side ``salt`` ways and salt the
  left randomly — every hot left key spreads across salt partitions.

AQE's skew-join splitting (enabled in session.py) handles moderate skew
automatically; these operators are for the pathological keys AQE can't
rebalance (single-key hotspots inside one partition of a hash aggregate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Example::

        salted_agg(tokens, ["token"], {"n": ("token", "count")}, salt=32)

    Phase 1 groups on (keys…, salt) — map-side combine still applies;
    phase 2 merges partials per key. Results are identical to a direct
    groupBy; only the shuffle layout changes.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {
        "sum": lambda c: F.sum(c),
        "count": lambda c: F.count(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
    }
    for _out, (_col, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"non-decomposable aggregate {fn!r}")

    salted = df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_c, fn) in aggs.items()]
    )


def salted_join_left_skewed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join resilient to hot keys on the LEFT side.

    Left rows get a random salt in [0, salt); the right side is replicated
    ``salt`` ways (explode of a literal range), and the join key becomes
    (key, salt). A left key with 10^9 rows now hashes to ``salt`` different
    reducers instead of one. Right-side blowup is ×salt — use only when
    right ≪ left (else AQE skew-split or broadcast is the answer).
    """
    l = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [key, "__salt"]).drop("__salt")
