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


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    out: str = "n_distinct",
    salt: int = 16,
) -> DataFrame:
    """Skew-resilient ``COUNT(DISTINCT value)`` per key group.

    Decomposable aggregates (sum/count/min/max) survive hot keys because
    map-side partial aggregation collapses each key to one row per task
    BEFORE the shuffle — ``salted_agg`` is belt-and-braces there. COUNT
    DISTINCT is different: the partial phase must ship every distinct
    (key, value) pair, so a hot key with millions of distinct values
    still lands on ONE reducer. Remedy: salt by ``hash(value) % salt``
    (content-derived, NOT random — every duplicate of a value lands in
    the same salt bucket, so bucket-local distinct counts are disjoint
    and sum exactly). Phase 1 counts distincts per (keys…, salt) over
    ``salt`` reducers; phase 2 sums the disjoint partials.

    Results are identical to ``groupBy(keys).agg(countDistinct(value))``
    (NULL values are ignored by both, matching SQL COUNT(DISTINCT));
    only the shuffle layout changes. Measured at bench scale in
    SCALING.md (tools/skew_stress_bench.py).
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count_distinct(F.col(value)).alias("__nd")
    )
    return partial.groupBy(*keys).agg(F.sum("__nd").cast("long").alias(out))
