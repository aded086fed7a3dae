"""Declarative data-quality validation (Deequ/Great-Expectations-style)
compiled to ONE aggregation pass, plus referential-integrity checks as
anti-join counts.

The 100 TB shape: N column constraints over a table must not become N
scans. Every row-local check (not-null, value range, accepted values,
regex shape) compiles to a conditional-sum column inside a single
``agg`` — one scan, one 1-row result, partial map-side combine.
Uniqueness rides the same pass as ``count − count(distinct)`` (exact; an
``approx`` knob swaps in HLL for key spaces where exact distinct is the
bottleneck — same trade the profiler documents). Referential integrity
(child FK ⊆ parent PK) is a distinct-keys anti join — the child is
reduced to its distinct key set FIRST, so the join is key- not
row-cardinality.

Output is one row per check: (check, metric, violations, passed) —
a table you gate an ingest job on, or trend per partition-day.

Reference parity: none (the reference validates nothing); north-star
pipeline hygiene — the step between ingest and training-mix assembly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_count(cond: Column) -> Column:
    """Count of rows violating ``cond`` (null condition counts as a
    violation — constraints are predicates rows must PROVABLY satisfy)."""
    return F.sum(
        F.when(F.coalesce(cond, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
    ).cast("bigint")


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null:{col}", _violation_count(F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"range:{col}",
        _violation_count(F.col(col).between(F.lit(lo), F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"accepted:{col}",
        _violation_count(F.col(col).isin(values)),
    )


def matches_regex(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"regex:{col}",
        _violation_count(F.col(col).rlike(pattern)),
    )


def unique(col: str, approx: bool = False) -> tuple[str, Column]:
    """Duplicate-row count for ``col``: total non-null minus distinct.
    ``approx=True`` swaps exact distinct for HLL (±~2 %) when the key
    space itself is shuffle-prohibitive."""
    total = F.count(F.col(col))
    distinct = (
        F.approx_count_distinct(F.col(col))
        if approx
        else F.countDistinct(F.col(col))
    )
    return f"unique:{col}", (total - distinct).cast("bigint")


def column_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate row-local checks in ONE aggregation pass over ``df``.
    Returns (check, metric, violations, passed) rows — unpivoted via
    ``stack`` from the single 1-row aggregate (the table-profiler shape,
    operators/profiling.py)."""
    names = [n for n, _ in checks]
    agg = df.agg(
        F.count(F.lit(1)).alias("__rows"),
        *[c.alias(f"__c{i}") for i, (_, c) in enumerate(checks)],
    )
    stack = ", ".join(f"'{n}', __c{i}" for i, n in enumerate(names))
    return agg.selectExpr(
        "__rows", f"stack({len(names)}, {stack}) AS (check, violations)"
    ).select(
        "check",
        F.col("__rows").alias("metric"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def fk_check(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential integrity: count of DISTINCT child keys absent from the
    parent (nulls excluded — optionality is ``not_null``'s job). The child
    reduces to its distinct key set before the anti join, so the join is
    key-cardinality on both sides."""
    ck = (
        child.select(F.col(child_col).alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
    )
    pk = parent.select(F.col(parent_col).alias("k")).distinct()
    orphans = ck.join(pk, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("violations")
    )
    n_keys = ck.agg(F.count(F.lit(1)).cast("bigint").alias("metric"))
    return orphans.crossJoin(n_keys).select(
        F.lit(f"fk:{child_col}").alias("check"),
        "metric",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def dq_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-source check frames into one report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
