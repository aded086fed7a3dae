"""Per-group feature normalization for training pipelines: winsorization
(quantile clipping) and robust scaling (median/IQR).

Both are the 2-pass distributed shape:

  1. per-group exact interpolated percentiles — ONE aggregation whose
     output is group-cardinality (tiny in practice, but data-dependent);
  2. the bounds table joins back onto the data as a narrow clip/scale
     projection. The join carries NO forced broadcast hint — group
     cardinality grows with the data in principle, so AQE broadcasts the
     bounds while they fit ``autoBroadcastJoinThreshold`` (the fact side
     then never shuffles) and falls back to a shuffle join beyond
     (SCALING.md "broadcast policy").

Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the linear
interpolation rule, so the oracle replays the identical math. At 100 TB
substitute ``approx_percentile`` in pass 1 (documented knob) — the shape
is unchanged.

Reference parity: none (the reference has no normalization surface);
north-star feature-engineering operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: Sequence[float],
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles at the given probabilities. ``approx=True``
    switches to ``approx_percentile`` (the 100 TB default — sketch-mergeable,
    no exact sort of group values)."""
    fn = F.approx_percentile if approx else F.percentile
    aggs = [
        fn(F.col(value_col), F.lit(p)).alias(f"q{int(p * 1000):03d}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Clip ``value_col`` to the per-group [lower, upper] quantile band;
    adds ``{value_col}_wins`` and ``{value_col}_clipped`` (bool)."""
    bounds = group_quantiles(
        df, value_col, group_cols, [lower, upper], approx=approx
    ).withColumnsRenamed(
        {
            f"q{int(lower * 1000):03d}": "__lo",
            f"q{int(upper * 1000):03d}": "__hi",
        }
    )
    v = F.col(value_col)
    return (
        df.join(bounds, list(group_cols))
        .withColumn(
            f"{value_col}_wins",
            F.least(F.greatest(v.cast("double"), F.col("__lo")), F.col("__hi")),
        )
        .withColumn(
            f"{value_col}_clipped",
            (v.cast("double") < F.col("__lo")) | (v.cast("double") > F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    approx: bool = False,
) -> DataFrame:
    """Per-group robust z-score: (x − median) / IQR. Adds
    ``{value_col}_scaled`` (null when the group's IQR is 0)."""
    bounds = group_quantiles(
        df, value_col, group_cols, [0.25, 0.5, 0.75], approx=approx
    ).select(
        *group_cols,
        F.col("q500").alias("__med"),
        (F.col("q750") - F.col("q250")).alias("__iqr"),
    )
    v = F.col(value_col).cast("double")
    return (
        df.join(bounds, list(group_cols))
        .withColumn(
            f"{value_col}_scaled",
            F.when(
                F.col("__iqr") > 0, (v - F.col("__med")) / F.col("__iqr")
            ),
        )
        .drop("__med", "__iqr")
    )


def nfc_normalize_text(
    df: DataFrame, text_col: str, out_col: str = "nfc_text"
) -> DataFrame:
    """Unicode NFC normalization of a text column — the canonical-form
    step every multilingual curation pipeline runs before hashing or
    deduplicating text (the same logical string can arrive precomposed
    U+00E9 or decomposed 'e'+U+0301; exact dedup/fingerprinting is wrong
    until both map to one byte sequence).

    Spark has no built-in Unicode normalizer, so this is one of the
    sanctioned Arrow ``mapInPandas`` kernels (OPERATORS.md §2.7): a
    narrow per-batch ``unicodedata.normalize('NFC', s)`` pass — no
    shuffle, no state, scales embarrassingly. Value contract: DuckDB's
    native ``nfc_normalize`` must produce byte-identical output (the
    oracle compares md5 content hashes, not just lengths).
    """
    from collections.abc import Iterator
    import unicodedata

    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                None if s is None else unicodedata.normalize("NFC", s)
                for s in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


# exact_quantile_narrowed tail bounds (VERDICT r5 #4):
# _TAIL_ROWS_CAP — largest r the final TakeOrdered tail may rank (per-
# partition top-r + driver merge stays memory-safe well below this);
# _HARD_MAX_ROUNDS — absolute narrowing bound: 128 bins remove ~7 bits of
# interval width per round, so 16 rounds exceed the 2^64 distinct doubles
# (anything still wide after that is the no-shrink float-edge case);
# _TAIL_DISTINCT_CAP — distinct doubles the degenerate (non-shrinkable)
# interval fallback may collect before refusing to proceed.
_TAIL_ROWS_CAP = 1 << 20
_HARD_MAX_ROUNDS = 16
_TAIL_DISTINCT_CAP = 1 << 16
# exact_quantiles_narrowed_multi: combined remainder the one-pass batched
# tail may collect to the driver (vs one TakeOrdered job per group)
_BATCH_TAIL_CAP = 1 << 16


def _check_integral_precision(df: DataFrame, col: str, lo: float, hi: float, fname: str) -> None:
    """Both narrowing operators run on a DOUBLE cast of the column, so
    integer inputs with |value| >= 2^53 would round in the cast and the
    returned cut points — which callers inline as literals compared back
    against the EXACT integer column — could silently diverge from exact
    integer ranking (ADVICE r11). Checked on the double-cast min/max the
    first aggregate already computed (no extra pass): every double below
    2^53 is an exact integer, and rounding-to-nearest never carries a
    value across the 2^53 boundary, so the rounded extrema witness the
    bound exactly. Fractional inputs are already in double's value space
    and pass through."""
    try:
        dtype = df.schema[col].dataType.simpleString()
    except Exception:
        return
    if dtype in ("tinyint", "smallint", "int", "bigint") and max(
        abs(lo), abs(hi)
    ) >= float(1 << 53):
        raise ValueError(
            f"{fname}: integer column '{col}' has |value| >= 2^53 — the"
            " double-cast narrowing would lose integer precision and the"
            " returned cut points could misrank; offset or rescale the"
            " column (e.g. subtract its min) before narrowing"
        )


def exact_quantile_narrowed(
    df: DataFrame,
    col: str,
    q: float,
    bins: int = 128,
    max_rounds: int = 4,
    rank: int | None = None,
) -> tuple[float, int, int]:
    """EXACT order statistic at 100 TB without a global sort: iterative
    histogram narrowing (the classic distributed-selection algorithm —
    one bounded histogram aggregation per round, then recurse into the
    single bin that contains the target rank).

    This is the honest scale path that ``percentile()`` is not: Spark's
    exact percentile aggregate buffers every value of a group in executor
    memory, and a global sort shuffles the entire column. Here each round
    is one map-side-combinable agg whose output is ``bins`` counts (the
    only driver traffic, like k-means' k×d centroids), and the candidate
    range shrinks ~bins× per round, so 2-3 rounds reduce even a trillion
    rows to a remainder small enough for an exact bounded top-r pass
    (TakeOrdered, never a full sort).

    Returns ``(value, n_rows, rounds_used)`` where value is the rank
    ``k = max(1, ceil(q·n))`` element in ascending order — a DATA value
    (no interpolation), so any engine that can rank can verify it
    bit-for-bit.
    """
    if rank is None and not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    x = F.col(col).cast("double")
    base = df.filter(x.isNotNull()).select(x.alias("_x"))
    first = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_x").alias("lo"),
        F.max("_x").alias("hi"),
    ).collect()[0]
    n = first["n"]
    if n == 0:
        raise ValueError("exact_quantile_narrowed: no non-null rows")
    import math

    # ``rank`` overrides the quantile-derived target with an absolute
    # 1-based rank (conformal thresholds need k = ceil((n+1)(1-alpha)),
    # which is NOT expressible as ceil(q*n) without float hazards)
    k = min(n, max(1, rank)) if rank is not None else max(1, math.ceil(q * n))
    lo, hi = float(first["lo"]), float(first["hi"])
    _check_integral_precision(df, col, lo, hi, "exact_quantile_narrowed")
    c_below = 0  # rows strictly below the current [lo, hi] range
    rounds = 0
    remainder = n  # rows inside the current [lo, hi] range
    # Narrow while the remainder is big enough that sorting it would hurt.
    # Every value in [lo, hi]; target rank within range = k - c_below.
    # max_rounds is the BUDGET for well-spread data, not a hard stop: if the
    # remainder still exceeds the TakeOrdered tail cap after the budget
    # (possible only at extreme n), keep narrowing — each extra round is one
    # more bins-sized agg, and the absolute bound caps the worst case (128
    # bins shrink the interval 2^7× per round, so ~10 rounds exhaust the
    # entire double range; degenerate identical-value mass exits via the
    # no-shrink guard instead and is handled below the loop). A caller-
    # supplied max_rounds above _HARD_MAX_ROUNDS raises the absolute bound
    # too — with tiny bins (e.g. 2) a round removes only 1 bit, so a
    # converging call may legitimately need more than 16 rounds.
    hard_rounds = max(_HARD_MAX_ROUNDS, max_rounds)
    # Membership is tracked as the CHAIN of per-round bucket predicates,
    # never as nominal [lo, hi] bounds: float rounding in (x - lo) / w can
    # assign a value to a bucket whose nominal range excludes it (found by
    # hypothesis: -2^-52 - (-3.0) rounds to exactly 3.0, landing the value
    # in 0.0's bucket whose nominal lower edge is 0.0 > -2^-52). Counting
    # and recursion use the SAME Spark expression, so the set counted as
    # "bucket hit" is bit-for-bit the set recursed into, and the rank
    # arithmetic (k - c_below) stays exact by induction. lo/hi remain the
    # nominal bounds that drive next round's bucket arithmetic only.
    pred = F.lit(True)
    while lo < hi and rounds < hard_rounds and (
        rounds < max_rounds or remainder > _TAIL_ROWS_CAP
    ):
        w = (hi - lo) / bins
        bucket = F.least(
            F.greatest(F.floor((F.col("_x") - F.lit(lo)) / F.lit(w)), F.lit(0)),
            F.lit(bins - 1),
        ).cast("int")
        counts = dict(
            base.filter(pred)
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        target = k - c_below
        cum = 0
        hit = bins - 1
        for b in range(bins):
            c = counts.get(b, 0)
            if cum + c >= target:
                hit = b
                break
            cum += c
        new_lo = lo + hit * w
        new_hi = hi if hit == bins - 1 else lo + (hit + 1) * w
        # float-edge guard: a bin that no longer shrinks the range means
        # the remaining mass is (near-)identical values — stop narrowing
        if new_lo <= lo and new_hi >= hi:
            break
        c_below += cum
        pred = pred & (bucket == F.lit(hit))
        lo, hi = new_lo, new_hi
        rounds += 1
        remainder = counts.get(hit, 0)
        if remainder <= max(bins, 1024):
            break  # remainder already tiny; the top-r pass is cheap
    r = k - c_below
    remaining = base.filter(pred)
    if r > _TAIL_ROWS_CAP:
        # Degenerate column (VERDICT r5 #4): the no-shrink guard exited
        # with most of the mass at one (or a few float-adjacent) values —
        # e.g. a 99%-constant column whose target rank lands inside the
        # constant run. A TakeOrdered tail of r rows would be a near-global
        # sort at 100 TB, so rank among DISTINCT values instead: one
        # groupBy("_x") agg whose output is bounded by the handful of
        # distinct doubles a non-shrinkable float interval can hold. The
        # limit caps driver traffic even adversarially; exceeding it means
        # the interval was NOT at float resolution, which the no-shrink /
        # hard-round exits make unreachable for real columns — raise rather
        # than silently sort the world.
        vals = (
            remaining.groupBy("_x")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("_x")
            .limit(_TAIL_DISTINCT_CAP + 1)
            .collect()
        )
        if len(vals) > _TAIL_DISTINCT_CAP:
            raise ValueError(
                "exact_quantile_narrowed: degenerate remainder has more than"
                f" {_TAIL_DISTINCT_CAP} distinct values with r={r} — refusing"
                " the near-global TakeOrdered; raise bins/max_rounds"
            )
        cum2 = 0
        for vrow in vals:
            cum2 += vrow["c"]
            if cum2 >= r:
                return float(vrow["_x"]), int(n), rounds
        raise AssertionError("exact_quantile_narrowed: rank not in remainder")
    value = (
        remaining.orderBy("_x").limit(r).agg(F.max("_x").alias("v")).collect()
    )[0]["v"]
    return float(value), int(n), rounds


def exact_quantiles_narrowed_multi(
    df: DataFrame,
    col: str,
    ranks: list[int] | None = None,
    bins: int = 128,
    max_rounds: int = 4,
    ranks_fn=None,
) -> tuple[dict[int, float], int, int]:
    """Shared-scan multi-order-statistic selection: every target rank
    narrows TOGETHER — per round ONE (interval, bucket)-keyed
    aggregation over the column, where the intervals are the current
    disjoint candidate ranges (≤ n_targets of them, encoded as a
    when-chain over each interval's bucket-predicate lineage). Nine
    decile cut points cost ~4 full-column passes instead of the ~27 that
    nine independent :func:`exact_quantile_narrowed` calls pay — the
    difference between one narrowing and nine at 100 TB, with the SAME
    per-target semantics (rank-k DATA value, identical bucket
    arithmetic, no-shrink float-edge guard, degenerate distinct-tail
    fallback; targets that land in the same bucket keep sharing one
    interval, so duplicate/close ranks cost nothing extra).

    ``ranks`` are absolute 1-based ascending ranks (deduplicate and
    clamp to [1, n] before calling, or values raise). When the ranks
    depend on n, pass ``ranks_fn(n) -> list[int]`` instead — the
    operator derives them from its own first aggregate, saving the
    caller a separate count() pass over the column. Returns
    ``({rank: value}, n_rows, rounds_used)`` where rounds is the number
    of shared aggregation rounds executed.
    """
    if (ranks is None) == (ranks_fn is None):
        raise ValueError(
            "exact_quantiles_narrowed_multi: pass exactly one of ranks/ranks_fn"
        )
    x = F.col(col).cast("double")
    base = df.filter(x.isNotNull()).select(x.alias("_x"))
    first = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_x").alias("lo"),
        F.max("_x").alias("hi"),
    ).collect()[0]
    n = int(first["n"])
    if n == 0:
        raise ValueError("exact_quantiles_narrowed_multi: no non-null rows")
    if ranks_fn is not None:
        ranks = list(ranks_fn(n))
    if not ranks:
        raise ValueError("exact_quantiles_narrowed_multi: no ranks")
    ks = sorted(set(int(k) for k in ranks))
    if ks[0] < 1 or ks[-1] > n:
        raise ValueError(
            f"exact_quantiles_narrowed_multi: ranks must be within [1, {n}]"
        )
    _check_integral_precision(
        df, col, float(first["lo"]), float(first["hi"]),
        "exact_quantiles_narrowed_multi",
    )
    hard_rounds = max(_HARD_MAX_ROUNDS, max_rounds)
    tiny = max(bins, 1024)
    # One group per disjoint candidate interval. All targets in a group
    # share the SAME bucket-predicate chain (pred), nominal bounds and
    # c_below — invariant by construction: a group only ever splits by
    # hit bucket, and same-bucket targets stay together. ``active``
    # False = stop narrowing (tiny remainder or float-edge no-shrink).
    groups = [
        {
            "pred": F.lit(True),
            "lo": float(first["lo"]),
            "hi": float(first["hi"]),
            "c_below": 0,
            "ks": ks,
            "remainder": n,
            "active": True,
        }
    ]
    rounds = 0

    def _needs(g) -> bool:
        return (
            g["active"]
            and g["lo"] < g["hi"]
            and g["remainder"] > tiny
            and (rounds < max_rounds or g["remainder"] > _TAIL_ROWS_CAP)
        )

    while rounds < hard_rounds and any(_needs(g) for g in groups):
        workset = [g for g in groups if _needs(g)]
        rest = [g for g in groups if not _needs(g)]
        # gid + bucket as ONE chained projection; same bucket expression
        # as the single-target operator, per group's nominal bounds
        buckets = []
        for g in workset:
            w = (g["hi"] - g["lo"]) / bins
            buckets.append(
                F.least(
                    F.greatest(
                        F.floor((F.col("_x") - F.lit(g["lo"])) / F.lit(w)), F.lit(0)
                    ),
                    F.lit(bins - 1),
                ).cast("int")
            )
        gid = F.lit(-1)
        for i in range(len(workset) - 1, -1, -1):
            gid = F.when(workset[i]["pred"], F.lit(i)).otherwise(gid)
        bexpr = F.lit(-1)
        for i in range(len(workset) - 1, -1, -1):
            bexpr = F.when(gid == F.lit(i), buckets[i]).otherwise(bexpr)
        counts_rows = (
            base.select(gid.alias("g"), bexpr.alias("b"))
            .filter(F.col("g") >= 0)
            .groupBy("g", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_group: dict[int, dict[int, int]] = {}
        for row in counts_rows:
            by_group.setdefault(row["g"], {})[row["b"]] = row["c"]
        rounds += 1
        new_groups = rest
        for i, g in enumerate(workset):
            counts = by_group.get(i, {})
            w = (g["hi"] - g["lo"]) / bins
            # cumulative walk once; assign each target its hit bucket
            cum_before: dict[int, int] = {}
            cum = 0
            for b in range(bins):
                cum_before[b] = cum
                cum += counts.get(b, 0)
            children: dict[int, dict] = {}
            for k in g["ks"]:
                target = k - g["c_below"]
                run, hit = 0, bins - 1
                for b in range(bins):
                    c = counts.get(b, 0)
                    if run + c >= target:
                        hit = b
                        break
                    run += c
                if hit in children:
                    children[hit]["ks"].append(k)
                    continue
                new_lo = g["lo"] + hit * w
                new_hi = g["hi"] if hit == bins - 1 else g["lo"] + (hit + 1) * w
                no_shrink = new_lo <= g["lo"] and new_hi >= g["hi"]
                children[hit] = {
                    "pred": g["pred"] & (buckets[i] == F.lit(hit)),
                    "lo": g["lo"] if no_shrink else new_lo,
                    "hi": g["hi"] if no_shrink else new_hi,
                    "c_below": g["c_below"] + cum_before[hit],
                    "ks": [k],
                    "remainder": counts.get(hit, 0),
                    "active": not no_shrink,
                }
                if no_shrink:
                    # float-edge: keep the PARENT predicate/bounds so the
                    # tail sees the same rows the counts were taken over.
                    # ``widened`` marks that this group's predicate is NOT
                    # disjoint from its bucket-restricted siblings' — the
                    # batched tail (which assumes disjoint predicates for
                    # its first-match group routing) must exclude it and
                    # route it through the overlap-safe per-group path
                    # (ADVICE r11).
                    children[hit]["pred"] = g["pred"]
                    children[hit]["c_below"] = g["c_below"]
                    children[hit]["remainder"] = g["remainder"]
                    children[hit]["widened"] = True
            new_groups.extend(children.values())
        groups = new_groups

    out: dict[int, float] = {}
    # Batched tail: bucket-restricted groups' predicates are disjoint
    # (same parent → different hit buckets; different parents → disjoint
    # by induction), so when the combined remainder is driver-safe, ONE
    # pass collects every non-degenerate group's rows instead of one
    # TakeOrdered job per group. ``widened`` (no-shrink) groups keep
    # their PARENT's predicate, which overlaps any bucket-restricted
    # sibling — they are excluded here and handled by the per-group
    # path below, which filters each group independently — at fixture scale that's the difference between 2 and 10
    # driver round-trips, and at 100 TB it's one fewer full-column pass
    # per group (the narrowing already shrank each group below the cap).
    batch = [
        g
        for g in groups
        if not g.get("widened")
        and max(k - g["c_below"] for k in g["ks"]) <= _TAIL_ROWS_CAP
        and g["remainder"] <= _BATCH_TAIL_CAP
    ]
    if batch and sum(g["remainder"] for g in batch) <= _BATCH_TAIL_CAP:
        bid = F.lit(-1)
        for i in range(len(batch) - 1, -1, -1):
            bid = F.when(batch[i]["pred"], F.lit(i)).otherwise(bid)
        rows = (
            base.select(bid.alias("g"), "_x")
            .filter(F.col("g") >= 0)
            .collect()
        )
        per: dict[int, list[float]] = {i: [] for i in range(len(batch))}
        for row in rows:
            per[row["g"]].append(row["_x"])
        for i, g in enumerate(batch):
            vals = sorted(per[i])
            for k in g["ks"]:
                out[k] = float(vals[k - g["c_below"] - 1])
        # identity filter: group dicts hold Column objects, whose __eq__
        # builds an expression instead of comparing
        batch_ids = {id(g) for g in batch}
        groups = [g for g in groups if id(g) not in batch_ids]
    for g in groups:
        remaining = base.filter(g["pred"])
        rs = sorted(k - g["c_below"] for k in g["ks"])
        if rs[-1] > _TAIL_ROWS_CAP:
            # degenerate mass (same contract as the single-target path):
            # rank among DISTINCT values of the non-shrinkable interval
            vals = (
                remaining.groupBy("_x")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy("_x")
                .limit(_TAIL_DISTINCT_CAP + 1)
                .collect()
            )
            if len(vals) > _TAIL_DISTINCT_CAP:
                raise ValueError(
                    "exact_quantiles_narrowed_multi: degenerate remainder has"
                    f" more than {_TAIL_DISTINCT_CAP} distinct values —"
                    " refusing the near-global TakeOrdered; raise"
                    " bins/max_rounds"
                )
            for k in g["ks"]:
                r, cum2 = k - g["c_below"], 0
                for vrow in vals:
                    cum2 += vrow["c"]
                    if cum2 >= r:
                        out[k] = float(vrow["_x"])
                        break
                else:
                    raise AssertionError(
                        "exact_quantiles_narrowed_multi: rank not in remainder"
                    )
            continue
        tail = [
            r["_x"] for r in remaining.orderBy("_x").limit(rs[-1]).collect()
        ]
        for k in g["ks"]:
            out[k] = float(tail[k - g["c_below"] - 1])
    return out, n, rounds


def strip_accents_text(
    df: DataFrame, text_col: str, out_col: str = "folded_text"
) -> DataFrame:
    """Accent/diacritic folding — NFD-decompose then drop combining
    marks (Unicode category Mn) — the normalization search and dedup
    pipelines apply so 'café' and 'cafe' fingerprint identically. Same
    sanctioned Arrow-kernel shape as :func:`nfc_normalize_text`; the
    value contract is DuckDB's native ``strip_accents`` (byte-identical
    on Latin-script text, verified by md5 content hashes in the oracle
    twin). Note the contract is mark REMOVAL, not transliteration:
    characters without a canonical decomposition (ø, ß, đ) pass through
    unchanged on both engines."""
    from collections.abc import Iterator
    import unicodedata

    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` string"

    def fold(s):
        return "".join(
            c
            for c in unicodedata.normalize("NFD", s)
            if unicodedata.category(c) != "Mn"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [None if s is None else fold(s) for s in pdf[text_col]]
            yield pdf

    return df.mapInPandas(kernel, schema=schema)
