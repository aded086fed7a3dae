"""Frequency-sketch operators for huge key spaces.

``heavy_hitters`` is the scale pattern for "top-k over trillions of distinct
keys": a plain ``groupBy(key).count()`` shuffles every distinct key, which
at 100 TB means a shuffle the size of the key space. Instead:

pass 1  map-side candidate generation — each partition keeps only its local
        top-m keys (a bounded Counter inside ``mapInPandas``; no shuffle of
        the long tail), then the tiny candidate union is collected;
pass 2  exact recount of ONLY the candidates (broadcast semi join → narrow
        filter → groupBy over ≤ partitions×m keys) → global top-k.

Counts for surviving keys are EXACT (pass 2 recounts from the source), so
the result is value-checkable against a plain SQL top-k — the approximation
only affects which keys make the candidate set, and any key that is in the
true top-k in aggregate is in the local top-m of enough partitions in
practice (guaranteed when m ≥ k and a top-k key is top-m in at least one
partition; increase ``per_partition`` for skew-free data).

Two scans beat one full-keyspace shuffle at scale; the second scan's
aggregation state is bounded by the candidate count, not the key space.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candidate_keys(df: DataFrame, col: str, per_partition: int = 200) -> DataFrame:
    """Pass 1: per-partition local top-``per_partition`` keys by count.

    Arrow-batched; state per partition is one bounded Counter. Emits each
    partition's candidates once, at end-of-partition.
    """

    def local_topm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[col].dropna())
        if counts:
            top = [k for k, _ in counts.most_common(per_partition)]
            yield pd.DataFrame({col: top})

    return df.select(col).mapInPandas(local_topm, schema=f"{col} string").distinct()


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    per_partition: int = 200,
) -> DataFrame:
    """Exact-count top-k over a huge key space without a full-keyspace
    shuffle (see module docstring). Deterministic tie-break:
    (count desc, key asc). Returns (col, n).
    """
    # candidate count is bounded by partitions × per_partition but
    # data-dependent, so no broadcast hint — AQE broadcasts while it fits
    cand = candidate_keys(df, col, per_partition)
    exact = (
        df.join(cand, col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), F.col(col).asc()).limit(k)


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over a key
    column as a (row, bucket, cnt) cell table.

    Each occurrence of a key increments ``depth`` cells, one per hash row:
    bucket_r(k) = md5_hash64(k ':' r ':' seed) mod width. The sketch is a
    fixed-size summary — at most depth × width rows REGARDLESS of corpus
    size or key cardinality — and is mergeable: sketches of two corpora
    (same depth/width/seed) combine by summing cells (:func:`cms_merge`),
    which is what makes per-day / per-source frequency summaries
    re-aggregable without ever re-scanning raw data (same role HLL plays
    for distinct counts, here for point frequencies).

    Scale shape: one explode (× depth, a constant) over the key column,
    then a single aggregation whose key space is capped at depth × width —
    partial map-side combine makes the shuffle sketch-sized, not
    corpus-sized. Hashes are md5-derived so DuckDB replays the sketch
    bit-for-bit (functions/hashing.py idiom).

    Guarantee: estimate ≥ true count always (cells only overcount on
    collision); estimate ≤ true + εN with probability 1−δ for
    width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
    """
    from sentiment_analysis_bigdata_spark.functions.hashing import md5_hash64

    rows = df.select(F.col(col).cast("string").alias("k")).filter(
        F.col("k").isNotNull()
    )
    e = rows.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    )
    bucket = F.pmod(
        md5_hash64(
            F.concat_ws(
                ":", F.col("k"), F.col("r").cast("string"), F.lit(str(seed))
            )
        ),
        F.lit(width),
    )
    return (
        e.select("r", bucket.alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-shaped count-min sketches by summing cells."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a count-min sketch:
    min over hash rows of the addressed cell (0 when the cell is absent —
    an empty cell means no key ever touched it).

    The probe table is |keys| × depth rows; the join is an equi join on
    (r, b) against the sketch, whose size is bounded at depth × width BY
    CONSTRUCTION (the groupBy in :func:`cms_build` caps it). No broadcast
    hint even so: the sketch's subtree scans the corpus, and the plan
    audit (tools/plan_audit.py) conservatively rejects hint-forced
    broadcasts over SF-scaled scans — AQE sees the post-aggregation size
    and broadcasts it at runtime anyway.

    Returns (col, est_n).
    """
    from sentiment_analysis_bigdata_spark.functions.hashing import md5_hash64

    probes = (
        keys.select(F.col(col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
        .select(
            "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
        )
    )
    bucket = F.pmod(
        md5_hash64(
            F.concat_ws(
                ":", F.col("k"), F.col("r").cast("string"), F.lit(str(seed))
            )
        ),
        F.lit(width),
    )
    probes = probes.select("k", "r", bucket.alias("b"))
    joined = probes.join(sketch, ["r", "b"], "left").select(
        "k", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return (
        joined.groupBy("k")
        .agg(F.min("cnt").alias("est_n"))
        .withColumnRenamed("k", col)
    )


def hist_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    keys: list[str] | None = None,
) -> DataFrame:
    """Mergeable fixed-range histogram sketch of a numeric column:
    (keys..., bucket, cnt) with bucket = clamp(⌊(x−lo)/w⌋, 0, bins−1),
    w = (hi−lo)/bins. Per key the sketch is ≤ ``bins`` cells regardless
    of row count, and sketches merge by cell-sum (:func:`hist_merge`) —
    the quantile analogue of the HLL/CMS rollup story: persist per-day
    histograms, answer per-week P95s without re-reading raw data.

    Fixed, data-independent bucket edges are the point: quantile error is
    bounded a priori by one bin width (asserted by the oracle query), and
    two independently-built sketches are mergeable BECAUSE they share
    edges — adaptive sketches (t-digest, KLL) trade that determinism for
    tighter tails. Out-of-range values clamp into the edge buckets.
    """
    w = (hi - lo) / bins
    x = F.col(col).cast("double")
    bucket = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    gcols = list(keys or [])
    return (
        df.filter(x.isNotNull())
        .select(*gcols, bucket.alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(keys: list[str], *sketches: DataFrame) -> DataFrame:
    """Merge same-edged histogram sketches by cell-sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
    keys: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: per key and quantile
    q, the UPPER EDGE of the first bucket whose cumulative count reaches
    ⌈q·total⌉ — deterministic, so an oracle replays it exactly, and never
    more than one bin width above the true quantile (the bound the
    oracle's ``within_bound`` column value-checks).

    One cumulative window over ≤ ``bins`` rows per key (support-sized,
    the roc_auc/KS shape) + a ≤ |qs|-row quantile grid join.
    """
    from pyspark.sql import Window

    gcols = list(keys or [])
    w = (hi - lo) / bins
    win = Window.partitionBy(*[F.col(k) for k in gcols]).orderBy("bucket")
    cum = sketch.withColumn(
        "cum", F.sum("cnt").over(win.rowsBetween(Window.unboundedPreceding, 0))
    )
    totals = sketch.groupBy(*gcols).agg(F.sum("cnt").alias("total"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    joined = cum.join(totals, gcols) if gcols else cum.crossJoin(totals)
    hit = joined.join(qdf).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("total"))
    )
    return (
        hit.groupBy(*gcols, "q")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            *gcols,
            "q",
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("est"),
        )
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = 8192,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Build a Bloom filter (Bloom 1970) over a key column as a distinct
    occupied-position table: each key sets ``k`` positions
    pos_i(key) = md5_hash64(key ':' i ':' seed) mod m.

    The sketch is a fixed-size summary — at most ``m`` rows regardless of
    how many keys were inserted — and is mergeable by distinct-union
    (:func:`bloom_merge`), which is what makes it the standard corpus-scale
    MEMBERSHIP pre-filter: build once over the benchmark/blocklist side,
    then prune the 100 TB side down to bloom-positive candidates before any
    exact join ever runs. Guarantee: no false negatives, ever (a present
    key's positions are all set by construction); false positives at rate
    ≈ (1 − e^{−kn/m})^k, and every bloom-positive candidate is expected to
    be exact-checked downstream (the :func:`bloom_probe` caller's job).

    Scale shape: one explode (× k, a constant) over the DISTINCT keys,
    then a distinct over a key space capped at ``m`` — partial map-side
    dedup makes the shuffle sketch-sized. Hashes are md5-derived so DuckDB
    replays the filter bit-for-bit (functions/hashing.py idiom).

    The position-set form is the join-friendly working representation; for
    a wire/storage format :func:`bloom_pack` folds it into ⌈m/64⌉ bitmask
    words (the literal bit array).
    """
    from sentiment_analysis_bigdata_spark.functions.hashing import md5_hash64

    keys = (
        df.select(F.col(col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
    )
    e = keys.select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    )
    pos = F.pmod(
        md5_hash64(
            F.concat_ws(
                ":", F.col("key"), F.col("i").cast("string"), F.lit(str(seed))
            )
        ),
        F.lit(m),
    )
    return e.select(pos.alias("pos")).distinct()


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-parameter Bloom filters by position-set union."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_pack(sketch: DataFrame, m: int) -> DataFrame:
    """Fold an occupied-position sketch into its literal bit array:
    (word_idx, bits) with bits = OR of (1 << pos%64) over positions in
    word ``pos DIV 64`` — ⌈m/64⌉ rows, the form you'd persist or ship to
    another system. ``bit_or`` aggregates identically in Spark and DuckDB
    (two's-complement BIGINT), so packed words are value-checkable."""
    return (
        sketch.select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    m: int = 8192,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Membership probe: a key is bloom-positive iff ALL ``k`` of its
    positions are occupied. Probe table is |keys| × k rows; the join is an
    equi join on ``pos`` against the ≤ m-row sketch. No broadcast hint (the
    sketch subtree scans the inserted side; AQE sees the post-distinct size
    and broadcasts at runtime — same policy as :func:`cms_estimate`).

    Returns (col, bloom_member). No false negatives: rows of the inserted
    set always return true; a true here still means "maybe present" —
    callers exact-check bloom-positive survivors, which is the whole
    pre-filter bargain (prune ~all of the corpus side for the price of one
    m-row join, pay exact verification only on the tiny candidate set).
    """
    from sentiment_analysis_bigdata_spark.functions.hashing import md5_hash64

    probes = (
        keys.select(F.col(col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
        .select(
            "key", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
        )
    )
    pos = F.pmod(
        md5_hash64(
            F.concat_ws(
                ":", F.col("key"), F.col("i").cast("string"), F.lit(str(seed))
            )
        ),
        F.lit(m),
    )
    probes = probes.select("key", pos.alias("pos"))
    hits = probes.join(sketch, "pos", "left_semi")
    return (
        probes.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_pos"))
        .join(
            hits.groupBy("key").agg(F.count(F.lit(1)).alias("n_hit")),
            "key",
            "left",
        )
        .select(
            F.col("key").alias(col),
            (F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos")).alias(
                "bloom_member"
            ),
        )
    )
