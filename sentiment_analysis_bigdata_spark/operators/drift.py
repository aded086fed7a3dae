"""Distribution-drift monitoring: KL / Jensen-Shannon divergence between
two token (or any categorical) distributions.

The data-quality guardrail for a continuously-ingested corpus: compare
today's token distribution against the reference corpus (or one source
against another) and alarm when divergence jumps. Distributed shape: each
side reduces to a category-count frame (one agg, vocabulary-sized); the
two count frames full-outer join on the category (joint support) and the
divergences are one scalar aggregation over that joined frame. The raw
corpus is scanned exactly once per side.

Add-k smoothing over the JOINT vocabulary keeps both distributions
absolutely continuous (KL finite) — the standard treatment for unseen
categories.

Reference parity: none; north-star pipeline-monitoring operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def category_counts(df: DataFrame, cat_col: str) -> DataFrame:
    """(category, n) — the sufficient statistic each side reduces to."""
    return df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )


def divergence_from_counts(
    counts_a: DataFrame, counts_b: DataFrame, smoothing: float = 0.5
) -> DataFrame:
    """KL(A‖B), KL(B‖A), and JS divergence from two (category, n) frames.

    Probabilities use add-k smoothing over the joint support:
    p_i = (n_ai + k) / (N_a + k·V). Returns one row:
    (n_categories, kl_ab, kl_ba, js_divergence)."""
    joined = (
        counts_a.select("category", F.col("n").alias("na"))
        .join(
            counts_b.select("category", F.col("n").alias("nb")),
            "category",
            "full_outer",
        )
        .na.fill({"na": 0, "nb": 0})
    )
    k = float(smoothing)
    tot = joined.agg(
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    j = joined.join(F.broadcast(tot))
    p = (F.col("na") + k) / (F.col("ta") + k * F.col("v"))
    q = (F.col("nb") + k) / (F.col("tb") + k * F.col("v"))
    m = (p + q) / 2
    return j.agg(
        F.max("v").alias("n_categories"),
        F.sum(p * F.log(p / q)).alias("kl_ab"),
        F.sum(q * F.log(q / p)).alias("kl_ba"),
        (
            F.sum(p * F.log(p / m)) / 2 + F.sum(q * F.log(q / m)) / 2
        ).alias("js_divergence"),
    )


def ks_two_sample(
    sample_a: DataFrame,
    sample_b: DataFrame,
    value_col: str,
    round_digits: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two numeric
    distributions: D = sup_x |F_a(x) − F_b(x)| — the nonparametric
    complement to KL/JS for CONTINUOUS drift (model scores, lengths,
    latencies), where category counts don't apply.

    Distributed shape (the roc_points pattern): each side reduces to a
    (value, count) frame first (one vocab/support-sized aggregation), the
    two frames full-outer join on the value, and the cumulative window
    runs over #distinct-values rows — never raw rows. For genuinely
    continuous data the distinct support can approach n, so
    ``round_digits`` bins values before counting (the histogram variant:
    binning perturbs each CDF by at most the bin's probability mass, the
    same exactness trade roc_auc_hist documents); with it set, the sorted
    window sees a bounded number of bins at any corpus size.

    Returns one row: (n_a, n_b, n_support, ks_stat, ks_scaled) where
    ks_scaled = D·√(n_a·n_b/(n_a+n_b)) — the statistic compared against
    the Kolmogorov critical values (1.358 ≈ α 0.05).
    """
    from pyspark.sql import Window

    def side(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col)
        if round_digits is not None:
            v = F.round(v, round_digits)
        return df.select(v.alias("x")).groupBy("x").agg(
            F.count(F.lit(1)).alias(out)
        )

    joined = (
        side(sample_a, "na")
        .join(side(sample_b, "nb"), "x", "full_outer")
        .na.fill({"na": 0, "nb": 0})
    )
    tot = joined.agg(
        F.sum("na").cast("double").alias("ta"),
        F.sum("nb").cast("double").alias("tb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = joined.select(
        "x",
        F.sum("na").over(w).alias("cna"),
        F.sum("nb").over(w).alias("cnb"),
    ).join(F.broadcast(tot))
    d = F.abs(F.col("cna") / F.col("ta") - F.col("cnb") / F.col("tb"))
    return cum.agg(
        F.max(F.col("ta").cast("bigint")).alias("n_a"),
        F.max(F.col("tb").cast("bigint")).alias("n_b"),
        F.count(F.lit(1)).alias("n_support"),
        F.max(d).alias("ks_stat"),
        (
            F.max(d)
            * F.sqrt(F.max("ta") * F.max("tb") / (F.max("ta") + F.max("tb")))
        ).alias("ks_scaled"),
    )


def psi_binned(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    smoothing: float = 0.5,
    edge_round_digits: int = 6,
    exact_edges: bool = True,
) -> DataFrame:
    """Population Stability Index between two numeric distributions over
    reference-quantile bins — the production scorecard-drift metric
    (rule of thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted):
    PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) where p is the reference share
    and q the current share of bin b.

    Bin edges are the reference side's interior ``n_bins``-quantiles,
    rounded to ``edge_round_digits`` so the boundary comparison is
    engine-reproducible; the edges are bounded (n_bins − 1 doubles), so
    collecting them is model-sized driver traffic, and the bin
    assignment is a codegen'd literal comparison chain — no join. Each
    side then reduces to an n_bins-row count frame (one aggregation per
    side, the only shuffles) joined to a literal bin skeleton so EMPTY
    bins participate; add-k smoothing keeps every log finite.

    Returns per-bin rows (bin, n_ref, n_cur, p_ref, p_cur, contrib) —
    total PSI is ``sum(contrib)``.

    ``exact_edges=True`` (the oracle-replayable default) uses Spark's
    exact ``percentile``, whose per-partition state grows with the
    number of DISTINCT reference values — fine for scores/ratios with
    bounded precision, wrong for 100 TB of unbounded doubles. Pass
    ``exact_edges=False`` there: edges come from ``approx_percentile``
    (mergeable KLL-style sketch, fixed memory at accuracy 1e-4); bin
    SHARES drift by at most the rank error, which the PSI bands
    (0.1/0.25) comfortably absorb. Everything downstream is identical.
    """
    if n_bins < 2:
        raise ValueError("psi_binned: n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    q_arr = F.array(*[F.lit(q) for q in qs])
    v_ref = F.col(value_col).cast("double")
    edge_agg = (
        F.percentile(v_ref, q_arr)
        if exact_edges
        else F.percentile_approx(v_ref, q_arr, 10000)
    )
    edges_row = reference.agg(
        F.transform(edge_agg, lambda e: F.round(e, edge_round_digits)).alias("e")
    ).first()
    edges = list(edges_row["e"])

    def binned(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = sum(
            (F.when(v > F.lit(float(e)), 1).otherwise(0) for e in edges),
            F.lit(0),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    spark = reference.sparkSession
    skeleton = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        skeleton.join(binned(reference, "n_ref"), "bin", "left")
        .join(binned(current, "n_cur"), "bin", "left")
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    tot = joined.agg(
        F.sum("n_ref").cast("double").alias("tr"),
        F.sum("n_cur").cast("double").alias("tc"),
    )
    k = float(smoothing)
    j = joined.join(F.broadcast(tot))
    p = (F.col("n_ref") + k) / (F.col("tr") + k * n_bins)
    q = (F.col("n_cur") + k) / (F.col("tc") + k * n_bins)
    return j.select(
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("p_cur"),
        ((p - q) * F.log(p / q)).alias("contrib"),
    )
