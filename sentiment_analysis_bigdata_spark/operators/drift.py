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
