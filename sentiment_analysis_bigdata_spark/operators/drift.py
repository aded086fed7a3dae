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
