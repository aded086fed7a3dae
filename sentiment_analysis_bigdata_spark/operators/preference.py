"""Pairwise-preference aggregation (Bradley-Terry) — the data-prep step
of reward-model / RLHF pipelines: turn a table of pairwise outcomes
("annotator preferred response A over B") into per-item strength scores
and a global ranking.

Model (Bradley & Terry 1952; MM fitting per Hunter 2004, "MM algorithms
for generalized Bradley-Terry models", Ann. Statist. 32(1)): item i has
strength s_i > 0, P(i beats j) = s_i / (s_i + s_j). The minorize-maximize
update

    s_i' = W_i / sum_j  N_ij / (s_i + s_j)

(W_i = total wins of i, N_ij = comparisons between i and j) increases the
likelihood every step. A FIXED number of iterations from the uniform
start with 12-dp rounding after every update makes the whole fit
engine-replayable — the same unrolled-recursion discipline as the BPE and
unigram-LM oracles.

Cross-engine determinism contract: every per-opponent term is rounded to
12 dp, the per-item denominator folds those terms in OPPONENT ORDER
(``aggregate`` over an ``array_sort``-ed struct array — an identical
left-to-right IEEE sum in DuckDB's ``list_reduce`` over ``list(... ORDER
BY ...)``), and wins/comparison counts are integers, so both engines see
bit-identical inputs at every step. No driver round-trips: the score
frame is item-sized and iterates via k-row joins (at reward-model scale,
items = responses per prompt batch — thousands; the comparison table is
the corpus-sized side and is touched once to build integer win counts).

The reference has no preference surface (its scope ends at classifier
evaluation, `compare_models.py:12-59`); this is part of the LLM-pipeline
extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

_ROUND = 12


def bt_win_counts(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """(winner, loser) rows → directed win counts ``(w, l, n)``.

    The ONE corpus-sized aggregation; everything after operates on the
    item-pair-sized result.
    """
    return (
        comparisons.select(
            F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
        )
        .groupBy("w", "l")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bt_scores(
    wins: DataFrame,
    iterations: int = 3,
) -> DataFrame:
    """Fit Bradley-Terry strengths by ``iterations`` MM updates over the
    directed win-count frame ``(w, l, n)``; returns
    ``(item, score, wins, comparisons)`` with ``score`` normalized so the
    maximum is 1 (max is order-independent, unlike a sum) and rounded to
    9 dp.
    """
    # symmetric comparison counts N_ij (+ per-item totals), all integers
    directed = wins.select("w", "l", "n")
    pairs = (
        directed.select(F.col("w").alias("i"), F.col("l").alias("j"), "n")
        .unionByName(
            directed.select(
                F.col("l").alias("i"), F.col("w").alias("j"), "n"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_ij"))
        .transform(barrier_eager)
    )
    totals = (
        pairs.groupBy("i")
        .agg(F.sum("n_ij").alias("comparisons"))
        .join(
            directed.groupBy(F.col("w").alias("i")).agg(
                F.sum("n").alias("wins")
            ),
            "i",
            "left",
        )
        .select("i", F.coalesce("wins", F.lit(0)).alias("wins"), "comparisons")
        .transform(barrier_eager)
    )
    scores = totals.select("i", F.lit(1.0).alias("s"))
    for _ in range(iterations):
        si = scores.select(F.col("i"), F.col("s").alias("s_i"))
        sj = scores.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
        terms = (
            pairs.join(si, "i")
            .join(sj, "j")
            .select(
                "i",
                F.struct(
                    "j",
                    F.round(
                        F.col("n_ij") / (F.col("s_i") + F.col("s_j")), _ROUND
                    ).alias("t"),
                ).alias("jt"),
            )
        )
        denom = terms.groupBy("i").agg(
            F.aggregate(
                F.array_sort(F.collect_list("jt")),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ).alias("denom")
        )
        # floor keeps zero-win items (degenerate MLE: score → 0) from
        # producing 0/0 terms next round — engines disagree on x/0
        scores = (
            totals.join(denom, "i")
            .select(
                "i",
                F.greatest(
                    F.round(F.col("wins") / F.col("denom"), _ROUND),
                    F.lit(1e-6),
                ).alias("s"),
            )
            .transform(barrier_eager)
        )
    s_max = scores.agg(F.max("s").alias("m"))
    return (
        scores.crossJoin(F.broadcast(s_max))
        .join(totals, "i")
        .select(
            F.col("i").alias("item"),
            F.round(F.col("s") / F.col("m"), 9).alias("score"),
            "wins",
            "comparisons",
        )
    )
