"""Distributed-evaluation parity tests (SURVEY A5-A9, FIXTURES §6):
hand-computed expectations on tiny frames + parity with the MLlib
evaluators the reference used, including tied scores (§7.4 risk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import evaluation as EV

# 20-row (label, prediction) frame with a hand-computed 2×2 matrix
PRED_ROWS = (
    [(1, 1)] * 7 + [(1, 0)] * 3 + [(0, 0)] * 6 + [(0, 1)] * 4
)


@pytest.fixture(scope="module")
def preds(spark):
    return spark.createDataFrame(PRED_ROWS, "label int, prediction int")


def test_confusion_matrix_counts(preds):
    cm = {(r["label"], r["prediction"]): r["n"] for r in EV.confusion_matrix(preds).collect()}
    assert cm == {(1, 1): 7, (1, 0): 3, (0, 0): 6, (0, 1): 4}


def test_confusion_matrix_pivot(preds):
    rows = EV.confusion_matrix_pivot(preds).collect()
    assert [r["label"] for r in rows] == [0, 1]
    assert rows[0]["0"] == 6 and rows[0]["1"] == 4
    assert rows[1]["0"] == 3 and rows[1]["1"] == 7


def test_accuracy(preds):
    assert EV.accuracy(preds) == pytest.approx(13 / 20)


def test_classification_report(preds):
    rep = {r["label"]: r for r in EV.classification_report(preds).collect()}
    # class 1: tp=7, fp=4, fn=3 → p=7/11, r=7/10
    assert rep[1]["tp"] == 7 and rep[1]["fp"] == 4 and rep[1]["fn"] == 3
    assert rep[1]["precision"] == pytest.approx(7 / 11)
    assert rep[1]["recall"] == pytest.approx(7 / 10)
    assert rep[0]["support"] == 10


def test_weighted_f1_matches_mllib(spark, preds):
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    d = preds.select(
        F.col("label").cast("double").alias("label"),
        F.col("prediction").cast("double").alias("prediction"),
    )
    ev = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    )
    assert EV.weighted_f1(preds) == pytest.approx(ev.evaluate(d), abs=1e-12)


AUC_ROWS = [  # includes tied scores — the §7.4 parity risk
    (1, 0.9), (0, 0.9), (1, 0.8), (1, 0.7), (0, 0.7), (0, 0.7),
    (1, 0.5), (0, 0.4), (1, 0.3), (0, 0.1),
]


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(AUC_ROWS, "label int, score double")


def test_roc_auc_matches_mllib_with_ties(spark, scored):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    d = scored.select(
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.array(1 - F.col("score"), F.col("score"))).alias("rawPrediction"),
    )
    ev = BinaryClassificationEvaluator(metricName="areaUnderROC")
    assert EV.roc_auc(scored, score_col="score") == pytest.approx(
        ev.evaluate(d), abs=1e-9
    )


def test_roc_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "label int, score double"
    )
    assert EV.roc_auc(perfect, score_col="score") == pytest.approx(1.0)
    inverted = spark.createDataFrame(
        [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)], "label int, score double"
    )
    assert EV.roc_auc(inverted, score_col="score") == pytest.approx(0.0)


def test_roc_points_monotone(scored):
    pts = EV.roc_points(scored, score_col="score").orderBy(F.col("score").desc()).collect()
    fprs = [r["fpr"] for r in pts]
    tprs = [r["tpr"] for r in pts]
    assert fprs == sorted(fprs) and tprs == sorted(tprs)
    assert fprs[-1] == pytest.approx(1.0) and tprs[-1] == pytest.approx(1.0)


class TestPrecisionRecall:
    def _scored(self, spark):
        rows = [(1, 0.9), (0, 0.8), (1, 0.7), (1, 0.6)]
        return spark.createDataFrame(rows, "label int, score double")

    def test_pr_points_hand_computed(self, spark):
        pts = {
            round(r["score"], 2): (r["precision"], r["recall"])
            for r in EV.pr_points(self._scored(spark)).collect()
        }
        assert pts[0.9] == (pytest.approx(1.0), pytest.approx(1 / 3))
        assert pts[0.8] == (pytest.approx(0.5), pytest.approx(1 / 3))
        assert pts[0.7] == (pytest.approx(2 / 3), pytest.approx(2 / 3))
        assert pts[0.6] == (pytest.approx(0.75), pytest.approx(1.0))

    def test_average_precision_hand_computed(self, spark):
        # AP = Σ (R_k − R_{k−1})·P_k = (1/3)·1 + 0·0.5 + (1/3)·(2/3) + (1/3)·0.75
        ap = EV.average_precision(self._scored(spark))
        assert ap == pytest.approx(1 / 3 + 2 / 9 + 0.25)

    def test_perfect_ranking_ap_is_one(self, spark):
        df = spark.createDataFrame(
            [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "label int, score double"
        )
        assert EV.average_precision(df) == pytest.approx(1.0)

    def test_empty_frame_no_thresholds(self, spark):
        empty = spark.createDataFrame([], "label int, score double")
        assert EV.pr_points(empty).count() == 0
        assert EV.average_precision(empty) == 0.0

    def test_zero_positives_no_null_recall(self, spark):
        df = spark.createDataFrame(
            [(0, 0.9), (0, 0.1)], "label int, score double"
        )
        # recall would be tp/0 → null; the guard returns no thresholds
        assert EV.pr_points(df).count() == 0
        assert EV.average_precision(df) == 0.0


class TestCalibration:
    def test_perfectly_calibrated(self, spark):
        # scores equal to empirical positive rate per bin → ECE == 0
        rows = []
        for score, pos_of_4 in [(0.25, 1), (0.75, 3)]:
            for i in range(4):
                rows.append((1 if i < pos_of_4 else 0, score))
        df = spark.createDataFrame(rows, "label int, score double")
        assert EV.expected_calibration_error(df, bins=4) == pytest.approx(0.0)

    def test_overconfident(self, spark):
        # all scores 0.95 but only half positive → ECE = 0.45
        df = spark.createDataFrame(
            [(1, 0.95), (0, 0.95)] * 5, "label int, score double"
        )
        assert EV.expected_calibration_error(df, bins=10) == pytest.approx(0.45)

    def test_bins_sum_to_n(self, spark):
        df = spark.createDataFrame(
            [(i % 2, i / 10.0) for i in range(11)], "label int, score double"
        )
        bins = EV.calibration_bins(df, bins=10).collect()
        assert sum(r.n for r in bins) == 11  # score 1.0 clamps to bin 9
        assert max(r.bin for r in bins) == 9


# --- Poisson bootstrap CI --------------------------------------------------------


class TestBootstrapMeanCi:
    def test_ci_covers_truth_and_matches_binomial_theory(self, spark):
        import math

        from sentiment_analysis_bigdata_spark.operators import evaluation as EVO

        n, p = 2000, 0.75
        rows = [(i, 1 if (i * 37 % 100) < p * 100 else 0) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, correct int")
        true_mean = sum(r[1] for r in rows) / n
        out = EVO.bootstrap_mean_ci(df, "correct", "doc_id", n_boot=32).collect()[0]
        assert out["ci_lo"] <= true_mean <= out["ci_hi"]
        assert abs(out["mean"] - true_mean) < 0.02
        theory_sd = math.sqrt(true_mean * (1 - true_mean) / n)
        assert 0.3 * theory_sd < out["sd"] < 3.0 * theory_sd

    def test_deterministic_across_repartitioning(self, spark):
        from sentiment_analysis_bigdata_spark.operators import evaluation as EVO

        rows = [(i, i % 3 == 0 and 1 or 0) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, correct int")
        a = EVO.bootstrap_mean_ci(df, "correct", "doc_id").collect()[0]
        b = EVO.bootstrap_mean_ci(df.repartition(17), "correct", "doc_id").collect()[0]
        assert a == b


class TestModelAgreement:
    def test_known_counts_and_kappa(self, spark):
        from sentiment_analysis_bigdata_spark.operators import evaluation as EVO

        # label always 1; A right 8/10, B right 6/10; b/c constructed
        rows = []
        for i in range(10):
            pa = 1 if i < 8 else 0
            pb = 1 if i < 4 or (6 <= i < 8) else 0
            rows.append((1, pa, pb))
        df = spark.createDataFrame(rows, "label int, pred_a int, pred_b int")
        out = EVO.model_agreement(df).collect()[0]
        assert out["n"] == 10
        assert out["accuracy_a"] == 0.8 and out["accuracy_b"] == 0.6
        # discordant: A right & B wrong = rows 4,5 (pa=1,pb=0) -> b=2? recompute:
        # i<8: pa=1. pb=1 for i in 0..3 and 6..7. So pa=1&pb=0: i=4,5 -> b=2
        # pa=0 (i=8,9) & pb=1: none -> c=0
        assert out["b"] == 2 and out["c"] == 0
        # chi2 = (|2-0|-1)^2/2 = 0.5, not significant
        assert abs(out["mcnemar_chi2"] - 0.5) < 1e-9
        assert out["significant"] is False

    def test_identical_models_perfect_kappa(self, spark):
        from sentiment_analysis_bigdata_spark.operators import evaluation as EVO

        rows = [(i % 2, i % 2, i % 2) for i in range(20)]
        df = spark.createDataFrame(rows, "label int, pred_a int, pred_b int")
        out = EVO.model_agreement(df).collect()[0]
        assert out["kappa"] == 1.0
        assert out["b"] == 0 and out["c"] == 0 and out["mcnemar_chi2"] == 0.0


class TestRankingMetrics:
    def _run(self, spark, ranked_rows, totals, k):
        ranked = spark.createDataFrame(
            ranked_rows, "query_id long, rank long, rel int"
        )
        tot = spark.createDataFrame(totals, "query_id long, n_rel_total long")
        return EV.ranking_metrics(ranked, tot, k=k).first()

    def test_hand_computed(self, spark):
        import math

        # q1: rel at ranks 1,3 of 3; R=2 → RR=1, DCG=1+1/2, IDCG=1+1/log2(3)
        # q2: no rel in top-3; R=1 → all zeros except precision
        rows = [
            (1, 1, 1), (1, 2, 0), (1, 3, 1),
            (2, 1, 0), (2, 2, 0), (2, 3, 0),
        ]
        r = self._run(spark, rows, [(1, 2), (2, 1)], k=3)
        dcg = 1.0 + 1.0 / math.log2(4)
        idcg = 1.0 + 1.0 / math.log2(3)
        assert r.n_queries == 2
        assert r.mrr == pytest.approx((1.0 + 0.0) / 2)
        assert r.ndcg_at_k == pytest.approx((dcg / idcg + 0.0) / 2)
        assert r.precision_at_k == pytest.approx((2 / 3 + 0.0) / 2)
        assert r.recall_at_k == pytest.approx((2 / 2 + 0.0) / 2)

    def test_perfect_ranking_is_one(self, spark):
        rows = [(1, 1, 1), (1, 2, 1), (1, 3, 0)]
        r = self._run(spark, rows, [(1, 2)], k=3)
        assert r.mrr == pytest.approx(1.0)
        assert r.ndcg_at_k == pytest.approx(1.0)
        assert r.recall_at_k == pytest.approx(1.0)

    def test_idcg_truncates_at_k(self, spark):
        import math

        # R=10 but k=2: IDCG must use min(k, R)=2 terms
        rows = [(1, 1, 1), (1, 2, 0)]
        r = self._run(spark, rows, [(1, 10)], k=2)
        idcg = 1.0 + 1.0 / math.log2(3)
        assert r.ndcg_at_k == pytest.approx(1.0 / idcg)

    def test_zero_relevant_guard(self, spark):
        rows = [(1, 1, 0), (1, 2, 0)]
        r = self._run(spark, rows, [(1, 0)], k=2)
        assert (r.mrr, r.ndcg_at_k, r.recall_at_k) == (0.0, 0.0, 0.0)


class TestRankCorrelation:
    def _rc(self, spark, pairs):
        from sentiment_analysis_bigdata_spark.operators.regression import (
            rank_correlation,
        )

        df = spark.createDataFrame(pairs, "x double, y double")
        return rank_correlation(df, "x", "y").collect()[0]

    def test_perfect_monotone_nonlinear(self, spark):
        # y = x³ is monotone but nonlinear: Spearman 1, Pearson < 1
        pts = [(float(x), float(x**3)) for x in range(-5, 6)]
        r = self._rc(spark, pts)
        assert r.spearman_rho == 1.0
        assert r.pearson_r < 1.0

    def test_perfect_inverse(self, spark):
        pts = [(float(x), float(-x)) for x in range(10)]
        r = self._rc(spark, pts)
        assert r.spearman_rho == -1.0
        assert r.pearson_r == -1.0

    def test_ties_fractional_ranks(self, spark):
        # scipy-checked: spearmanr([1,1,2], [1,2,3]) = 0.866025...
        r = self._rc(spark, [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0)])
        assert r.spearman_rho == 0.866025

    def test_constant_column_null(self, spark):
        r = self._rc(spark, [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)])
        assert r.spearman_rho is None


class TestFleissKappa:
    def _kappa(self, spark, assignments):
        """assignments: list of per-item category lists (equal length)."""
        from sentiment_analysis_bigdata_spark.operators.evaluation import (
            fleiss_kappa,
        )

        rows = [
            (i, c) for i, cats in enumerate(assignments) for c in cats
        ]
        df = spark.createDataFrame(rows, "item long, category int")
        return fleiss_kappa(df).first()

    def test_textbook_example(self, spark):
        """Fleiss 1971's worked example (as reproduced on the Wikipedia
        'Fleiss' kappa' page): 10 items x 14 raters over 5 categories;
        kappa = 0.210."""
        n_ij = [
            [0, 0, 0, 0, 14],
            [0, 2, 6, 4, 2],
            [0, 0, 3, 5, 6],
            [0, 3, 9, 2, 0],
            [2, 2, 8, 1, 1],
            [7, 7, 0, 0, 0],
            [3, 2, 6, 3, 0],
            [2, 5, 3, 2, 2],
            [6, 5, 2, 1, 0],
            [0, 2, 2, 3, 7],
        ]
        assignments = [
            [c for c, n in enumerate(row) for _ in range(n)] for row in n_ij
        ]
        r = self._kappa(spark, assignments)
        assert r["n_items"] == 10 and r["n_raters"] == 14
        assert abs(r["kappa"] - 0.2099) < 5e-4
        assert abs(r["p_bar"] - 0.378) < 1e-3
        assert abs(r["p_e"] - 0.213) < 1e-3

    def test_perfect_agreement(self, spark):
        r = self._kappa(spark, [[0, 0, 0], [1, 1, 1], [2, 2, 2], [0, 0, 0]])
        assert r["kappa"] == 1.0

    def test_unequal_raters_raises(self, spark):
        import pytest

        with pytest.raises(Exception, match="must be constant"):
            self._kappa(spark, [[0, 0, 0], [1, 1]])


class TestBradleyTerry:
    def _fit(self, spark, comparisons, iterations=3):
        from sentiment_analysis_bigdata_spark.operators.preference import (
            bt_scores,
            bt_win_counts,
        )

        df = spark.createDataFrame(comparisons, "winner string, loser string")
        return {
            r["item"]: r
            for r in bt_scores(
                bt_win_counts(df), iterations=iterations
            ).collect()
        }

    @staticmethod
    def _py_bt(wins, iterations):
        """Independent MM reference with the engine's rounding contract:
        terms 12dp, opponent-ordered fold, update 12dp + 1e-6 floor,
        final normalized by max to 9dp."""
        items = sorted({i for p in wins for i in p})
        n = {}
        for (w, l), c in wins.items():
            n[(w, l)] = n.get((w, l), 0) + c
            n[(l, w)] = n.get((l, w), 0) + c
        w_tot = {i: sum(c for (a, _), c in wins.items() if a == i) for i in items}
        s = {i: 1.0 for i in items}
        for _ in range(iterations):
            s2 = {}
            for i in items:
                acc = 0.0
                for j in items:
                    if (i, j) in n:
                        acc += round(n[(i, j)] / (s[i] + s[j]), 12)
                s2[i] = max(round(w_tot[i] / acc, 12), 1e-6)
            s = s2
        m = max(s.values())
        return {i: round(s[i] / m, 9) for i in items}

    def test_matches_independent_reference(self, spark):
        comparisons = (
            [("a", "b")] * 6 + [("b", "a")] * 2
            + [("a", "c")] * 5 + [("c", "a")] * 1
            + [("b", "c")] * 4 + [("c", "b")] * 3
        )
        got = self._fit(spark, comparisons)
        wins = {}
        for w, l in comparisons:
            wins[(w, l)] = wins.get((w, l), 0) + 1
        want = self._py_bt(wins, 3)
        for i in want:
            assert got[i]["score"] == want[i], (i, got[i]["score"], want[i])
        # dominance order: a beats everyone most -> top score
        assert got["a"]["score"] == 1.0
        assert got["a"]["score"] > got["b"]["score"] > got["c"]["score"]
        assert got["a"]["wins"] == 11 and got["a"]["comparisons"] == 14

    def test_zero_win_item_floors_not_crashes(self, spark):
        got = self._fit(spark, [("a", "b")] * 3 + [("a", "c")] * 2 + [("b", "c")])
        assert got["c"]["wins"] == 0
        assert got["c"]["score"] > 0  # floored, never divides by zero
        assert got["a"]["score"] == 1.0


class TestPassAtK:
    def test_matches_exact_combinatorics(self, spark, sf_dir):
        """The HOF-product estimator must equal 1 − C(n−c,k)/C(n,k)
        computed with exact integer combinatorics, task by task."""
        import math

        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_pass_at_k,
        )
        from sentiment_analysis_bigdata_spark.sources import load_table

        events = load_table(spark, sf_dir, "events")
        rows = (
            events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("event_type") == "purchase").cast("long")).alias("c"),
            )
            .collect()
        )
        got = {r.k: (r.n_tasks, r.pass_at_k) for r in q_pass_at_k(spark, sf_dir).collect()}
        for k in (1, 5, 10):
            vals = [
                1.0
                if r.n - r.c < k
                else 1.0 - math.comb(r.n - r.c, k) / math.comb(r.n, k)
                for r in rows
                if r.n >= k
            ]
            want = round(sum(vals) / len(vals), 6)
            n_tasks, passk = got[k]
            assert n_tasks == len(vals)
            assert abs(passk - want) < 1e-6, (k, passk, want)

    def test_degenerate_cases(self, spark):
        """c=0 → pass@k = 0; c=n → 1; n<k tasks are excluded."""
        from sentiment_analysis_bigdata_spark.workloads import evaluation_q as EQ

        # build a tiny frame through the same estimator path by monkey
        # route: reuse the HOF expression inline
        df = spark.createDataFrame(
            [(1, 10, 0), (2, 10, 10), (3, 3, 1)], "task long, n long, c long"
        )
        k = 5
        p = F.when(F.col("n") - F.col("c") < F.lit(k), F.lit(1.0)).otherwise(
            F.lit(1.0)
            - F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.lit(1.0),
                lambda acc, i: acc * (F.col("n") - F.col("c") - i) / (F.col("n") - i),
            )
        )
        got = {
            r.task: r.p
            for r in df.filter(F.col("n") >= k).withColumn("p", p).collect()
        }
        assert got[1] == 0.0   # no successes
        assert got[2] == 1.0   # all successes (n−c < k branch)
        assert 3 not in got    # n < k excluded


class TestConformalCoverage:
    def test_coverage_tracks_alpha_and_tau_monotone(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_conformal_coverage,
        )

        rows = {r.alpha: r for r in q_conformal_coverage(spark, sf_dir).collect()}
        # marginal validity (with finite-sample slack on a fixed split)
        for alpha, r in rows.items():
            assert r.coverage >= 1.0 - alpha - 0.05, (alpha, r.coverage)
        # a stricter alpha keeps MORE mass → larger threshold
        assert rows[0.1].tau >= rows[0.2].tau
        assert rows[0.1].coverage >= rows[0.2].coverage
