"""ML classification pipelines at reference parity (SURVEY §2.6 M1-M12).

Three pipelines — Logistic Regression, LinearSVC, Multinomial NaiveBayes —
with the reference's exact stage graphs and hyperparameters (verified
against the persisted stage metadata under the reference's ``model/`` tree):

- TF-IDF features: Tokenizer → StopWordsRemover → HashingTF(2^18) →
  IDF(minDocFreq=5) → classifier
  (reference model_logistic_regression.py:88-161)
- N-gram features: Tokenizer → StopWordsRemover → NGram(1..n) →
  CountVectorizer(vocab 10k, minDF 5) per n → IDF per n → VectorAssembler →
  classifier (reference model_logistic_regression.py:124-150, model_svm.py)

``evaluate`` replaces the reference's evaluator+sklearn+toPandas block with
the distributed aggregations in ``operators.evaluation`` and caches the
scored frame once (fixing the 5× lineage recomputation called out in
SURVEY §3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LinearSVC, LogisticRegression, NaiveBayes
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    StopWordsRemover,
    Tokenizer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import evaluation


@dataclass
class PipelineConfig:
    """Reference hyperparameters (BASELINE.md config column)."""

    text_col: str = "text"
    label_col: str = "label"
    features: str = "tfidf"  # "tfidf" | "ngram"
    num_features: int = 2**18  # HashingTF dims (metadata: numFeatures 262144)
    min_doc_freq: int = 5  # IDF minDocFreq (metadata)
    ngram_max: int = 3  # NGram n=1..3 when features="ngram"
    vocab_size: int = 10000  # CountVectorizer vocabSize (metadata)
    min_df: int = 5  # CountVectorizer minDF (metadata)
    max_iter: int = 20  # LR/SVC maxIter (metadata)
    reg_param: float = 0.01  # LR/SVC regParam (metadata)
    elastic_net: float = 0.0  # LR elasticNetParam (metadata)
    smoothing: float = 1.0  # NB smoothing (metadata)
    seed: int = 42
    split: tuple[float, float] = (0.8, 0.2)
    extra: dict = field(default_factory=dict)


def _feature_stages(cfg: PipelineConfig) -> list:
    """The shared feature front-end (M1-M8)."""
    stages = [
        Tokenizer(inputCol=cfg.text_col, outputCol="words"),
        StopWordsRemover(inputCol="words", outputCol="filtered_words"),
    ]
    if cfg.features == "tfidf":
        stages += [
            HashingTF(
                inputCol="filtered_words",
                outputCol="raw_features",
                numFeatures=cfg.num_features,
            ),
            IDF(inputCol="raw_features", outputCol="features", minDocFreq=cfg.min_doc_freq),
        ]
    elif cfg.features == "ngram":
        ngram_cols = []
        for n in range(1, cfg.ngram_max + 1):
            stages += [
                NGram(n=n, inputCol="filtered_words", outputCol=f"{n}gram"),
                CountVectorizer(
                    inputCol=f"{n}gram",
                    outputCol=f"{n}gram_tf",
                    vocabSize=cfg.vocab_size,
                    minDF=cfg.min_df,
                ),
                IDF(inputCol=f"{n}gram_tf", outputCol=f"{n}gram_tfidf"),
            ]
            ngram_cols.append(f"{n}gram_tfidf")
        stages.append(VectorAssembler(inputCols=ngram_cols, outputCol="features"))
    else:
        raise ValueError(f"unknown features {cfg.features!r}")
    return stages


def build_pipeline(model: str, cfg: PipelineConfig | None = None) -> Pipeline:
    """model ∈ {'lr','svm','nb'} → the reference's exact Pipeline (M12)."""
    cfg = cfg or PipelineConfig()
    stages = _feature_stages(cfg)
    if model == "lr":
        clf = LogisticRegression(
            featuresCol="features",
            labelCol=cfg.label_col,
            maxIter=cfg.max_iter,
            regParam=cfg.reg_param,
            elasticNetParam=cfg.elastic_net,
        )
    elif model == "svm":
        clf = LinearSVC(
            featuresCol="features",
            labelCol=cfg.label_col,
            maxIter=cfg.max_iter,
            regParam=cfg.reg_param,
        )
    elif model == "nb":
        clf = NaiveBayes(
            featuresCol="features",
            labelCol=cfg.label_col,
            modelType="multinomial",
            smoothing=cfg.smoothing,
        )
    else:
        raise ValueError(f"unknown model {model!r}")
    return Pipeline(stages=stages + [clf])


def _scored_metrics(scored: DataFrame, with_score: DataFrame, cfg: "PipelineConfig") -> dict:
    """Distributed metrics over a cached scored frame (same dict shape as
    the reference's metrics JSONs)."""
    return {
        "accuracy": evaluation.accuracy(scored, cfg.label_col, "prediction"),
        "f1": evaluation.weighted_f1(scored, cfg.label_col, "prediction"),
        "roc_auc": evaluation.roc_auc(with_score, cfg.label_col, "score"),
        "confusion_matrix": {
            f"{r['label']}_{r['prediction']}": r["n"]
            for r in evaluation.confusion_matrix(scored, cfg.label_col, "prediction")
            .orderBy("label", "prediction")
            .collect()
        },
        "test_rows": scored.count(),
    }


def fit_and_evaluate(
    train: DataFrame,
    test: DataFrame,
    model: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Fit on an EXPLICIT train frame, evaluate on an explicit test frame
    — the building block for deterministic k-fold cross-validation
    (hash folds, no RNG), where the caller owns the split."""
    cfg = cfg or PipelineConfig()
    fitted = build_pipeline(model, cfg).fit(train)
    scored = fitted.transform(test).cache()
    try:
        from pyspark.ml.functions import vector_to_array

        with_score = scored.withColumn(
            "score", vector_to_array(F.col("rawPrediction"))[1]
        )
        return _scored_metrics(scored, with_score, cfg)
    finally:
        scored.unpersist()


def cross_validate_folds(
    df: DataFrame,
    model: str,
    k: int = 3,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
) -> list[tuple[int, dict]]:
    """Deterministic k-fold cross-validation: fold = ``id % k`` (a stable
    hash split on a unique id — NO RNG, so the folds are reproducible
    across runs, machines, and engines), each fold held out once.
    Returns [(fold, metrics_dict)].

    Complements :func:`tune` (MLlib CrossValidator, RNG folds, selection
    only): this variant reports the full per-fold metric set and is
    value-checkable by a golden oracle because every step is
    deterministic. Cost is k sequential fits — the standard CV price;
    each fit is the already-audited pipeline shape.
    """
    cfg = cfg or PipelineConfig()
    out: list[tuple[int, dict]] = []
    fold = F.pmod(F.col(id_col), F.lit(k))
    keyed = df.withColumn("__fold", fold)
    for f in range(k):
        train = keyed.filter(F.col("__fold") != f).drop("__fold", id_col)
        test = keyed.filter(F.col("__fold") == f).drop("__fold", id_col)
        out.append((f, fit_and_evaluate(train, test, model, cfg)))
    return out


def train_and_evaluate(
    df: DataFrame,
    model: str,
    cfg: PipelineConfig | None = None,
    charts_dir: str | None = None,
) -> tuple[PipelineModel, dict]:
    """Train/test split → fit → distributed evaluation. Returns
    (fitted model, metrics dict matching the reference's metrics JSON shape:
    accuracy, f1, roc_auc, confusion_matrix).

    The scored test frame is cached once and reused by all metrics
    (the reference recomputed the transform lineage 5×, SURVEY §3).

    ROC-AUC uses ``rawPrediction[1]`` for ALL models — the reference's
    metrics JSONs come from ``BinaryClassificationEvaluator`` with its
    default rawPrediction column (model_*.py:196-204), which for NB yields
    the miscalibrated ~0.53 AUC (BASELINE.md caveat: reproduce, don't
    "fix" by switching to the normalized probability).
    """
    cfg = cfg or PipelineConfig()
    train, test = df.randomSplit(list(cfg.split), seed=cfg.seed)
    fitted = build_pipeline(model, cfg).fit(train)
    scored = fitted.transform(test).cache()
    try:
        from pyspark.ml.functions import vector_to_array

        with_score = scored.withColumn("score", vector_to_array(F.col("rawPrediction"))[1])
        metrics = _scored_metrics(scored, with_score, cfg)
        if charts_dir:
            # reference chart parity (model_logistic_regression.py:261-296),
            # rendered from the distributed aggregates while the scored
            # frame is still cached — k-row confusion counts and ≤256
            # binned ROC points reach the driver, never row data
            import os

            from sentiment_analysis_bigdata_spark.apps import charts

            cm = metrics["confusion_matrix"]
            classes = sorted({int(k.split("_")[0]) for k in cm} | {int(k.split("_")[1]) for k in cm})
            matrix = [
                [cm.get(f"{a}_{p}", 0) for p in classes] for a in classes
            ]
            charts.heatmap(
                os.path.join(charts_dir, f"confusion_matrix_{model}.png"),
                matrix,
                title=f"CONFUSION MATRIX ({model.upper()})",
            )
            charts.roc_curve_png(
                os.path.join(charts_dir, f"roc_curve_{model}.png"),
                evaluation.roc_points_binned(with_score, cfg.label_col, "score"),
                auc_value=metrics["roc_auc"],
                title=f"ROC CURVE ({model.upper()})",
            )
    finally:
        scored.unpersist()
    return fitted, metrics


def tune(
    df: DataFrame,
    model: str = "lr",
    cfg: PipelineConfig | None = None,
    reg_params: tuple[float, ...] = (0.001, 0.01, 0.1),
    num_folds: int = 3,
) -> tuple[PipelineModel, dict]:
    """k-fold cross-validated hyperparameter search over regParam.

    Standard MLlib ``CrossValidator`` (parallel fold evaluation) with
    areaUnderROC as the selection metric; returns the refit best model and
    {best_reg_param, avg_metrics}. The reference has no tuning at all —
    its fixed regParam=0.01 came untuned — so this is surface the engine
    adds; defaults reproduce the reference's value range.
    """
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    cfg = cfg or PipelineConfig()
    pipeline = build_pipeline(model, cfg)
    clf = pipeline.getStages()[-1]
    # NaiveBayes has no regParam — its regularization knob is `smoothing`
    tuned_param = clf.smoothing if model == "nb" else clf.regParam
    grid = ParamGridBuilder().addGrid(tuned_param, list(reg_params)).build()
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol=cfg.label_col),
        numFolds=num_folds,
        parallelism=4,
        seed=cfg.seed,
    )
    fitted = cv.fit(df)
    best_idx = int(max(range(len(fitted.avgMetrics)), key=lambda i: fitted.avgMetrics[i]))
    return fitted.bestModel, {
        "best_reg_param": reg_params[best_idx],
        "avg_metrics": {str(rp): m for rp, m in zip(reg_params, fitted.avgMetrics)},
    }


def save_model(model: PipelineModel, path: str) -> None:
    """S4 — persist PipelineModel (reference model_logistic_regression.py:301)."""
    model.write().overwrite().save(path)


def load_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)
