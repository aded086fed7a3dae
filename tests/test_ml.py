"""ML pipeline tests (reference parity M1-M12): stage graphs, seed-stable
metrics, persist/load round-trip, distributed-vs-evaluator agreement."""

from __future__ import annotations

import tempfile

import pytest

from sentiment_analysis_bigdata_spark.operators import ml as ML

WORDS_POS = ["great", "good", "love", "happy", "excellent", "best", "nice"]
WORDS_NEG = ["bad", "awful", "hate", "sad", "terrible", "worst", "poor"]


@pytest.fixture(scope="module")
def tweets(spark):
    """Deterministic synthetic tweets_clean (FIXTURES §2): label-correlated
    vocabulary so the classifiers have signal to learn."""
    rows = []
    for i in range(400):
        label = i % 2
        words = (WORDS_POS if label else WORDS_NEG)[: 3 + i % 4]
        filler = ["the", "day", "was", f"w{i % 17}"]
        rows.append((label, " ".join(words + filler)))
    return spark.createDataFrame(rows, "label int, text string")


def test_pipeline_stage_graph_tfidf():
    p = ML.build_pipeline("lr", ML.PipelineConfig())
    names = [type(s).__name__ for s in p.getStages()]
    assert names == [
        "Tokenizer",
        "StopWordsRemover",
        "HashingTF",
        "IDF",
        "LogisticRegression",
    ]


def test_pipeline_stage_graph_ngram():
    p = ML.build_pipeline("svm", ML.PipelineConfig(features="ngram", ngram_max=2))
    names = [type(s).__name__ for s in p.getStages()]
    assert names == [
        "Tokenizer",
        "StopWordsRemover",
        "NGram",
        "CountVectorizer",
        "IDF",
        "NGram",
        "CountVectorizer",
        "IDF",
        "VectorAssembler",
        "LinearSVC",
    ]


def test_reference_hyperparameters():
    cfg = ML.PipelineConfig()
    p = ML.build_pipeline("lr", cfg)
    htf, idf, lr = p.getStages()[2], p.getStages()[3], p.getStages()[4]
    assert htf.getNumFeatures() == 2**18  # reference metadata numFeatures
    assert idf.getMinDocFreq() == 5
    assert lr.getMaxIter() == 20 and lr.getRegParam() == 0.01
    assert lr.getElasticNetParam() == 0.0


@pytest.mark.parametrize("model", ["lr", "nb", "svm"])
def test_train_and_evaluate(tweets, model):
    cfg = ML.PipelineConfig(num_features=2**12, max_iter=10)
    _m, metrics = ML.train_and_evaluate(tweets, model, cfg)
    assert metrics["accuracy"] > 0.9  # separable synthetic vocabulary
    assert 0.0 <= metrics["f1"] <= 1.0
    assert metrics["test_rows"] > 0
    assert sum(metrics["confusion_matrix"].values()) == metrics["test_rows"]


def test_seed_stability(tweets):
    cfg = ML.PipelineConfig(num_features=2**12, max_iter=5)
    _, m1 = ML.train_and_evaluate(tweets, "lr", cfg)
    _, m2 = ML.train_and_evaluate(tweets, "lr", cfg)
    assert m1["accuracy"] == m2["accuracy"]
    assert m1["confusion_matrix"] == m2["confusion_matrix"]


def test_save_load_roundtrip(spark, tweets):
    cfg = ML.PipelineConfig(num_features=2**10, max_iter=3)
    model, _ = ML.train_and_evaluate(tweets, "lr", cfg)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/model"
        ML.save_model(model, path)
        loaded = ML.load_model(path)
    a = model.transform(tweets).select("prediction").collect()
    b = loaded.transform(tweets).select("prediction").collect()
    assert a == b


def test_cross_validate_folds_deterministic_and_exhaustive(spark):
    # id-keyed tweets: fold = id % k must partition the data exactly,
    # learn the label-correlated vocabulary, and be rerun-stable
    rows = []
    for i in range(300):
        label = i % 2
        words = (WORDS_POS if label else WORDS_NEG)[: 3 + i % 4]
        rows.append((i, label, " ".join(words + ["the", "day"])))
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    cfg = ML.PipelineConfig(num_features=2**12, max_iter=5)
    folds = ML.cross_validate_folds(df, "lr", k=3, cfg=cfg, id_col="doc_id")
    assert [f for f, _ in folds] == [0, 1, 2]
    assert sum(m["test_rows"] for _, m in folds) == 300
    for _, m in folds:
        assert m["accuracy"] > 0.9  # separable vocabulary must be learned
    again = ML.cross_validate_folds(df, "lr", k=3, cfg=cfg, id_col="doc_id")
    assert [m["confusion_matrix"] for _, m in folds] == [
        m["confusion_matrix"] for _, m in again
    ]
