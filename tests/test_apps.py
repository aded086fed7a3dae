"""End-to-end workflow tests: the reference's script pipeline (preprocess →
train×3 → compare) run on a synthetic Sentiment140-shaped corpus
(FIXTURES §1 generation hints: mentions, URLs, hashtags, emoji, nulls,
rows that clean to empty)."""

from __future__ import annotations

import csv
import glob
import json
import os

import pytest

from sentiment_analysis_bigdata_spark import schemas
from sentiment_analysis_bigdata_spark.apps import workflow

POS_WORDS = ["great", "love", "happy", "excellent", "wonderful"]
NEG_WORDS = ["awful", "hate", "sad", "terrible", "horrible"]


def _make_raw_rows(n=300):
    rows = []
    for i in range(n):
        sentiment = 4 if i % 2 else 0
        words = (POS_WORDS if sentiment else NEG_WORDS)[: 2 + i % 3]
        decorations = [
            f"@user{i % 7}",
            "https://t.co/xyz" if i % 3 == 0 else "",
            f"#tag{i % 5}",
            "123!!" if i % 4 == 0 else "",
        ]
        text = f"  {' '.join(words)} {' '.join(decorations)} the day  "
        rows.append((sentiment, str(i), "Mon Apr 06 22:19:45 PDT 2009", "NO_QUERY", f"u{i % 11}", text))
    # edge cases: null row, row that cleans to empty
    rows.append((None, "x", None, None, None, None))
    rows.append((0, "y", "d", "NO_QUERY", "u", "@only http://x.co 12!!"))
    return rows


@pytest.fixture(scope="module")
def raw_csv(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    path = str(d / "tweets.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        for r in _make_raw_rows():
            w.writerow(["" if v is None else v for v in r])
    return path


def test_preprocess_end_to_end(spark, raw_csv, tmp_path):
    out = str(tmp_path / "clean")
    stats_path = str(tmp_path / "stats.json")
    stats = workflow.preprocess(spark, raw_csv, out, stats_path=stats_path)

    # null row dropped, clean-to-empty row filtered
    assert stats["rows_clean"] == 300
    assert set(stats["label_distribution"]) == {"0", "1"}
    assert stats["text_length"]["min"] > 0
    assert os.path.exists(stats_path)

    # S3 contract: headered CSV, ≤4 part files (reference preprocessing.py:
    # 166-169; coalesce only merges, so a small single-split source → 1 file)
    parts = glob.glob(f"{out}/part-*.csv")
    assert 1 <= len(parts) <= 4
    with open(parts[0]) as f:
        assert f.readline().strip() == "label,text"

    # clean invariants (FIXTURES §2): lowercase [a-z ]+, trimmed, non-empty
    clean = spark.read.schema(schemas.TWEETS_CLEAN).csv(out, header=True)
    bad = clean.filter("text rlike '[^a-z ]' or text = '' or text != trim(text)")
    assert bad.count() == 0


def _assert_png(path, min_bytes=500):
    """Valid PNG signature + IHDR with sane dimensions."""
    import struct

    assert os.path.exists(path), path
    with open(path, "rb") as f:
        data = f.read()
    assert len(data) >= min_bytes, path
    assert data[:8] == b"\x89PNG\r\n\x1a\n", path
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    assert 100 <= w <= 2000 and 100 <= h <= 2000


def test_train_and_compare_end_to_end(spark, raw_csv, tmp_path):
    from sentiment_analysis_bigdata_spark.operators.ml import PipelineConfig

    clean_dir = str(tmp_path / "clean")
    charts = str(tmp_path / "charts")
    workflow.preprocess(spark, raw_csv, clean_dir, charts_dir=charts)
    for png in [
        "sentiment_distribution.png",
        "text_length_histogram.png",
        "text_length_boxplot.png",
    ]:
        _assert_png(os.path.join(charts, png))

    art = str(tmp_path / "artifacts")
    cfg = PipelineConfig(num_features=2**12, max_iter=5, min_doc_freq=0)
    for model in ["lr", "nb"]:
        metrics = workflow.train_model(
            spark, clean_dir, model, art, cfg=cfg, charts_dir=charts
        )
        assert 0.5 <= metrics["accuracy"] <= 1.0  # separable vocab
        assert os.path.exists(f"{art}/{model}_metrics.json")
        assert os.path.isdir(f"{art}/model_{model}")
        _assert_png(os.path.join(charts, f"confusion_matrix_{model}.png"))
        _assert_png(os.path.join(charts, f"roc_curve_{model}.png"))

    merged = workflow.compare_models(
        art, str(tmp_path / "comparison.json"), charts_dir=charts
    )
    assert set(merged) == {"lr", "nb"}
    with open(tmp_path / "comparison.json") as f:
        assert json.load(f)["lr"]["accuracy"] == merged["lr"]["accuracy"]
    _assert_png(os.path.join(charts, "model_comparison.png"))


def test_read_csv_infer_schema_mode(spark, raw_csv):
    # S2 parity: opt-in inferSchema reproduces the reference's typed scan
    # (model_logistic_regression.py:71-75) without an explicit schema
    from sentiment_analysis_bigdata_spark.sources import read_csv

    df = read_csv(spark, raw_csv, None, header=False, infer_schema=True)
    assert df.count() == 302  # all raw rows, typed by inference
    # sentiment column inferred as a numeric type, not string
    assert df.schema.fields[0].dataType.typeName() in ("integer", "long", "double")
