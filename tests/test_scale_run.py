"""Reference-parity accuracy band on Sentiment140-SHAPED data.

The reference's published metrics (reference metrics/*_metrics.json) come
from real Sentiment140 over HDFS; the container has no real corpus, so
tools/scale_run.py synthesizes a statistically similar one (Zipf-skewed
vocabulary, cross-class bleed, calibrated label noise) and this test pins
that all three reference pipelines land within ±0.06 of their published
accuracies. 100k rows is enough: accuracy is a population-level quantity
(stderr ≈ 0.003 at a 20k test split) — tools/scale_run.py runs the same
check at the full 1.6M (measured: lr 0.779 / svm 0.779 / nb 0.776 vs
published 0.775 / 0.775 / 0.758).
"""

from __future__ import annotations

import sys

import pytest


def test_accuracy_band_vs_reference_published(spark):
    sys.path.insert(0, "/root/repo/tools")
    import scale_run

    out = scale_run.run(spark, 100_000)
    assert out["clean_rows"] == 100_000
    for model, m in out["models"].items():
        assert m["within_band"], (
            f"{model}: accuracy {m['accuracy']} outside "
            f"±{scale_run.BAND} of published {m['published_accuracy']}"
        )
    # the reference's NB rawPrediction AUC caveat must reproduce too
    # (BASELINE.md: ~0.53, an artifact of uncalibrated NB raw margins)
    assert out["models"]["nb"]["roc_auc"] < 0.6
    assert out["models"]["lr"]["roc_auc"] > 0.7


def test_corpus_scale_pipeline_invariants():
    """The end-to-end curation pipeline tool (synthesize → clean → Gopher
    gate → cluster-dedup → chunk → pack → mix) holds its planted
    invariants at a reduced 20k docs — run as a subprocess because the
    tool owns its SparkSession lifecycle (it stops the session on exit,
    which would kill the shared pytest fixture in-process)."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/corpus_scale.py", "20000"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["failures"] == []
    assert out["stats"]["gopher"]["f_wc"] == 20000
    assert out["stats"]["dedup"]["removed"] == pytest.approx(4000, rel=0.1)

