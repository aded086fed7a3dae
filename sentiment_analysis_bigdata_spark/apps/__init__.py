"""Application layer: the reference workload's entry points re-expressed on
the engine (SURVEY §3 lifecycle, §7 Phases 2-3).

A user of the reference runs five scripts (preprocessing.py,
model_logistic_regression.py, model_svm.py, model_naive_bayes.py,
compare_models.py); here each is a function + CLI subcommand:

    python -m sentiment_analysis_bigdata_spark.apps preprocess --input ... --output ...
    python -m sentiment_analysis_bigdata_spark.apps train --model lr --input ... --out-dir ...
    python -m sentiment_analysis_bigdata_spark.apps compare --metrics-dir ...

Differences from the reference, by design (all SURVEY-flagged anti-patterns):
- no inferSchema double scans — explicit schemas everywhere (§1.2);
- no unaggregated toPandas / sklearn — evaluation is distributed (§2.3);
- the scored test frame is cached once, not recomputed 5× (§3);
- chart PNGs are optional (matplotlib import-gated) — the data behind every
  reference chart is produced as JSON from distributed aggregations.
"""

from sentiment_analysis_bigdata_spark.apps.workflow import (
    compare_models,
    preprocess,
    train_model,
)

__all__ = ["preprocess", "train_model", "compare_models"]
