from sentiment_analysis_bigdata_spark.operators import (
    asof,
    dedup,
    evaluation,
    features,
    ml,
    multimodal,
    relational,
    similarity,
)

__all__ = [
    "asof",
    "dedup",
    "evaluation",
    "features",
    "ml",
    "multimodal",
    "relational",
    "similarity",
]
