from sentiment_analysis_bigdata_spark.functions import hashing, text, vector

__all__ = ["text", "vector", "hashing"]
