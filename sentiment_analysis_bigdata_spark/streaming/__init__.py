from sentiment_analysis_bigdata_spark.streaming import jobs

__all__ = ["jobs"]
