from sentiment_analysis_bigdata_spark.plans import explain

__all__ = ["explain"]
