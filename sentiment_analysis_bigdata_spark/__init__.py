"""sentiment_analysis_bigdata_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference workload ``nhhung18/Sentiment_Analysis_BigData``
(see SURVEY.md), generalized into a complete DataFrame/SQL operator surface:

- relational core: scans, projections, filters, joins (all types), windows,
  set ops, grouping sets, sampling, sorts, top-k  (``operators.relational``)
- text/feature operators at reference parity: clean chain, tokenize,
  stopwords, n-grams, TF / IDF / CountVectorizer twins (``functions.text``,
  ``operators.features``)
- ML pipelines (LR / LinearSVC / NaiveBayes) with distributed evaluation
  (confusion matrix, accuracy, weighted F1, ROC-AUC — no sklearn, no
  unaggregated toPandas)  (``operators.ml``, ``operators.evaluation``)
- LLM-data-pipeline extensions: exact/near dedup (MinHash-LSH, SimHash,
  n-gram Jaccard, embedding cosine), similarity search (brute-force +
  LSH-bucketed ANN), multimodal binary columns, text analysis
  (lang-id, quality scores, token counts, fingerprints)
- Structured Streaming wrappers over the ``events`` table
  (``streaming.jobs``)

Everything is declarative DataFrame / Spark SQL so Catalyst + Tungsten pick
the physical plan; Python UDFs are banned on hot paths (Arrow-batched
pandas UDFs only where built-ins cannot express the semantics).
"""

from sentiment_analysis_bigdata_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
