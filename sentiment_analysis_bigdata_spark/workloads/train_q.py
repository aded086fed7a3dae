"""Training-pipeline queries, batch 2: tokenizer training (BPE pair
counts), Z-order layout keys, group-wise regression, and embedding
centroids — each with a DuckDB oracle twin.

These extend the north-star LLM-pipeline surface (BASELINE.json): the
reference itself has none of these (its tokenizer is ML ``Tokenizer``
only, SURVEY §2.6 M1; it trains global models only, M9-M11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import layout, regression, tokenizer_train
from sentiment_analysis_bigdata_spark.sources import load_table


# --- BPE merge candidates (tokenizer training, one round) ------------------------

def q_bpe_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 freq-weighted adjacent character pairs over documents.

    One corpus-sized pass (word frequencies); pair generation and the final
    aggregation run on the vocab-sized frame (operators/tokenizer_train.py).
    """
    docs = load_table(spark, sf, "documents")
    return tokenizer_train.top_merge_candidates(docs, "text", k=50)


SQL_BPE_MERGE_CANDIDATES = """
WITH words AS (
  SELECT w AS word, count(*) AS freq
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents
  )
  GROUP BY 1
),
pairs AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, freq
  FROM words, unnest(range(1, length(word))) AS t(i)
  WHERE length(word) >= 2
)
SELECT pair, sum(freq) AS n
FROM pairs
GROUP BY 1
ORDER BY n DESC, pair
LIMIT 50
"""


# --- Z-order (Morton) layout keys ------------------------------------------------

def q_zorder_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Morton key + target Z-file for events, interleaving (user_id mod
    1024, minute-of-day): the write-time clustering key that gives BOTH
    columns min/max pruning (operators/layout.py). Aggregated per Z-file
    so the result is small and the whole key computation is exercised."""
    ev = load_table(spark, sf, "events")
    keyed = layout.zorder_keys(
        ev.withColumn("zx", F.col("user_id") % 1024)
        .withColumn("zy", (F.hour("ts") * 60 + F.minute("ts")).cast("bigint")),
        "zx",
        "zy",
        bits=10,
        file_bits=6,
    )
    return keyed.groupBy("zfile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("morton").alias("min_morton"),
        F.max("morton").alias("max_morton"),
        F.sum("morton").alias("sum_morton"),
    )


_MORTON_SQL = layout.morton_key_sql("(user_id % 1024)", "(hour(ts) * 60 + minute(ts))", bits=10)

SQL_ZORDER_KEYS = f"""
WITH keyed AS (
  SELECT {_MORTON_SQL} AS morton
  FROM events
)
SELECT morton >> 14 AS zfile,
       count(*) AS n_rows,
       min(morton) AS min_morton,
       max(morton) AS max_morton,
       sum(morton) AS sum_morton
FROM keyed
GROUP BY 1
"""


# --- Group-wise regression -------------------------------------------------------

def q_groupwise_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Per-returnflag OLS of extendedprice on quantity via the built-in
    regr_* aggregates (operators/regression.py — the pure-JVM one-shuffle
    path; the applyInPandas generalization is tested equivalent)."""
    li = load_table(spark, sf, "lineitem")
    return regression.groupwise_ols_expr(
        li, ["l_returnflag"], x="l_quantity", y="l_extendedprice"
    )


SQL_GROUPWISE_REGRESSION = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
       regr_count(l_extendedprice, l_quantity) AS n
FROM lineitem
GROUP BY 1
"""


# --- Embedding centroids (mean-pool per label) -----------------------------------

def q_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroid, flattened to (label, pos, avg value).

    posexplode → groupBy(label, pos) → avg: linear in rows × dim, partial
    aggregation map-side, one shuffle keyed (label, pos) — the standard
    distributed mean-pool (also how IVF list centroids re-estimate).
    Rounded for cross-engine float stability."""
    emb = load_table(spark, sf, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .groupBy("label", F.col("pos").alias("dim"))
        .agg(
            F.round(F.avg("col"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


SQL_LABEL_CENTROIDS = """
SELECT label,
       CAST(i - 1 AS INT) AS dim,
       round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6) AS centroid_val,
       count(*) AS n_vectors
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY 1, 2
"""


QUERIES = {
    "bpe_merge_candidates": (q_bpe_merge_candidates, SQL_BPE_MERGE_CANDIDATES),
    "zorder_keys": (q_zorder_keys, SQL_ZORDER_KEYS),
    "groupwise_regression": (q_groupwise_regression, SQL_GROUPWISE_REGRESSION),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
}
