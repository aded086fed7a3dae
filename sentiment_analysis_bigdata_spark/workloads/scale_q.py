"""Scale-mechanism queries: salted aggregation (oracle = the plain GROUP BY
it must be equivalent to), bucketed join, stateful streaming EWMA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import text as TXT
from sentiment_analysis_bigdata_spark.operators import skew
from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.workloads.text_q import SQL_TOKS


def q_salted_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation of token counts — the hot-key-resilient
    plan for stopword-like skew. Must equal the direct GROUP BY (oracle)."""
    docs = load_table(spark, sf, "documents")
    tokens = docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
    return skew.salted_agg(tokens, ["token"], {"n": ("token", "count")}, salt=16)


SQL_SALTED_TOKEN_COUNTS = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
GROUP BY token
"""


def q_salted_supplier_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salt-replicated join (left-skew remedy) — equals the plain join."""
    li = load_table(spark, sf, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        skew.salted_join_left_skewed(li, supp, "l_suppkey", salt=8)
        .groupBy("l_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


SQL_SALTED_SUPPLIER_JOIN = """
SELECT l_suppkey, s_name, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY l_suppkey, s_name
"""


def q_stateful_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    EWMA of event values, run as a real incremental stream. Rows-only —
    checked against its batch twin in tests/test_scale_ops.py."""
    from sentiment_analysis_bigdata_spark.streaming import jobs as SJ
    from sentiment_analysis_bigdata_spark.streaming import stateful

    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    out = stateful.ewma_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("q_stateful_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("q_stateful_ewma")
    return res.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("ewma", "n_events"), 6).alias("ewma"),
    )


def q_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Two-pass exact-count top-k tokens: map-side bounded candidate
    generation (no full-keyspace shuffle), then an exact recount of only the
    candidates. Counts are exact, so the plain SQL top-k is the oracle."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    docs = load_table(spark, sf, "documents")
    tokens = docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
    return sketches.heavy_hitters(tokens, "token", k=20, per_partition=500)


SQL_HEAVY_HITTERS = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy per-partition sequence packing into 512-token training shards
    (rows-only: shard assignment depends on partition layout; the invariants
    — every doc exactly once, fills ≤ budget — are tested in
    tests/test_packing.py)."""
    from sentiment_analysis_bigdata_spark.operators import packing

    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.size(TXT.tokenize_nonempty("text")).cast("long").alias("n_tokens")
    )
    return packing.pack_sequences(docs, max_tokens=512)


QUERIES = {
    "salted_token_counts": (q_salted_token_counts, SQL_SALTED_TOKEN_COUNTS),
    "salted_supplier_join": (q_salted_supplier_join, SQL_SALTED_SUPPLIER_JOIN),
    "stateful_ewma": (q_stateful_ewma, None),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "pack_sequences": (q_pack_sequences, None),
}
