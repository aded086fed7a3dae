"""Relational coverage, batch 3: statistical aggregates, GROUPING SETS,
regexp extraction, map functions — with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- statistical aggregate family ------------------------------------------------

def q_stats_functions(spark: SparkSession, sf: str) -> DataFrame:
    """stddev/variance/skew-free stats per event_type + correlation between
    value and JSON k (sample semantics on both engines)."""
    ev = _t(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr("value", "k"), 6).alias("corr_value_k"),
        F.round(F.covar_samp("value", "k"), 6).alias("covar_value_k"),
    )


SQL_STATS_FUNCTIONS = """
SELECT event_type, count(*) AS n,
       round(stddev_samp(value), 6) AS sd_value,
       round(var_samp(value), 6) AS var_value,
       round(corr(value, k), 6) AS corr_value_k,
       round(covar_samp(value, k), 6) AS covar_value_k
FROM (SELECT event_type, value, CAST(json_extract(props, '$.k') AS DOUBLE) AS k FROM events)
GROUP BY event_type
"""


# --- GROUPING SETS explicitly -----------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube): totals by
    (status), by (priority), and grand total — via Spark SQL on a temp view."""
    orders = _t(spark, sf, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- regexp extraction family ------------------------------------------------------

def q_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract + rlike predicates over part names/types."""
    part = _t(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.regexp_extract("p_name", r"(\d+)", 1).alias("first_number"),
        F.col("p_type").rlike("BRASS|STEEL").alias("is_metal"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[a-z]+"), 0)).cast("bigint").alias("n_words"),
    )


SQL_REGEXP_EXTRACT = r"""
SELECT p_partkey,
       coalesce(regexp_extract(p_type, '^(\w+)', 1), '') AS type_head,
       coalesce(regexp_extract(p_name, '(\d+)', 1), '') AS first_number,
       regexp_matches(p_type, 'BRASS|STEEL') AS is_metal,
       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words
FROM part
"""


# --- map functions ------------------------------------------------------------------

def q_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Build a map from JSON props, read through it, enumerate keys."""
    ev = _t(spark, sf, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("type"), F.col("event_type"),
    )
    return ev.select(
        "event_id",
        m.getItem("k").cast("int").alias("k_value"),
        m.getItem("type").alias("type_value"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


SQL_MAP_FUNCTIONS = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
       event_type AS type_value,
       'k,type' AS keys,
       2 AS n_keys
FROM events
"""


# --- conditional expression family ---------------------------------------------------

def q_conditional_functions(spark: SparkSession, sf: str) -> DataFrame:
    """coalesce / nullif / nvl2 / least / greatest over account balances."""
    cust = _t(spark, sf, "customer")
    maybe = F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))
    return cust.select(
        "c_custkey",
        F.round(F.coalesce(maybe, F.lit(0.0)), 4).alias("bal_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_not_building"),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 4).alias("bal_capped"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 4).alias("bal_floor"),
        F.isnull(maybe).alias("is_nonpositive"),
    )


SQL_CONDITIONAL_FUNCTIONS = """
SELECT c_custkey,
       round(coalesce(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0.0), 4) AS bal_or_zero,
       nullif(c_mktsegment, 'BUILDING') AS seg_not_building,
       round(least(c_acctbal, 1000.0), 4) AS bal_capped,
       round(greatest(c_acctbal, 0.0), 4) AS bal_floor,
       (CASE WHEN c_acctbal > 0 THEN c_acctbal END) IS NULL AS is_nonpositive
FROM customer
"""


# --- reference-parity n-gram ML pipeline (rows-only) ----------------------------------

def q_ml_lr_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's alternative feature path: NGram(1..2) →
    CountVectorizer → IDF → VectorAssembler → LR (reference
    model_logistic_regression.py:124-150; CLI-switchable vs TF-IDF)."""
    from sentiment_analysis_bigdata_spark.operators import ml as ML
    from sentiment_analysis_bigdata_spark.workloads.evaluation_q import _synthetic_tweets

    cfg = ML.PipelineConfig(
        features="ngram", ngram_max=2, vocab_size=5000, min_df=2, max_iter=10
    )
    _m, m = ML.train_and_evaluate(_synthetic_tweets(spark, sf), "lr", cfg)
    return spark.createDataFrame(
        [(round(m["accuracy"], 6), round(m["f1"], 6), m["test_rows"])],
        "accuracy double, f1 double, test_rows bigint",
    )


QUERIES = {
    "stats_functions": (q_stats_functions, SQL_STATS_FUNCTIONS),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "regexp_extract": (q_regexp_extract, SQL_REGEXP_EXTRACT),
    "map_functions": (q_map_functions, SQL_MAP_FUNCTIONS),
    "conditional_functions": (q_conditional_functions, SQL_CONDITIONAL_FUNCTIONS),
    "ml_lr_ngram": (q_ml_lr_ngram, None),
}
