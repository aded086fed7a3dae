"""Relational coverage, batch 3: statistical aggregates, GROUPING SETS,
regexp extraction, map functions — with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
    _metrics_literal_sql as _ml_metrics_sql,
)
from sentiment_analysis_bigdata_spark.workloads.relational_q import money_sum


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
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0D, 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
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


# --- date arithmetic family -----------------------------------------------------------

def q_date_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """datediff / date_add / months_between / dayofweek over order dates."""
    orders = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("int").alias("days_to_y2k"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.round(F.months_between(F.lit("2000-01-01").cast("date"), d), 4).alias("months_to_y2k"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.quarter(d).cast("int").alias("qtr"),
    )


SQL_DATE_ARITHMETIC = """
SELECT o_orderkey,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       round(CASE WHEN day(CAST(o_orderdate AS DATE)) = day(DATE '2000-01-01')
                  THEN datediff('month', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                  ELSE datediff('month', date_trunc('month', CAST(o_orderdate AS DATE)),
                                date_trunc('month', DATE '2000-01-01'))
                       + (day(DATE '2000-01-01') - day(CAST(o_orderdate AS DATE))) / 31.0
             END, 4) AS months_to_y2k,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr
FROM orders
WHERE o_orderkey % 7 = 0
"""


def q_nation_trade_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipped between supplier-nation and
    customer-nation pairs per year — the same dimension table joined twice
    under different aliases (Catalyst attribute disambiguation), two fact
    joins, and a multi-key aggregation."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    )
    return (
        j.filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_NATION_TRADE_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS INTEGER) AS ship_year,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q_fillna_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """na.fill / na.replace handling over a derived nullable column."""
    ev = _t(spark, sf, "events")
    with_nulls = ev.withColumn(
        "maybe", F.when(F.col("value") > 150, F.col("value"))
    )
    filled = with_nulls.na.fill({"maybe": -1.0})
    return filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("maybe"), 4).alias("sum_filled"),
        F.sum((F.col("maybe") == -1.0).cast("bigint")).alias("n_defaulted"),
    )


SQL_FILLNA_AGGREGATES = """
SELECT event_type, count(*) AS n,
       round(sum(coalesce(CASE WHEN value > 150 THEN value END, -1.0)), 4) AS sum_filled,
       CAST(sum(CASE WHEN coalesce(CASE WHEN value > 150 THEN value END, -1.0) = -1.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
FROM events
GROUP BY event_type
"""


def q_first_last_window(spark: SparkSession, sf: str) -> DataFrame:
    """first_value / last_value over an explicit full-partition frame."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


SQL_FIRST_LAST_WINDOW = """
SELECT user_id, event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_frame_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal frame-sampling plan (JVM-side sequence/explode fan-out):
    pseudo-durations derived from n_chars, one row per sampled frame."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    media = MM.attach_payload(docs).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("h264").alias("codec"),
        ),
    )
    frames = MM.frame_sample_plan(media, every_ms=1000)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ts_ms").cast("bigint").alias("last_frame_ms"),
    )


SQL_FRAME_SAMPLING = """
SELECT doc_id, count(*) AS n_frames, CAST(max(ts) AS BIGINT) AS last_frame_ms
FROM (
  SELECT doc_id, unnest(range(0, n_chars * 10 + 1, 1000)) AS ts
  FROM documents WHERE doc_id < 50
)
GROUP BY doc_id
"""


# --- nested correlated subqueries -------------------------------------------------------

def q_cheapest_part_per_brand(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: parts whose price is the minimum within their brand
    (correlated min-subquery, decorrelated to a per-brand min AGGREGATE
    joined back — map-side-combinable, so the 25-value brand enum never
    funnels corpus-scaled groups through single window tasks the way
    ``min() OVER (PARTITION BY p_brand)`` would at 100 TB (VERDICT r11
    #4 defect class). The brand-mins frame is value-cardinality (≤ 25
    rows) — no hint; AQE broadcasts it at runtime, so the part scan
    itself never shuffles."""
    part = _t(spark, sf, "part")
    mins = part.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(mins, "p_brand")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


SQL_CHEAPEST_PART_PER_BRAND = """
SELECT p_brand, p_partkey, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
"""


def q_nested_semijoin_chain(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped small parts in 1996 —
    a two-level nested IN chain expressed as chained semi joins."""
    part = _t(spark, sf, "part").filter(F.col("p_size") < 10)
    li = _t(spark, sf, "lineitem").filter(
        F.year("l_shipdate") == 1996
    )
    supp = _t(spark, sf, "supplier")
    # part is SF-scaled — no broadcast hint; AQE picks the semi strategy
    shipped_small = li.join(
        part.select(F.col("p_partkey").alias("l_partkey")),
        "l_partkey",
        "left_semi",
    )
    return supp.join(
        shipped_small.select(F.col("l_suppkey").alias("s_suppkey")),
        "s_suppkey",
        "left_semi",
    ).select("s_suppkey", "s_name")


SQL_NESTED_SEMIJOIN_CHAIN = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE extract(year FROM l_shipdate) = 1996
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
)
"""


# --- reference-parity n-gram ML pipeline (rows-only) ----------------------------------

def q_ml_lr_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's alternative feature path: NGram(1..2) →
    CountVectorizer → IDF → VectorAssembler → LR (reference
    model_logistic_regression.py:124-150; CLI-switchable vs TF-IDF)."""
    from sentiment_analysis_bigdata_spark.operators import ml as ML
    from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
        _metrics_row,
        _synthetic_tweets,
    )

    cfg = ML.PipelineConfig(
        features="ngram", ngram_max=2, vocab_size=5000, min_df=2, max_iter=10
    )
    _m, m = ML.train_and_evaluate(_synthetic_tweets(spark, sf), "lr", cfg)
    return _metrics_row(spark, m)


QUERIES = {
    "stats_functions": (q_stats_functions, SQL_STATS_FUNCTIONS),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "regexp_extract": (q_regexp_extract, SQL_REGEXP_EXTRACT),
    "map_functions": (q_map_functions, SQL_MAP_FUNCTIONS),
    "conditional_functions": (q_conditional_functions, SQL_CONDITIONAL_FUNCTIONS),
    "nation_trade_volume": (q_nation_trade_volume, SQL_NATION_TRADE_VOLUME),
    "cheapest_part_per_brand": (q_cheapest_part_per_brand, SQL_CHEAPEST_PART_PER_BRAND),
    "nested_semijoin_chain": (q_nested_semijoin_chain, SQL_NESTED_SEMIJOIN_CHAIN),
    "date_arithmetic": (q_date_arithmetic, SQL_DATE_ARITHMETIC),
    "fillna_aggregates": (q_fillna_aggregates, SQL_FILLNA_AGGREGATES),
    "first_last_window": (q_first_last_window, SQL_FIRST_LAST_WINDOW),
    "frame_sampling": (q_frame_sampling, SQL_FRAME_SAMPLING),
    # golden constants measured at sf0.01 (deterministic training — see
    # evaluation_q._synthetic_tweets / _metrics_literal_sql)
    "ml_lr_ngram": (
        q_ml_lr_ngram,
        _ml_metrics_sql(108, 32, 26, 23, 27, 546296, 545712, 531732),
    ),
}
