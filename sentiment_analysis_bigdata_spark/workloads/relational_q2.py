"""Relational coverage, batch 2: percentiles, pivot, scalar function
families (string/math/date), window frames (RANGE), HAVING, first/last
aggregates — each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- exact + approximate percentiles ------------------------------------------

def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact linear-interpolation percentiles per returnflag. Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the interpolation rule.
    (Scale note: exact percentile sorts per group — at 100 TB swap in
    approx_percentile, same API shape.)"""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25_qty"),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
       round(quantile_cont(l_quantity, 0.25), 4) AS q25_qty
FROM lineitem
GROUP BY l_returnflag
"""


# --- pivot (wide aggregation) ---------------------------------------------------

def q_pivot_status_by_priority(spark: SparkSession, sf: str) -> DataFrame:
    """groupBy().pivot() — order counts per status × priority, wide."""
    orders = _t(spark, sf, "orders")
    # static key list (TPC-H fixed domain): passing it to .pivot() avoids the
    # extra distinct+collect job Spark would otherwise run to enumerate keys
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .count()
        .na.fill(0)
    )
    # normalize pivot column names to SQL-friendly identifiers
    for p in priorities:
        out = out.withColumnRenamed(p, f"n_{p.replace('-', '_').lower()}")
    return out


SQL_PIVOT_STATUS_BY_PRIORITY = """
SELECT o_orderstatus,
       CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_1_urgent,
       CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_2_high,
       CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_3_medium,
       CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "n_4_not specified",
       CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_5_low
FROM orders
GROUP BY o_orderstatus
"""


# --- string function family ------------------------------------------------------

def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.reverse(F.col("c_mktsegment")).alias("rev_segment"),
    )


SQL_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       substr(c_name, 1, 8) AS prefix8,
       CAST(length(c_name) AS INTEGER) AS name_len,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       replace(c_name, '#', '-') AS dashed,
       reverse(c_mktsegment) AS rev_segment
FROM customer
"""


# --- math function family ----------------------------------------------------------

def q_math_functions(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).cast("double").alias("qty_dev"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil(F.col("l_tax")).cast("bigint").alias("tax_ceil"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.pmod(F.col("l_orderkey"), F.lit(97)).cast("bigint").alias("key_mod"),
    )


SQL_MATH_FUNCTIONS = """
SELECT l_orderkey,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(pow(l_discount, 2), 6) AS disc_sq,
       CAST(abs(l_quantity - 25) AS DOUBLE) AS qty_dev,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_tax) AS BIGINT) AS tax_ceil,
       round(exp(l_discount), 6) AS exp_disc,
       round(ln(l_extendedprice + 1), 6) AS ln_price,
       CAST(l_orderkey % 97 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_linenumber = 1
"""


# --- array function family over tokens ----------------------------------------------

def q_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    from sentiment_analysis_bigdata_spark.functions import text as TXT

    docs = _t(spark, sf, "documents")
    toks = TXT.tokenize_nonempty("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.array_min(toks).alias("first_alpha"),
        F.array_max(toks).alias("last_alpha"),
        F.array_join(F.slice(F.array_sort(toks), 1, 3), ",").alias("first3_sorted"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


SQL_ARRAY_FUNCTIONS = r"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       list_min(toks) AS first_alpha,
       list_max(toks) AS last_alpha,
       array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
       list_contains(toks, 'spark') AS has_spark
FROM base
"""


# --- window RANGE frame ---------------------------------------------------------------

def q_range_frame_window(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE BETWEEN 500 PRECEDING AND CURRENT ROW over account balance:
    for each supplier, how many suppliers (incl. self) sit within 500
    below them, and their summed balance.

    r11 scale shape (the roc_points pattern): the range frame runs over
    the BALANCE SUPPORT — one groupBy(balance) collapses the table to
    per-value (count, sum) first, so the single-partition window sees
    value cardinality (2-decimal money in [-999.99, 9999.99] → ≤ ~1.1M
    distinct values, a constant of the domain), never row cardinality;
    rows join the rolled-up frame back on their balance. Balances
    aggregate as integer CENTS (the compaction_plan lesson) so the
    support-subtotal addition order can't drift from the oracle's
    per-row running sum."""
    supp = _t(spark, sf, "supplier").select(
        "s_suppkey",
        F.expr("CAST(round(s_acctbal * 100) AS BIGINT)").alias("bal_c"),
    )
    support = supp.groupBy("bal_c").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("bal_c").alias("sum_c")
    )
    w = Window.orderBy("bal_c").rangeBetween(-50000, Window.currentRow)
    roll = support.select(
        "bal_c",
        F.sum("cnt").over(w).alias("n_within_500"),
        F.sum("sum_c").over(w).alias("sum_within_c"),
    )
    return supp.join(roll, "bal_c").select(
        "s_suppkey",
        "n_within_500",
        F.round(F.col("sum_within_c") / 100.0, 4).alias("bal_within_500"),
    )


SQL_RANGE_FRAME_WINDOW = """
WITH s AS (
  SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
  FROM supplier
)
SELECT s_suppkey,
       count(*) OVER w AS n_within_500,
       round((sum(bal_c) OVER w) / 100.0, 4) AS bal_within_500
FROM s
WINDOW w AS (ORDER BY bal_c RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
"""


# --- first/last aggregates (deterministic via ordered struct-max) ----------------------

def q_latest_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """max_by-style: each customer's most recent order. Spark ``max_by`` /
    DuckDB ``arg_max`` with an explicit (date, key) tie-break."""
    orders = _t(spark, sf, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by(
            "o_orderkey", F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
        ).alias("latest_orderkey"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("latest_date"),
    )


SQL_LATEST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, latest_orderkey, latest_date FROM (
  SELECT o_custkey, o_orderkey AS latest_orderkey,
         strftime(max(o_orderdate) OVER (PARTITION BY o_custkey), '%Y-%m-%d') AS latest_date,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""


# --- HAVING + conditional aggregation ---------------------------------------------------

def q_having_big_nations(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).cast("bigint").alias("n_positive"),
            F.round(F.avg(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), 6).alias("avg_positive_bal"),
        )
        .filter(F.col("n_customers") >= 5)
    )


SQL_HAVING_BIG_NATIONS = """
SELECT c_nationkey,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
       round(avg(CASE WHEN c_acctbal > 0 THEN c_acctbal END), 6) AS avg_positive_bal
FROM customer
GROUP BY c_nationkey
HAVING count(*) >= 5
"""


# --- IN-list / BETWEEN filters ----------------------------------------------------------

def q_filter_families(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000, 100000)
            & F.col("o_orderdate").cast("date").between("1996-01-01", "1998-06-30")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.min("o_totalprice"), 2).alias("min_price"))
    )


SQL_FILTER_FAMILIES = """
SELECT o_orderpriority, count(*) AS n, round(min(o_totalprice), 2) AS min_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 1000 AND 100000
  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1998-06-30'
GROUP BY o_orderpriority
"""


# --- union by name (schema alignment) ----------------------------------------------------

def q_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """unionByName with differing column order — count of all parties."""
    cust = _t(spark, sf, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    supp = _t(spark, sf, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_name").alias("name")
    )
    return cust.unionByName(supp).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


SQL_UNION_BY_NAME = """
SELECT kind, count(*) AS n FROM (
  SELECT c_name AS name, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_name AS name, 'supplier' AS kind FROM supplier
)
GROUP BY kind
"""


QUERIES = {
    "percentiles": (q_percentiles, SQL_PERCENTILES),
    "pivot_status_by_priority": (q_pivot_status_by_priority, SQL_PIVOT_STATUS_BY_PRIORITY),
    "string_functions": (q_string_functions, SQL_STRING_FUNCTIONS),
    "math_functions": (q_math_functions, SQL_MATH_FUNCTIONS),
    "array_functions": (q_array_functions, SQL_ARRAY_FUNCTIONS),
    "range_frame_window": (q_range_frame_window, SQL_RANGE_FRAME_WINDOW),
    "latest_order_per_customer": (q_latest_order_per_customer, SQL_LATEST_ORDER_PER_CUSTOMER),
    "having_big_nations": (q_having_big_nations, SQL_HAVING_BIG_NATIONS),
    "filter_families": (q_filter_families, SQL_FILTER_FAMILIES),
    "union_by_name": (q_union_by_name, SQL_UNION_BY_NAME),
}
