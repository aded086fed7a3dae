"""Relational coverage, batch 5: TPC-H Q7/Q14/Q19 shapes and a LATERAL
(correlated-subquery) join — each with a DuckDB oracle twin.

Scale notes per query live in the docstrings; the common theme: dimension
sides broadcast explicitly when they are true dimensions (nation), complex
predicates stay as single-scan filters (Q19's OR-of-ANDs pushes into the
parquet scan as one disjunction), and ratio aggregates use the
integer-cents convention so cross-engine value checks are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.workloads.relational_q import (
    money_sum,
    sql_money_sum,
)


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- TPC-H Q7 shape: bilateral trade volume between nation pairs ------------------

def q_nation_pair_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue shipped from supplier-nation to customer-nation, per pair +
    year. Two independent dimension lookups (supplier→nation, customer→
    nation) hang off the fact table; both nation joins broadcast, so the
    only shuffles are lineitem→orders (fact-fact equi join, AQE-planned)
    and the final pair aggregation."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(money_sum(rev).alias("volume"))
    )


SQL_NATION_PAIR_VOLUME = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name < nc.n_name
GROUP BY 1, 2, 3
"""


# --- TPC-H Q14 shape: promo revenue share ------------------------------------------

def q_promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional-aggregate ratio in ONE pass over the join (the naive
    two-query formulation scans the fact table twice). Promo share per
    month, integer-cents on both numerator and denominator so the ratio's
    inputs are bitwise identical across engines."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            money_sum(promo).alias("promo_revenue"),
            money_sum(rev).alias("total_revenue"),
        )
        .withColumn(
            "promo_share_pct",
            F.round(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4),
        )
    )


SQL_PROMO_REVENUE_SHARE = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       {sql_money_sum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
       round(100.0 * ({sql_money_sum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")})
             / ({sql_money_sum('l_extendedprice * (1 - l_discount)')}), 4) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# --- TPC-H Q19 shape: OR-of-ANDs predicate pushdown --------------------------------

def q_brand_band_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunction of conjunctive bands (brand × size × quantity) evaluated
    as ONE filter on the joined scan — Catalyst keeps the whole disjunction
    a single predicate, so the fact table is read once with the filter
    evaluated in the scan stage, never three scans unioned."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return joined.filter(band).groupBy("p_brand").agg(
        money_sum(rev).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_BRAND_BAND_REVENUE = f"""
SELECT p_brand,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
"""


# --- LATERAL correlated subquery ----------------------------------------------------

SQL_LATERAL_TOP_ORDERS = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey AND o_totalprice > 300000
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""


def q_lateral_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL join (correlated subquery in FROM): each customer's top-2
    big orders. The IDENTICAL SQL string runs on Spark and DuckDB — Spark
    decorrelates the lateral subquery into a ranked window join (no
    per-customer re-execution), which is the plan a hand-written
    top_k_per_group produces."""
    for t in ("orders", "customer"):
        _t(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(SQL_LATERAL_TOP_ORDERS)


# --- TPC-H Q4 shape: EXISTS subquery --------------------------------------------

def q_priority_order_check(spark: SparkSession, sf: str) -> DataFrame:
    """Orders with at least one late-shipped line (TPC-H Q4's EXISTS
    shape), counted per priority. The EXISTS is a LEFT SEMI join — the fact
    side never duplicates, no distinct needed after."""
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    late = li.filter(F.col("l_shipdate") > "1998-01-01").select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_PRIORITY_ORDER_CHECK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > DATE '1998-01-01'
)
GROUP BY o_orderpriority
"""


# --- TPC-H Q10 shape: returned-item revenue per customer ---------------------------

def q_returned_item_losses(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue lost to returns per customer + nation, top 20 (TPC-H Q10):
    fact filter first (returnflag), then join out to customer/nation —
    filter-before-join keeps the shuffle to the returned subset only."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(rev).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_ITEM_LOSSES = f"""
SELECT c_custkey, c_name, n_name,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


# --- TPC-H Q18 shape: large-quantity orders (agg subquery in filter) ---------------

def q_large_quantity_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Orders whose total line quantity exceeds a threshold (TPC-H Q18):
    the qualifying-key set comes from ONE aggregation of the fact table and
    semi-joins back — never a correlated per-order scan."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
    )


SQL_LARGE_QUANTITY_ORDERS = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
SELECT o_orderkey, o_custkey, o_orderdate, total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
"""


QUERIES = {
    "nation_pair_volume": (q_nation_pair_volume, SQL_NATION_PAIR_VOLUME),
    "priority_order_check": (q_priority_order_check, SQL_PRIORITY_ORDER_CHECK),
    "returned_item_losses": (q_returned_item_losses, SQL_RETURNED_ITEM_LOSSES),
    "large_quantity_orders": (q_large_quantity_orders, SQL_LARGE_QUANTITY_ORDERS),
    "promo_revenue_share": (q_promo_revenue_share, SQL_PROMO_REVENUE_SHARE),
    "brand_band_revenue": (q_brand_band_revenue, SQL_BRAND_BAND_REVENUE),
    "lateral_top_orders": (q_lateral_top_orders, SQL_LATERAL_TOP_ORDERS),
}
