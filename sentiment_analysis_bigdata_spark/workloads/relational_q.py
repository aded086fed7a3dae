"""Relational-core queries (SURVEY §2.2-§2.5) with DuckDB oracle twins.

Conventions shared with the oracles (driver compares by column name +
order-insensitive value hash):
- every computed column is aliased identically on both sides;
- double aggregates are ``round``ed (2 decimals for money-scale sums,
  6 for ratios/averages) so partial-aggregation summation order can't
  flip the hash;
- counts are BIGINT on both sides (DuckDB ``sum`` of integers is HUGEINT —
  always cast);
- timestamps are emitted as 'yyyy-MM-dd' / full strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import relational as R
from sentiment_analysis_bigdata_spark.sources import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


def money_sum(expr) -> F.Column:
    """Order-independent money sum: per-row round to integer cents (both
    engines see identical input bits → identical cents), exact BIGINT sum,
    divide back to dollars.

    A plain ``sum(double)`` depends on partial-aggregation order; with
    thousands of addends the ~1e-9 jitter occasionally straddles a 2-decimal
    rounding boundary and flips the last cent between engines/runs. SQL twin:
    ``sum(CAST(round(expr * 100) AS BIGINT)) / 100.0``.
    """
    return F.sum(F.round(expr * 100).cast("bigint")) / 100.0


# SQL fragment mirroring money_sum
def sql_money_sum(expr: str) -> str:
    return f"sum(CAST(round(({expr}) * 100) AS BIGINT)) / 100.0"


# --- Q1: pricing summary (TPC-H Q1 shape: scan → filter → agg) -------------

def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # selective predicate (testdata dates span 1995-2001) — pushes to the scan
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(money_sum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(
                money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                money_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS sum_disc_price,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT)) / 100.0, 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-shape: 3-way join, revenue top-k ------------------------------------

def q_top_revenue_orders(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    # no forced broadcast on the customer side: it's dim-sized here but grows
    # with SF — Catalyst/AQE picks broadcast-hash while it fits the threshold
    # and degrades to shuffle join beyond, which is the right call at 100 TB
    joined = R.join(
        R.join(li, orders, F.col("l_orderkey") == F.col("o_orderkey")),
        cust,
        F.col("o_custkey") == F.col("c_custkey"),
    )
    rev = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.round(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return R.top_k(
        rev, [F.col("revenue").desc(), F.col("o_orderkey").asc()], 10
    ).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "revenue",
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- Q5-shape: star join through region/nation -----------------------------

def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    # dims broadcast; the lineitem fact side shuffles only for the final agg
    geo = R.join(
        R.join(cust, nation, F.col("c_nationkey") == F.col("n_nationkey"), broadcast_right=True),
        region,
        F.col("n_regionkey") == F.col("r_regionkey"),
        broadcast_right=True,
    ).select("c_custkey", "n_name", "r_name")
    facts = R.join(li, orders, F.col("l_orderkey") == F.col("o_orderkey"))
    # geo (customer-sized) is NOT force-broadcast — AQE decides by size
    return (
        R.join(facts, geo, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) / 100.0, 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- join family -------------------------------------------------------------

def q_customer_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT join + agg: customers with their order counts (0 for none)."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(money_sum(F.col("o_totalprice")), 2).alias("total_spent"),
    )
    return (
        R.join(cust, per_cust, F.col("c_custkey") == F.col("o_custkey"), how="left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.round(F.coalesce(F.col("total_spent"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


SQL_CUSTOMER_ORDER_STATS = """
SELECT c_custkey, c_mktsegment,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       round(coalesce(total_spent, 0.0), 2) AS total_spent
FROM customer
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) / 100.0, 2) AS total_spent
    FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def q_customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT SEMI join."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return R.semi_join(cust, orders, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "c_name"
    )


SQL_CUSTOMERS_WITH_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ANTI join."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return R.anti_join(cust, orders, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "c_name"
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


def q_full_outer_nation_counts(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join of customer-nation counts vs supplier-nation counts."""
    cust = _t(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = _t(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cust.withColumnRenamed("nk", "c_nk")
        .join(supp.withColumnRenamed("nk", "s_nk"), F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).cast("int").alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).cast("bigint").alias("n_suppliers"),
        )
    )


SQL_FULL_OUTER_NATION_COUNTS = """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT CAST(coalesce(c.nk, s.nk) AS INTEGER) AS nationkey,
       CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


def q_range_join_price_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi (range) join: parts bucketed into static price bands."""
    part = _t(spark, sf, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1200.0), ("high", 1200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
    )


SQL_RANGE_JOIN_PRICE_BANDS = """
WITH bands(band, lo, hi) AS (VALUES ('low', 0.0, 500.0), ('mid', 500.0, 1200.0), ('high', 1200.0, 1e9))
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --- windows ------------------------------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    return R.top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_running_total_per_user(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    out = R.running_agg(
        ev,
        ["user_id"],
        [F.col("ts").asc(), F.col("event_id").asc()],
        F.sum("value"),
        "running_value",
    )
    return out.select(
        "user_id", "event_id", F.round(F.col("running_value"), 4).alias("running_value")
    )


SQL_RUNNING_TOTAL_PER_USER = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


def q_event_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    out = R.lag_lead(ev, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()], "value")
    return out.select(
        "user_id",
        "event_id",
        F.round(F.coalesce(F.col("value_lag"), F.lit(-1.0)), 4).alias("prev_value"),
        F.round(F.coalesce(F.col("value_lead"), F.lit(-1.0)), 4).alias("next_value"),
    )


SQL_EVENT_NEIGHBORS = """
SELECT user_id, event_id,
       round(coalesce(lag(value) OVER w, -1.0), 4) AS prev_value,
       round(coalesce(lead(value) OVER w, -1.0), 4) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


def q_rank_dense_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """rank / dense_rank / ntile over supplier balances.

    The composite order (s_acctbal DESC, s_suppkey ASC) is UNIQUE
    (s_suppkey is the key), so rank ≡ dense_rank ≡ global position; the
    scale-relevant content is computing that position WITHOUT the
    single-partition sort a global ranking window compiles to —
    ``operators/ordering.banded_global_ordinal`` (percentile bands +
    in-band row_number + broadcast offsets; r11). ntile(4) is then a
    closed-form expression of (position, N): the ANSI convention both
    engines share — the first N mod 4 quartiles take ceil(N/4) rows,
    the rest floor(N/4). The oracle keeps the naive global window."""
    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_global_ordinal,
    )

    supp = _t(spark, sf, "supplier")
    pos = banded_global_ordinal(
        supp.select("s_suppkey", "s_acctbal"),
        "s_acctbal",
        "s_suppkey",
        descending=True,
        out_col="pos",
    )
    n_total = supp.agg(F.count(F.lit(1)).alias("n_total"))
    p, n = F.col("pos"), F.col("n_total")
    base, rem = F.floor(n / 4), n % 4
    head = rem * (base + 1)  # rows covered by the (base+1)-sized quartiles
    quartile = F.when(base == 0, p).otherwise(
        F.when(p <= head, F.ceil(p / (base + 1))).otherwise(
            rem + F.ceil((p - head) / base)
        )
    )
    return pos.crossJoin(F.broadcast(n_total)).select(
        "s_suppkey",
        p.alias("bal_rank"),
        p.alias("bal_dense_rank"),
        quartile.cast("int").alias("bal_quartile"),
    )


SQL_RANK_DENSE_NTILE = """
SELECT s_suppkey,
       CAST(rank() OVER w AS BIGINT) AS bal_rank,
       CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
       CAST(ntile(4) OVER w AS INTEGER) AS bal_quartile
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
"""


# --- set ops -------------------------------------------------------------------

def q_set_union(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    small = part.filter(F.col("p_size") < 10).select("p_partkey")
    pricey = part.filter(F.col("p_retailprice") > 1500).select("p_partkey")
    return R.union_all(small, pricey).distinct()


SQL_SET_UNION = """
SELECT p_partkey FROM part WHERE p_size < 10
UNION
SELECT p_partkey FROM part WHERE p_retailprice > 1500
"""


def q_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    small = part.filter(F.col("p_size") < 25).select("p_partkey")
    pricey = part.filter(F.col("p_retailprice") > 1000).select("p_partkey")
    return R.intersect(small, pricey)


SQL_SET_INTERSECT = """
SELECT p_partkey FROM part WHERE p_size < 25
INTERSECT
SELECT p_partkey FROM part WHERE p_retailprice > 1000
"""


def q_set_except(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    small = part.filter(F.col("p_size") < 25).select("p_partkey")
    pricey = part.filter(F.col("p_retailprice") > 1000).select("p_partkey")
    return R.except_(small, pricey)


SQL_SET_EXCEPT = """
SELECT p_partkey FROM part WHERE p_size < 25
EXCEPT
SELECT p_partkey FROM part WHERE p_retailprice > 1000
"""


# --- grouping sets ---------------------------------------------------------------

def q_rollup_geo(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region")
    geo = R.join(
        R.join(cust, nation, F.col("c_nationkey") == F.col("n_nationkey"), broadcast_right=True),
        region,
        F.col("n_regionkey") == F.col("r_regionkey"),
        broadcast_right=True,
    )
    return (
        R.rollup_agg(
            geo,
            ["r_name", "n_name"],
            F.count(F.lit(1)).alias("n_customers"),
            F.round(money_sum(F.col("c_acctbal")), 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("r_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("n_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


SQL_ROLLUP_GEO = """
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(n_name, 'ALL') AS n_name,
       count(*) AS n_customers,
       round(sum(CAST(round((c_acctbal) * 100) AS BIGINT)) / 100.0, 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    return (
        R.cube_agg(
            orders,
            ["o_orderstatus", "o_orderpriority"],
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "avg_price",
        )
    )


SQL_CUBE_ORDERS = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- misc scalar/aggregate surface -----------------------------------------------

def q_distinct_segments(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "customer").select("c_mktsegment").distinct()


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


def q_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """count(distinct) + approx vs exact side-by-side (exact only in oracle)."""
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_DISTINCT_AGG = """
SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem
"""


def q_top_orders_global(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    return R.top_k(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 10
    ).select("o_orderkey", "o_totalprice")


SQL_TOP_ORDERS_GLOBAL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_case_when_bands(spark: SparkSession, sf: str) -> DataFrame:
    """P5 CASE WHEN chain + filter + projection (reference clean-path shape)."""
    orders = _t(spark, sf, "orders")
    band = R.case_when(
        [
            (F.col("o_totalprice") < 1000, F.lit("small")),
            (F.col("o_totalprice") < 50000, F.lit("medium")),
        ],
        F.lit("large"),
    )
    return (
        orders.withColumn("band", band)
        .filter(F.col("o_orderstatus") != "X")
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(money_sum(F.col("o_totalprice")), 2).alias("total"))
    )


SQL_CASE_WHEN_BANDS = """
SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
            WHEN o_totalprice < 50000 THEN 'medium'
            ELSE 'large' END AS band,
       count(*) AS n,
       round(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) / 100.0, 2) AS total
FROM orders
WHERE o_orderstatus <> 'X'
GROUP BY 1
"""


def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k_bucket", (k % 10).cast("int"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


SQL_JSON_PROPS = """
SELECT CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_bucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1
"""


def q_orders_monthly(spark: SparkSession, sf: str) -> DataFrame:
    """Date functions: truncate to month, extract year, aggregate."""
    orders = _t(spark, sf, "orders")
    return (
        orders.withColumn("month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM"))
        .withColumn("year", F.year("o_orderdate").cast("int"))
        .groupBy("year", "month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(money_sum(F.col("o_totalprice")), 2).alias("monthly_total"),
        )
    )


SQL_ORDERS_MONTHLY = """
SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS year,
       strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       count(*) AS n_orders,
       round(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) / 100.0, 2) AS monthly_total
FROM orders
GROUP BY 1, 2
"""


def q_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    """P1 dropna + null-aware aggregates over a derived nullable column."""
    ev = _t(spark, sf, "events")
    with_nulls = ev.withColumn(
        "maybe_value", F.when(F.col("value") > 100, F.col("value"))
    )
    return with_nulls.dropna(subset=["props"]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("maybe_value").alias("n_nonnull"),
        F.round(F.avg("maybe_value"), 6).alias("avg_big_value"),
    )


SQL_NULL_HANDLING = """
SELECT count(*) AS n_rows,
       count(maybe_value) AS n_nonnull,
       round(avg(maybe_value), 6) AS avg_big_value
FROM (SELECT CASE WHEN value > 100 THEN value END AS maybe_value, props FROM events)
WHERE props IS NOT NULL
"""


def q_correlated_exists(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-EXISTS shape: orders that contain a high-quantity line."""
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 45)
    return R.semi_join(orders, li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey", "o_totalprice"
    )


SQL_CORRELATED_EXISTS = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
"""


def q_scalar_subquery_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-subquery shape: lineitems above the global average quantity.

    Spark-first: compute the scalar with one tiny agg job and fold it into
    the filter as a literal (exactly what a decorrelated plan does).
    """
    li = _t(spark, sf, "lineitem")
    avg_qty = li.agg(F.avg("l_quantity")).first()[0]
    return li.filter(F.col("l_quantity") > F.lit(avg_qty) * 1.5).agg(
        F.count(F.lit(1)).alias("n_above"),
        F.round(money_sum(F.col("l_extendedprice")), 2).alias("price_above"),
    )


SQL_SCALAR_SUBQUERY_AVG = """
SELECT count(*) AS n_above,
       round(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) / 100.0, 2) AS price_above
FROM lineitem
WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem) * 1.5
"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_revenue_orders": (q_top_revenue_orders, SQL_TOP_REVENUE_ORDERS),
    "region_revenue": (q_region_revenue, SQL_REGION_REVENUE),
    "customer_order_stats": (q_customer_order_stats, SQL_CUSTOMER_ORDER_STATS),
    "customers_with_orders": (q_customers_with_orders, SQL_CUSTOMERS_WITH_ORDERS),
    "customers_without_orders": (q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS),
    "full_outer_nation_counts": (q_full_outer_nation_counts, SQL_FULL_OUTER_NATION_COUNTS),
    "range_join_price_bands": (q_range_join_price_bands, SQL_RANGE_JOIN_PRICE_BANDS),
    "top_orders_per_customer": (q_top_orders_per_customer, SQL_TOP_ORDERS_PER_CUSTOMER),
    "running_total_per_user": (q_running_total_per_user, SQL_RUNNING_TOTAL_PER_USER),
    "event_neighbors": (q_event_neighbors, SQL_EVENT_NEIGHBORS),
    "rank_dense_ntile": (q_rank_dense_ntile, SQL_RANK_DENSE_NTILE),
    "set_union": (q_set_union, SQL_SET_UNION),
    "set_intersect": (q_set_intersect, SQL_SET_INTERSECT),
    "set_except": (q_set_except, SQL_SET_EXCEPT),
    "rollup_geo": (q_rollup_geo, SQL_ROLLUP_GEO),
    "cube_orders": (q_cube_orders, SQL_CUBE_ORDERS),
    "distinct_segments": (q_distinct_segments, SQL_DISTINCT_SEGMENTS),
    "distinct_agg": (q_distinct_agg, SQL_DISTINCT_AGG),
    "top_orders_global": (q_top_orders_global, SQL_TOP_ORDERS_GLOBAL),
    "case_when_bands": (q_case_when_bands, SQL_CASE_WHEN_BANDS),
    "json_props": (q_json_props, SQL_JSON_PROPS),
    "orders_monthly": (q_orders_monthly, SQL_ORDERS_MONTHLY),
    "null_handling": (q_null_handling, SQL_NULL_HANDLING),
    "correlated_exists": (q_correlated_exists, SQL_CORRELATED_EXISTS),
    "scalar_subquery_avg": (q_scalar_subquery_avg, SQL_SCALAR_SUBQUERY_AVG),
}
