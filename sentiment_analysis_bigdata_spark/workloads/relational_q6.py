"""Relational coverage, batch 6: the remaining classic TPC-H plan shapes
expressible on the testdata schema — Q6 (pure scan-filter-agg), Q15
(scalar subquery over an aggregated view), Q17 (correlated per-group
average), Q2 (min-per-group argmin with dimension lookups), Q8
(conditional-aggregate market share), Q16 (anti-join exclusion + distinct
count) — each with a DuckDB oracle twin.

Scale notes: explicit ``F.broadcast`` hints are reserved for frames that
are bounded regardless of scale factor — nation/region (fixed 25/5 rows)
and 1-row global aggregates. Tables that grow with SF (customer, supplier,
part, and any per-part aggregate) carry NO hint: at test scale AQE picks
broadcast-hash for them anyway (they fit autoBroadcastJoinThreshold), and
at 100× the unhinted plan degrades gracefully to a shuffle join instead of
OOMing the executors (SCALING.md "broadcast policy"). Money
arithmetic uses the integer-cents convention (``money_sum``) so the
cross-engine value hash is exact; ratio outputs divide two exact cent sums
and round to 6.

Reference parity: the reference engine has no TPC-H surface — these
queries extend the relational core (SURVEY §2.2-§2.5 join/agg/subquery
semantics) to the canonical analytics shapes a Spark user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.workloads.relational_q import (
    money_sum,
    sql_money_sum,
)


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- TPC-H Q6 shape: forecast revenue change (scan → tight filter → 1-row agg) ----

def q_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue that would have been gained by eliminating small discounts in
    one year. The whole predicate (date range + discount band + quantity
    cap) pushes into the parquet scan; the aggregate is a single partial+
    final hash agg with no shuffle key — the cheapest possible plan shape,
    and the canonical pushdown litmus test."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_FORECAST_REVENUE = f"""
SELECT {sql_money_sum('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- TPC-H Q15 shape: top supplier (scalar subquery over an aggregated view) ------

def q_top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the maximum. The revenue
    view aggregates once (one shuffle on l_suppkey); the global max is a
    1-row broadcast joined back — no second scan of lineitem, no global
    sort. Ties all surface, exactly like the SQL scalar-subquery form."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_TOP_SUPPLIER_REVENUE = f"""
WITH rev AS (
  SELECT l_suppkey, {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --- TPC-H Q17 shape: small-quantity-order revenue (correlated per-group avg) -----

def q_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Average yearly revenue lost if small orders (below 20 % of the
    part's average quantity) were not filled. The correlated scalar
    subquery decorrelates to a per-part aggregate joined back to the fact —
    the same rewrite Catalyst applies to the SQL form; expressing it as the
    explicit agg-join keeps the plan visible. Because the correlation key
    is the part key, the per-part average only needs lineitem rows whose
    partkey survives the Brand#13 filter — so lineitem is semi-joined to
    the filtered part list FIRST, and the avg aggregates ~4 % of the fact
    instead of all of it. No broadcast hint anywhere: part (and the pruned
    per-part agg) scale with SF, so AQE owns the join strategy.

    Determinism note: quantities are integer-valued doubles, so the avg's
    numerator sum is exact in any order — the 0.2×avg threshold compare
    cannot flip across engines/partitionings."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    pruned = li.join(part, li.l_partkey == part.p_partkey, "left_semi")
    per_part = pruned.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    small = (
        pruned.join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return small.agg(
        F.round(money_sum(F.col("l_extendedprice")) / 7.0, 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


SQL_SMALL_QUANTITY_REVENUE = f"""
SELECT round({sql_money_sum('l_extendedprice')} / 7.0, 2) AS avg_yearly,
       count(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
WHERE l.l_quantity < 0.2 * (
  SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


# --- TPC-H Q2 shape: cheapest supplier per part (argmin with dim lookups) ---------

def q_cheapest_supplier_per_part(spark: SparkSession, sf: str) -> DataFrame:
    """For each small part, the supplier offering the lowest observed unit
    price (testdata has no partsupp table — the offer book derives from
    lineitem history, grouped to (part, supplier) min unit price). The
    argmin is a per-part window over the pre-aggregated offers (cardinality
    = part×supplier pairs, far below lineitem), never a global sort; ties
    break on suppkey so the row_number pick is total-order deterministic.
    Unit prices compare as integer cents — bit-identical across engines."""
    li = _t(spark, sf, "lineitem")
    part = (
        _t(spark, sf, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_name")
    )
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast(
                "bigint"
            )
        ).alias("price_cents")
    )
    w = Window.partitionBy("l_partkey").orderBy("price_cents", "l_suppkey")
    best = (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            (F.col("price_cents") / 100.0).alias("best_price"),
        )
    )


SQL_CHEAPEST_SUPPLIER_PER_PART = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS price_cents
  FROM lineitem
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, l_suppkey, price_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY price_cents, l_suppkey) AS rn
  FROM offers
)
SELECT p_partkey, p_name, s_suppkey, s_name,
       n_name AS supp_nation, price_cents / 100.0 AS best_price
FROM best
JOIN part ON p_partkey = l_partkey AND p_size <= 10
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE rn = 1
"""


# --- TPC-H Q8 shape: national market share (conditional-aggregate ratio) ----------

def q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """NATION_9's share of revenue delivered to ASIA customers, per order
    year. Numerator and denominator are one pass over the same joined
    rows (a conditional aggregate, not two scans); both are exact cent
    sums, so the share is a deterministic division rounded to 6."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region")
    asia_nations = (
        nation.join(
            region,
            (nation.n_regionkey == region.r_regionkey) & (region.r_name == "ASIA"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_nations), cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_9", cents).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("_num"),
            F.sum(cents).alias("_den"),
        )
        .select(
            "o_year",
            F.round(F.col("_num") / F.col("_den"), 6).alias("mkt_share"),
            (F.col("_den") / 100.0).alias("total_revenue"),
        )
    )


SQL_MARKET_SHARE = """
WITH joined AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         n2.n_name AS supp_nation,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN cents ELSE 0 END) AS DOUBLE)
             / sum(cents), 6) AS mkt_share,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS total_revenue
FROM joined
GROUP BY 1
"""


# --- TPC-H Q16 shape: supplier counts with an exclusion list ----------------------

def q_brand_supplier_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct suppliers able to supply each (brand, type, size) of
    selected parts, excluding flagged suppliers (negative account balance —
    the testdata's stand-in for Q16's complaints predicate). The offer
    pairs pre-aggregate via distinct before joining dims; the exclusion is
    an anti join (NOT IN with non-null keys ≡ anti). Supplier and part
    grow with SF, so neither carries a broadcast hint — AQE decides."""
    li = _t(spark, sf, "lineitem")
    part = (
        _t(spark, sf, "part")
        .filter(
            (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 14, 23, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            flagged,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_BRAND_SUPPLIER_COUNTS = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


QUERIES = {
    "forecast_revenue": (q_forecast_revenue, SQL_FORECAST_REVENUE),
    "top_supplier_revenue": (q_top_supplier_revenue, SQL_TOP_SUPPLIER_REVENUE),
    "small_quantity_revenue": (q_small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE),
    "cheapest_supplier_per_part": (
        q_cheapest_supplier_per_part,
        SQL_CHEAPEST_SUPPLIER_PER_PART,
    ),
    "market_share": (q_market_share, SQL_MARKET_SHARE),
    "brand_supplier_counts": (q_brand_supplier_counts, SQL_BRAND_SUPPLIER_COUNTS),
}
