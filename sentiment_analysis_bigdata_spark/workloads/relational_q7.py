"""Relational coverage, batch 7: the last four classic TPC-H plan shapes —
Q9 (multi-dim profit rollup by nation × year), Q11 (group value vs a
global-total scalar threshold), Q12 (conditional two-way priority counts),
Q21 (multi-supplier order correlation: "the only supplier who failed") —
adapted to the testdata schema (no partsupp / l_shipmode / l_commitdate
columns exist, so the stand-ins are documented per query), each with a
DuckDB oracle twin.

Scale notes: dimensions (part 2 k, supplier 100, nation 25) broadcast;
fact-fact joins (lineitem→orders) stay AQE-planned shuffle joins; Q21's
correlated double-EXISTS decorrelates into ONE pass over lineitem + a
per-(order, supplier) aggregate — never a second fact scan. Money sums use
the integer-cents convention (order-independent, cross-engine exact).

Reference parity: the reference has no relational surface (SURVEY §2.5);
these complete the TPC-H shape inventory started in relational_q*.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- TPC-H Q9 shape: profit by supplier nation × order year ----------------------

def q_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """Profit on 'widget' parts per supplier nation per order year.

    Q9's ps_supplycost has no testdata counterpart; cost is proxied as
    60 % of the part's retail price × quantity (a fixed margin rule — the
    join/agg shape is identical). part and supplier→nation broadcast; the
    only shuffles are lineitem→orders (AQE) and the final (nation, year)
    aggregation. Profit rounds to cents per row before summing, so the sum
    is order-independent and bit-exact across engines."""
    li = _t(spark, sf, "lineitem")
    part = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("bigint")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (F.sum(profit_cents) / 100.0).alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_PROFIT_BY_NATION_YEAR = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       sum(CAST(round((l_extendedprice * (1 - l_discount)
                       - 0.6 * p_retailprice * l_quantity) * 100) AS BIGINT)) / 100.0
         AS profit,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


# --- TPC-H Q11 shape: high-value parts vs a global scalar threshold --------------

def q_important_part_values(spark: SparkSession, sf: str) -> DataFrame:
    """Parts whose traded value exceeds 0.05 % of total traded value
    (Q11's partsupp value book derives from lineitem history here). One
    aggregation by part (single shuffle); the global total re-aggregates
    the PER-PART frame (2 k rows, not lineitem) and broadcasts back as a
    1-row cross join — the decorrelated form of Q11's HAVING scalar
    subquery, with no second fact scan."""
    li = _t(spark, sf, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("_total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > 0.0005 * F.col("_total_cents"))
        .select(
            "l_partkey",
            (F.col("value_cents") / 100.0).alias("value"),
            F.round(F.col("value_cents") / F.col("_total_cents"), 6).alias(
                "value_share"
            ),
        )
    )


SQL_IMPORTANT_PART_VALUES = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem GROUP BY 1
),
total AS (SELECT sum(value_cents) AS total_cents FROM per_part)
SELECT l_partkey,
       value_cents / 100.0 AS value,
       round(CAST(value_cents AS DOUBLE) / total_cents, 6) AS value_share
FROM per_part, total
WHERE value_cents > 0.0005 * total_cents
"""


# --- TPC-H Q12 shape: conditional priority counts per return flag ----------------

def q_returnflag_priority_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Lines per return flag split into critical- vs normal-priority order
    counts (Q12's l_shipmode has no testdata counterpart; l_returnflag is
    the grouping stand-in — the conditional-aggregate shape is identical).
    The date filter pushes into the lineitem scan; orders joins shuffle-
    side (fact-sized, grows with SF — AQE picks the strategy); one final
    3-group aggregation."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(critical.cast("bigint")).alias("high_line_count"),
            F.sum((~critical).cast("bigint")).alias("low_line_count"),
        )
    )


SQL_RETURNFLAG_PRIORITY_COUNTS = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
GROUP BY 1
"""


# --- TPC-H Q21 shape: the only supplier whose line was returned -------------------

def q_sole_returned_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Per supplier: on how many finished multi-supplier orders was THIS
    supplier the only one whose line came back returned ('R')? Q21's
    receipt-after-commit lateness has no testdata counterpart; the return
    flag is the failure stand-in — the correlation shape (EXISTS another
    supplier, NOT EXISTS another failing supplier) is identical.

    The double correlated EXISTS decorrelates into ONE aggregate over
    (order, supplier) — n_suppliers and n_returned_suppliers per order are
    window-free group counts over a frame already reduced from lineitem to
    distinct (order, supplier) pairs; candidates then filter on
    n_supp >= 2 AND n_ret = 1. lineitem is scanned exactly once."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("returned"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("returned").alias("n_ret"),
    )
    sole = (
        per_pair.filter(F.col("returned") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    )
    return (
        sole.join(supp, sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_SOLE_RETURNED_SUPPLIER = """
WITH per_pair AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(returned) AS n_ret
  FROM per_pair GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_pair
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE per_pair.returned = 1 AND n_supp >= 2 AND n_ret = 1
GROUP BY 1, 2
"""


QUERIES = {
    "profit_by_nation_year": (q_profit_by_nation_year, SQL_PROFIT_BY_NATION_YEAR),
    "important_part_values": (q_important_part_values, SQL_IMPORTANT_PART_VALUES),
    "returnflag_priority_counts": (
        q_returnflag_priority_counts,
        SQL_RETURNFLAG_PRIORITY_COUNTS,
    ),
    "sole_returned_supplier": (q_sole_returned_supplier, SQL_SOLE_RETURNED_SUPPLIER),
}
