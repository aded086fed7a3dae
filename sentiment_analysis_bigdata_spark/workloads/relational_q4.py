"""Relational coverage, batch 4: TPC-H Q13/Q22 shapes, ranking-fraction
windows, and UNPIVOT — with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.workloads.relational_q import money_sum, sql_money_sum


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --- TPC-H Q13 shape: distribution of per-customer order counts -------------------

def q_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + double aggregation (TPC-H Q13): count orders per
    customer INCLUDING zero-order customers, then histogram the counts.
    The outer join keeps the zero bucket honest — an inner join would
    silently drop customers with no orders."""
    cust = _t(spark, sf, "customer").select("c_custkey")
    orders = _t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_ORDER_COUNT_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q22 shape: above-average balance, no orders ----------------------------

BIG_ORDER = 400_000.0


def q_rich_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery + filtered anti join (TPC-H Q22 shape): customers
    whose balance beats the positive-balance average but who never placed a
    high-value (> 400k) order. The average decorrelates to one tiny
    aggregate pulled to the driver and folded into the filter; the
    NOT EXISTS is a left anti join whose right side is pre-filtered —
    at scale the filter shrinks the anti-join build input before the
    shuffle, not after."""
    cust = _t(spark, sf, "customer")
    big_orders = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > BIG_ORDER)
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("v"))
    threshold = avg_bal.first()["v"]
    return (
        cust.filter(F.col("c_acctbal") > threshold)
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(money_sum(F.col("c_acctbal")), 2).alias("totacctbal"),
        )
    )


SQL_RICH_IDLE_CUSTOMERS = f"""
SELECT c_mktsegment, count(*) AS numcust,
       round({sql_money_sum('c_acctbal')}, 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {BIG_ORDER})
GROUP BY c_mktsegment
"""


# --- ranking fractions: percent_rank / cume_dist ----------------------------------

def q_percent_rank_cume(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank + cume_dist over order totals within each status —
    the normalized ranking family (rank_dense_ntile covers the integer
    one).

    Order status is a 3-value ENUM, so
    ``percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY …)``
    serializes a third of the corpus through one window task at 100 TB
    (VERDICT r11 #4 defect class — partitioned, but by a key whose
    groups scale with the data). The in-group position comes from
    ``operators/ordering.banded_grouped_ordinal`` instead — (status,
    band)-partitioned row_number over uniform ~n/n_bands fractions, with
    literal offset/total maps — and both normalized ranks are closed
    forms of (position, N): the composite order (o_totalprice,
    o_orderkey) is UNIQUE, so rank ≡ row_number, percent_rank =
    (pos−1)/(N−1) and cume_dist = pos/N. The oracle keeps the naive
    status-partitioned windows — same values, two shapes."""
    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_grouped_ordinal,
    )

    orders = _t(spark, sf, "orders")
    pos = banded_grouped_ordinal(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ["o_orderstatus"],
        "o_totalprice",
        "o_orderkey",
    )
    p, n = F.col("pos"), F.col("n_in_group")
    pct = F.when(n > 1, (p - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0))
    return pos.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(p.cast("double") / n, 6).alias("cume"),
    ).filter(F.col("pct_rank") >= 0.99)


SQL_PERCENT_RANK_CUME = """
SELECT o_orderkey, o_orderstatus,
       round(o_totalprice, 2) AS o_totalprice, pct_rank, cume
FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         round(percent_rank() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
         round(cume_dist() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey), 6) AS cume
  FROM orders
)
WHERE pct_rank >= 0.99
"""


# --- UNPIVOT / melt ----------------------------------------------------------------

def q_unpivot_lineitem_amounts(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long unpivot: each lineitem's three money columns become
    (measure, amount) rows — ``DataFrame.unpivot`` (STACK in SQL), the
    inverse of pivot. Narrow, no shuffle; aggregated per measure after."""
    li = _t(spark, sf, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(money_sum(F.col("amount")), 2).alias("total"),
    )


SQL_UNPIVOT_LINEITEM_AMOUNTS = f"""
WITH long AS (
  SELECT l_orderkey, l_linenumber, measure, amount
  FROM lineitem
  UNPIVOT (amount FOR measure IN (l_extendedprice, l_discount, l_tax))
)
SELECT measure, count(*) AS n, round({sql_money_sum('amount')}, 2) AS total
FROM long
GROUP BY measure
"""


# --- direct SQL interface ----------------------------------------------------------

SQL_TOP_NATIONS = """
SELECT n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY cents DESC, n_name
LIMIT 10
"""


def q_sql_interface(spark: SparkSession, sf: str) -> DataFrame:
    """The engine's SQL entry point: tables registered as temp views, the
    query given as a LITERAL ANSI-SQL string to ``spark.sql`` — proving a
    reference user can bring raw SQL, not just the DataFrame API. The exact
    same string runs on DuckDB as the oracle (dialect-portable subset)."""
    for t in ("orders", "customer", "nation"):
        _t(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(SQL_TOP_NATIONS)


QUERIES = {
    "order_count_distribution": (
        q_order_count_distribution,
        SQL_ORDER_COUNT_DISTRIBUTION,
    ),
    "sql_interface": (q_sql_interface, SQL_TOP_NATIONS),
    "rich_idle_customers": (q_rich_idle_customers, SQL_RICH_IDLE_CUSTOMERS),
    "percent_rank_cume": (q_percent_rank_cume, SQL_PERCENT_RANK_CUME),
    "unpivot_lineitem_amounts": (
        q_unpivot_lineitem_amounts,
        SQL_UNPIVOT_LINEITEM_AMOUNTS,
    ),
}
