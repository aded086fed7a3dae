"""Relational coverage, batch 8: the two remaining classic TPC-H plan
shapes — Q3 (segment-filtered unshipped-order top-k by revenue) and Q5
(same-nation customer/supplier revenue within a region) — adapted to the
testdata schema, each with a DuckDB oracle twin. With these, all 22 TPC-H
query shapes have an engine query + oracle.

Scale notes: Q3 filters BOTH fact inputs before the join (date predicates
push into the parquet scans) and ends in TakeOrderedAndProject — the top-10
never materializes a global sort. Q5 broadcast-hints only the bounded
frames (region, the region-filtered nation list); customer and supplier
grow with SF so they carry no hint — AQE picks broadcast-hash while they
fit autoBroadcastJoinThreshold and degrades to a shuffle join beyond it
(SCALING.md "broadcast policy"). The same-nation predicate stays a join
condition, not a post-filter, so the planner can use it for pruning.
Money sums use the integer-cents convention (order-independent,
cross-engine exact).

Reference parity: the reference has no relational surface (SURVEY §2.5);
these complete the TPC-H shape inventory (Q1-Q22) started in
relational_q*.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.sources import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


def _rev_cents():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")


# --- TPC-H Q3 shape: top unshipped BUILDING orders by revenue --------------------

def q_unshipped_order_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 orders by open revenue: BUILDING-segment customers, ordered
    before 1997-07-01, with lines still shipping after that date (Q3's
    o_shippriority has no testdata counterpart; o_orderpriority is carried
    instead — the filter/join/top-k shape is identical).

    Both date predicates push into their parquet scans BEFORE the join;
    the segment-filtered customer side is SF-scaled, so it carries no
    broadcast hint (AQE broadcasts it while it fits the threshold). The
    final top-10 is orderBy(...).limit(10) → TakeOrderedAndProject: each
    partition keeps 10 candidates and the driver merges k·p rows — no
    global sort at any scale. Ties break on o_orderkey for cross-engine
    determinism."""
    cutoff = F.lit("1997-07-01")
    cust = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", _rev_cents().alias("rev_cents"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("rev_cents") / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_UNSHIPPED_ORDER_REVENUE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
         AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_shipdate > TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- TPC-H Q5 shape: same-nation customer/supplier revenue in ASIA ---------------

def q_local_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per ASIA nation from 1996 orders where the supplier and the
    ordering customer share that nation (TPC-H Q5 verbatim shape on the
    testdata schema).

    nation semi-joins region driver-side-free (broadcast both — bounded
    frames); the same-nation constraint is expressed as c_nationkey =
    s_nationkey INSIDE the join condition so only matching pairs survive
    the probe. The only fact-fact shuffle is lineitem→orders. Customer and
    supplier grow with SF, so they carry no broadcast hint — AQE picks
    broadcast-hash while they fit the threshold and falls back to a shuffle
    join beyond it. Output is one row per qualifying nation — final agg is
    trivially small."""
    nation = _t(spark, sf, "nation")
    region = (
        _t(spark, sf, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    asia_nations = (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        _t(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_cents().alias("rev_cents")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(asia_nations),
            supp.s_nationkey == asia_nations.n_nationkey,
        )
        .groupBy("n_name")
        .agg((F.sum("rev_cents") / 100.0).alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_REVENUE = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
         AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# --- higher-order array functions -------------------------------------------------

def q_hof_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order lambda expressions over the embedding arrays:
    fold (aggregate), zip_with, exists, filter — all JVM-side, no UDF.
    Left-fold order is identical in both engines, so the float sums are
    bit-comparable (rounded anyway)."""
    emb = _t(spark, sf, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(
            F.aggregate(
                F.zip_with(e, e, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("self_dot"),
        F.exists(e, lambda x: x > 0.3).alias("has_big"),
        F.size(F.filter(e, lambda x: x < 0)).cast("bigint").alias("n_neg"),
    )


SQL_HOF_FUNCTIONS = """
SELECT vec_id,
       round(list_reduce(
         list_prepend(0.0, list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
         (a, x) -> a + x), 6) AS l1_norm,
       round(list_reduce(
         list_prepend(0.0, list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         (a, x) -> a + x), 6) AS self_dot,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.3)) > 0 AS has_big,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 0)) AS BIGINT)
         AS n_neg
FROM embeddings
"""


# --- null-safe equality join ------------------------------------------------------

def q_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """<=> (eqNullSafe) join semantics: null keys match each other instead
    of vanishing. Derived nullable key from nation; self-join pair counts
    per key value including the null group."""
    nation = _t(spark, sf, "nation").select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("n_regionkey"))
        .cast("int")
        .alias("rk"),
    )
    a = nation.select(F.col("n_nationkey").alias("ka"), F.col("rk").alias("rka"))
    b = nation.select(F.col("n_nationkey").alias("kb"), F.col("rk").alias("rkb"))
    return (
        a.join(b, a.rka.eqNullSafe(b.rkb))
        .groupBy(F.col("rka").alias("rk"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


SQL_NULL_SAFE_JOIN = """
WITH x AS (
  SELECT n_nationkey,
         CAST(CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS INTEGER)
           AS rk
  FROM nation
)
SELECT a.rk, count(*) AS n_pairs
FROM x a JOIN x b ON a.rk IS NOT DISTINCT FROM b.rk
GROUP BY 1
"""


QUERIES = {
    "unshipped_order_revenue": (
        q_unshipped_order_revenue,
        SQL_UNSHIPPED_ORDER_REVENUE,
    ),
    "local_supplier_revenue": (
        q_local_supplier_revenue,
        SQL_LOCAL_SUPPLIER_REVENUE,
    ),
    "hof_functions": (q_hof_functions, SQL_HOF_FUNCTIONS),
    "null_safe_join": (q_null_safe_join, SQL_NULL_SAFE_JOIN),
}


def q_skyline_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Börzsönyi et al. 2001 — the
    multi-objective SELECT Spark has no native operator for): parts that
    are not dominated on (retail price ↓, size ↑) — no other part is
    both cheaper-or-equal AND larger-or-equal with at least one strict
    improvement. The 2-D skyline needs NO pairwise dominance join: sort
    by (price asc, size desc), keep rows whose size strictly exceeds the
    running maximum size of all strictly-cheaper rows — one window over
    the PRICE SUPPORT, O(n log n), vs the naive O(n²) self-join. Prices
    compare as integer cents (the compaction_plan lesson) so dominance
    ties are engine-exact.

    r11: "over the PRICE SUPPORT" is now literal in the plan — a
    groupBy(price_c) collapses parts to per-price max size BEFORE the
    running-max window, so the single-partition sort sees distinct
    prices (bounded by the 2-decimal money domain, not by corpus size);
    rows join the rolled-up support back on price."""
    from pyspark.sql.window import Window

    part = load_table(spark, sf, "part").select(
        "p_partkey",
        "p_size",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("price_c"),
    )
    # support: per distinct price, the max size AT that price (the
    # same-price dominance bound) …
    support = part.groupBy("price_c").agg(F.max("p_size").alias("max_same"))
    # … plus the running max size over all STRICTLY cheaper prices:
    # order by price, range frame ending 1 cent before the current price
    w = (
        Window.orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    roll = support.withColumn("max_cheaper", F.max("max_same").over(w))
    return (
        part.join(roll, "price_c")
        .filter(
            (F.col("max_cheaper").isNull() | (F.col("p_size") > F.col("max_cheaper")))
            & (F.col("p_size") == F.col("max_same"))
        )
        .select(
            "p_partkey",
            "p_size",
            F.round(F.col("price_c") / 100.0, 2).alias("retail_price"),
        )
        .orderBy("retail_price", "p_partkey")
    )


SQL_SKYLINE_PARTS = """
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
  FROM part
),
flagged AS (
  SELECT p_partkey, p_size, price_c,
         max(p_size) OVER (ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_cheaper,
         max(p_size) OVER (PARTITION BY price_c) AS max_same
  FROM p
)
SELECT p_partkey, p_size, round(price_c / 100.0, 2) AS retail_price
FROM flagged
WHERE (max_cheaper IS NULL OR p_size > max_cheaper) AND p_size = max_same
ORDER BY retail_price, p_partkey
"""

QUERIES["skyline_parts"] = (q_skyline_parts, SQL_SKYLINE_PARTS)
