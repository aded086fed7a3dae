"""Wrapper-overhead check against BASELINE.md's criterion: the engine's
operator wrappers must add no material overhead (<2×) over direct
hand-written PySpark DataFrame code on the same data.

For each sampled query this times (a) the engine's ``queries()`` entry and
(b) an inline, hand-written plain-PySpark equivalent of the same semantics,
alternating A/B/A/B within one warmed JVM so codegen/compile cost is paid
once per plan shape and the comparison is steady-state. Prints one JSON
line: {"pairs": {name: {"engine": s, "plain": s, "ratio": r}},
"max_ratio": r}.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_overhead.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3


def plain_pricing_summary(spark, sf):
    # identical semantics to workloads.relational_q.q_pricing_summary —
    # same filter, same 8 aggregates, same integer-cents rounding; anything
    # less and the ratio measures missing work, not wrapper overhead
    from pyspark.sql import functions as F

    def money(expr):
        return F.sum(F.round(expr * 100).cast("bigint")) / 100.0

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(money(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(money(disc), 2).alias("sum_disc_price"),
            F.round(money(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def plain_region_revenue(spark, sf):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    geo = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(geo, orders.o_custkey == geo.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.round(rev * 100).cast("bigint")) / 100.0, 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def plain_token_topk_nostop(spark, sf):
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark.functions.text import ENGLISH_STOPWORDS

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    stop = spark.createDataFrame([(w,) for w in ENGLISH_STOPWORDS], "token string")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token")
    )
    return (
        toks.join(F.broadcast(stop), "token", "left_anti")
        .groupBy("token")
        .count()
        .orderBy(F.col("count").desc(), F.col("token").asc())
        .limit(20)
    )


def plain_top_orders_per_customer(spark, sf):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def plain_bm25_search(spark, sf):
    # identical semantics to workloads.affinity_q.q_bm25_search (Lucene-form
    # idf, k1=1.2 b=0.75, query = distinct first-5 tokens of doc_id < 3,
    # top-10 per query with (score desc, doc asc) tie-break)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k1, b = 1.2, 0.75
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    tf = (
        docs.select(F.col("doc_id").alias("doc"), F.explode(toks).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(F.slice(toks, 1, 5))).alias("term"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfp = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        q.join(tf, "term")
        .join(dfreq, "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc", (idf * tfp).alias("p"))
        .groupBy("query_id", "doc")
        .agg(F.sum("p").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id", "doc", F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def plain_bloom_contamination(spark, sf):
    # identical semantics to workloads.scale_q.q_bloom_contamination —
    # same tokenization, 3-grams, md5 positions, one-pass two-flag agg,
    # same localCheckpoint staging
    from pyspark.sql import functions as F

    M, K = 8192, 3
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
    tk = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    docs = docs.select("doc_id", tk.alias("tk"))
    grams3 = F.when(
        F.size("tk") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - F.lit(2)),
            lambda i: F.array_join(F.slice(F.col("tk"), i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(grams3)).alias("gram")
        )
        .localCheckpoint(eager=False)
    )
    bench = grams.filter(F.col("doc_id") < 25).select("gram").distinct()
    corpus = grams.filter(F.col("doc_id") >= 25)

    def positions(df):
        e = df.select(
            "gram", F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("i")
        )
        pos = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("gram"), F.col("i").cast("string"),
                            F.lit("0"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("bigint"),
            F.lit(M),
        )
        return e.select("gram", pos.alias("pos"))

    sketch = positions(bench).select("pos").distinct()
    probes = positions(corpus.select("gram").distinct())
    hits = probes.join(sketch, "pos", "left_semi")
    member = (
        probes.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_pos"))
        .join(
            hits.groupBy("gram").agg(F.count(F.lit(1)).alias("n_hit")),
            "gram", "left",
        )
        .select(
            "gram",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos")).alias(
                "bloom_member"
            ),
        )
    )
    flagged = corpus.join(member, "gram").join(
        bench.withColumn("__in_bench", F.lit(1)), "gram", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(F.col("bloom_member").cast("long")).alias("n_bloom_grams"),
            F.sum(
                F.when(F.col("__in_bench").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_exact_grams"),
        )
        .filter(F.col("n_bloom_grams") >= 2)
        .select(
            "doc_id", "n_bloom_grams", "n_exact_grams",
            (F.col("n_bloom_grams") >= F.col("n_exact_grams")).alias(
                "no_false_negative"
            ),
            (F.col("n_exact_grams") == 0).alias("false_alarm"),
        )
    )


PAIRS = {
    "pricing_summary": plain_pricing_summary,
    "region_revenue": plain_region_revenue,
    "token_topk_nostop": plain_token_topk_nostop,
    "top_orders_per_customer": plain_top_orders_per_customer,
    "bm25_search": plain_bm25_search,
    "bloom_contamination": plain_bloom_contamination,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from sentiment_analysis_bigdata_spark import get_spark

    spark = get_spark("bench-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # noop sink materializes every output column on both sides (count(1)
    # would let Catalyst prune projections and hollow out both timings)
    def run(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name, plain_fn in PAIRS.items():
        # warm both plan shapes once (codegen compile), then time alternating
        run(qs[name](spark, sf_dir))
        run(plain_fn(spark, sf_dir))
        eng = plain = 0.0
        for _ in range(REPEATS):
            t0 = time.time()
            run(qs[name](spark, sf_dir))
            eng += time.time() - t0
            t0 = time.time()
            run(plain_fn(spark, sf_dir))
            plain += time.time() - t0
        ratio = eng / plain if plain > 0 else float("inf")
        out[name] = {
            "engine": round(eng / REPEATS, 3),
            "plain": round(plain / REPEATS, 3),
            "ratio": round(ratio, 3),
        }
        print(f"  {name}: engine {out[name]['engine']}s plain {out[name]['plain']}s "
              f"ratio {out[name]['ratio']}", file=sys.stderr)

    print(json.dumps({"pairs": out, "max_ratio": max(p["ratio"] for p in out.values())}))
    spark.stop()


if __name__ == "__main__":
    main()
