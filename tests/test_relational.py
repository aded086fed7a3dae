"""Relational-operator tests + physical-plan assertions (the 'is this the
plan I'd want at 100 TB' checks: broadcast joins, pushdown, pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import relational as R
from sentiment_analysis_bigdata_spark.operators.asof import asof_join
from sentiment_analysis_bigdata_spark.plans import explain
from sentiment_analysis_bigdata_spark.sources import load_table


def test_join_types(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (3, "y"), (4, "z")], "k int, w string")
    assert R.join(left, right, "k").count() == 2
    assert R.join(left, right, "k", how="left").count() == 3
    assert R.join(left, right, "k", how="full").count() == 4
    assert sorted(r["k"] for r in R.semi_join(left, right, "k").collect()) == [1, 3]
    assert [r["k"] for r in R.anti_join(left, right, "k").collect()] == [2]


def test_broadcast_join_plan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    j = R.join(li, supp, F.col("l_suppkey") == F.col("s_suppkey"), broadcast_right=True)
    assert explain.has_broadcast_join(j)
    assert not explain.has_sort_merge_join(j)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    pushed = explain.pushed_filters(q)
    assert "l_quantity" in pushed, pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    rs = explain.read_schema(q)
    assert "l_orderkey" in rs and "l_extendedprice" not in rs, rs


def test_global_topk_avoids_total_sort(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    q = R.top_k(orders, [F.col("o_totalprice").desc()], 5)
    assert "TakeOrderedAndProject" in explain.formatted_plan(q)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9)], "g string, x int"
    )
    out = R.top_k_per_group(df, ["g"], [F.col("x").desc()], 2)
    got = sorted((r["g"], r["x"]) for r in out.collect())
    assert got == [("a", 3), ("a", 5), ("b", 9)]


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x int")
    assert R.union_all(a, b).count() == 7
    assert sorted(r["x"] for r in R.intersect(a, b).collect()) == [2, 3]
    assert sorted(r["x"] for r in R.except_(a, b).collect()) == [1]
    assert sorted(r["x"] for r in R.except_(a, b, keep_duplicates=True).collect()) == [1, 2]


def test_rollup_and_cube(spark):
    df = spark.createDataFrame(
        [("r1", "n1", 1), ("r1", "n2", 2), ("r2", "n3", 3)], "r string, n string, x int"
    )
    roll = R.rollup_agg(df, ["r", "n"], F.sum("x").alias("s"))
    assert roll.count() == 3 + 2 + 1  # leaves + per-r + grand total
    cube = R.cube_agg(df, ["r", "n"], F.sum("x").alias("s"))
    assert cube.count() == 3 + 2 + 3 + 1  # + per-n slices


def test_case_when(spark):
    df = spark.createDataFrame([(5,), (50,), (500,)], "x int")
    band = R.case_when(
        [(F.col("x") < 10, F.lit("s")), (F.col("x") < 100, F.lit("m"))], F.lit("l")
    )
    assert [r["b"] for r in df.select(band.alias("b")).collect()] == ["s", "m", "l"]


def test_random_split_invariants(spark, sf_dir):
    """SURVEY §7.2: splits checked by invariants, not value hashes."""
    orders = load_table(spark, sf_dir, "orders")
    train, test = R.random_split(orders, [0.8, 0.2], seed=42)
    n, tr, te = orders.count(), train.count(), test.count()
    assert tr + te == n
    assert 0.7 < tr / n < 0.9
    # determinism: same seed → same split
    tr2, _ = R.random_split(orders, [0.8, 0.2], seed=42)
    assert tr2.count() == tr
    assert tr2.subtract(train).count() == 0


def test_bernoulli_sample_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = R.bernoulli_sample(li, 0.1, seed=42)
    frac = s.count() / li.count()
    assert 0.05 < frac < 0.15


class TestAsofJoin:
    def test_backward_match_and_tolerance(self, spark):
        left = spark.createDataFrame(
            [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
            "user_id int, ts long, name string",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        right = spark.createDataFrame(
            [(1, 90, 7), (1, 200, 8), (2, 60, 9)],
            "user_id int, ts long, rid int",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        out = asof_join(left, right, "user_id", "ts", "ts", ["rid"])
        got = {r["name"]: r["rid_matched"] for r in out.collect()}
        assert got == {"p1": 7, "p2": 8, "p3": None}  # p3: right event is later

    def test_tie_matches(self, spark):
        left = spark.createDataFrame([(1, 100)], "user_id int, ts long").withColumn(
            "ts", F.timestamp_seconds("ts")
        )
        right = spark.createDataFrame([(1, 100, 5)], "user_id int, ts long, rid int").withColumn(
            "ts", F.timestamp_seconds("ts")
        )
        out = asof_join(left, right, "user_id", "ts", "ts", ["rid"])
        assert out.first()["rid_matched"] == 5

    def test_tolerance_nulls_stale_matches(self, spark):
        left = spark.createDataFrame([(1, 1000)], "user_id int, ts long").withColumn(
            "ts", F.timestamp_seconds("ts")
        )
        right = spark.createDataFrame([(1, 10, 5)], "user_id int, ts long, rid int").withColumn(
            "ts", F.timestamp_seconds("ts")
        )
        out = asof_join(left, right, "user_id", "ts", "ts", ["rid"], tolerance_seconds=60)
        assert out.first()["rid_matched"] is None


class TestTpchBatch6:
    """Plan + invariant checks for the batch-6 TPC-H shapes (values are
    oracle-checked by the driver harness; these assert the physical plans
    scale and the semantics hold on the tiny sf)."""

    def test_forecast_revenue_pushdown_no_shuffle_join(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads import relational_q6 as Q6

        df = Q6.q_forecast_revenue(spark, sf_dir)
        pushed = explain.pushed_filters(df)
        assert "l_shipdate" in pushed and "l_discount" in pushed, pushed
        assert not explain.has_sort_merge_join(df)
        assert df.first()["n_items"] >= 0

    def test_top_supplier_returns_all_ties_at_max(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads import relational_q6 as Q6

        rows = Q6.q_top_supplier_revenue(spark, sf_dir).collect()
        assert len(rows) >= 1
        assert len({r["total_revenue"] for r in rows}) == 1

    def test_cheapest_supplier_unique_per_part(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads import relational_q6 as Q6

        df = Q6.q_cheapest_supplier_per_part(spark, sf_dir)
        # argmin windows over the pre-aggregated offer book, never lineitem
        assert "TakeOrderedAndProject" not in explain.formatted_plan(df)
        parts = [r["p_partkey"] for r in df.collect()]
        assert len(parts) == len(set(parts))

    def test_market_share_is_a_ratio(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads import relational_q6 as Q6

        df = Q6.q_market_share(spark, sf_dir)
        assert explain.has_broadcast_join(df)
        for r in df.collect():
            assert 0.0 <= r["mkt_share"] <= 1.0
            assert r["total_revenue"] > 0

    def test_brand_supplier_counts_excludes_flagged(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads import relational_q6 as Q6

        df = Q6.q_brand_supplier_counts(spark, sf_dir)
        plan = explain.formatted_plan(df)
        assert "BroadcastHashJoin" in plan
        n_supp = load_table(spark, sf_dir, "supplier").count()
        for r in df.collect():
            assert 0 < r["supplier_cnt"] <= n_supp


class TestFunnelStages:
    def test_stages_are_strictly_sequential(self, spark):
        from datetime import datetime

        from sentiment_analysis_bigdata_spark.operators.funnel import funnel_stages

        rows = [
            # user 1 completes the funnel in order
            (1, "signup", datetime(2024, 1, 1, 0)),
            (1, "click", datetime(2024, 1, 1, 1)),
            (1, "purchase", datetime(2024, 1, 1, 2)),
            # user 2's purchase precedes its click -> stage 3 not reached
            (2, "signup", datetime(2024, 1, 1, 0)),
            (2, "purchase", datetime(2024, 1, 1, 1)),
            (2, "click", datetime(2024, 1, 1, 2)),
            # user 3 never signs up -> nothing counts
            (3, "click", datetime(2024, 1, 1, 0)),
            (3, "purchase", datetime(2024, 1, 1, 1)),
        ]
        ev = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
        out = {
            r["user_id"]: r["stages_completed"]
            for r in funnel_stages(ev, ["signup", "click", "purchase"]).collect()
        }
        assert out == {1: 3, 2: 2, 3: 0}

    def test_single_shuffle_plan(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.operators.funnel import funnel_stages

        ev = load_table(spark, sf_dir, "events")
        df = funnel_stages(ev, ["signup", "click", "purchase"])
        # all stage windows + the final collapse share one hash partitioning
        assert explain.num_shuffles(df) == 1
