"""Tests for the warehouse/curation batch-2 operators: SCD2, runtime
min/max join filtering, winsorization/robust scaling, HTML stripping."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions.text import strip_html
from sentiment_analysis_bigdata_spark.operators import normalize, runtime_filter, scd


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestScd2:
    def _changes(self, spark):
        rows = [
            Row(k=1, state="a", ts=_ts("2024-01-01T00:00:00"), i=1),
            Row(k=1, state="a", ts=_ts("2024-01-02T00:00:00"), i=2),  # no change
            Row(k=1, state="b", ts=_ts("2024-01-03T00:00:00"), i=3),  # change
            Row(k=1, state="a", ts=_ts("2024-01-04T00:00:00"), i=4),  # back to a
            Row(k=2, state="x", ts=_ts("2024-01-01T00:00:00"), i=5),
            Row(k=2, state=None, ts=_ts("2024-01-02T00:00:00"), i=6),  # → null
            Row(k=2, state=None, ts=_ts("2024-01-03T00:00:00"), i=7),  # no change
        ]
        return spark.createDataFrame(rows)

    def test_intervals(self, spark):
        hist = scd.scd2_history(
            self._changes(spark), ["k"], ["state"], "ts", tiebreak_col="i"
        ).collect()
        by_key = {}
        for r in hist:
            by_key.setdefault(r.k, []).append(r)
        k1 = sorted(by_key[1], key=lambda r: r.valid_from)
        assert [(r.state, r.is_current) for r in k1] == [
            ("a", False),
            ("b", False),
            ("a", True),
        ]
        # intervals chain: valid_to of run i == valid_from of run i+1
        assert k1[0].valid_to == k1[1].valid_from
        assert k1[1].valid_to == k1[2].valid_from
        assert k1[2].valid_to is None
        # null attribute states form their own run (null-safe comparison)
        k2 = sorted(by_key[2], key=lambda r: r.valid_from)
        assert [(r.state, r.is_current) for r in k2] == [("x", False), (None, True)]

    def test_tiebreak_same_timestamp(self, spark):
        t = _ts("2024-01-01T00:00:00")
        df = spark.createDataFrame(
            [Row(k=1, state="a", ts=t, i=2), Row(k=1, state="b", ts=t, i=1)]
        )
        hist = sorted(
            scd.scd2_history(df, ["k"], ["state"], "ts", tiebreak_col="i").collect(),
            key=lambda r: r.i if hasattr(r, "i") else 0,
        )
        # order by (ts, i): b (i=1) then a (i=2) → b closed, a current
        states = {(r.state, r.is_current) for r in hist}
        assert states == {("b", False), ("a", True)}

    def test_asof_state_lookup(self, spark):
        hist = scd.scd2_history(
            self._changes(spark), ["k"], ["state"], "ts", tiebreak_col="i"
        )
        probes = spark.createDataFrame(
            [
                Row(k=1, ts=_ts("2024-01-02T12:00:00")),  # inside run 'a'
                Row(k=1, ts=_ts("2024-01-03T00:00:00")),  # boundary → 'b'
                Row(k=1, ts=_ts("2025-01-01T00:00:00")),  # open interval → 'a'
                Row(k=3, ts=_ts("2024-01-01T00:00:00")),  # unknown key → null
            ]
        )
        got = {
            (r.k, r.ts): r.state
            for r in scd.asof_state(hist, probes, ["k"], "ts").collect()
        }
        assert got[(1, _ts("2024-01-02T12:00:00"))] == "a"
        assert got[(1, _ts("2024-01-03T00:00:00"))] == "b"
        assert got[(1, _ts("2025-01-01T00:00:00"))] == "a"
        assert got[(3, _ts("2024-01-01T00:00:00"))] is None


class TestRuntimeFilteredJoin:
    def test_equals_plain_join(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)
        fast = runtime_filter.runtime_filtered_join(li, supp, "l_suppkey", "s_suppkey")
        plain = li.join(supp, li.l_suppkey == supp.s_suppkey)
        assert fast.count() == plain.count()

    def test_empty_dim_short_circuits(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier").filter(F.lit(False))
        assert (
            runtime_filter.runtime_filtered_join(
                li, supp, "l_suppkey", "s_suppkey"
            ).count()
            == 0
        )

    def test_non_inner_join_raises(self, spark, sf_dir):
        # The fact-side pre-prune drops unmatched fact rows, which is only
        # a semantic no-op for inner/left_semi — anything else must raise.
        from sentiment_analysis_bigdata_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier")
        for how in ("left", "left_outer", "full", "right"):
            with pytest.raises(ValueError, match="inner/left_semi"):
                runtime_filter.runtime_filtered_join(
                    li, supp, "l_suppkey", "s_suppkey", how=how
                )

    def test_left_semi_allowed(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)
        fast = runtime_filter.runtime_filtered_join(
            li, supp, "l_suppkey", "s_suppkey", how="left_semi"
        )
        plain = li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
        assert fast.count() == plain.count()

    def test_bound_filter_reaches_scan(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)
        plan = runtime_filter.runtime_filtered_join(
            li, supp, "l_suppkey", "s_suppkey"
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(l_suppkey), GreaterThanOrEqual(l_suppkey" in plan


class TestNormalize:
    def _df(self, spark):
        # group a: 1..100 (clear p05/p95 clip); group b: constant (IQR 0)
        rows = [Row(g="a", v=float(i)) for i in range(1, 101)]
        rows += [Row(g="b", v=5.0)] * 10
        return spark.createDataFrame(rows)

    def test_winsorize_bounds(self, spark):
        out = normalize.winsorize(self._df(spark), "v", ["g"], 0.05, 0.95)
        a = out.filter(F.col("g") == "a")
        stats = a.agg(
            F.min("v_wins").alias("lo"),
            F.max("v_wins").alias("hi"),
            F.sum(F.col("v_clipped").cast("int")).alias("nc"),
        ).first()
        # p05 of 1..100 = 5.95, p95 = 95.05 (linear interpolation)
        assert stats.lo == pytest.approx(5.95)
        assert stats.hi == pytest.approx(95.05)
        assert stats.nc == 10  # 1..5 and 96..100
        # unclipped values unchanged
        mid = a.filter((F.col("v") >= 6) & (F.col("v") <= 95))
        assert mid.filter(F.col("v_wins") != F.col("v")).count() == 0

    def test_robust_scale(self, spark):
        out = normalize.robust_scale(self._df(spark), "v", ["g"])
        a_med = (
            out.filter((F.col("g") == "a") & (F.col("v") == 50.5)).count()
        )  # no exact-median row; check z at v=75.25 instead
        z = (
            out.filter((F.col("g") == "a") & (F.col("v") == 75.0))
            .select("v_scaled")
            .first()
            .v_scaled
        )
        # median 50.5, IQR = 75.25 - 25.75 = 49.5 → z(75) = 24.5/49.5
        assert z == pytest.approx(24.5 / 49.5)
        # zero-IQR group → null z
        assert (
            out.filter(F.col("g") == "b").filter(F.col("v_scaled").isNotNull()).count()
            == 0
        )


class TestStripHtml:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("<p>hello <b>world</b></p>", "hello world"),
            ("<script>var x = '<p>';</script>text", "text"),
            ("<SCRIPT>ignore</SCRIPT>kept", "kept"),
            ("<style>.a { color: red; }</style>body", "body"),
            ("<!-- note -->visible", "visible"),
            ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g", "a & b <c> \"d\" 'e' f g"),
            # double-escaped entities decode ONE level (&amp; runs last)
            ("&amp;lt;tag&amp;gt; &amp;amp;", "&lt;tag&gt; &amp;"),
            ("multi\n\nline\ttext", "multi line text"),
            ("no markup at all", "no markup at all"),
            ("<div\nclass='x'>split tag</div>", "split tag"),
        ],
    )
    def test_cases(self, spark, raw, expected):
        df = spark.createDataFrame([Row(t=raw)])
        got = df.select(strip_html("t").alias("s")).first().s
        assert got == expected


class TestDrift:
    def _counts(self, spark, pairs):
        return spark.createDataFrame(pairs, "category string, n long")

    def test_identical_distributions_zero(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._counts(spark, [("x", 10), ("y", 20)])
        b = self._counts(spark, [("x", 10), ("y", 20)])
        r = drift.divergence_from_counts(a, b).first()
        assert r.kl_ab == pytest.approx(0.0, abs=1e-12)
        assert r.js_divergence == pytest.approx(0.0, abs=1e-12)
        assert r.n_categories == 2

    def test_disjoint_support_positive_and_symmetric_js(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._counts(spark, [("x", 100)])
        b = self._counts(spark, [("y", 100)])
        r = drift.divergence_from_counts(a, b).first()
        assert r.kl_ab > 1.0 and r.kl_ba > 1.0
        # JS is symmetric and bounded by ln 2
        assert 0 < r.js_divergence <= math.log(2) + 1e-9
        r2 = drift.divergence_from_counts(b, a).first()
        assert r2.js_divergence == pytest.approx(r.js_divergence)

    def test_kl_nonnegative_on_skew(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._counts(spark, [("x", 90), ("y", 10)])
        b = self._counts(spark, [("x", 50), ("y", 50)])
        r = drift.divergence_from_counts(a, b).first()
        assert r.kl_ab > 0 and r.kl_ba > 0


# --- HLL sketch rollup -----------------------------------------------------------


def test_hll_rollup_union_matches_direct_estimate(spark):
    """Per-partition sketches unioned must estimate the same set as a
    direct sketch over the union — the mergeability contract."""
    from pyspark.sql import functions as F

    df = spark.range(50_000).select(
        (F.col("id") % 9876).alias("u"), (F.col("id") % 10).alias("part")
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("est")
    ).collect()[0]["est"]
    rolled = (
        df.groupBy("part")
        .agg(F.hll_sketch_agg("u").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    exact = 9876
    assert abs(direct - exact) <= 0.05 * exact
    assert abs(rolled - exact) <= 0.05 * exact


def test_profile_table_one_pass_stats(spark):
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark.operators import profiling

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r for r in profiling.profile_table(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nonnull"] == 3
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_numeric"] == 1.0 and out["k"]["max_numeric"] == 2.0
    assert out["k"]["min_text"] is None
    assert out["s"]["n_nonnull"] == 2 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_text"] == "a" and out["s"]["max_text"] == "b"
    assert out["s"]["min_numeric"] is None
    assert out["v"]["n_nonnull"] == 2 and out["v"]["max_numeric"] == 3.5


class TestKSTwoSample:
    def _vals(self, spark, xs):
        return spark.createDataFrame([(float(x),) for x in xs], "v double")

    def test_hand_computed(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        # a = {1,2,3,4}, b = {3,4,5,6}: D peaks at x=2: F_a=0.5, F_b=0 → 0.5
        a = self._vals(spark, [1, 2, 3, 4])
        b = self._vals(spark, [3, 4, 5, 6])
        r = drift.ks_two_sample(a, b, "v").first()
        assert (r.n_a, r.n_b, r.n_support) == (4, 4, 6)
        assert r.ks_stat == pytest.approx(0.5)
        assert r.ks_scaled == pytest.approx(0.5 * math.sqrt(16 / 8))

    def test_identical_zero(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._vals(spark, [1, 1, 2, 3])
        b = self._vals(spark, [1, 1, 2, 3])
        r = drift.ks_two_sample(a, b, "v").first()
        assert r.ks_stat == pytest.approx(0.0)

    def test_disjoint_is_one(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        r = drift.ks_two_sample(
            self._vals(spark, [1, 2]), self._vals(spark, [10, 20]), "v"
        ).first()
        assert r.ks_stat == pytest.approx(1.0)

    def test_binning_bounds_support(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._vals(spark, [0.1001, 0.1002, 0.1003, 0.9])
        b = self._vals(spark, [0.1004, 0.9])
        r = drift.ks_two_sample(a, b, "v", round_digits=1).first()
        assert r.n_support == 2  # {0.1, 0.9}
        assert r.ks_stat == pytest.approx(abs(3 / 4 - 1 / 2))



class TestPsiBinned:
    def _vals(self, spark, xs):
        return spark.createDataFrame([(float(x),) for x in xs], "v double")

    def test_identical_distributions_near_zero(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        a = self._vals(spark, range(100))
        rows = drift.psi_binned(a, a, "v", n_bins=5).collect()
        assert len(rows) == 5
        assert sum(r.contrib for r in rows) == pytest.approx(0.0, abs=1e-12)
        assert sum(r.n_ref for r in rows) == 100

    def test_empty_bins_participate_via_smoothing(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        # current mass sits entirely above the reference support: the low
        # reference bins are EMPTY on the current side but still contribute.
        ref = self._vals(spark, range(100))
        cur = self._vals(spark, [1000.0] * 40)
        rows = drift.psi_binned(ref, cur, "v", n_bins=4).collect()
        assert len(rows) == 4
        by_bin = {r.bin: r for r in rows}
        assert by_bin[0].n_cur == 0 and by_bin[0].p_cur > 0  # smoothing keeps it finite
        assert by_bin[3].n_cur == 40
        total = sum(r.contrib for r in rows)
        assert total > 0.25  # well past the "drifted" threshold
        assert all(math.isfinite(r.contrib) for r in rows)

    def test_hand_computed_two_bins(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        # ref = {1,2,3,4}: median edge = 2.5 -> bins {1,2} | {3,4} (2/2);
        # cur = {3,3,3,4}: bins 0/4. k = 0.5 smoothing, B = 2.
        ref = self._vals(spark, [1, 2, 3, 4])
        cur = self._vals(spark, [3, 3, 3, 4])
        rows = sorted(drift.psi_binned(ref, cur, "v", n_bins=2).collect())
        p0, q0 = (2 + 0.5) / 5, (0 + 0.5) / 5
        p1, q1 = (2 + 0.5) / 5, (4 + 0.5) / 5
        assert rows[0].p_ref == pytest.approx(p0) and rows[0].p_cur == pytest.approx(q0)
        assert rows[0].contrib == pytest.approx((p0 - q0) * math.log(p0 / q0))
        assert rows[1].contrib == pytest.approx((p1 - q1) * math.log(p1 / q1))

    def test_approx_edges_match_exact_here(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        # at this cardinality the KLL sketch is exact, so the 100 TB path
        # must reproduce the oracle path bin-for-bin
        ref = self._vals(spark, range(200))
        cur = self._vals(spark, range(50, 250))
        a = sorted(drift.psi_binned(ref, cur, "v", n_bins=4).collect())
        b = sorted(drift.psi_binned(ref, cur, "v", n_bins=4, exact_edges=False).collect())
        assert a == b

    def test_rejects_single_bin(self, spark):
        from sentiment_analysis_bigdata_spark.operators import drift

        with pytest.raises(ValueError):
            drift.psi_binned(self._vals(spark, [1]), self._vals(spark, [1]), "v", n_bins=1)


class TestDqChecks:
    def test_column_checks_one_pass(self, spark):
        from pyspark.sql import Row

        from sentiment_analysis_bigdata_spark.operators import dq

        df = spark.createDataFrame(
            [
                Row(id=1, price=10.0, status="O"),
                Row(id=2, price=-5.0, status="X"),
                Row(id=2, price=None, status="O"),
                Row(id=None, price=50.0, status="F"),
            ]
        )
        out = {
            r.check: (r.metric, r.violations, r.passed)
            for r in dq.column_checks(
                df,
                [
                    dq.not_null("id"),
                    dq.unique("id"),
                    dq.in_range("price", 0, 100),
                    dq.accepted_values("status", ["O", "F", "P"]),
                ],
            ).collect()
        }
        assert out["not_null:id"] == (4, 1, False)
        # 3 non-null ids, 2 distinct → 1 duplicate
        assert out["unique:id"] == (4, 1, False)
        # -5 out of range, NULL price cannot prove the constraint → 2
        assert out["range:price"] == (4, 2, False)
        assert out["accepted:status"] == (4, 1, False)

    def test_fk_check_distinct_keys(self, spark):
        from pyspark.sql import Row

        from sentiment_analysis_bigdata_spark.operators import dq

        child = spark.createDataFrame(
            [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)]
        )
        parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
        r = dq.fk_check(child, "fk", parent, "pk").collect()[0]
        # 3 distinct non-null child keys, 1 orphan (99)
        assert (r.check, r.metric, r.violations, r.passed) == ("fk:fk", 3, 1, False)

    def test_all_green_passes(self, spark):
        from pyspark.sql import Row

        from sentiment_analysis_bigdata_spark.operators import dq

        df = spark.createDataFrame([Row(id=1), Row(id=2)])
        out = dq.column_checks(df, [dq.not_null("id"), dq.unique("id")]).collect()
        assert all(r.passed and r.violations == 0 for r in out)


class TestIncrementalAgg:
    _SPECS = [
        ("n", "*", "count"),
        ("s", "v", "sum"),
        ("mn", "v", "min"),
        ("mx", "v", "max"),
    ]

    def test_merge_equals_direct(self, spark):
        from sentiment_analysis_bigdata_spark.operators import incremental

        rows = [Row(k="a", v=i) for i in range(10)] + [
            Row(k="b", v=100 + i) for i in range(5)
        ]
        df = spark.createDataFrame(rows)
        d1, d2, d3 = df.filter("v % 3 = 0"), df.filter("v % 3 = 1"), df.filter("v % 3 = 2")
        parts = [incremental.partial_agg(d, ["k"], self._SPECS) for d in (d1, d2, d3)]
        merged = {
            r.k: (r.n, r.s, r.mn, r.mx)
            for r in incremental.merge_states(["k"], self._SPECS, *parts).collect()
        }
        direct = {
            r.k: (r.n, r.s, r.mn, r.mx)
            for r in incremental.partial_agg(df, ["k"], self._SPECS).collect()
        }
        assert merged == direct

    def test_merge_order_invariant(self, spark):
        from sentiment_analysis_bigdata_spark.operators import incremental

        df = spark.createDataFrame([Row(k="a", v=1), Row(k="a", v=9), Row(k="b", v=4)])
        p1 = incremental.partial_agg(df.filter("v < 5"), ["k"], self._SPECS)
        p2 = incremental.partial_agg(df.filter("v >= 5"), ["k"], self._SPECS)
        ab = incremental.merge_states(["k"], self._SPECS, p1, p2).collect()
        ba = incremental.merge_states(["k"], self._SPECS, p2, p1).collect()
        key = lambda r: r.k
        assert sorted(map(tuple, ab), key=str) == sorted(map(tuple, ba), key=str)

    def test_finalize_avg(self, spark):
        from sentiment_analysis_bigdata_spark.operators import incremental

        df = spark.createDataFrame([Row(k="a", v=2), Row(k="a", v=4)])
        st = incremental.partial_agg(df, ["k"], self._SPECS)
        out = incremental.finalize(st, {"avg": ("s", "n")}).collect()[0]
        assert out.avg == 3.0


class TestZipfFit:
    def test_exact_zipf_slope_minus_one(self, spark):
        from sentiment_analysis_bigdata_spark.operators.profiling import zipf_fit

        # f_k = 12/k exactly for ranks 1..4 → ln f = ln 12 − ln k:
        # slope −1, r² = 1
        text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
        df = spark.createDataFrame([(text,)], "text string")
        r = zipf_fit(df, top_n=10).collect()[0]
        assert r.n_terms == 4
        assert r.slope == -1.0
        assert r.r2 == 1.0

    def test_uniform_corpus_flat_slope(self, spark):
        from sentiment_analysis_bigdata_spark.operators.profiling import zipf_fit

        df = spark.createDataFrame([("x y z w x y z w",)], "text string")
        r = zipf_fit(df, top_n=10).collect()[0]
        assert r.slope == 0.0


class TestTableDiff:
    def test_classification(self, spark):
        from sentiment_analysis_bigdata_spark.operators import incremental

        old = spark.createDataFrame(
            [Row(k=1, v=10, s="a"), Row(k=2, v=20, s="b"), Row(k=3, v=30, s="c"),
             Row(k=5, v=None, s="e")]
        )
        new = spark.createDataFrame(
            [Row(k=1, v=10, s="a"), Row(k=2, v=21, s="x"), Row(k=4, v=40, s="d"),
             Row(k=5, v=50, s="e")]
        )
        got = {
            r.k: (r.change, r.n_changed_cols)
            for r in incremental.table_diff(old, new, ["k"], ["v", "s"]).collect()
        }
        # k=1 unchanged → absent; k=2 both cols changed; k=3 removed;
        # k=4 added; k=5 NULL→50 counts as a change (null-safe compare)
        assert 1 not in got
        assert got[2] == ("changed", 2)
        assert got[3] == ("removed", 0)
        assert got[4] == ("added", 0)
        assert got[5] == ("changed", 1)

    def test_identical_snapshots_empty(self, spark):
        from sentiment_analysis_bigdata_spark.operators import incremental

        df = spark.createDataFrame([Row(k=1, v=1), Row(k=2, v=2)])
        assert incremental.table_diff(df, df, ["k"], ["v"]).isEmpty()


class TestCompactionPlan:
    def test_contiguous_packing_invariants(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            _COMPACT_TARGET,
            q_compaction_plan,
        )

        rows = q_compaction_plan(spark, sf_dir).collect()
        by_day = {}
        for r in rows:
            by_day.setdefault(r["day_num"], []).append(r)
        for day, files in by_day.items():
            ids = sorted(r["target_file"] for r in files)
            # target files are dense 0..m (contiguous-range policy)
            assert ids == list(range(len(ids)))
            # every target except possibly the last holds >= 1 file and
            # starts within budget: a file beyond target k exists only if
            # cumulative bytes crossed k * target
            total = sum(r["total_bytes"] for r in files)
            assert max(ids) <= total // _COMPACT_TARGET


class TestForecastBacktest:
    def test_window_and_ape(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_forecast_backtest,
        )

        rows = sorted(
            q_forecast_backtest(spark, sf_dir).collect(), key=lambda r: r["month"]
        )
        assert rows, "expected at least one backtest month"
        for r in rows:
            assert r["ape"] >= 0.0
        # the first three months have no full trailing window -> excluded
        months = [r["month"] for r in rows]
        assert len(set(months)) == len(months)
