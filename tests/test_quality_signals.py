"""Tests for the round-5 quality/monitoring additions: the exact
neighborhood function (ANF), CUSUM changepoints (closed form vs the
sequential recurrence), Murphy's Brier decomposition, the Benford DQ
screen, char-entropy profiling, and boilerplate n-gram detection."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as _F


def F_ts(col):
    """Seconds-since-epoch bigint column -> timestamp."""
    return _F.timestamp_seconds(_F.col(col) if isinstance(col, str) else col)


from sentiment_analysis_bigdata_spark.operators.graph import neighborhood_function
from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
    q_brier_decomposition,
)
from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
    q_cusum_changepoints,
    q_seasonal_dow_index,
)
from sentiment_analysis_bigdata_spark.workloads.text_q import (
    q_boilerplate_ngrams,
    q_char_entropy,
)
from sentiment_analysis_bigdata_spark.workloads.warehouse_q import q_benford_dq


class TestNeighborhoodFunction:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "a bigint, b bigint")

    def test_path_graph_counts(self, spark):
        # path 1-2-3-4-5: ordered pairs at distance 1/2/3 are 8/6/4
        out = neighborhood_function(
            self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_hops=3
        ).collect()
        got = {r.hop: (r.n_pairs, r.cum_pairs, r.avg_reach) for r in out}
        assert got[1] == (8, 8, 1.6)
        assert got[2] == (6, 14, 2.8)
        assert got[3] == (4, 18, 3.6)

    def test_early_stop_past_diameter(self, spark):
        # triangle: everything is reached at hop 1; hops 2+ emit no rows
        out = neighborhood_function(
            self._edges(spark, [(1, 2), (2, 3), (1, 3)]), max_hops=5
        ).collect()
        assert [r.hop for r in out] == [1]
        assert out[0].n_pairs == 6

    def test_orientation_invariant(self, spark):
        canon = [(1, 2), (2, 3), (3, 4)]
        both = canon + [(b, a) for a, b in canon]
        a = neighborhood_function(self._edges(spark, canon), max_hops=3).collect()
        b = neighborhood_function(self._edges(spark, both), max_hops=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestCusumChangepoints:
    def test_matches_sequential_recurrence(self, spark, sf_dir):
        """The window closed form S+ = C - min(0, running-min C) must flag
        exactly the hours the textbook sequential recurrence flags."""
        got = {
            (r.bucket, r.event_type, r.direction)
            for r in q_cusum_changepoints(spark, sf_dir).collect()
        }
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        ev["bucket"] = ev["ts"].dt.floor("h")
        hourly = ev.groupby(["event_type", "bucket"]).size().rename("n").reset_index()
        want = set()
        for etype, grp in hourly.groupby("event_type"):
            grp = grp.sort_values("bucket")
            mu = grp["n"].mean()
            sigma = grp["n"].std(ddof=1)
            s_hi = s_lo = 0.0
            for _, row in grp.iterrows():
                s_hi = max(0.0, s_hi + (row["n"] - mu - 0.5 * sigma))
                s_lo = max(0.0, s_lo + (mu - row["n"] - 0.5 * sigma))
                key = row["bucket"].strftime("%Y-%m-%d %H:%M:%S")
                if round(s_hi, 6) > round(4 * sigma, 6):
                    want.add((key, etype, "up"))
                elif round(s_lo, 6) > round(4 * sigma, 6):
                    want.add((key, etype, "down"))
        assert got == want
        assert want  # fixture actually exercises the detector

    def test_seasonal_index_centers_on_one(self, spark, sf_dir):
        rows = q_seasonal_dow_index(spark, sf_dir).collect()
        assert [r.dow for r in rows] == sorted({r.dow for r in rows})
        assert all(0.5 < r.seasonal_index < 2.0 for r in rows)
        mean_idx = sum(r.seasonal_index for r in rows) / len(rows)
        assert abs(mean_idx - 1.0) < 0.1


class TestBrierDecomposition:
    def test_identity_and_bounds(self, spark, sf_dir):
        r = q_brier_decomposition(spark, sf_dir).collect()[0]
        # Murphy identity: Brier = REL - RES + UNC + within-bin gap
        assert abs(
            r.brier - (r.reliability - r.resolution + r.uncertainty + r.decomp_gap)
        ) < 5e-6
        assert 0.0 <= r.reliability
        assert 0.0 <= r.resolution <= r.uncertainty + 5e-6
        assert 0.0 <= r.uncertainty <= 0.25


class TestBenfordDq:
    def test_digit_partition_and_shares(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        rows = q_benford_dq(spark, sf_dir).collect()
        assert {r.digit for r in rows} <= set(range(1, 10))
        n_orders = load_table(spark, sf_dir, "orders").count()
        assert sum(r.n for r in rows) == n_orders
        assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert abs(r.expected_share - math.log10(1 + 1 / r.digit)) < 1e-6
            assert r.chi2_term >= 0.0


class TestTextQuality:
    def test_char_entropy_bounds_and_totals(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.sources import load_table

        rows = q_char_entropy(spark, sf_dir).collect()
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in rows) == n_docs
        for r in rows:
            assert 0.0 <= r.min_entropy <= r.avg_entropy <= r.max_entropy
            # entropy of a text over ~27 lowercase symbols is < ln(64)
            assert r.max_entropy < math.log(64)
            assert 0 <= r.n_low <= r.n_docs

    def test_boilerplate_threshold_and_coverage(self, spark, sf_dir):
        rows = q_boilerplate_ngrams(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.top_df >= max(2, math.ceil(0.08 * r.n_docs))
            assert 0 < r.docs_covered <= r.n_docs
            assert abs(r.coverage - r.docs_covered / r.n_docs) < 1e-6
            assert len(r.top_gram.split(" ")) == 3


class TestIsotonicCalibration:
    def test_monotone_and_mass_preserving(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_isotonic_calibration,
        )

        rows = q_isotonic_calibration(spark, sf_dir).collect()
        fits = [r.isotonic_fit for r in rows]
        assert fits == sorted(fits)  # isotonic by construction
        assert all(0.0 <= f <= 1.0 for f in fits)
        # PAV is a projection that preserves block means: total fitted
        # positives equal total observed positives
        fitted_pos = sum(r.n * r.isotonic_fit for r in rows)
        observed_pos = sum(r.n * r.pos_rate for r in rows)
        assert abs(fitted_pos - observed_pos) < 1e-2 * max(1.0, observed_pos)


class TestLDiversity:
    def test_flags_match_distinct_counts(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            _LDIV_L,
            q_l_diversity,
        )

        rows = q_l_diversity(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r.n_sensitive <= 5  # five order priorities exist
            assert r.risky == (r.n_sensitive < _LDIV_L)
            assert r.n_members <= r.n_orders


class TestNeighborhoodHll:
    def test_sparse_mode_is_exact_on_small_graph(self, spark):
        from sentiment_analysis_bigdata_spark.operators.graph import neighborhood_hll

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "a bigint, b bigint"
        )
        got = {
            r.hop: r.cum_pairs_est
            for r in neighborhood_hll(edges, max_hops=3).collect()
        }
        # HLL sparse mode is exact at these cardinalities -> matches the
        # exact neighborhood function on the path graph
        assert got == {1: 8, 2: 14, 3: 18}


class TestMatthewsAndLift:
    def test_mcc_matches_closed_form(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_matthews_corrcoef,
        )

        r = q_matthews_corrcoef(spark, sf_dir).collect()[0]
        denom = (
            (r.tp + r.fp) * (r.tp + r.fn) * (r.tn + r.fp) * (r.tn + r.fn)
        ) ** 0.5
        assert abs(r.mcc - (r.tp * r.tn - r.fp * r.fn) / denom) < 1e-6
        assert -1.0 <= r.mcc <= 1.0

    def test_lift_gains_monotone_and_complete(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import q_lift_gains

        rows = q_lift_gains(spark, sf_dir).collect()
        assert [r.decile for r in rows] == list(range(1, 11))
        gains = [r.cum_gain for r in rows]
        assert gains == sorted(gains)
        assert abs(gains[-1] - 1.0) < 1e-6
        # the fixture's score carries label*0.3, so the top decile must
        # over-capture positives
        assert rows[0].lift > 1.0


class TestJaccardThresholdSweep:
    def test_counts_monotone_in_threshold(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.dedup_sim import (
            q_jaccard_threshold_sweep,
        )

        rows = q_jaccard_threshold_sweep(spark, sf_dir).collect()
        pair_counts = [r.n_pairs for r in rows]
        removed = [r.n_docs_removed for r in rows]
        assert pair_counts == sorted(pair_counts, reverse=True)
        assert removed == sorted(removed, reverse=True)
        for r in rows:
            assert r.n_docs_removed <= r.n_pairs or r.n_pairs == 0


class TestEmbeddingAlignment:
    def test_bounds_and_pair_counts(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from sentiment_analysis_bigdata_spark.sources import load_table
        from sentiment_analysis_bigdata_spark.workloads.dedup_sim import (
            q_embedding_alignment,
        )

        r = q_embedding_alignment(spark, sf_dir).collect()[0]
        emb = load_table(spark, sf_dir, "embeddings")
        from sentiment_analysis_bigdata_spark.functions import hashing as H
        from sentiment_analysis_bigdata_spark.workloads.dedup_sim import ALIGN_SHARDS

        # each shard / (label, shard) group forfeits its last vector's pair
        sharded = emb.select(
            "label",
            (H.md5_hash64(F.col("vec_id").cast("string")) % ALIGN_SHARDS).alias("shard"),
        )
        n = sharded.count()
        n_ls_groups = sharded.select("label", "shard").distinct().count()
        n_shards = sharded.select("shard").distinct().count()
        assert r.n_pos_pairs == n - n_ls_groups
        assert r.n_rand_pairs == n - n_shards
        assert 0.0 <= r.alignment <= 4.0  # squared unit-vector distance
        assert -8.0 <= r.uniformity <= 0.0  # ln of a mean of exp(-[0,8])


class TestStreamingHll:
    def test_fold_is_replay_idempotent(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from sentiment_analysis_bigdata_spark.streaming import jobs as SJ

        out = str(tmp_path / "state")
        batch = spark.createDataFrame(
            [("a", str(i)) for i in range(50)] + [("b", str(i)) for i in range(7)],
            "k string, uid string",
        )
        fold = SJ.hll_fold(out, "k", "uid")
        fold(batch, 0)
        once = {
            r.k: r.est
            for r in SJ.read_upsert_table(spark, out)
            .select("k", F.hll_sketch_estimate("sk").alias("est"))
            .collect()
        }
        fold(batch, 1)  # replaying the same rows must not change registers
        twice = {
            r.k: r.est
            for r in SJ.read_upsert_table(spark, out)
            .select("k", F.hll_sketch_estimate("sk").alias("est"))
            .collect()
        }
        assert once == twice
        assert once["a"] == 50 and once["b"] == 7  # sparse mode is exact here


class TestCdcApply:
    def test_merge_semantics_and_order_independence(self, spark):
        from sentiment_analysis_bigdata_spark.operators.scd import cdc_apply

        rows = [
            ("A", 1, "I", "a1"),
            ("A", 2, "U", "a2"),
            ("B", 1, "I", "b1"),
            ("B", 2, "D", None),
            ("C", 1, "I", "c1"),
        ]
        schema = "k string, seq int, op string, val string"
        out = {
            r.k: (r.seq, r.val)
            for r in cdc_apply(
                spark.createDataFrame(rows, schema), ["k"], "seq"
            ).collect()
        }
        assert out == {"A": (2, "a2"), "C": (1, "c1")}
        # arrival order must not matter — the log is keyed by seq, not order
        shuffled = spark.createDataFrame(list(reversed(rows)), schema)
        out2 = {
            r.k: (r.seq, r.val)
            for r in cdc_apply(shuffled, ["k"], "seq").collect()
        }
        assert out2 == out

    def test_pit_lookup_covers_every_purchasing_user(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from sentiment_analysis_bigdata_spark.sources import load_table
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            q_scd2_pit_lookup,
        )

        rows = q_scd2_pit_lookup(spark, sf_dir).collect()
        ev = load_table(spark, sf_dir, "events")
        n_buyers = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct()
            .count()
        )
        assert len(rows) == n_buyers
        types = {r[0] for r in ev.select("event_type").distinct().collect()}
        assert {r.state for r in rows} <= types | {"none"}

    def test_lasttouch_shares_sum_to_one(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_lasttouch_attribution,
        )

        rows = q_lasttouch_attribution(spark, sf_dir).collect()
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
        assert all(r.conversions > 0 for r in rows)
        assert "purchase" not in {r.channel for r in rows}


class TestCorpusStatistics:
    def test_hill_alpha_on_pareto_tail(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import (
            q_hill_tail_index,
        )

        r = q_hill_tail_index(spark, sf_dir).collect()[0]
        assert r.k == 100
        assert r.xmin > 0
        assert r.hill_alpha is None or r.hill_alpha > 0

    def test_token_gini_bounds(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import q_token_gini

        r = q_token_gini(spark, sf_dir).collect()[0]
        assert 0.0 <= r.gini < 1.0
        assert r.n_types <= r.total_tokens

    def test_symspell_finds_planted_typos(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import (
            q_symspell_variants,
        )

        rows = q_symspell_variants(spark, sf_dir).collect()
        assert rows  # the planted corruptions must surface
        for r in rows:
            # a deletion typo is exactly one char shorter or a 1-sub variant
            assert abs(len(r.typo) - len(r.correction)) <= 1
            assert r.corr_count >= 10 * r.typo_count

    def test_rbo_bounds_and_overlap(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.affinity_q import (
            q_rbo_rankings,
        )

        rows = q_rbo_rankings(spark, sf_dir).collect()
        assert len(rows) == 3
        for r in rows:
            assert 0.0 <= r.rbo <= 1.0 + 1e-9
            assert 0 <= r.n_common <= 10
        # truncating a query must retain SOME head agreement on this corpus
        assert any(r.n_common > 0 for r in rows)

    def test_time_to_convert_sane(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_time_to_convert,
        )

        r = q_time_to_convert(spark, sf_dir).collect()[0]
        assert 0 < r.n_converted <= r.n_signups
        assert 0 <= r.conversion_rate <= 1
        assert 0 < r.p50_s <= r.p90_s


class TestBatch5:
    def test_platt_monotone_and_bounded(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_platt_scaling,
        )

        rows = q_platt_scaling(spark, sf_dir).collect()
        probs = [r.platt_prob for r in rows]
        coef_a = {r.coef_a for r in rows}
        assert len(coef_a) == 1  # one global fit
        assert all(0.0 <= p <= 1.0 for p in probs)
        # sigmoid in score is monotone when a > 0 (scores carry signal)
        if rows[0].coef_a > 0:
            assert probs == sorted(probs)

    def test_frequent_triples_are_supported_pairsets(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.affinity_q import (
            q_frequent_triples,
        )

        rows = q_frequent_triples(spark, sf_dir).collect()
        for r in rows:
            assert r.a < r.b < r.c
            assert r.support >= 2

    def test_window_funnel_shares(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_window_funnel_7d,
        )

        rows = q_window_funnel_7d(spark, sf_dir).collect()
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
        assert {r.step for r in rows} <= {0, 1, 2, 3}

    def test_audio_peak_matches_planted_bin(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.dedup_sim import (
            q_audio_peak_freq,
        )

        rows = q_audio_peak_freq(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.peak_bin == 1 + r.doc_id % 200
            assert abs(r.peak_freq_hz - r.peak_bin * 8000 / 512) < 1e-6


class TestBatch6:
    def test_bagofwords_dedup_collapses_reorders(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.dedup_sim import (
            q_bagofwords_dedup,
        )

        rows = q_bagofwords_dedup(spark, sf_dir).collect()
        for r in rows:
            assert r.group_size >= 2
            assert r.survivor_id >= 0

    def test_unicode_hygiene_flags_planted_rows(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import (
            q_unicode_hygiene,
        )

        rows = q_unicode_hygiene(spark, sf_dir).collect()
        assert sum(r.n_zero_width for r in rows) > 0
        assert sum(r.n_bidi for r in rows) > 0
        for r in rows:
            assert r.n_flagged <= r.n_docs
            assert max(r.n_zero_width, r.n_bidi) <= r.n_flagged

    def test_weighted_quantiles_monotone_and_shifted_right(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from sentiment_analysis_bigdata_spark.sources import load_table
        from sentiment_analysis_bigdata_spark.workloads.scale_q import (
            q_weighted_quantiles,
        )

        rows = {r.q: r.weighted_quantile for r in q_weighted_quantiles(spark, sf_dir).collect()}
        vals = [rows[q] for q in sorted(rows)]
        assert vals == sorted(vals)
        # token mass concentrates in longer docs, so the weighted median
        # sits at or right of the unweighted one
        med = (
            load_table(spark, sf_dir, "documents")
            .agg(F.expr("percentile(n_chars, 0.5)"))
            .collect()[0][0]
        )
        assert rows[0.5] >= med * 0.9


class TestBatch7:
    def test_forward_asof_matches_next_value(self, spark):
        from sentiment_analysis_bigdata_spark.operators.asof import (
            asof_join,
            asof_join_forward,
        )

        left = spark.createDataFrame(
            [(1, 10), (1, 25), (2, 5)], "k bigint, t bigint"
        ).select("k", F_ts("t").alias("ts"))
        right = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 1, "z")],
            "k bigint, t bigint, v string",
        ).select("k", F_ts("t").alias("ts"), "v")
        fwd = {
            (r.k, r.ts): r.v_matched
            for r in asof_join_forward(
                left, right, key="k", left_ts="ts", right_ts="ts", payload_cols=["v"]
            ).collect()
        }
        # equal ts matches (t=10 -> 'a'); t=25 -> next is 'c'; k=2 t=5 -> none
        vals = sorted(fwd.values(), key=lambda x: (x is None, x))
        assert set(v for v in fwd.values()) == {"a", "c", None}
        bwd = {
            r.v_matched
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="ts", payload_cols=["v"]
            ).collect()
        }
        assert bwd == {"a", "b", "z"}  # backward sees prior rows instead

    def test_referential_integrity_clean_fixture(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            q_referential_integrity,
        )

        rows = q_referential_integrity(spark, sf_dir).collect()
        assert len(rows) == 6
        assert all(r.intact and r.n_orphans == 0 for r in rows)

    def test_referential_integrity_catches_orphans(self, spark, tmp_path, sf_dir):
        # corrupt a copy of the star schema: drop half the customers
        import shutil

        from pyspark.sql import functions as F

        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            q_referential_integrity,
        )

        dst = str(tmp_path / "sf_corrupt")
        shutil.copytree(sf_dir, dst)
        spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
            F.col("c_custkey") % 2 == 0
        ).write.mode("overwrite").parquet(f"{dst}/customer.parquet")
        rows = {r.fk_edge: r for r in q_referential_integrity(spark, dst).collect()}
        assert rows["orders.o_custkey"].n_orphans > 0
        assert not rows["orders.o_custkey"].intact
        assert rows["lineitem.l_orderkey"].intact


class TestBatch8:
    def test_mutual_information_bounds(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_mutual_information,
        )

        r = q_mutual_information(spark, sf_dir).collect()[0]
        assert 0.0 <= r.mi_nats <= min(r.h_type, r.h_hour) + 1e-9
        assert 0.0 <= r.normalized_mi <= 1.0 + 1e-9
        import math

        assert r.h_hour <= math.log(24) + 1e-6
        assert r.h_type <= math.log(8) + 1e-6

    def test_delete_cascade_counts_nest(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            q_delete_cascade_plan,
        )

        rows = {r.table_name: r for r in q_delete_cascade_plan(spark, sf_dir).collect()}
        assert set(rows) == {"customer", "orders", "lineitem"}
        assert rows["customer"].n_to_purge > 0
        for r in rows.values():
            assert 0 <= r.n_to_purge <= r.n_rows


class TestBatch9:
    def test_ngram_novelty_decays(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import q_ngram_novelty

        rows = q_ngram_novelty(spark, sf_dir).collect()
        byd = {r.decile: r.avg_novelty for r in rows}
        assert all(0.0 <= v <= 1.0 for v in byd.values())
        # the first decile sees a mostly-unseen corpus; the last does not
        assert byd[1] > byd[10]

    def test_vocab_richness_identities(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import q_vocab_richness

        r = q_vocab_richness(spark, sf_dir).collect()[0]
        assert 0 <= r.n1_hapax <= r.v_types <= r.n_tokens
        assert 0.0 <= r.good_turing_unseen <= 1.0
        assert r.chao1_richness >= r.v_types

    def test_neyman_allocation_budget(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.scale_q import (
            _NEYMAN_BUDGET,
            q_neyman_allocation,
        )

        rows = q_neyman_allocation(spark, sf_dir).collect()
        assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-4
        total = sum(r.n_alloc for r in rows)
        # floor() loses at most one doc per stratum
        assert _NEYMAN_BUDGET - len(rows) <= total <= _NEYMAN_BUDGET

    def test_markov_stationary_is_a_distribution(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_markov_stationary,
        )

        rows = q_markov_stationary(spark, sf_dir).collect()
        assert abs(sum(r.stationary_p for r in rows) - 1.0) < 1e-4
        assert all(r.stationary_p >= 0 for r in rows)
        # fixed point: pi P ~= pi (12 rounds converge on a 5-state chain)
        from sentiment_analysis_bigdata_spark.operators.timeseries import (
            transition_matrix,
        )
        from sentiment_analysis_bigdata_spark.sources import load_table

        tm = transition_matrix(load_table(spark, sf_dir, "events")).collect()
        pi = {r.state: r.stationary_p for r in rows}
        nxt = {}
        for c in tm:
            nxt[c.to_state] = nxt.get(c.to_state, 0.0) + pi.get(c.from_state, 0.0) * c.p
        z = sum(nxt.values())
        for s in pi:
            assert abs(nxt.get(s, 0.0) / z - pi[s]) < 1e-3


class TestBatch10:
    def test_kaplan_meier_monotone(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_kaplan_meier,
        )

        rows = q_kaplan_meier(spark, sf_dir).collect()
        surv = [r.survival for r in sorted(rows, key=lambda r: r.horizon_d)]
        assert all(0.0 <= s <= 1.0 for s in surv)
        assert surv == sorted(surv, reverse=True)  # survival never increases

    def test_decayed_engagement_bounds(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_decayed_engagement,
        )

        rows = q_decayed_engagement(spark, sf_dir).collect()
        assert 0 < len(rows) <= 20
        for r in rows:
            assert 0.0 < r.decayed_score <= r.n_events  # each weight <= 1

    def test_skyline_no_dominated_survivor(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.relational_q8 import (
            q_skyline_parts,
        )
        from sentiment_analysis_bigdata_spark.sources import load_table

        sky = [
            (r.retail_price, r.p_size)
            for r in q_skyline_parts(spark, sf_dir).collect()
        ]
        allp = [
            (round(r.p_retailprice, 2), r.p_size)
            for r in load_table(spark, sf_dir, "part").collect()
        ]
        for price, size in sky:
            dominated = any(
                p2 <= price and s2 >= size and (p2 < price or s2 > size)
                for p2, s2 in allp
            )
            assert not dominated
        # along the frontier size strictly INCREASES with price (a more
        # expensive survivor must offer something the cheaper one lacks)
        ordered = sorted(sky)
        sizes = [s for _, s in ordered]
        assert sizes == sorted(sizes)


class TestBatch11:
    def test_phrase_vs_bag_containment(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.affinity_q import (
            q_phrase_search,
        )

        rows = q_phrase_search(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            # phrase matches are a subset of both-terms matches, and the
            # phrase's own df is a lower bound on phrase docs
            assert r.df <= r.n_phrase_docs <= r.n_both_docs

    def test_ztest_internally_consistent(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.evaluation_q import (
            q_ab_conversion_ztest,
        )

        r = q_ab_conversion_ztest(spark, sf_dir).collect()[0]
        assert r.c0 <= r.n0 and r.c1 <= r.n1
        assert abs(r.rate_diff - (r.c1 / r.n1 - r.c0 / r.n0)) < 1e-5
        assert r.sig_99 <= r.sig_95  # 99% significance implies 95%


class TestBatch12:
    def test_fd_discovery_rates(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.warehouse_q import (
            q_fd_discovery,
        )

        rows = q_fd_discovery(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert 0.0 <= r.violation_rate <= 1.0
            assert r.fd_holds == (r.n_violating == 0)

    def test_activity_islands_bounds(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
            q_activity_islands,
        )

        rows = q_activity_islands(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.longest_streak >= 1
            assert r.n_islands >= 1

    def test_dau_mau_stickiness_bounds(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.temporal_q import q_dau_mau

        rows = q_dau_mau(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 < r.stickiness <= 1.0
            assert r.avg_dau <= r.mau


def test_top_event_paths_shares(spark, sf_dir):
    from sentiment_analysis_bigdata_spark.workloads.temporal_q import (
        q_top_event_paths,
    )

    rows = q_top_event_paths(spark, sf_dir).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert sum(r.share for r in rows) <= 1.0 + 1e-9
    assert all(len(r.path.split(" > ")) == 3 for r in rows)


def test_kmeans_elbow_inertia_decreases(spark, sf_dir):
    from sentiment_analysis_bigdata_spark.workloads.cluster_q import q_kmeans_elbow

    rows = sorted(q_kmeans_elbow(spark, sf_dir).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [2, 4, 8]
    inertias = [r.total_inertia for r in rows]
    assert inertias == sorted(inertias, reverse=True)  # more clusters, less inertia
    assert all(r.n_points == rows[0].n_points for r in rows)
