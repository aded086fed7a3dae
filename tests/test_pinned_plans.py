"""Pinned physical-plan shapes for flagship operators (VERDICT r7 #7).

`tools/plan_audit.py` asserts global hygiene (pushed filters, no cartesian
products) across every registered query; these tests pin the EXACT shape
of the plans the scale story depends on, so a Catalyst upgrade or an
innocent-looking code change that silently degrades one fails CI instead
of waiting for a PLANS.md review.

Pinned here:
- exact_substring_spans / exactsubstr_attribution — the ExactSubstr
  family must never grow a pair join (BroadcastNestedLoopJoin /
  CartesianProduct); the corpus-sized shuffle count is pinned so an extra
  recompute of the window explode shows up as a hard failure.
- The ANN serving paths:
  * ann_bruteforce IS a BroadcastNestedLoopJoin by design — broadcast
    query block × one corpus scan; the pin is that the broadcast is on
    the QUERY side (no shuffle of the corpus) and nothing else joins.
  * ann_lsh / ann_ivf must be bucket/list equi-joins — BroadcastHashJoin
    present, NO BroadcastNestedLoopJoin (a lost bucket key would
    silently fall back to all-pairs and still return correct rows).
"""

from __future__ import annotations

import re

import pytest

from sentiment_analysis_bigdata_spark.plans import explain
from sentiment_analysis_bigdata_spark.workloads import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _plan(spark, queries, name, sf_dir):
    return explain.formatted_plan(queries[name](spark, sf_dir))


class TestExactSubstrPlans:
    def test_spans_no_pair_join(self, spark, queries, sf_dir):
        p = _plan(spark, queries, "exact_substring_spans", sf_dir)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_spans_exchange_count_pinned(self, spark, queries, sf_dir):
        # With the winnowing-anchor prefilter (round 9, VERDICT r8 #3):
        # anchor agg + anchor semi join + per-doc candidate-region
        # regroup + region join, then the exact pass (hash agg, semi
        # join, text re-join, text agg, semi join) and the final per-doc
        # window — 19 exchanges at 8 shuffle partitions, but every one
        # AFTER the anchor pair is candidate-set-sized and the anchor
        # pair carries ~2/(W0+1) of positions (measured 0.58x shuffle
        # write bytes / 0.42x records at sf0.1 vs the stride-1 plan,
        # tools/exactsubstr_shuffle_bench.py). A regression that
        # reintroduces a corpus-sized recompute shows up as extra
        # exchanges here.
        df = queries["exact_substring_spans"](spark, sf_dir)
        assert explain.num_shuffles(df) <= 19

    def test_clusters_no_pair_join(self, spark, queries, sf_dir):
        # exactsubstr_clusters must stay star-edge shaped: per-window doc
        # sets collapse to (doc -> min doc) edges, never an all-pairs
        # join over a window's doc set.
        p = _plan(spark, queries, "exactsubstr_clusters", sf_dir)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_attribution_no_pair_join_and_one_corpus_explode(
        self, spark, queries, sf_dir
    ):
        p = _plan(spark, queries, "exactsubstr_attribution", sf_dir)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        # The lazy localCheckpoint barrier means the corpus-sized window
        # explode (the xxhash64 transform over every position) appears in
        # the plan of the CHECKPOINTED subtree only — the consumer plan
        # must read the materialized RDD, not re-derive windows.
        assert len(re.findall(r"xxhash64", p)) == 0, (
            "attribution consumer plan re-derives the window explode —"
            " the localCheckpoint barrier is gone"
        )

    def test_attribution_matches_spans_intervals_at_fixture(
        self, spark, queries, sf_dir
    ):
        spans = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in queries["exact_substring_spans"](spark, sf_dir).collect()
        }
        attr = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in queries["exactsubstr_attribution"](spark, sf_dir).collect()
        }
        assert spans == attr and len(spans) > 0


class TestAnnServingPlans:
    def test_bruteforce_is_broadcast_query_scan(self, spark, queries, sf_dir):
        p = _plan(spark, queries, "ann_bruteforce", sf_dir)
        # brute force = broadcast the bounded query block, ONE pass over
        # the corpus — BroadcastNestedLoopJoin with BroadcastExchange is
        # exactly that; a SortMergeJoin here would mean the corpus got
        # shuffled for a bounded query set.
        assert "BroadcastNestedLoopJoin" in p
        assert "BroadcastExchange" in p
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p

    @pytest.mark.parametrize("name", ["ann_lsh", "ann_ivf"])
    def test_bucketed_paths_are_equi_joins(self, spark, queries, name, sf_dir):
        p = _plan(spark, queries, name, sf_dir)
        # bucket/list-pruned candidate generation joins on the bucket/list
        # key: hash equi-join, never a nested-loop fallback (which would
        # be all-pairs and still return the right rows — only the plan
        # reveals the regression).
        assert "BroadcastHashJoin" in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p


class TestPartitionedDecilePlans:
    """The three r10-verdict global windows reworked in r11 and the
    suite-wide single-partition audit rule that now polices the shape
    (VERDICT r10 #1/#3)."""

    @pytest.mark.parametrize("name", ["lift_gains", "ngram_novelty"])
    def test_no_global_ntile(self, spark, queries, name, sf_dir):
        p = _plan(spark, queries, name, sf_dir)
        # NB: "percentile(" contains "ntile(" — match the window form
        assert "ntile(10) windowspecdefinition" not in p, (
            "partitioned-decile pattern regressed to a global NTILE "
            "ranking — single-partitions the corpus at 100 TB"
        )

    def test_embedding_alignment_windows_sharded(self, spark, queries, sf_dir):
        p = _plan(spark, queries, "embedding_alignment", sf_dir)
        # both lead() pairings must shuffle on the md5 shard key, never
        # funnel the embedding table through one partition
        assert "hashpartitioning(shard" in p
        assert "CartesianProduct" not in p

    def test_single_partition_audit_rule(self, spark, queries, sf_dir):
        """tools/plan_audit.single_partition_violations: flags an
        unpartitioned window over a corpus-identity-keyed aggregate,
        passes keyless-agg funnels and the reworked queries."""
        import sys as _sys
        from pathlib import Path

        _sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from tools.plan_audit import single_partition_violations

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        per_doc = docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        bad = (
            per_doc.withColumn("decile", F.ntile(10).over(Window.orderBy("doc_id")))
            .groupBy("decile")
            .count()
        )
        assert single_partition_violations(explain.formatted_plan(bad))
        for name in [
            "roc_points",
            "lift_gains",
            "ngram_novelty",
            "embedding_alignment",
            # the three §2.5 demos reworked in r11 (support-aggregated /
            # banded-ordinal shapes) + one GlobalLimit false-positive rep
            "rank_dense_ntile",
            "range_frame_window",
            "skyline_parts",
            "ann_bruteforce",
        ]:
            p = _plan(spark, queries, name, sf_dir)
            assert single_partition_violations(p) == [], name


class TestUnboundedWindowPartitionPlans:
    """r12 (VERDICT r11 #4): the unbounded-window-partition audit rule —
    a window partitioned by a corpus-CONTENT key (gram / fingerprint /
    low-cardinality enum) cannot split its hottest group across tasks,
    so it serializes a corpus-scaled group through ONE task at 100 TB
    even though the window IS partitioned. The rule must flag a
    synthetic rebuild of the old ngram_novelty first-seen shape and pass
    every query reworked away from it."""

    def test_rule_flags_hot_key_window(self, spark, sf_dir):
        import sys as _sys
        from pathlib import Path

        _sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from tools.plan_audit import unbounded_window_violations

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        grams = docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("g")
        )
        bad = grams.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("g"))
        )
        assert unbounded_window_violations(explain.formatted_plan(bad))
        # a doc_id-partitioned window is entity-bounded — must pass
        ok = grams.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("g")),
        )
        assert unbounded_window_violations(explain.formatted_plan(ok)) == []

    def test_reworked_queries_pass(self, spark, queries, sf_dir):
        import sys as _sys
        from pathlib import Path

        _sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from tools.plan_audit import unbounded_window_violations

        for name in [
            # r12 reworks (partial-agg first-occurrence / banded ordinals
            # / oversize anti join / grouped ordinal / agg+join-back)
            "ngram_novelty",
            "corpus_filter_report",
            "token_gini",
            "vocab_coverage",
            "ppjoin_pairs",
            "winnow_overlap",
            "percent_rank_cume",
            "cheapest_part_per_brand",
            # bounded-input windows the rule must recognize, not flag
            "compaction_plan",
            "isotonic_calibration",
            "rank_dense_ntile",
            "asof_purchase_signup",
        ]:
            p = _plan(spark, queries, name, sf_dir)
            assert unbounded_window_violations(p) == [], name
