"""Query registry: every SURVEY §2 operator exposed as a named query with a
DuckDB-oracle SQL twin (where SQL-expressible).

Each module defines ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame``. ``__spark_entry__.py``
aggregates them into the driver contract.

Registry order is **interleaved round-robin by operator family** (one lane
per family; the eight relational modules share a single lane) so any prefix
sample of ``all_queries()`` — in particular the driver's first-50
correctness sample — spans every family: relational, text, dedup/ANN/
multimodal, affinity, modern-SQL, temporal/streaming, tokenizer-training,
warehouse, evaluation/ML, graph, clustering, and scale ops. Within each lane a short
headline list pulls the family's flagship operators to the front; the
remaining queries follow in module-definition order. The *set* of queries
and their semantics are unchanged — only the iteration order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_bigdata_spark.workloads import (
    affinity_q,
    cluster_q,
    dedup_sim,
    evaluation_q,
    modern_q,
    graph_q,
    relational_q,
    relational_q2,
    relational_q3,
    relational_q4,
    relational_q5,
    relational_q6,
    relational_q7,
    relational_q8,
    scale_q,
    temporal_q,
    text_q,
    train_q,
    warehouse_q,
)

SparkQuery = Callable[[SparkSession, str], DataFrame]

# One lane per operator family. Lane order fixes which family fills slot k of
# each round-robin cycle; module order within a lane is concatenation order.
_FAMILIES: list[tuple[str, list]] = [
    (
        "relational",
        [
            relational_q,
            relational_q2,
            relational_q3,
            relational_q4,
            relational_q5,
            relational_q6,
            relational_q7,
            relational_q8,
        ],
    ),
    ("text", [text_q]),
    ("dedup_sim", [dedup_sim]),
    ("temporal", [temporal_q]),
    ("train", [train_q]),
    ("evaluation", [evaluation_q]),
    ("warehouse", [warehouse_q]),
    ("scale", [scale_q]),
    ("affinity", [affinity_q]),
    ("modern", [modern_q]),
    ("graph", [graph_q]),
    ("cluster", [cluster_q]),
]

# Flagship queries pulled to the front of their family lane so they land
# inside any small prefix sample. Names not (yet) present are skipped, so
# this list may mention queries added in later rounds without breaking.
_HEADLINE: dict[str, list[str]] = {
    "relational": ["pricing_summary", "top_revenue_orders", "top_orders_per_customer"],
    "text": ["clean_documents", "token_topk_nostop", "corpus_filter_report", "hashed_embeddings", "zipf_fit", "lang_id", "tfidf_top_terms"],
    "dedup_sim": [
        "minhash_near_dups",
        "dedup_cascade",
        "dup_ngram_spans",
        "minhash_recall",
        "ann_ivfpq",
        "ann_ivf_index",
        "ppjoin_pairs",
        "multimodal_decode",
        "multimodal_resize",
        "ann_recall",
        "embedding_pca",
        "simhash_near_dups",
        "ann_ivf_append",
        "embedding_near_dup",
    ],
    "temporal": [
        "streaming_upsert",
        "streaming_topk",
        "streaming_interval_join_outer",
        "streaming_tumbling",
        "event_transitions",
        "forecast_backtest",
        "asof_purchase_signup",
        "streaming_dedup",
        "streaming_sessions",
        "streaming_sliding",
    ],
    "train": ["bpe_merges", "unigram_segment", "wordpiece_candidates", "bpe_vocab"],
    "evaluation": ["confusion_matrix", "rank_correlation", "roc_auc", "ml_logistic_regression", "ml_crossval"],
    "warehouse": ["scd2_user_state", "dq_orders", "compaction_plan", "incremental_order_rollup", "table_diff", "source_token_drift"],
    "scale": ["group_sample", "cms_token_counts", "mixture_plan", "hist_quantiles", "dataset_fingerprint", "heavy_hitters", "stateful_ewma"],
    "affinity": ["co_purchase_pairs", "bm25_search", "association_rules"],
    "graph": ["pagerank_purchases", "label_propagation", "bfs_hops"],
    "cluster": ["kmeans_clusters", "semdedup", "knn_graph", "knn_recall", "cluster_diversity"],
}


# Rotating driver-certification prefix. The external driver samples the
# FIRST 50 registry entries for its oracle gate, so this list pins slots
# 1-50 explicitly. Layout varies per round: r9 pins 50 FIRST-TIMERS and
# zero canaries (VERDICT r8 #1 asked for a full fresh round; every name
# below is absent from CORRECTNESS_r01..r08 and locally green), while
# r10 should pin the remaining 48-query tail plus 2 driver-green
# canaries (see the ROUND-10 PLAN below). Everything after the prefix
# keeps the round-robin family interleave. Names not present in any
# lane are skipped.
_DRIVER_PREFIX: list[str] = [
    # -- rotation, round 9 --
    # ROUND-10 PLAN (written r9): after this round certifies the 50 below,
    # EXACTLY 48 oracle-backed queries remain never-driver-checked —
    # rbo_rankings, source_token_drift, quantile_bins, bpe_encode_corpus,
    # l_diversity, weighted_quantiles, neyman_allocation,
    # tokenizer_fertility, salted_token_counts, referential_integrity,
    # delete_cascade_plan, group_weighted_sample, lasttouch_attribution,
    # groupwise_regression, token_gini, window_funnel_7d,
    # label_noise_estimate, embedding_alignment, asof_click_fulfillment,
    # ngram_novelty, jaccard_threshold_sweep, runtime_filtered_join,
    # split_leakage, term_dispersion, decayed_engagement,
    # activity_islands, code_prose_profile, table_profile,
    # top_event_paths, ngram_diversity, seasonal_dow_index,
    # contamination_check, vocab_coverage, purged_time_split,
    # chunk_token_windows, hourly_to_daily_rollup, ngram_jaccard_adjacent,
    # doc_logprob, fuzzy_part_names, bigram_logprob, rate_anomalies,
    # chi2_lang_terms, retrieval_metrics, source_overlap, hard_negatives,
    # approx_aggregates, payload_stats, important_part_values.
    # They fit ONE final rotation (48 + 2 driver-green canaries = 50),
    # completing registry-wide driver certification. The witness-pinned
    # BPE pair stays out by design (README note).
    # 50 never-driver-checked queries (no row in any CORRECTNESS_r01..r08);
    # VERDICT r8 #1 asked for a full round of 50 first-timers (cumulative
    # 250/348 → target ≥300). Leads with the reference-parity rows
    # (token_topk/bigram_topk/label_distribution/text_stats cover SURVEY
    # A1/A4/M1/M5 directly), then the verdict's named priorities, then a
    # family-spanning fill. The two witness-pinned oracle-less entries
    # (bpe_merges_1k, bpe_encode_1k) stay out of the prefix by design.
    # reference-parity rows (VERDICT r8 #1 lead items)
    "token_topk",
    "bigram_topk",
    "label_distribution",
    "text_stats",
    # verdict-named priorities
    "simhash_signatures",
    "fingerprint_clusters",
    "winnow_fingerprints",
    "roc_auc_hist",
    "incremental_dedup",
    "leakage_safe_split",
    "priority_order_check",
    "brand_supplier_counts",
    "forecast_revenue",
    # text/corpus analysis tail
    "token_counts",
    "lexical_stats",
    "repetition_ratio",
    "unicode_hygiene",
    "html_stripped_docs",
    "vocab_richness",
    "length_histogram",
    "corpus_health",
    # dedup/similarity tail
    "simhash_weighted",
    "bagofwords_dedup",
    "neardup_cliques",
    "rolling_fingerprint",
    "image_ahash_near_dup",
    # evaluation tail
    "matthews_corrcoef",
    "expected_calibration_error",
    "lift_gains",
    "accuracy_by_slice",
    "model_agreement",
    "score_drift_ks",
    # training-data / scale ops
    "mixture_sample",
    "dsir_sample",
    "balance_sources",
    "chunk_documents",
    "span_corruption_plan",
    "salted_supplier_join",
    "key_skew_report",
    "hll_user_rollup",
    # temporal
    "dau_mau",
    "funnel_conversion",
    "resample_ffill",
    "time_weighted_avg",
    # graph / clustering
    "clustering_coeffs",
    "link_prediction",
    "label_centroids",
    "kmeans_elbow",
    # r9 registry additions (new code meets the driver first; displaced
    # referential_integrity/table_profile to the r10 rotation)
    "exactsubstr_clusters",
    "salted_distinct_users",
]


def _lane_names(family: str, modules: list) -> list[str]:
    names: list[str] = []
    for m in modules:
        names.extend(m.QUERIES)
    head = [n for n in _HEADLINE.get(family, []) if n in names]
    return head + [n for n in names if n not in head]


def _interleaved() -> list[tuple[str, tuple]]:
    """Return (name, (fn, sql)) pairs, round-robin across family lanes."""
    lanes: list[list[tuple[str, tuple]]] = []
    for family, modules in _FAMILIES:
        by_name: dict[str, tuple] = {}
        for m in modules:
            for name, entry in m.QUERIES.items():
                if name in by_name:
                    raise ValueError(f"duplicate query name {name}")
                by_name[name] = entry
        lanes.append([(n, by_name[n]) for n in _lane_names(family, modules)])
    seen: set[str] = set()
    for lane in lanes:
        for name, _ in lane:
            if name in seen:
                raise ValueError(f"duplicate query name {name}")
            seen.add(name)
    out: list[tuple[str, tuple]] = []
    cursors = [0] * len(lanes)
    while any(cursors[i] < len(lanes[i]) for i in range(len(lanes))):
        for i, lane in enumerate(lanes):
            if cursors[i] < len(lane):
                out.append(lane[cursors[i]])
                cursors[i] += 1
    # Pin the driver-certification prefix (slots 1-50), then the remaining
    # queries in their round-robin family order. Set semantics unchanged.
    by_name = dict(out)
    prefix = [(n, by_name[n]) for n in _DRIVER_PREFIX if n in by_name]
    prefix_names = {n for n, _ in prefix}
    return prefix + [(n, e) for n, e in out if n not in prefix_names]


def all_queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _sql) in _interleaved()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _interleaved() if sql is not None}
