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
# 1-50 explicitly: ~10 family canaries that were driver-green last round
# (regression tripwires — if one goes red the cause is environmental, not
# the new queries) followed by ~40 queries that have NEVER received a
# driver-side row (computed from the union of CORRECTNESS_r01..r04 keys).
# Rotate the never-checked block each round until the whole registry is
# driver-certified; everything after the prefix keeps the round-robin
# family interleave. Names not present in any lane are skipped.
_DRIVER_PREFIX: list[str] = [
    # -- canaries (driver-green in r4 AND r5; regression tripwires) --
    "pricing_summary",
    "clean_documents",
    "minhash_near_dups",
    "streaming_upsert",
    "bpe_merges",
    "confusion_matrix",
    "scd2_user_state",
    "group_sample",
    "pagerank_purchases",
    "kmeans_clusters",
    "compaction_plan",
    # -- rotation, round 7 --
    # 38 never-driver-checked queries (no row in any CORRECTNESS_r01..r06)
    # plus zorder_keys, the r6 red row whose oracle HUGEINT→BIGINT cast must
    # re-certify. Priorities per VERDICT r6: the 4 latent HUGEINT siblings
    # re-typed this round, the 4 r6 registry additions (new code meets the
    # driver first), never-certified flagships with novel cross-engine
    # surfaces, and ~10 cheap relational/SQL long-tail rows (ask #6 —
    # sub-second at sf0.01, fastest certified-coverage per driver-minute).
    "zorder_keys",
    # re-typed HUGEINT oracle siblings (commit a9912d1)
    "bpe_merge_candidates",
    "winsorized_doc_lengths",
    "robust_scaled_events",
    "returnflag_priority_counts",
    # round-6 registry additions + the r7 addition (new code meets the
    # driver first — the r6 precedent)
    "gopher_quality_gate",
    "c4_line_filters",
    "unimax_mixture",
    "semdedup_4096",
    "exact_substring_spans",
    # never-certified flagships
    "dedup_exact",
    "minhash_signatures",
    "tumbling_events",
    "session_windows",
    "interval_join",
    "ann_bruteforce",
    "ann_lsh",
    "ann_pq",
    "countvec_vocab",
    "text_quality",
    "pack_sequences",
    "bigram_pmi",
    "triangle_count",
    "retention_cohorts",
    "pii_redaction",
    # streaming sketch-sink twins
    "streaming_hll",
    "streaming_bloom",
    # ML model twins beyond logistic regression
    "ml_naive_bayes",
    "ml_linear_svc",
    # relational/SQL long tail (ask #6)
    "sql_interface",
    "lateral_top_orders",
    "null_safe_join",
    "promo_revenue_share",
    "market_share",
    "skyline_parts",
    "percent_rank_cume",
    "unpivot_lineitem_amounts",
    "hof_functions",
    "cheapest_supplier_per_part",
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
