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
    # -- canaries (driver-green in r4) --
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
    # r4's only red row, rewritten integer-exact this round — must re-green
    "compaction_plan",
    # -- never-driver-checked rotation, round 5 --
    "ppjoin_pairs",
    "multimodal_decode",
    # (displace multimodal_resize — same decode path multimodal_decode
    # already certifies this round — for the perceptual-hash lane's
    # integer bit math, same NEW-first rationale)
    "image_ahash_dedup",
    "embedding_pca",
    "ann_recall",
    "simhash_near_dups",
    "ann_ivf_index",
    "winnow_overlap",
    # (displace embedding_near_dup / dedup_components — oracle-green
    # since r2, standard join shapes — for the Arrow NFC kernel (byte-
    # level cross-engine contract vs DuckDB's native normalizer) and the
    # seed-teleport PageRank, same NEW-first rationale)
    "unicode_nfc",
    "asof_purchase_signup",
    # (displace personalized_pagerank / minhash_signatures /
    # streaming_dedup / ml_naive_bayes / retrieval_metrics /
    # link_prediction — each shares its kernel or recursion shape with a
    # driver-green twin (pagerank_purchases, minhash_near_dups, the four
    # r4 streaming rows, the golden-constant ML lane, average_precision,
    # plain join+agg) — for the six queries added in this session, whose
    # cross-engine surfaces (char-split + ln entropy, CUSUM float
    # windows, recursive-CTE ANF, Brier float decomposition, integer
    # digit extraction, n-gram tie-breaks) have never been certified)
    "cusum_changepoints",
    "char_entropy",
    "boilerplate_ngrams",
    "neighborhood_function",
    "brier_decomposition",
    "benford_dq",
    # countvec_vocab displaced by bloom_contamination (see end of list)
    # -- queries NEW this round (never had a driver row by construction) --
    # (late-session swaps, same twin-coverage rationale as above:
    # source_overlap / fleiss_kappa / hard_negatives / semdedup_512 /
    # crossdoc_dedup each share their surface with a prefix canary or a
    # pytest-proven equality twin; the five replacements carry surfaces
    # that exist nowhere else in the prefix — unrolled-Newton Platt,
    # Kaplan-Meier exp/ln windows, FFT closed-form recovery, planted-
    # corruption Levenshtein, and the 12-round Markov recursion)
    "dup_ngram_spans_ladder",
    "kaplan_meier",
    "bradley_terry",
    "audio_peak_freq",
    "bpe_encode_arrow",
    "platt_scaling",
    "kcore_parts",
    # (displace kmeans_broadcast — pytest proves it assignment-identical
    # to the literal path kmeans_clusters certifies as a canary — for
    # the closed-form minimax PAV, whose bins² self-join + running-min
    # surface is brand new this session)
    "isotonic_calibration",
    "semdedup_512",
    "multimodal_jpeg",
    # (late-r5: these three displace three relational rotation rows —
    # relational already has the deepest historical driver coverage, and
    # a NEW query's first driver row is the strongest cross-engine check)
    "symspell_variants",
    "matryoshka_recall",
    # (displace roc_points/hll_user_rollup — both oracle-green since r2 —
    # for the two queries added at round end, same NEW-first rationale)
    "silhouette_kmeans",
    "score_drift_psi",
    # (displace pii_redaction/text_stats — oracle-green since r1 — for the
    # two LLM-curation queries added late in r5, same NEW-first rationale)
    "dsir_importance",
    "perplexity_buckets",
    # (displace dedup_exact — oracle-green since r1 — for the hybrid
    # lexical+semantic RRF retrieval query, same NEW-first rationale)
    "hybrid_rrf_search",
    # (displace countvec_vocab — oracle-green since r2 with pinned Murmur3
    # golden checksums — for the Bloom decontamination pre-filter added
    # this session, same NEW-first rationale)
    "bloom_contamination",
    # (displace lang_id / tfidf_top_terms / retention_cohorts /
    # funnel_conversion / ml_linear_svc — all plain-expression or
    # golden-constant-pinned and oracle-green since r1/r2, the lowest
    # cross-engine-risk rows in the prefix — for the five queries added
    # in this session, same NEW-first rationale: incremental streaming
    # CMS, pass@k, histogram-narrowing selection, quality-aware dedup,
    # and the token-budget recipe)
    "streaming_cms",
    "pass_at_k",
    "exact_quantiles_narrowed",
    "dedup_keep_best",
    "token_budget_plan",
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
