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
# 1-50 explicitly. Everything after the prefix keeps the round-robin
# family interleave. Names not present in any lane are skipped.
#
# ROUND 10 (this round): the FINAL certification rotation — exactly the
# 48-query tail that has never appeared in CORRECTNESS_r01..r09 (pinned
# as the ROUND-10 PLAN in r9; verified again this round by diffing the
# registry against all nine CORRECTNESS files), plus 2 long-green
# canaries (pricing_summary, minhash_near_dups — both driver-green since
# their first rotation) as drift guards. A green round completes
# registry-wide driver certification: 348/348 oracle-backed queries
# checked at least once. The witness-pinned BPE pair (bpe_merges_1k,
# bpe_encode_1k) stays out by design — they can never produce a driver
# row (README "Oracle-less pair" note).
#
# POST-CERTIFICATION CANARY POLICY (round 11 onward): once every
# oracle-backed query is certified there is no rotation pressure left;
# the prefix becomes a pure regression guard. The switch is AUTOMATIC
# (``_active_prefix`` below): the committed CORRECTNESS_r*.json driver
# artifacts are the shared ground truth — while any oracle-backed query
# has never been fully green, the pinned rotation list above stays
# active (it must carry the stragglers); once the green set covers the
# registry, the prefix becomes canary_prefix(latest_round + 1), which
# advances by itself as each round's artifact lands. A query that later
# turns red re-enters certification pressure only via a fix + its next
# canary window; a query that was NEVER green keeps rotation mode on,
# which is the fail-safe (red first-timers are first-class bugs).
# ``canary_prefix`` (defined below, tested in tests/test_registry.py)
# draws a DETERMINISTIC 50-query sample over all oracle-backed queries,
# STRATIFIED by family lane: slots are allocated proportionally to lane
# size (largest-remainder rounding, every lane gets >= 1), and the
# window within each lane advances by the lane's own allocation each
# round, wrapping — so every family is re-checked every round and every
# query re-certifies within 8 rounds (measured: 10 consecutive samples
# cover all 348 by the 8th; tests/test_registry.py pins this). Pure
# function of (round_no, registry): the driver and any local run agree
# on the sample with no shared state.
_DRIVER_PREFIX: list[str] = [
    # ROUND-11 PLAN (written r10): a green CORRECTNESS_r10 completes
    # registry-wide certification (348/348 oracle-backed + 2
    # witness-pinned by design). _active_prefix() then switches to
    # canary_prefix(11) AUTOMATICALLY — no edit needed here; that exact
    # 50-query sample was pre-validated this round (50/50 green at
    # sf0.01, BASELINE.md "Round-11 pre-validation"). If any r10 row
    # comes back red, rotation mode stays on by itself: fix the query,
    # keep it in this pinned list, re-certify. Registry freeze
    # discipline continues (cap 356; candidates need genuinely novel
    # 100 TB-curation semantics + a full oracle).
    # -- rotation, round 10: the final 48 first-timers --
    "rbo_rankings",
    "source_token_drift",
    "quantile_bins",
    "bpe_encode_corpus",
    "l_diversity",
    "weighted_quantiles",
    "neyman_allocation",
    "tokenizer_fertility",
    "salted_token_counts",
    "referential_integrity",
    "delete_cascade_plan",
    "group_weighted_sample",
    "lasttouch_attribution",
    "groupwise_regression",
    "token_gini",
    "window_funnel_7d",
    "label_noise_estimate",
    "embedding_alignment",
    "asof_click_fulfillment",
    "ngram_novelty",
    "jaccard_threshold_sweep",
    "runtime_filtered_join",
    "split_leakage",
    "term_dispersion",
    "decayed_engagement",
    "activity_islands",
    "code_prose_profile",
    "table_profile",
    "top_event_paths",
    "ngram_diversity",
    "seasonal_dow_index",
    "contamination_check",
    "vocab_coverage",
    "purged_time_split",
    "chunk_token_windows",
    "hourly_to_daily_rollup",
    "ngram_jaccard_adjacent",
    "doc_logprob",
    "fuzzy_part_names",
    "bigram_logprob",
    "rate_anomalies",
    "chi2_lang_terms",
    "retrieval_metrics",
    "source_overlap",
    "hard_negatives",
    "approx_aggregates",
    "payload_stats",
    "important_part_values",
    # -- canaries (long driver-green; drift guards) --
    "pricing_summary",
    "minhash_near_dups",
]


def _lane_names(family: str, modules: list) -> list[str]:
    names: list[str] = []
    for m in modules:
        names.extend(m.QUERIES)
    head = [n for n in _HEADLINE.get(family, []) if n in names]
    return head + [n for n in names if n not in head]


def _certification_state() -> tuple[int, set[str]]:
    """(latest driver round on record, queries ever fully green) from the
    committed ``CORRECTNESS_r*.json`` artifacts at the repo root. Fully
    green = rows + schema + hash all matched in at least one round.
    Missing/unreadable artifacts degrade to (0, empty) — rotation mode —
    never an import error."""
    import json
    import pathlib
    import re as _re

    root = pathlib.Path(__file__).resolve().parents[2]
    latest, green = 0, set()
    try:
        files = list(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        return latest, green
    for f in files:
        m = _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        latest = max(latest, int(m.group(1)))
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return latest, green


def canary_prefix(round_no: int, slots: int = 50) -> list[str]:
    """Deterministic stratified regression-canary sample (r11+ policy).

    Returns ``slots`` query names drawn from the oracle-backed registry,
    stratified by family lane. Slot allocation is proportional to lane
    size with largest-remainder rounding and a floor of one slot per
    lane (capped at lane size). Within a lane, selection is a
    contiguous window of the lane's allocation starting at
    ``(round_no * alloc) % len(lane)`` — consecutive rounds advance the
    window by exactly the allocation, so the windows tile the lane and
    every query re-certifies on a ``ceil(len(lane)/alloc)``-round cycle
    (8 rounds covers the whole 348-query registry at 50 slots — pinned
    by tests/test_registry.py). Pure function of
    ``(round_no, registry)``: no RNG, no shared state, so the external
    driver and any local rerun agree on the sample.
    """
    lanes: list[list[str]] = []
    for family, modules in _FAMILIES:
        by_name: dict[str, tuple] = {}
        for m in modules:
            by_name.update(m.QUERIES)
        names = [
            n
            for n in _lane_names(family, modules)
            if by_name[n][1] is not None  # oracle-backed only
        ]
        if names:
            lanes.append(names)
    total = sum(len(lane) for lane in lanes)
    slots = min(slots, total)
    # Largest-remainder allocation with a floor of 1 per lane.
    quotas = [len(lane) * slots / total for lane in lanes]
    alloc = [int(q) for q in quotas]
    remainders = sorted(
        range(len(lanes)), key=lambda i: (quotas[i] - alloc[i], len(lanes[i])), reverse=True
    )
    short = slots - sum(alloc)
    for i in remainders[:short]:
        alloc[i] += 1
    for i, lane in enumerate(lanes):
        alloc[i] = min(alloc[i], len(lane))
        if alloc[i] == 0:
            alloc[i] = 1
    # Floors/caps can leave us off-target; rebalance against the largest
    # headroom (deterministic: index order breaks ties).
    while sum(alloc) > slots:
        i = max(range(len(lanes)), key=lambda j: (alloc[j], -j))
        alloc[i] -= 1
    while sum(alloc) < slots:
        i = max(range(len(lanes)), key=lambda j: (len(lanes[j]) - alloc[j], -j))
        alloc[i] += 1
    out: list[str] = []
    for lane, k in zip(lanes, alloc):
        start = (round_no * k) % len(lane)
        out.extend(lane[(start + j) % len(lane)] for j in range(k))
    return out


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
    prefix = [(n, by_name[n]) for n in _active_prefix() if n in by_name]
    prefix_names = {n for n, _ in prefix}
    return prefix + [(n, e) for n, e in out if n not in prefix_names]


def _active_prefix() -> list[str]:
    """The prefix the driver should sample THIS round: the pinned
    rotation while any oracle-backed query has never been fully green
    (the pinned list carries exactly those stragglers + canaries), else
    the deterministic canary sample for the upcoming round. See the
    POST-CERTIFICATION CANARY POLICY comment above _DRIVER_PREFIX."""
    import logging

    latest, green = _certification_state()
    oracle_backed = {
        name
        for _family, modules in _FAMILIES
        for m in modules
        for name, entry in m.QUERIES.items()
        if entry[1] is not None
    }
    log = logging.getLogger(__name__)
    if oracle_backed - green:
        # The prefix depends on the CORRECTNESS_r*.json artifacts on
        # disk; log the resolution so a checkout whose artifact set
        # differs from the driver's (ADVICE r10) is diagnosable.
        log.info(
            "driver prefix: ROTATION mode (%d oracle-backed queries never "
            "fully green; latest artifact round %d)",
            len(oracle_backed - green),
            latest,
        )
        return _DRIVER_PREFIX
    log.info(
        "driver prefix: CANARY mode, canary_prefix(%d) "
        "(registry fully certified through round %d)",
        latest + 1,
        latest,
    )
    return canary_prefix(latest + 1)


def all_queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _sql) in _interleaved()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _interleaved() if sql is not None}
