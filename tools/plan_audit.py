"""Physical-plan audit: regenerates PLANS.md with ``explain("formatted")``
output for representative queries plus automated checks of the properties
that matter at 100 TB — filter/column pushdown into the parquet scan,
broadcast joins on dimension tables, TakeOrderedAndProject for top-k,
whole-stage codegen coverage, and absence of cartesian products.

Usage: python tools/plan_audit.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# query name -> (what to look for, why it matters at scale)
AUDIT = {
    "pricing_summary": (
        ["PushedFilters", "HashAggregate"],
        "date filter pushed to the parquet scan; partial+final hash agg",
    ),
    "region_revenue": (
        ["BroadcastHashJoin"],
        "dimension tables broadcast — no shuffle for nation/region joins",
    ),
    "top_orders_global": (
        ["TakeOrderedAndProject"],
        "global top-k never materializes a full sort",
    ),
    "token_topk_nostop": (
        ["BroadcastHashJoin", "LeftAnti"],
        "stopword filter is a broadcast anti join (hash probe per token)",
    ),
    "order_count_distribution": (
        ["HashAggregate"],
        "double aggregation, each with map-side partial agg",
    ),
    # markers may be alternates separated by "|" — any one suffices
    "interval_join": (
        ["SortMergeJoin|BroadcastHashJoin"],
        "time-bounded self-join on the user_id equi key (+ range filter) — "
        "AQE broadcasts the small side here; shuffles on user_id at scale; "
        "never a cartesian",
    ),
    "roc_points": (
        ["HashAggregate", "Window"],
        "per-distinct-score hash aggregation (partial+final) BEFORE the "
        "cumulative window, so the single-partition sort sees #thresholds "
        "rows, never #rows",
    ),
    "global_shuffle": (
        ["hashpartitioning(shard", "Window"],
        "deterministic shuffle partitions by shard id; the ordinal window "
        "sorts per shard (n/n_shards rows) — no global sort anywhere",
    ),
    "contamination_check": (
        ["BroadcastHashJoin"],
        "benchmark n-gram set broadcasts; the corpus probe is a hash join, "
        "never a corpus self-join or gram shuffle",
    ),
    "nation_pair_volume": (
        ["BroadcastHashJoin"],
        "both nation dimension lookups broadcast; only fact-fact joins and "
        "the final pair aggregation shuffle",
    ),
    "balance_sources": (
        ["BroadcastHashJoin"],
        "the k-row per-domain acceptance-rate table broadcasts back onto "
        "the corpus; the sampler itself is a narrow filter",
    ),
    "incremental_dedup": (
        ["BroadcastHashJoin|SortMergeJoin", "LeftAnti"],
        "delta-vs-history dedup is an anti join on distinct fingerprints "
        "(broadcast while history fits, shuffle beyond) — never a full "
        "corpus self-join",
    ),
    "forecast_revenue": (
        ["PushedFilters", "HashAggregate"],
        "TPC-H Q6: the whole predicate (date+discount+quantity) reaches "
        "the parquet scan; a no-key partial+final agg is all that remains",
    ),
    "market_share": (
        ["BroadcastHashJoin"],
        "TPC-H Q8: nation/region dims broadcast; numerator and denominator "
        "are ONE conditional aggregate pass, not two scans",
    ),
    "cheapest_supplier_per_part": (
        ["HashAggregate", "Window"],
        "TPC-H Q2: the argmin window runs over the pre-aggregated offer "
        "book (part×supplier pairs), never over raw lineitem",
    ),
    "funnel_conversion": (
        ["Window"],
        "all three stage windows partition on the same key — one Exchange "
        "feeds the whole chain (asserted ==1 in TestFunnelStages)",
    ),
    "rate_anomalies": (
        ["HashAggregate", "Window"],
        "agg-over-agg: the trailing-24h window runs over the hourly "
        "rollup (hours×types rows), never raw events",
    ),
    "unshipped_order_revenue": (
        ["PushedFilters", "BroadcastHashJoin", "TakeOrderedAndProject"],
        "TPC-H Q3: both date predicates reach their scans before the join; "
        "segment-filtered customer broadcasts; top-10 is "
        "TakeOrderedAndProject, never a global sort",
    ),
    "local_supplier_revenue": (
        ["PushedFilters", "BroadcastHashJoin"],
        "TPC-H Q5: order-date filter pushed; every dimension (customer, "
        "supplier, region-filtered nations) broadcasts — the only "
        "fact-fact shuffle is lineitem-orders",
    ),
    "bpe_merge_candidates": (
        ["HashAggregate", "TakeOrderedAndProject"],
        "BPE training: the corpus collapses to a vocab-sized (word, freq) "
        "frame in one agg; pair explode + merge top-k run on that small "
        "frame with TakeOrderedAndProject",
    ),
    "zorder_keys": (
        ["HashAggregate", "partial_min(morton"],
        "Morton key is a pure codegen'd projection (32 bit-ops fused into "
        "the scan stage); the per-file summary aggregates map-side first",
    ),
    "groupwise_regression": (
        ["HashAggregate"],
        "regr_* are algebraic aggregates: map-side partial state (sums of "
        "x, y, xy, x², y²) then one constant-width shuffle per group",
    ),
    "label_centroids": (
        ["Generate", "HashAggregate"],
        "posexplode generate is narrow (fuses with the scan); mean-pool is "
        "a partial+final agg keyed (label, dim)",
    ),
    "minhash_near_dups": (
        ["SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", "!BroadcastNestedLoopJoin"],
        "LSH banding: candidate pairs come from an EQUI join on (band, "
        "band_key) — never a nested-loop/cartesian pair scan",
    ),
    "simhash_near_dups": (
        ["SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", "!BroadcastNestedLoopJoin"],
        "pigeonhole chunk buckets: Hamming candidates from an equi join on "
        "the chunk value — never all-pairs",
    ),
    "ann_lsh": (
        ["!BroadcastNestedLoopJoin"],
        "sign-LSH probe is a bucket equi join; no nested-loop fallback",
    ),
    "sparse_cosine_pairs": (
        ["HashAggregate", "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"],
        "inverted-index self-join on the term (df-capped) is an EQUI join; "
        "pair scores are a partial+final agg keyed (doc_a, doc_b). (The "
        "plan's one BroadcastNestedLoopJoin is the 1-row corpus-count "
        "broadcast for the idf constant — not a pair join.)",
    ),
    "co_purchase_pairs": (
        ["HashAggregate", "!BroadcastNestedLoopJoin"],
        "basket-keyed self-join; per-basket fan-out bounded by basket size",
    ),
    "asof_purchase_signup": (
        ["Window", "!BroadcastNestedLoopJoin"],
        "as-of is union + one keyed window — not a range join, so no BNLJ "
        "explosion at any scale",
    ),
    "scd2_user_state": (
        ["Window", "!BroadcastNestedLoopJoin"],
        "change-detect and interval-close windows share one (key, ts) "
        "sort; a single Exchange on the entity key feeds both",
    ),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from sentiment_analysis_bigdata_spark import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = io.StringIO()
    out.write(
        "# PLANS — physical-plan audit of representative queries\n\n"
        "Generated by `python tools/plan_audit.py` (sf0.01 inputs; plan shape\n"
        "is scale-invariant, sizes are not). Each section lists the scale\n"
        "property being asserted, then the `explain(\"formatted\")` output.\n"
    )
    failures = []
    for name, (markers, why) in AUDIT.items():
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # "!marker" asserts ABSENCE; "a|b" alternates assert any-present
        missing = []
        for m in markers:
            if m.startswith("!"):
                if m[1:] in plan:
                    missing.append(m)
            elif not any(alt in plan for alt in m.split("|")):
                missing.append(m)
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failures.append((name, missing))
        if "CartesianProduct" in plan:
            failures.append((name, ["CartesianProduct present"]))
        # strip the per-run expression ids to keep the diff stable-ish
        plan_clean = re.sub(r"#\d+L?", "#x", plan)
        out.write(f"\n## {name} — {why} [{status}]\n\n```\n{plan_clean}```\n")
        print(f"  {name}: {status}", file=sys.stderr)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md", file=sys.stderr)
    if failures:
        print(f"AUDIT FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
