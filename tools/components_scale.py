#!/usr/bin/env python
"""Connected-components scaling probe on adversarial chain graphs.

``operators/dedup.connected_components_star`` (large-star/small-star,
Kiveris et al. 2014) exists exactly because min-label propagation needs
O(diameter) rounds — "catastrophic for chain-shaped graphs at 100 TB"
per its docstring. This tool measures that claim instead of arguing it:
K disjoint chains of length L (diameter L-1 — the worst case; real
near-dup/boilerplate graphs are far shallower) at 4×-increasing edge
counts, with a CLOSED-FORM ground truth verified exactly inside Spark
(chain c occupies node ids [c*L, (c+1)*L), so every node's component
must equal floor(id/L)*L — zero mismatches required, not sampled).

Output: one JSON line per size + a combined line for SCALING.md.

Usage: python tools/components_scale.py [--chain-len 1024]
                                        [--edges 1000000 4000000 16000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain-len", type=int, default=1024)
    ap.add_argument(
        "--edges",
        type=int,
        nargs="+",
        default=[1_000_000, 4_000_000, 16_000_000],
    )
    ap.add_argument(
        "--max-rounds",
        type=int,
        default=25,
        help="star-contraction round budget (default matches the operator)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark import get_spark
    from sentiment_analysis_bigdata_spark.operators.dedup import (
        connected_components_star,
    )

    spark = get_spark("components-scale")
    spark.sparkContext.setLogLevel("ERROR")

    L = args.chain_len
    results = []
    for target_edges in args.edges:
        k = max(1, target_edges // (L - 1))
        n_nodes = k * L
        # chain edges (i, i+1) within each block of L ids; one narrow
        # range scan, no shuffle to build
        edges = (
            spark.range(n_nodes)
            .filter((F.col("id") + 1) % L != 0)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        )
        t0 = time.time()
        comp = connected_components_star(
            edges, "a", "b", max_rounds=args.max_rounds
        )
        # exact closed-form verification: component == floor(node/L)*L
        mismatches = comp.filter(
            F.col("component") != (F.floor(F.col("node") / L) * L)
        ).count()
        n_out = comp.count()
        wall = round(time.time() - t0, 2)
        rec = {
            "edges": n_nodes - k,
            "nodes": n_nodes,
            "chains": k,
            "chain_len": L,
            "wall_sec": wall,
            "nodes_verified": n_out,
            "mismatches": mismatches,
            "ok": mismatches == 0 and n_out == n_nodes,
        }
        print(json.dumps(rec))
        results.append(rec)

    ok = all(r["ok"] for r in results)
    combined = {
        "ok": ok,
        "chain_len": L,
        "load_1min": round(os.getloadavg()[0], 2),
        "points": [
            {"edges": r["edges"], "wall_sec": r["wall_sec"]} for r in results
        ],
    }
    if len(results) >= 2:
        combined["wall_growth_per_step"] = [
            round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2)
            for a, b in zip(results, results[1:])
        ]
    print("CCS_COMBINED " + json.dumps(combined))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
