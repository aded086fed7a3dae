#!/usr/bin/env python
"""Reliable-checkpoint mode bench (VERDICT r9 #3).

``plans/barrier.py``'s SPARK_GRAFT_CHECKPOINT_DIR switch is
parity-tested (tests/test_reliable_checkpoint.py) but its COST was only
characterized at test scale. This tool prices the cluster-posture
switch at bench scale, the same way RocksDB (state_store_bench.py) and
skew salting (skew_stress_bench.py) got priced: the iterative-operator
lane — Lloyd k-means, the pagerank family, connected components
(both propagation and large-star/small-star), label propagation, BFS,
and the ExactSubstr family — at sf0.1, cold + warm-median-of-3, under
each barrier mode in its own subprocess (the checkpoint root is
session-level state; one JVM per mode keeps the lanes clean).

In reliable mode the child also reports bytes written under the
checkpoint directory per query (cumulative directory-walk delta), since
on a real cluster that is HDFS/object-store traffic billed per barrier.

Output: one JSON line per mode + a combined line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

QUERIES = [
    "kmeans_clusters",
    "kmeans_broadcast",
    "pagerank_purchases",
    "personalized_pagerank",
    "dedup_components",
    "dedup_components_star",
    "label_propagation",
    "bfs_hops",
    "dup_ngram_spans",
    "exactsubstr_clusters",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
import __spark_entry__ as entrymod
from sentiment_analysis_bigdata_spark import get_spark

spark = get_spark("checkpoint-bench")
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = json.loads(os.environ["SPARK_GRAFT_CKB_QUERIES"])
ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")

def run(df):
    df.write.format("noop").mode("overwrite").save()

def ckpt_bytes():
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return 0
    total = 0
    for root, _dirs, files in os.walk(ckpt_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total

cold, warm, wrote = {}, {}, {}
for n in names:
    b0 = ckpt_bytes()
    t0 = time.time(); run(qs[n](spark, sf_dir)); cold[n] = round(time.time() - t0, 3)
    wrote[n] = ckpt_bytes() - b0
for n in names:
    samples = []
    for _ in range(3):
        t0 = time.time(); run(qs[n](spark, sf_dir)); samples.append(time.time() - t0)
    warm[n] = round(sorted(samples)[1], 3)
print("CKB_RESULT " + json.dumps({
    "mode": "reliable" if ckpt_dir else "local",
    "cold": cold, "warm_median": warm,
    "ckpt_bytes_cold": wrote,
    "ckpt_bytes_total": ckpt_bytes(),
    "cold_total": round(sum(cold.values()), 3),
    "warm_total": round(sum(warm.values()), 3),
    "load_1min": round(os.getloadavg()[0], 2),
}))
spark.stop()
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    rc = 0
    with tempfile.TemporaryDirectory(prefix="ckb-") as tmp:
        for mode in ["local", "reliable"]:
            env = dict(os.environ)
            env["SPARK_GRAFT_REPO"] = repo
            env["SPARK_GRAFT_CKB_QUERIES"] = json.dumps(QUERIES)
            if mode == "reliable":
                env["SPARK_GRAFT_CHECKPOINT_DIR"] = os.path.join(tmp, "ckpt")
            else:
                env.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD], env=env, cwd=repo,
                capture_output=True, text=True,
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("CKB_RESULT ")),
                None,
            )
            if line is None:
                # keep going so a partial run still leaves a combined record
                print(proc.stderr[-2000:], file=sys.stderr)
                results.append({"mode": mode, "error": f"exit {proc.returncode}"})
                rc = 1
                continue
            results.append(json.loads(line[len("CKB_RESULT "):]))
            print(line[len("CKB_RESULT "):])
    ok = [r for r in results if "error" not in r]
    combined = {"lanes": results}
    if len(ok) == 2:
        local, rel = ok[0], ok[1]
        combined["warm_overhead_x"] = {
            n: round(rel["warm_median"][n] / max(local["warm_median"][n], 1e-9), 3)
            for n in QUERIES
        }
        combined["warm_total_overhead_x"] = round(
            rel["warm_total"] / max(local["warm_total"], 1e-9), 3
        )
        combined["ckpt_mb_total"] = round(rel["ckpt_bytes_total"] / 1e6, 1)
    print("CKB_COMBINED " + json.dumps(combined))
    return rc


if __name__ == "__main__":
    sys.exit(main())
