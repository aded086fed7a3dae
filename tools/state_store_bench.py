#!/usr/bin/env python
"""Streaming state-store provider bench (VERDICT r7 #6).

The dual-provider pytest matrix proves SEMANTICS under both
{HDFSBackedStateStoreProvider, RocksDBStateStoreProvider} at test scale;
this tool gives the RocksDB lane — the 100 TB scale path, where state no
longer fits an executor heap — a MEASURED baseline at bench scale: the
four streaming bench extras at sf0.1, cold + warm-median-of-3, under each
provider, in one idle session per provider.

Each provider runs in its own subprocess (the state-store provider is a
session-level conf; mixing them in one JVM would measure a hybrid).
Output: one JSON line per provider + a combined line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

QUERIES = ["streaming_upsert", "streaming_hll", "streaming_bloom", "streaming_cms"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
import __spark_entry__ as entrymod
from sentiment_analysis_bigdata_spark import get_spark

spark = get_spark("state-store-bench")
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = json.loads(os.environ["SPARK_GRAFT_SSB_QUERIES"])

def run(df):
    df.write.format("noop").mode("overwrite").save()

cold, warm = {}, {}
for n in names:
    t0 = time.time(); run(qs[n](spark, sf_dir)); cold[n] = round(time.time() - t0, 3)
for n in names:
    samples = []
    for _ in range(3):
        t0 = time.time(); run(qs[n](spark, sf_dir)); samples.append(time.time() - t0)
    warm[n] = round(sorted(samples)[1], 3)
print("SSB_RESULT " + json.dumps({
    "provider": os.environ.get("SPARK_GRAFT_STATE_STORE", "hdfs") or "hdfs",
    "cold": cold, "warm_median": warm,
    "cold_total": round(sum(cold.values()), 3),
    "warm_total": round(sum(warm.values()), 3),
    "load_1min": round(os.getloadavg()[0], 2),
}))
spark.stop()
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for provider in ["", "rocksdb"]:
        env = dict(os.environ)
        env["SPARK_GRAFT_REPO"] = repo
        env["SPARK_GRAFT_SSB_QUERIES"] = json.dumps(QUERIES)
        if provider:
            env["SPARK_GRAFT_STATE_STORE"] = provider
        else:
            env.pop("SPARK_GRAFT_STATE_STORE", None)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            capture_output=True, text=True,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("SSB_RESULT ")),
            None,
        )
        if line is None:
            # Don't abort: run the remaining provider lanes anyway so a
            # partial run still leaves a machine-readable combined record
            # of which lane succeeded.
            print(f"provider {provider or 'hdfs'} FAILED:\n{proc.stderr[-2000:]}")
            results.append({"provider": provider or "hdfs", "ok": False})
            continue
        rec = json.loads(line[len("SSB_RESULT "):])
        rec["ok"] = True
        print(json.dumps(rec))
        results.append(rec)
    any_failed = any(not r["ok"] for r in results)
    print(json.dumps({"providers": {r["provider"]: r for r in results}}))
    return 1 if any_failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
