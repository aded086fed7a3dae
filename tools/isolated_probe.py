"""Isolated per-query probe: 1 cold + N warm noop-sink runs per query in
one fresh session — the round-13 per-query instrument (full-bench extras
swing ±50% from the bench's own accumulated session load; this probe is
what r12/r13 per-query claims rest on).

Usage:
    python tools/isolated_probe.py [--sf DIR] [--warm N] query [query ...]

Prints one JSON line per query: {"query": ..., "cold": s, "warm": [s...],
"load_start": l}. Env: SPARK_GRAFT_SF_DIR overrides --sf default.
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
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark import get_spark

    spark = get_spark("isolated-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # same warmup as bench.py so the first probed query isn't billed for
    # table-footer reads / HOF machinery
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        spark.read.parquet(f"{args.sf}/{t}.parquet").limit(1).count()
    spark.range(10).select(
        F.aggregate(F.array(F.col("id")), F.lit(0).cast("bigint"), lambda a, b: a + b)
    ).count()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"probe: {name}")
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    for name in args.queries:
        load = os.getloadavg()[0]
        cold = run(name)
        warm = [run(name) for _ in range(args.warm)]
        print(
            json.dumps(
                {
                    "query": name,
                    "cold": round(cold, 3),
                    "warm": [round(w, 3) for w in warm],
                    "warm_min": round(min(warm), 3),
                    "load_start": round(load, 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
