"""Headline-only floor probe: cold + N warm passes of bench.py's frozen
28-query headline set against a given repo checkout — the paired-A/B
instrument that separates host co-tenancy from real plan regressions.

Full bench runs cost ~13 min and spend most of it on the 131 extras, so
cross-round floor questions ("is 18.8 s a regression or a slow host?")
were previously answered by archaeology over old snapshots taken under
different load. This probe answers them experimentally: check out the
comparison commit in a worktree (``git worktree add /tmp/rNNcode <sha>``)
and run BOTH checkouts back-to-back in both orders — the r12 disposition
(bench_results/floor_ab_r12.json) found within-code spread (15.1-17.8 s)
exceeding the between-code delta (0.07 s), settling the question in four
5-minute runs.

PYTHONPATH must carry the target checkout so local-mode Python workers
can import the package (driver-side sys.path does not propagate).

Usage:
    PYTHONPATH=<repo_dir> python tools/headline_floor.py <repo_dir> [warm_runs]
"""
import json
import os
import sys
import time

repo = sys.argv[1]
warm_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sys.path.insert(0, repo)

import bench  # noqa: E402  (the checkout's own HEADLINE list)
import __spark_entry__ as entrymod  # noqa: E402
from sentiment_analysis_bigdata_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
load_start = os.getloadavg()[0]
spark = get_spark("headline-probe")
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
spark.range(10).select(
    F.aggregate(F.array(F.col("id")), F.lit(0).cast("bigint"), lambda a, b: a + b)
).count()


def run(df):
    df.write.format("noop").mode("overwrite").save()


cold = {}
for name in bench.HEADLINE:
    t0 = time.time()
    run(qs[name](spark, sf_dir))
    cold[name] = round(time.time() - t0, 3)

samples = {n: [] for n in bench.HEADLINE}
for _ in range(warm_runs):
    for name in bench.HEADLINE:
        t0 = time.time()
        run(qs[name](spark, sf_dir))
        samples[name].append(round(time.time() - t0, 3))

warm_min = {n: min(v) for n, v in samples.items()}
print(json.dumps({
    "repo": repo,
    "cold_total": round(sum(cold.values()), 3),
    "warm_min_total": round(sum(warm_min.values()), 3),
    "warm_runs": warm_runs,
    "queries_warm_min": warm_min,
    "load": {"start": round(load_start, 2), "end": round(os.getloadavg()[0], 2)},
}))
spark.stop()
