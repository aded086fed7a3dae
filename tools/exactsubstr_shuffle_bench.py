#!/usr/bin/env python
"""ExactSubstr shuffle-volume A/B: winnowing-anchor prefilter on vs off.

VERDICT r8 #3: the stride-1 window explode shuffles ~24 bytes per corpus
character; the anchor prefilter (operators/dedup._exactsubstr_marked,
``prefilter=``) should cut the first corpus-wide shuffle to the anchor
density (~2/(W0+1) of positions) plus candidate-region traffic. This tool
MEASURES it instead of asserting it: each variant runs in its own
subprocess (fresh JVM, UI enabled) executing exact_substring_spans +
exact_substring_attribution + exact_substring_removal on the fixture
documents table, then reads total shuffle write/read bytes and records
from the Spark status REST API. Also cross-checks that both variants
return identical span rows.

Usage: python tools/exactsubstr_shuffle_bench.py [--sf DIR] [--min-len 40]
                                                 [--corpus table|lowdup]
Prints one JSON line per variant and a combined summary line for
SCALING.md.

``--corpus lowdup`` (VERDICT r9 #4) swaps the fixture documents table —
pathologically self-similar, 480 planted spans over 5k docs, so its
candidate-region exact pass is bounded below by a large true-dup mass —
for a synthesized SAME-SHAPE corpus (5k docs x ~290 chars, matching the
sf0.1 documents profile) whose texts are per-doc md5 chains (cross-doc
window collisions cryptographically negligible) with ONE 60-char block
planted into 1% of docs. This is the realistic low-dup-rate regime where
the prefilter's residual shuffle should approach the ~2/(W0+1) = 0.12x
anchor-density floor instead of the fixture's 0.58x.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
from sentiment_analysis_bigdata_spark import get_spark
from sentiment_analysis_bigdata_spark.operators import dedup as DD
from sentiment_analysis_bigdata_spark.sources.catalog import load_table
from sentiment_analysis_bigdata_spark.sources import ensure_min_parallelism

sf_dir = os.environ["SPARK_GRAFT_ESB_SF"]
L = int(os.environ["SPARK_GRAFT_ESB_L"])
prefilter = os.environ["SPARK_GRAFT_ESB_PREFILTER"] == "1"
corpus = os.environ.get("SPARK_GRAFT_ESB_CORPUS", "table")
spark = get_spark("exactsubstr-shuffle-bench", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
if corpus == "lowdup":
    from pyspark.sql import functions as F

    n_docs = int(os.environ.get("SPARK_GRAFT_ESB_NDOCS", "5000"))
    # Same shape as sf0.1 documents (default 5k docs, ~290 chars): 9
    # chained md5(salt || doc_id) segments = 288 hex chars, unique per
    # doc, so cross-doc duplicated windows are negligible except ONE
    # 60-char block planted into every 100th doc at offset 100.
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            *[
                F.md5(F.concat(F.lit(f"seg{i}-"), F.col("id").cast("string")))
                for i in range(9)
            ],
        ).alias("text"),
    )
    block = "PLANTED-DUPLICATE-BLOCK-" + "QWERTYUIOPASDFGHJKLZXCVBNM0123456789"
    docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 100 == 0,
            F.concat(
                F.substring("text", 1, 100),
                F.lit(block),
                F.expr("substring(text, 161)"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
else:
    docs = load_table(spark, sf_dir, "documents")
docs = ensure_min_parallelism(
    docs, spark.sparkContext.defaultParallelism, "doc_id"
)

t0 = time.time()
# drive the three public consumers the way the registry queries do
# (spans is the checksum carrier)
span_rows = sorted(
    (r["doc_id"], r["span_start"], r["span_end"])
    for r in DD.exact_substring_spans(docs, min_len=L, prefilter=prefilter).collect()
)
DD.exact_substring_attribution(docs, min_len=L, prefilter=prefilter).count()
DD.exact_substring_removal(docs, min_len=L, prefilter=prefilter).count()
elapsed = round(time.time() - t0, 3)

import hashlib
checksum = hashlib.md5(json.dumps(span_rows).encode()).hexdigest()

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId
stages = json.loads(
    urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages").read()
)
sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
swr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
print("ESB_RESULT " + json.dumps({
    "prefilter": prefilter,
    "shuffle_write_bytes": sw,
    "shuffle_read_bytes": sr,
    "shuffle_write_records": swr,
    "n_stages": len(stages),
    "span_rows": len(span_rows),
    "span_checksum": checksum,
    "elapsed_sec": elapsed,
}))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-len", type=int, default=40)
    ap.add_argument("--corpus", choices=["table", "lowdup"], default="table")
    ap.add_argument(
        "--n-docs",
        type=int,
        default=5000,
        help="lowdup corpus size (ignored for --corpus table); use to "
        "measure the shuffle/wall scaling curve vs corpus bytes",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = []
    for prefilter in ("0", "1"):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_REPO=repo,
            SPARK_GRAFT_ESB_SF=args.sf,
            SPARK_GRAFT_ESB_L=str(args.min_len),
            SPARK_GRAFT_ESB_PREFILTER=prefilter,
            SPARK_GRAFT_ESB_CORPUS=args.corpus,
            SPARK_GRAFT_ESB_NDOCS=str(args.n_docs),
        )
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            capture_output=True, text=True,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("ESB_RESULT ")),
            None,
        )
        if line is None:
            print(f"variant prefilter={prefilter} FAILED:\n{proc.stderr[-3000:]}")
            results.append({"prefilter": prefilter == "1", "ok": False})
            continue
        rec = json.loads(line[len("ESB_RESULT "):])
        rec["ok"] = True
        print(json.dumps(rec))
        results.append(rec)

    ok = all(r["ok"] for r in results)
    summary = {
        "sf": os.path.basename(args.sf.rstrip("/")),
        "min_len": args.min_len,
        "corpus": args.corpus,
        "n_docs": args.n_docs if args.corpus == "lowdup" else None,
    }
    if ok:
        off, on = results
        summary.update(
            checksums_match=off["span_checksum"] == on["span_checksum"],
            shuffle_write_bytes_off=off["shuffle_write_bytes"],
            shuffle_write_bytes_on=on["shuffle_write_bytes"],
            write_ratio=round(
                on["shuffle_write_bytes"] / max(off["shuffle_write_bytes"], 1), 4
            ),
            shuffle_write_records_off=off["shuffle_write_records"],
            shuffle_write_records_on=on["shuffle_write_records"],
            records_ratio=round(
                on["shuffle_write_records"] / max(off["shuffle_write_records"], 1),
                4,
            ),
            elapsed_off=off["elapsed_sec"],
            elapsed_on=on["elapsed_sec"],
        )
    summary["ok"] = ok and summary.get("checksums_match", False)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
