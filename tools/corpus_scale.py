"""Corpus-pipeline scale run: the full LLM-training-data path —
synthesize → annotate/filter → transitive near-dedup → token-window chunk
→ pack → training-mix shard — at hundreds of thousands of documents,
with per-stage wall-clock and end-to-end invariant asserts.

The companion to ``tools/scale_run.py`` (which proves the ML path at
reference scale): this proves the curation path's throughput and
correctness hold well beyond the sf0.1 bench corpus. The synthetic corpus
is generated DISTRIBUTEDLY (``spark.range`` + Catalyst expressions, no
driver-side rows) with planted redundancy whose rate the dedup stages must
recover:

- 10 % exact duplicates (every doc_id ≡ 9 (mod 10) reuses the decade
  base's content seed),
- 10 % near duplicates (doc_id ≡ 8 (mod 10): base text + a 3-token tail →
  high-Jaccard neighbor of the base, caught by MinHash, not by exact).

Usage: python tools/corpus_scale.py [n_docs]   (default 200,000)
Prints one JSON line: {"n_docs": N, "stages": {name: sec}, "stats": {...}}
Exits nonzero if any invariant fails.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKENS_PER_DOC = 40
VOCAB = 5000


def synthesize(spark, n_docs: int):
    """Zipf-shaped docs with planted exact/near duplicates, all Catalyst."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    seed = F.when(
        F.col("doc_id") % 10 == 9, F.col("doc_id") - 9
    ).when(
        F.col("doc_id") % 10 == 8, F.col("doc_id") - 8
    ).otherwise(F.col("doc_id"))

    def word(i):
        # Zipf-ish: rank = h % (1 + h' % VOCAB) biases toward low ranks
        h = F.abs(F.xxhash64(seed, F.lit(7), i))
        rank = h % (1 + (F.abs(F.xxhash64(seed, i)) % VOCAB))
        return F.concat(F.lit("w"), rank.cast("string"))

    body = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)), word), " "
    )
    text = F.when(
        F.col("doc_id") % 10 == 8, F.concat(body, F.lit(" near dup tail"))
    ).otherwise(body)
    return base.select(
        "doc_id",
        text.alias("text"),
        (F.abs(F.xxhash64("doc_id", F.lit(3))) % 5).cast("string").alias("source"),
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from pyspark.sql import functions as F

    from sentiment_analysis_bigdata_spark import get_spark
    from sentiment_analysis_bigdata_spark.apps import corpus as C
    from sentiment_analysis_bigdata_spark.operators.chunking import chunk_tokens

    spark = get_spark("corpus-scale")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="corpus_scale_")
    stages: dict[str, float] = {}
    stats: dict[str, object] = {"n_docs": n_docs}
    failures: list[str] = []

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                stages[name] = round(time.time() - self.t0, 2)

        return _T()

    try:
        raw = f"{work}/raw"
        with stage("synthesize"):
            synthesize(spark, n_docs).write.mode("overwrite").parquet(raw)

        cleaned = f"{work}/clean"
        with stage("annotate_filter"):
            clean_stats = C.clean_corpus(
                spark, raw, cleaned, min_quality=0.0, min_tokens=5
            )
        stats["clean"] = clean_stats

        # Gopher composite gate at corpus scale: the synthetic vocabulary
        # is 'w<rank>' tokens, so the alphabetic / mean-word-length /
        # symbol rules PASS every doc while the 40-token docs fail the
        # 50-word floor and (having no English stopwords) the stopword
        # rule — exact, closed-form expectations at any n_docs.
        with stage("gopher_gate"):
            from sentiment_analysis_bigdata_spark.workloads.text_q import (
                gopher_rules_frame,
            )

            rules = gopher_rules_frame(spark.read.parquet(cleaned), [])
            g = rules.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((~F.col("ok_wc")).cast("bigint")).alias("f_wc"),
                F.sum((~F.col("ok_stop")).cast("bigint")).alias("f_stop"),
                F.sum((~F.col("ok_mwl")).cast("bigint")).alias("f_mwl"),
                F.sum((~F.col("ok_sym")).cast("bigint")).alias("f_sym"),
                F.sum((~F.col("ok_alpha")).cast("bigint")).alias("f_alpha"),
            ).first()
        stats["gopher"] = {k: int(g[k]) for k in ("n", "f_wc", "f_stop")}
        if not (g["f_wc"] == g["f_stop"] == g["n"]):
            failures.append(f"gopher gate: expected all {g['n']} docs to fail wc+stopwords, got {g['f_wc']}/{g['f_stop']}")
        if g["f_mwl"] != 0 or g["f_sym"] != 0 or g["f_alpha"] != 0:
            failures.append("gopher gate: mwl/sym/alpha rules should pass the synthetic vocab")

        deduped = f"{work}/dedup"
        with stage("cluster_dedup"):
            dd = C.cluster_dedup_corpus(
                spark, cleaned, deduped, method="minhash", threshold=0.8
            )
        stats["dedup"] = dd
        # planted redundancy: ~20% of rows (the ≡8 and ≡9 residues) share a
        # decade base. Exact catches the ≡9s; MinHash must catch the ≡8s.
        expected = int(n_docs * 0.2)
        if not expected * 0.9 <= dd["removed"] <= expected * 1.1:
            failures.append(
                f"dedup removed {dd['removed']}, expected ~{expected}"
            )

        with stage("chunk"):
            docs = spark.read.parquet(deduped).select(
                "doc_id", F.split("text", " ").alias("toks")
            )
            chunks = chunk_tokens(docs, "toks", size=32, stride=24)
            n_chunks = chunks.count()
        stats["n_chunks"] = n_chunks
        if n_chunks < dd["rows_out"]:
            failures.append(f"{n_chunks} chunks < {dd['rows_out']} docs")

        packed = f"{work}/packed"
        with stage("pack"):
            pk = C.pack_corpus(spark, deduped, packed, max_tokens=2048)
        stats["pack"] = pk
        if not 0 < pk["avg_fill"] <= 2048:
            failures.append(f"bad avg shard fill {pk['avg_fill']}")

        mixed = f"{work}/mixed"
        with stage("mix"):
            mx = C.mix_corpus(
                spark, deduped, mixed, balance_col="source", n_shards=32
            )
        stats["mix"] = mx
        if mx["rows_out"] != sum(mx["splits"].values()):
            failures.append("mix split counts don't sum to rows_out")

        total = round(sum(stages.values()), 2)
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "stages": stages,
                    "total_sec": total,
                    "docs_per_sec": round(n_docs / total),
                    "stats": stats,
                    "failures": failures,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    if failures:
        print(f"FAILURES: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
