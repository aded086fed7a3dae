"""One-off kernel shootout for SimHash signature computation at sf0.1.

Variants:
  A  per-row HOF expression (hashing.simhash64 — zip_with vote array)
  B  Arrow mapInPandas numpy vote kernel over JVM md5 hashes
     (dedup.simhash_signatures — the production kernel)
  C  per-bit HOF folds (60 separate F.aggregate over the hash array)
  D  Arrow mapInPandas kernel (hashlib.md5 + numpy popcount votes)

Prints per-variant warm seconds; values cross-checked for equality.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark import get_spark
from sentiment_analysis_bigdata_spark.functions import hashing as H
from sentiment_analysis_bigdata_spark.functions import text as TXT
from sentiment_analysis_bigdata_spark.operators import dedup as DD

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BITS = H.MD5_PREFIX_HEX_CHARS * 4


def variant_a(docs):
    return docs.select(
        "doc_id", H.simhash64(TXT.tokenize_nonempty("text")).alias("simhash")
    )


def variant_b(docs):
    return DD.simhash_signatures(docs)


def variant_c(docs):
    hs = F.transform(TXT.tokenize_nonempty("text"), H.md5_hash64_expr)
    d = docs.select("doc_id", hs.alias("__hs"))
    sig = None
    for j in range(N_BITS):
        vote = F.aggregate(
            F.col("__hs"),
            F.lit(0).cast("bigint"),
            lambda acc, h, j=j: acc
            + F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        term = (
            F.when(vote > 0, F.lit(1 << j).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
        )
        sig = term if sig is None else sig + term
    return d.select("doc_id", sig.alias("simhash"))


def _simhash_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = np.zeros(len(pdf), dtype=np.int64)
        for i, text in enumerate(pdf["text"]):
            toks = (text or "").lower().split()
            toks = [t for t in toks if t]
            if not toks:
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    for t in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            # bits[n_tokens, 60]: 1 where bit set
            bits = (hs[:, None] >> np.arange(N_BITS)[None, :]) & 1
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = int(((votes > 0) << np.arange(N_BITS)).sum())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})


def variant_d(docs):
    return docs.select("doc_id", "text").mapInPandas(
        _simhash_pandas, schema="doc_id long, simhash long"
    )


def main():
    spark = get_spark("simhash-kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.limit(1).count()

    variants = {"A_hof_expr": variant_a, "B_prod_kernel": variant_b,
                "C_perbit_hof": variant_c, "D_pandas": variant_d}
    results = {}
    for name, fn in variants.items():
        df = fn(docs)
        df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        results[name] = min(times)
        print(f"{name}: {min(times):.3f}s  {times}")

    # value parity on a sample
    a = {r["doc_id"]: r["simhash"] for r in variant_a(docs.limit(200)).collect()}
    for name, fn in list(variants.items())[1:]:
        got = {r["doc_id"]: r["simhash"] for r in fn(docs.limit(200)).collect()}
        bad = [k for k in a if a[k] != got.get(k)]
        print(f"{name} parity: {'OK' if not bad else f'MISMATCH {bad[:5]}'}")
    spark.stop()


if __name__ == "__main__":
    main()
