"""Frequency-sketch operators for huge key spaces.

``heavy_hitters`` is the scale pattern for "top-k over trillions of distinct
keys": a plain ``groupBy(key).count()`` shuffles every distinct key, which
at 100 TB means a shuffle the size of the key space. Instead:

pass 1  map-side candidate generation — each partition keeps only its local
        top-m keys (a bounded Counter inside ``mapInPandas``; no shuffle of
        the long tail), then the tiny candidate union is collected;
pass 2  exact recount of ONLY the candidates (broadcast semi join → narrow
        filter → groupBy over ≤ partitions×m keys) → global top-k.

Counts for surviving keys are EXACT (pass 2 recounts from the source), so
the result is value-checkable against a plain SQL top-k — the approximation
only affects which keys make the candidate set, and any key that is in the
true top-k in aggregate is in the local top-m of enough partitions in
practice (guaranteed when m ≥ k and a top-k key is top-m in at least one
partition; increase ``per_partition`` for skew-free data).

Two scans beat one full-keyspace shuffle at scale; the second scan's
aggregation state is bounded by the candidate count, not the key space.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candidate_keys(df: DataFrame, col: str, per_partition: int = 200) -> DataFrame:
    """Pass 1: per-partition local top-``per_partition`` keys by count.

    Arrow-batched; state per partition is one bounded Counter. Emits each
    partition's candidates once, at end-of-partition.
    """

    def local_topm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[col].dropna())
        if counts:
            top = [k for k, _ in counts.most_common(per_partition)]
            yield pd.DataFrame({col: top})

    return df.select(col).mapInPandas(local_topm, schema=f"{col} string").distinct()


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    per_partition: int = 200,
) -> DataFrame:
    """Exact-count top-k over a huge key space without a full-keyspace
    shuffle (see module docstring). Deterministic tie-break:
    (count desc, key asc). Returns (col, n).
    """
    # candidate count is bounded by partitions × per_partition but
    # data-dependent, so no broadcast hint — AQE broadcasts while it fits
    cand = candidate_keys(df, col, per_partition)
    exact = (
        df.join(cand, col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), F.col(col).asc()).limit(k)
