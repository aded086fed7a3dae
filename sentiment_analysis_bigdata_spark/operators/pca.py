"""Distributed PCA over an embedding column: one-pass covariance matrix +
power iteration for the dominant principal component.

The 100 TB shape: PCA over n × d embeddings never materializes anything
corpus-sized beyond the single scan — the sufficient statistics
(Σ x xᵀ, Σ x, n) are computed in ONE pass and are d²-sized (d = 64 →
4 096 cells), after which the eigen-problem is a driver-side computation
on a d × d matrix (bounded-collect policy: post-aggregation, dimension-
not data-sized). The heavy step, Σ x xᵀ, runs as an Arrow ``mapInPandas``
kernel that reduces each ~10k-row batch to ONE d × d partial via numpy
GEMM (`X.T @ X`) — emitting d² rows per batch instead of d² per input
row, a ~batch-size× shuffle reduction over the explode-and-aggregate
formulation (same kernel policy as the MinHash/SimHash/GEMM kernels:
Arrow batches, never per-row Python).

Covariance assembles algebraically from the one pass:

    C = (Σ x xᵀ − n μ μᵀ) / (n − 1),   μ = Σ x / n

and the dominant component comes from fixed-iteration power iteration
(v₀ = 1/√d, vₜ₊₁ = C vₜ / ‖C vₜ‖) — deterministic, so a DuckDB oracle
replays the identical recursion unrolled as SQL CTEs (the same
unrolled-oracle technique as BPE training, workloads/train_q.py). Sign is
normalized by the max-|loading| rule (smallest index on ties) so the
eigenvector's direction is engine-independent.

Reference parity: none (the reference has no embedding surface); this is
a north-star LLM-pipeline extension — whitening / dimensionality
reduction / drift directions over embedding tables.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-pass sufficient statistics for covariance: the d² cells of
    Σ x xᵀ as rows (i, j, sxx), plus per-dimension sums via the kernel's
    j = -1 rows (i, -1, Σ x_i) and the count as (-1, -1, n).

    One Arrow kernel pass; each batch contributes d² + d + 1 rows
    regardless of batch size. Final aggregation key space is d² + d + 1 —
    constant in corpus size, so the shuffle is map-side combined down to
    nothing.
    """

    def partial_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            g = X.T @ X  # d × d partial of Σ x xᵀ
            s = X.sum(axis=0)  # d partial of Σ x
            ii, jj = np.indices((dim, dim))
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(dim), [-1]]),
                    "j": np.concatenate(
                        [jj.ravel(), np.full(dim, -1), [-1]]
                    ),
                    "v": np.concatenate([g.ravel(), s, [float(len(pdf))]]),
                }
            )

    return (
        df.select(vec_col)
        .mapInPandas(partial_moments, schema="i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Sample covariance C = (Σ x xᵀ − n μ μᵀ)/(n − 1) as (i, j, c) rows.

    The mean/count sides split off the same moments frame (d- and 1-row
    sub-frames — bounded by construction, safely broadcast by AQE); the
    assembly is two dimension-keyed joins over the d²-row gram frame.
    """
    m = embedding_moments(df, vec_col, dim)
    gram = m.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("k"), F.col("v").alias("s")
    )
    n = m.filter((F.col("i") == -1)).select(F.col("v").alias("n"))
    mi = sums.select(F.col("k").alias("i"), F.col("s").alias("si"))
    mj = sums.select(F.col("k").alias("j"), F.col("s").alias("sj"))
    return (
        gram.join(mi, "i")
        .join(mj, "j")
        .crossJoin(n)
        .select(
            "i",
            "j",
            (
                (F.col("v") - F.col("si") * F.col("sj") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("c"),
        )
    )


def power_iteration(
    cov: list[tuple[int, int, float]], dim: int, iters: int = 12
) -> tuple[list[float], float]:
    """Dominant eigenpair of a d × d covariance given as (i, j, c) cells —
    pure-Python driver math on the bounded matrix, fixed iteration count
    and fixed summation order so any engine replaying the same recursion
    agrees to fp noise. Returns (sign-normalized v, eigenvalue λ = vᵀCv).
    """
    C = [[0.0] * dim for _ in range(dim)]
    for i, j, c in cov:
        C[i][j] = c
    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(iters):
        y = [sum(C[i][j] * v[i] for i in range(dim)) for j in range(dim)]
        nrm = math.sqrt(sum(x * x for x in y))
        if nrm == 0.0:
            break
        v = [x / nrm for x in y]
    lam = sum(
        v[j] * sum(C[i][j] * v[i] for i in range(dim)) for j in range(dim)
    )
    # sign convention: the max-|loading| component is positive (lowest
    # index on ties) — direction is engine-independent
    k = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[k] < 0:
        v = [-x for x in v]
    return v, lam


def pca_top_component(
    df: DataFrame, vec_col: str, dim: int, iters: int = 12
) -> DataFrame:
    """End-to-end dominant principal component of an embedding column:
    (i, loading, eigenvalue, explained_ratio) — one corpus pass (the
    moments kernel), then driver math on the d × d covariance.

    ``explained_ratio`` = λ / trace(C), the share of total variance the
    component carries.
    """
    spark = df.sparkSession
    cov_df = covariance_matrix(df, vec_col, dim)
    cells = [(r["i"], r["j"], r["c"]) for r in cov_df.collect()]
    v, lam = power_iteration(cells, dim, iters)
    trace = sum(c for i, j, c in cells if i == j)
    rows = [
        (i, float(v[i]), float(lam), float(lam / trace) if trace else None)
        for i in range(dim)
    ]
    return spark.createDataFrame(
        rows, "i int, loading double, eigenvalue double, explained_ratio double"
    )
