"""Vector math over ``array<float|double>`` columns — pure Catalyst exprs.

The similarity-search and embedding-dedup operators (north star) work on the
``embeddings.embedding`` column (``array<float>``, dim 64 in testdata). All
kernels here are higher-order-function expressions (``zip_with`` /
``aggregate``): they run JVM-side with no Python crossing per row, but HOF
lambdas evaluate INTERPRETED (outside whole-stage codegen) and share no
subexpressions — so join-heavy callers should precompute per-row folds once
(e.g. ``norm`` before a pair join: cosine then costs one ``dot`` per pair
instead of ~5 folds; see ``dedup.embedding_near_duplicates``). For very high
dimensions where expression overhead beats Arrow transfer costs, a
pandas-UDF path exists in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (|a||b|); null-safe 0.0 for zero vectors."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance between two arrays."""
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))


def normalize(a: Column | str) -> Column:
    """Unit-normalize an array (zero vector stays zero)."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(_c(a), lambda v: v.cast("double") / n)
    ).otherwise(F.transform(_c(a), lambda v: v.cast("double")))


def hyperplane_sign_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """Random-hyperplane-style LSH bucket from the signs of leading dims.

    Uses axis-aligned hyperplanes (sign of dimension i for i < n_bits) —
    deterministic, reproducible in ANSI SQL for the oracle, and a valid LSH
    family for cosine similarity on roughly isotropic embeddings. Vectors in
    the same bucket agree on all n_bits signs → candidates for near-dup.
    """
    c = _c(a)
    bucket = F.lit(0).cast("bigint")
    for i in range(n_bits):
        bit = F.when(c[i] >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        bucket = bucket * F.lit(2) + bit
    return bucket
