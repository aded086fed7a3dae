"""Deterministic Lloyd's k-means over an embedding column.

The reference has no clustering surface (its 1,077 LoC stop at three
classifiers — SURVEY §2.6), but a training-data pipeline organizes a
corpus by clustering its embeddings (topic balancing, per-cluster
sampling, duplicate-cluster inspection). MLlib's ``KMeans`` is the
production path, but its kmeans|| init is RNG-dependent and therefore
not SQL-replayable; this operator is the *value-checkable* twin: every
step is a plain DataFrame composition with fixed, documented arithmetic,
so a DuckDB oracle can replay the identical recursion (see
``workloads/cluster_q.py``).

Determinism contract (what makes the oracle exact):

- **Init**: the centroids are the vectors of the ``k`` smallest ids
  (cluster_id = rank of the seed id). No RNG.
- **Assign**: squared L2 distance computed left-to-right over the
  dimensions (``F.aggregate`` over ``zip_with`` — the same sequential
  IEEE sum as DuckDB's ``list_sum(list_transform(...))``); argmin tie
  breaks to the lowest cluster_id via lexicographic ``array_min`` on
  ``(dist, cluster_id)`` structs.
- **Re-estimate**: per-(cluster, dim) mean via ``posexplode`` →
  ``groupBy`` → ``avg``, ROUNDED to ``round_digits`` (default 9) before
  becoming the next iteration's literals. Both engines consume the same
  rounded values, so cross-engine float drift (partial-agg association
  order, ~1e-15) cannot cascade into a flipped assignment.
- An empty cluster keeps its previous centroid (documented, replayed
  identically by the oracle via COALESCE).

Scale shape (100 TB): each iteration is ONE shuffle — ``posexplode``
then a partial+final hash agg keyed (cluster_id, dim) with k×d output
rows; the k×d centroid model rides to the executors as codegen'd
literals (k ≤ a few hundred; beyond that you'd switch the assign step
to a broadcast join on a centroid frame). Driver traffic per iteration
is k×d doubles. No global sort, no cartesian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist_sql(vec_col: str, center: list[float]) -> str:
    """Sequential left-to-right sum of squared per-dim diffs (matches
    DuckDB ``list_sum`` order for bit-stable cross-engine replay).

    Emitted as SQL TEXT, not Column-API calls: k centroids × (zip_with +
    aggregate + 2 lambdas) through py4j cost ~1.7 s of driver time PER
    assign at k=16 — rebuilt every Lloyd round; one ``selectExpr`` parse
    of the same expressions is milliseconds, and the parsed plan (and so
    the arithmetic) is identical. Float literals use repr(), which
    round-trips exactly."""
    arr = "array(" + ", ".join(f"{float(x)!r}D" for x in center) + ")"
    return (
        f"aggregate(zip_with(CAST({vec_col} AS array<double>), {arr}, "
        f"(x, c) -> (x - c) * (x - c)), 0.0D, (acc, x) -> acc + x)"
    )


def _assign(df: DataFrame, vec_col: str, centers: list[list[float]]) -> DataFrame:
    """Add ``cluster_id`` (argmin of squared L2; ties → lowest cid via
    lexicographic struct array_min) and ``dist2`` columns. Centroids are
    inline literals; the struct is selected once and fields projected in
    a second step (a top-level alias is not re-inlined, so the k folds
    run once per row)."""
    cands = ", ".join(
        f"struct({_sqdist_sql(vec_col, ctr)} AS d, {i} AS cid)"
        for i, ctr in enumerate(centers)
    )
    return (
        df.selectExpr("*", f"array_min(array({cands})) AS _best")
        .selectExpr("*", "_best.cid AS cluster_id", "_best.d AS dist2")
        .drop("_best")
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 2,
    round_digits: int = 9,
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds from the k-smallest-id seeds and
    return the final assignment frame: ``(id_col, cluster_id, dist2)``.

    ``iterations`` counts re-estimation rounds; the returned assignment
    uses the centroids produced by the last round.
    """
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centers: list[list[float]] = [list(r["v"]) for r in seeds]
    dim = len(centers[0])

    for _ in range(iterations):
        assigned = _assign(df, vec_col, centers)
        rows = (
            assigned.select(
                "cluster_id",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim", "val"
                ),
            )
            .groupBy("cluster_id", "dim")
            .agg(F.round(F.avg("val"), round_digits).alias("m"))
            .collect()
        )
        new_centers = [list(c) for c in centers]  # empty cluster keeps old
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cluster_id"], {})[r["dim"]] = r["m"]
        for cid, dims in by_cid.items():
            new_centers[cid] = [dims[i] for i in range(dim)]
        centers = new_centers

    return _assign(df, vec_col, centers).select(
        F.col(id_col), "cluster_id", "dist2"
    )


def kmeans_summary(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Per-cluster size + inertia (sum of squared distances), the
    standard clustering fit report."""
    assigned = kmeans_lloyd(df, vec_col, id_col, k=k, iterations=iterations)
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("dist2"), 6).alias("inertia"),
    )


def semdedup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embeddings, then inside each cluster remove every point with cosine
    ≥ ``threshold`` to a lower-id point. Clustering bounds the pairwise
    check to within-cluster blocks — the k-means step is what makes
    semantic dedup sub-quadratic (``k`` grows with the corpus so block
    sizes stay bounded; the paper uses 50k clusters for LAION).

    Keep-first policy (remove the higher id of every pair), same as
    :func:`~..operators.dedup.dedup_cascade`. Returns the per-cluster
    report ``(cluster_id, n_points, n_removed, n_kept)``.

    Per-pair cost: the L2 norms are precomputed ONCE per row (HOF folds
    are interpreted, no CSE — evaluating them per pair multiplies the
    in-cluster block cost ~5×), so each candidate pair pays exactly one
    dot-product fold; the cosine value ``dot/(na·nb)`` is IEEE-identical
    to the per-pair formulation, so the oracle is unchanged.
    """
    from sentiment_analysis_bigdata_spark.functions import vector as V

    assigned = kmeans_lloyd(emb, vec_col, id_col, k=k, iterations=iterations)
    base = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            V.norm(F.col(vec_col)).alias("nrm"),
        )
        .join(
            assigned.select(F.col(id_col).alias("id"), "cluster_id"), "id"
        )
        .localCheckpoint(eager=True)
    )
    l, r = base.alias("l"), base.alias("r")
    denom = F.col("l.nrm") * F.col("r.nrm")
    pairs = (
        l.join(
            r,
            (F.col("l.cluster_id") == F.col("r.cluster_id"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.when(
                denom > 0, V.dot(F.col("l.v"), F.col("r.v")) / denom
            )
            .otherwise(F.lit(0.0))
            .alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    removed = pairs.select(F.col("b").alias("id")).distinct().withColumn(
        "_rm", F.lit(1)
    )
    flagged = base.join(removed, "id", "left")
    return flagged.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.coalesce(F.col("_rm"), F.lit(0))).alias("n_removed"),
        F.sum(
            F.when(F.col("_rm").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_kept"),
    )


def knn_graph(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iterations: int = 2,
    n_neighbors: int = 3,
) -> DataFrame:
    """Approximate kNN graph via cluster blocking: each vector's top
    ``n_neighbors`` by cosine among its OWN k-means cluster — the
    IVF-nprobe=1 shape for building similarity graphs (diversity
    sampling, graph-based label propagation over corpus neighborhoods).
    Deterministic cut: (cosine desc, neighbor id asc) row_number.

    Same scale shape as :func:`semdedup`: per-cluster blocks bound the
    pair work at n²/k, row norms precomputed once, one window per
    cluster-blocked pair frame. Recall vs exact kNN is a measurable
    trade (raise k and probe adjacent clusters to improve it — see
    ``similarity.ivf_topk`` for the multi-probe variant).
    """
    from pyspark.sql import Window

    from sentiment_analysis_bigdata_spark.functions import vector as V

    assigned = kmeans_lloyd(emb, vec_col, id_col, k=k, iterations=iterations)
    base = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            V.norm(F.col(vec_col)).alias("nrm"),
        )
        .join(assigned.select(F.col(id_col).alias("id"), "cluster_id"), "id")
        .localCheckpoint(eager=True)
    )
    l, r = base.alias("l"), base.alias("r")
    denom = F.col("l.nrm") * F.col("r.nrm")
    pairs = l.join(
        r,
        (F.col("l.cluster_id") == F.col("r.cluster_id"))
        & (F.col("l.id") != F.col("r.id")),
    ).select(
        F.col("l.id").alias("id"),
        F.col("r.id").alias("neighbor"),
        F.when(denom > 0, V.dot(F.col("l.v"), F.col("r.v")) / denom)
        .otherwise(F.lit(0.0))
        .alias("cos"),
    )
    w = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("neighbor"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_neighbors)
        .select("id", "neighbor", F.round("cos", 6).alias("cosine"), "rank")
    )
