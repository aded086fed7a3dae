"""Similarity search over embedding columns (north star).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Queries × corpus via broadcast of the (small) query side; per-query top-k
  by window row_number. Exact but O(|Q|·n): right for small query sets or
  as the verifier for the ANN path.
- ``lsh_topk``: sign-LSH-bucketed approximate top-k — the scale path. The
  corpus is hashed once into 2^n_bits buckets; each query probes its own
  bucket (plus optional Hamming-1 neighbor buckets), so per-query work is
  n/2^n_bits on isotropic data.
- ``ivf_topk``: IVF-style probing with data-derived centroids (kmeans|| via
  MLlib) — the classic ANN layout; nlist/nprobe trade recall vs cost.

All distance math is JVM-side Catalyst expressions (functions.vector); an
Arrow-batched pandas-UDF kernel is provided for very high dimensions where
numpy matrix multiply beats per-element codegen (``cosine_topk_pandas``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import vector as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank), rank 1..k.

    Broadcast the query side (assumed ≪ corpus); the corpus is scanned once
    with no shuffle until the tiny per-query top-k window. Deterministic
    tie-break: cosine desc, vec_id asc. Self-matches (same id) excluded.
    """
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.cosine_similarity(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("cosine"), "rank")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    label_col: str = "label",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_label: str = "query_label",
) -> DataFrame:
    """Contrastive hard-negative mining — the training-pair prep step of
    embedding/reranker fine-tuning (triplet / InfoNCE losses): per anchor
    query, the ``k`` MOST similar corpus vectors with a DIFFERENT label.
    Random negatives are trivially separable; the hardest (most similar)
    negatives carry the gradient signal, and mining them is exactly an
    ANN query with a label-disagreement predicate.

    Same scale contract as :func:`brute_force_topk`: the anchor set
    broadcasts (plan-visible GlobalLimit upstream), the corpus is
    scanned once, and the per-anchor cut is a k-row window — at corpus
    scale the same predicate composes with the IVF path instead
    (:func:`ivf_topk` then filter+re-rank, over-fetching by the expected
    same-label fraction). Deterministic tie-break (cosine desc, id asc).
    Returns ``(query_id, vec_id, label, cosine, rank)``.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("qv"),
            F.col(query_label).alias("qlabel"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        F.col(label_col).alias("label"),
    )
    scored = (
        c.crossJoin(q)
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "vec_id",
            "label",
            V.cosine_similarity(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH buckets.

    Corpus and queries are bucketed by leading-dimension signs; candidates
    = same bucket (plus, with ``multiprobe``, all Hamming-1 buckets — flips
    of one sign bit — which substantially lifts recall for near-boundary
    vectors). Join shuffles on bucket, then exact cosine + top-k within
    candidates. At 100 TB the corpus side would be written bucket-partitioned
    so the probe join is pruned I/O, not a shuffle.
    """
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        V.hyperplane_sign_bucket(corpus_vec, n_bits).alias("bucket"),
    )
    qb = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        V.hyperplane_sign_bucket(query_vec, n_bits).alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
        )
        qb = qb.select("query_id", "qv", F.explode(probes).alias("bucket"))
    else:
        qb = qb.select("query_id", "qv", F.col("qbucket").alias("bucket"))
    scored = (
        c.join(F.broadcast(qb), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.cosine_similarity(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _fit_centroids(
    corpus: DataFrame, nlist: int, corpus_vec: str, seed: int
) -> list[list[float]]:
    """kmeans|| over the corpus → nlist centroid vectors (k-row model)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(corpus_vec).cast("array<double>")).alias("features")
    )
    km = KMeans(k=nlist, seed=seed, featuresCol="features").fit(train)
    return [[float(x) for x in c] for c in km.clusterCenters()]


def _nearest_lists(centers: list[list[float]], vec_col: str, n: int) -> Column:
    """The n nearest centroid list-ids of a vector column (codegen'd
    literal-centroid distance array + sort — centroids are k-row)."""
    dists = F.array(
        *[
            F.struct(
                V.l2_distance(
                    F.col(vec_col), F.array(*[F.lit(x) for x in ctr])
                ).alias("d"),
                F.lit(i).alias("list_id"),
            )
            for i, ctr in enumerate(centers)
        ]
    )
    return F.slice(F.array_sort(dists), 1, n)


def build_ivf_index(
    corpus: DataFrame,
    out_dir: str,
    nlist: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Persist an IVF index: centroids + the corpus assignment written
    PARTITIONED BY list_id — the build-once/probe-many serving path at
    100 TB. A probe then reads only its nprobe/nlist share of the data via
    parquet partition pruning (plan-asserted in tests), instead of
    rescanning and re-clustering per query batch like :func:`ivf_topk`.

    Layout: ``{out_dir}/centroids`` (nlist rows) and ``{out_dir}/corpus``
    (partition column ``list_id``). Returns the centroid list.
    """
    centers = _fit_centroids(corpus, nlist, corpus_vec, seed)
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "list_id int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        _nearest_lists(centers, corpus_vec, 1)[0]["list_id"].alias("list_id"),
    ).write.mode("overwrite").partitionBy("list_id").parquet(f"{out_dir}/corpus")
    return centers


def append_to_ivf_index(
    spark,
    index_dir: str,
    delta: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Incremental index maintenance: append a delta of new vectors to an
    EXISTING IVF index without re-clustering. The persisted centroids are
    reloaded and each delta vector is assigned to its nearest list; the
    assignment is written ``mode=append`` + ``partitionBy(list_id)``, so
    only NEW parquet files land inside the affected ``list_id=`` partition
    directories — existing files (and the centroids) are untouched, and a
    subsequent probe prunes partitions exactly as before. This is the
    build-once/probe-many serving loop closed: daily deltas append in
    O(|delta|) instead of re-clustering O(|corpus|). Centroid drift under
    sustained appends is a rebuild decision for the caller (track it with
    the per-list counts; rebuild via :func:`build_ivf_index`).
    """
    centroids = (
        spark.read.parquet(f"{index_dir}/centroids").orderBy("list_id").collect()
    )
    centers = [list(r["center"]) for r in centroids]
    delta.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        _nearest_lists(centers, corpus_vec, 1)[0]["list_id"].alias("list_id"),
    ).write.mode("append").partitionBy("list_id").parquet(f"{index_dir}/corpus")


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Probe a persisted IVF index: assign each query its nprobe nearest
    lists, scan ONLY those partitions (the probe-list filter is a literal
    IN over the partition column, so pruning happens at file-listing
    time), exact cosine within, per-query top-k.

    The query side is contractually small (an ANN query batch), so
    collecting its probe lists driver-side is a bounded action — same
    policy as the broadcast query set in :func:`brute_force_topk`.
    """
    centroids = (
        spark.read.parquet(f"{index_dir}/centroids").orderBy("list_id").collect()
    )
    centers = [list(r["center"]) for r in centroids]
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        F.explode(
            F.transform(
                _nearest_lists(centers, query_vec, nprobe), lambda s: s["list_id"]
            )
        ).alias("list_id"),
    )
    probe_lists = sorted({r["list_id"] for r in q.select("list_id").distinct().collect()})
    corpus = spark.read.parquet(f"{index_dir}/corpus").filter(
        F.col("list_id").isin(probe_lists)
    )
    scored = (
        corpus.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.cosine_similarity(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: kmeans|| centroids → corpus assigned to nearest list →
    queries probe their ``nprobe`` nearest lists → exact cosine within.

    The centroid model is tiny and broadcast both ways; corpus assignment
    is one narrow pass (at scale: persisted, partitioned by list id).
    """
    centers = _fit_centroids(corpus, nlist, corpus_vec, seed)

    def nearest_lists(vec_col: str, n: int) -> Column:
        return _nearest_lists(centers, vec_col, n)

    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("cv"),
        nearest_lists(corpus_vec, 1)[0]["list_id"].alias("list_id"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        F.explode(
            F.transform(nearest_lists(query_vec, nprobe), lambda s: s["list_id"])
        ).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.cosine_similarity(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries_pd,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Arrow-batched exact top-k for high dims: numpy GEMM per partition.

    ``queries_pd`` is a small pandas DataFrame (query_id, query_vec list) —
    it ships to executors inside the serialized function (broadcast-sized).
    Each mapInPandas batch computes a (batch × queries) similarity matrix in
    one BLAS call — the fast path when dim ≳ 512 where per-element codegen
    expressions lose to vectorized math.
    """
    import numpy as np
    import pandas as pd

    qids = queries_pd["query_id"].to_numpy()
    qm = np.stack(queries_pd["query_vec"].to_numpy()).astype("float64")
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    def score(batches):
        # one output frame per Arrow batch (not per query per batch), and
        # only each query's LOCAL top-k rows leave the executor — the
        # exchange carries nq*k rows per batch instead of batch_size*nq;
        # the global window then reduces the partial top-k sets.
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf[corpus_vec].to_numpy()).astype("float64")
            cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            sims = cn @ qn.T  # (batch, nq)
            ids = pdf[corpus_id].to_numpy()
            kk = min(k + 1, len(ids))  # +1: self-match is filtered downstream
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk),
                    "vec_id": ids[top.T.ravel()],
                    "cosine": np.take_along_axis(sims, top, axis=0).T.ravel(),
                }
            )

    scored = corpus.mapInPandas(score, "query_id long, vec_id long, cosine double")
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def sq8_dequantized(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar 8-bit quantization (FAISS-style SQ8) of an embedding column,
    returned in dequantized form: per-dimension corpus [min, max] maps each
    float to an integer code 0..255 (``floor(t*255 + 0.5)`` — floor-based
    rounding so every engine agrees on the boundary), then back to
    ``mn + code*step``. Stored as codes this is a 4x memory/IO reduction
    vs float32 with max per-value error of step/2 — the standard first rung
    of the ANN compression ladder (before PQ).

    Scale shape: the stats pass is a dim-sized aggregate (posexplode →
    groupBy(pos), partial map-side); the dim-length min/max arrays are a
    1-row bounded broadcast; quantization itself is a narrow per-row
    ``transform`` — no shuffle of the corpus.

    Returns (id_col, v: array<double>) with v the dequantized vectors.
    """
    stats = (
        corpus.select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("pos")
        .agg(F.min("col").alias("mn"), F.max("col").alias("mx"))
    )
    arrs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))),
            lambda s: s.getField("mn"),
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))),
            lambda s: s.getField("mx"),
        ).alias("maxs"),
    )

    def dq(x: Column, i: Column) -> Column:
        mn = F.element_at("mins", i + 1)
        mx = F.element_at("maxs", i + 1)
        code = F.floor((x - mn) / (mx - mn) * F.lit(255.0) + F.lit(0.5))
        return F.when(mx > mn, mn + code * (mx - mn) / F.lit(255.0)).otherwise(mn)

    return corpus.crossJoin(F.broadcast(arrs)).select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col).cast("array<double>"), dq).alias("v"),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Cosine top-k over the SQ8-quantized corpus with unquantized float
    queries (asymmetric distance computation — queries are few, so only
    the corpus pays the compression). Same candidate/top-k shape as
    ``brute_force_topk``; at 100 TB the dequantized scan reads 1/4 the
    bytes of the float corpus while recall stays near-exact (error step/2
    per dim; see tests for the planted-neighbor floor).
    """
    dq = sq8_dequantized(corpus, corpus_vec, corpus_id)
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"))
    )
    scored = (
        dq.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            V.cosine_similarity(F.col("v"), F.col("qv").cast("array<double>")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
