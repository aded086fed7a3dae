"""Product-quantization ANN (Jégou, Douze & Schmid 2011): compress each
d-dim embedding to m sub-space codes (here 64-dim → 8 codes of 4 bits =
4 bytes/vector vs 256 bytes float32 — 64×), then serve approximate
cosine top-k by scoring against the CODEBOOK RECONSTRUCTION instead of
the raw vectors.

The 100 TB shape:

- **Codebook training is bounded.** The codebook is m × k × (d/m)
  floats (here 8 × 16 × 8 = 1 024 values) — model-sized, not
  corpus-sized. Training runs ONE deterministic Lloyd iteration from a
  deterministic init (the sub-vectors of the k smallest-id rows):
  assignment + per-dimension partial sums happen in one Arrow kernel
  pass over the corpus (each batch reduces to ≤ m·k·(d/m) partial-sum
  rows), a sketch-sized aggregation finishes the means, and empty
  clusters keep their init centroid. Determinism is what buys the
  DuckDB oracle: the whole trainer replays as SQL (argmin with
  (distance, code) tie-break + grouped means), so even the APPROXIMATE
  index's contents are value-checked — same philosophy as the SQ8
  quantizer oracle (operators/similarity.py).
- **Encoding is narrow.** One kernel pass corpus → (id, m codes); no
  shuffle. At scale the encoded table is what you persist — the float
  corpus is read once, ever.
- **Scoring reads codes only.** Asymmetric distance: the query stays
  float, the corpus vector is reconstructed from the codebook (a m-way
  table lookup), cosine against the reconstruction. The kernel emits
  only its per-batch top-k per query, so the final shuffle is
  (batches × queries × k) rows — bounded, never corpus-sized.

Why one Lloyd iteration and not convergence: the oracle must replay the
exact trainer, and a fixed-depth recursion is SQL-expressible while
"iterate until stable" is not. More iterations only move centroids;
recall quality at a given iteration count is measured separately
(tests/test_similarity.py planted-structure floors), mirroring how
ann_recall treats LSH/IVF approximation quality as a measured number,
not an assumption.

Reference parity: none (no embedding surface in the reference); this is
the compressed-serving complement to IVF (partition pruning) and SQ8
(scalar quantization) in operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _np(books):
    import numpy as np

    return np.asarray(books, dtype=np.float64)  # (m, k, dsub)


def _assign_codes(X, books_np):
    """(n, d) float64 → (n, m) int32 nearest-centroid codes; ties take
    the smallest code (np.argmin first-hit == the SQL (d2, code) sort)."""
    import numpy as np

    n, d = X.shape
    m, k, dsub = books_np.shape
    S = X.reshape(n, m, dsub)
    # d2[n, m, k] = ||S[n, m] - books[m, k]||²
    d2 = ((S[:, :, None, :] - books_np[None, :, :, :]) ** 2).sum(axis=3)
    return d2.argmin(axis=2).astype("int32")


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """One deterministic Lloyd iteration per sub-space → [s][code][d]
    centroid list (bounded: m·k·(d/m) floats).

    Init = sub-vectors of the k smallest-``corpus_id`` rows (ORDER BY id
    LIMIT k — engine-independent). The corpus pass assigns every row to
    its nearest init centroid and accumulates per-(s, code, dim) partial
    sums inside the kernel; the shuffle is sketch-sized. Clusters no row
    chose keep their init centroid.
    """
    dsub = dim // m
    init_rows = (
        corpus.orderBy(corpus_id).limit(k).select(corpus_vec).collect()
    )
    # fewer rows than codes → the codebook shrinks to the corpus size
    # (k_eff = n); duplicate codes would only tie-break to the smaller one
    k = min(k, len(init_rows))
    init = [
        [
            [float(x) for x in r[0][s * dsub : (s + 1) * dsub]]
            for r in init_rows
        ]
        for s in range(m)
    ]
    books_np = _np(init)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]]
            )
            codes = _assign_codes(X, books_np)  # (n, m)
            S = X.reshape(len(X), m, dsub)
            out_s, out_c, out_d, out_sm, out_n = [], [], [], [], []
            for s in range(m):
                for c in range(k):
                    mask = codes[:, s] == c
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    sm = S[mask, s, :].sum(axis=0)
                    out_s += [s] * dsub
                    out_c += [c] * dsub
                    out_d += list(range(dsub))
                    out_sm += list(sm)
                    out_n += [n] * dsub
            yield pd.DataFrame(
                {"s": out_s, "c": out_c, "d": out_d, "sm": out_sm, "n": out_n}
            )

    agg = (
        corpus.select(corpus_vec)
        .mapInPandas(partials, schema="s int, c int, d int, sm double, n long")
        .groupBy("s", "c", "d")
        .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
        .collect()
    )
    books = [[list(init[s][c]) for c in range(k)] for s in range(m)]
    for r in agg:
        books[r["s"]][r["c"]][r["d"]] = r["sm"] / r["n"]
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Corpus → (id, codes array<int>): one narrow kernel pass, no
    shuffle. This is the table you persist at scale."""
    books_np = _np(books)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]]
            )
            codes = _assign_codes(X, books_np)
            yield pd.DataFrame(
                {"vec_id": pdf[corpus_id].values, "codes": list(codes)}
            )

    return corpus.select(corpus_id, corpus_vec).mapInPandas(
        encode, schema="vec_id long, codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    books: list[list[list[float]]] | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k over PQ codes (asymmetric distance:
    float query vs codebook reconstruction). Self-matches excluded;
    deterministic tie-break (score desc, vec_id asc).

    The kernel emits only its per-batch top-k per query, so the final
    exact window runs over (batches × queries × k) rows — the same
    bounded-shuffle shape as the brute-force verifier, minus the corpus-
    sized scored table.
    """
    if books is None:
        books = train_pq_codebooks(
            corpus, m=m, k=n_codes, corpus_id=corpus_id,
            corpus_vec=corpus_vec, dim=dim,
        )
    books_np = _np(books)
    q_rows = queries.select(query_id, query_vec).collect()  # bounded query batch
    encoded = pq_encode(corpus, books, corpus_id, corpus_vec)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        Q = np.asarray(
            [np.asarray(r[1], dtype=np.float64) for r in q_rows]
        )
        qids = np.asarray([r[0] for r in q_rows])
        qn = np.sqrt((Q * Q).sum(axis=1))
        mm, kk, dsub = books_np.shape
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf["vec_id"].values
            R = books_np[np.arange(mm)[None, :], codes, :].reshape(
                len(codes), mm * dsub
            )  # reconstructions (n, d)
            rn = np.sqrt((R * R).sum(axis=1))
            dots = R @ Q.T  # (n, nq)
            denom = rn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, 0.0)
            frames = []
            for qi in range(len(qids)):
                keep = ids != qids[qi]
                c, i = cos[keep, qi], ids[keep]
                sel = np.lexsort((i, -c))[:k]  # score desc, id asc
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "vec_id": i[sel],
                            "score": c[sel],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = encoded.mapInPandas(
        score, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def coarse_probes(
    q_rows,
    coarse: list[list[float]],
    nprobe: int,
) -> list[tuple[int, int]]:
    """Per collected query row: the ``nprobe`` nearest coarse centroids
    by squared L2, ties to the smaller list id. Pure-Python sequential
    sums so the SQL oracle's list_sum replays the identical arithmetic.
    Returns (query_id, list_id) pairs."""
    out = []
    for r in q_rows:
        qid, vec = r[0], [float(x) for x in r[1]]
        d2 = []
        for li, c in enumerate(coarse):
            s = 0.0
            for a, b in zip(vec, c):
                s += (a - b) * (a - b)
            d2.append((s, li))
        d2.sort()
        out.extend((qid, li) for _, li in d2[:nprobe])
    return out


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """IVF-PQ serving (the FAISS IVFx,PQy shape): a coarse inverted file
    prunes the corpus to each query's ``nprobe``/``nlist`` share, then PQ
    codes score the survivors by asymmetric cosine — compression (64×)
    AND candidate pruning composed, which is how billion-vector serving
    actually runs.

    Both quantizers reuse the deterministic one-Lloyd trainer: the coarse
    quantizer IS :func:`train_pq_codebooks` with m=1 (one full-dim
    sub-space of ``nlist`` centroids = flat k-means), so the whole index
    — coarse lists, codebooks, assignments — replays in SQL and the
    oracle value-checks the index contents, not just the output. This
    variant scores PQ codes of the ORIGINAL vectors (IVF prunes only);
    residual encoding (PQ of x − coarse centroid, tighter at the same
    bit budget) is the production refinement and would slot in as one
    extra subtraction before :func:`pq_encode`.

    Scale shape: candidate generation is a broadcast-sized (query ×
    nprobe) probe table equi-joined to the encoded corpus on list_id —
    at scale the encoded table is written PARTITIONED BY list_id and the
    join becomes pruned I/O (the persisted-IVF-index story,
    operators/similarity.py). Scoring emits per-batch top-k only.
    """
    coarse_books = train_pq_codebooks(
        corpus, m=1, k=nlist, corpus_id=corpus_id, corpus_vec=corpus_vec,
        dim=dim,
    )
    coarse = coarse_books[0]
    assigned = pq_encode(corpus, coarse_books, corpus_id, corpus_vec).select(
        "vec_id", F.element_at("codes", 1).alias("list_id")
    )
    books = train_pq_codebooks(
        corpus, m=m, k=n_codes, corpus_id=corpus_id, corpus_vec=corpus_vec,
        dim=dim,
    )
    books_np = _np(books)
    encoded = pq_encode(corpus, books, corpus_id, corpus_vec).join(
        assigned, "vec_id"
    )
    q_rows = queries.select(query_id, query_vec).collect()
    probes = coarse_probes(q_rows, coarse, nprobe)
    spark = corpus.sparkSession
    probes_df = spark.createDataFrame(probes, "query_id long, list_id int")
    cand = encoded.join(F.broadcast(probes_df), "list_id").select(
        "query_id", "vec_id", "codes"
    )
    qmap = {r[0]: r[1] for r in q_rows}

    def score(batches):
        import numpy as np
        import pandas as pd

        Q = {
            qid: np.asarray(v, dtype=np.float64) for qid, v in qmap.items()
        }
        qn = {qid: float(np.sqrt((v * v).sum())) for qid, v in Q.items()}
        mm, kk, dsub = books_np.shape
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            R = books_np[np.arange(mm)[None, :], codes, :].reshape(
                len(codes), mm * dsub
            )
            rn = np.sqrt((R * R).sum(axis=1))
            qcol = pdf["query_id"].to_numpy()
            vcol = pdf["vec_id"].to_numpy()
            frames = []
            for qid in np.unique(qcol):
                mask = qcol == qid
                Rg, rg = R[mask], rn[mask]
                ids = vcol[mask]
                keep = ids != qid
                dots = Rg[keep] @ Q[qid]
                denom = rg[keep] * qn[qid]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, dots / denom, 0.0)
                sel = np.lexsort((ids[keep], -cos))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": ids[keep][sel],
                            "score": cos[sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = cand.mapInPandas(
        score, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
