"""Similarity-search tests: exact top-k verified against numpy; LSH/IVF
recall on planted neighbors; pandas-UDF kernel ≡ expression kernel."""

from __future__ import annotations

import numpy as np
import pytest

from sentiment_analysis_bigdata_spark.functions import vector as V
from sentiment_analysis_bigdata_spark.operators import similarity as SIM

DIM = 16
N = 60


def _gen():
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(N, DIM))
    vecs[1] = vecs[0] + 0.01 * rng.normal(size=DIM)  # planted neighbor of 0
    return vecs


VECS = _gen()


def _make_vectors():
    return [(i, [float(x) for x in VECS[i]]) for i in range(N)]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_make_vectors(), "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return corpus.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )


def _numpy_topk(k=5, nq=3):
    norms = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
    sims = norms @ norms.T
    out = {}
    for q in range(nq):
        order = [
            i for i in np.lexsort((np.arange(N), -sims[q])) if i != q
        ][:k]
        out[q] = order
    return out


def test_brute_force_matches_numpy(corpus, queries):
    got = {}
    for r in SIM.brute_force_topk(corpus, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    expected = _numpy_topk()
    for q, pairs in got.items():
        ids = [v for _, v in sorted(pairs)]
        assert ids == list(expected[q]), q


def test_vector_kernels(spark):
    df = spark.createDataFrame([([3.0, 4.0], [4.0, 3.0])], "a array<double>, b array<double>")
    row = df.select(
        V.dot("a", "b").alias("dot"),
        V.norm("a").alias("na"),
        V.cosine_similarity("a", "b").alias("cos"),
        V.l2_distance("a", "b").alias("l2"),
    ).first()
    assert row["dot"] == pytest.approx(24.0)
    assert row["na"] == pytest.approx(5.0)
    assert row["cos"] == pytest.approx(24 / 25)
    assert row["l2"] == pytest.approx(np.sqrt(2))


def test_lsh_finds_planted_neighbor(corpus, queries):
    out = SIM.lsh_topk(corpus, queries, k=5, n_bits=6, multiprobe=True)
    got = {r["query_id"]: [] for r in out.collect()}
    for r in out.collect():
        got[r["query_id"]].append(r["vec_id"])
    # the planted near-identical neighbor shares all sign bits → always found
    assert 1 in got[0]


def test_ivf_finds_planted_neighbor(corpus, queries):
    out = SIM.ivf_topk(corpus, queries, k=5, nlist=4, nprobe=2)
    got = [r["vec_id"] for r in out.collect() if r["query_id"] == 0]
    assert 1 in got


def test_pandas_kernel_matches_expression_kernel(spark, corpus, queries):
    qpd = queries.toPandas().rename(columns={"query_vec": "query_vec"})
    a = SIM.brute_force_topk(corpus, queries, k=5).collect()
    b = SIM.cosine_topk_pandas(corpus, qpd, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["vec_id"] == rb["vec_id"]
        assert ra["cosine"] == pytest.approx(rb["cosine"], abs=1e-9)


def test_hyperplane_bucket_is_deterministic(spark):
    df = spark.createDataFrame(
        [([1.0, -1.0, 1.0, -1.0],), ([1.0, -1.0, 1.0, -1.0],)], "v array<double>"
    )
    buckets = [r["b"] for r in df.select(V.hyperplane_sign_bucket("v", 4).alias("b")).collect()]
    assert buckets[0] == buckets[1] == 0b1010
