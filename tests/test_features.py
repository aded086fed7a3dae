"""Feature-operator tests: the oracle twins must match the MLlib stages
bit-for-bit where the semantics overlap (SURVEY §5.4)."""

from __future__ import annotations

import math

import pytest

from sentiment_analysis_bigdata_spark.operators import features as FE

CORPUS = [
    (0, ["spark", "big", "data", "spark"]),
    (1, ["spark", "small", "data"]),
    (2, ["hash", "join", "spark"]),
    (3, ["window", "sort", "data"]),
    (4, []),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, tokens array<string>")


def test_term_frequencies(docs):
    rows = {(r["doc_id"], r["term"]): r["tf"] for r in FE.term_frequencies(docs).collect()}
    assert rows[(0, "spark")] == 2
    assert rows[(1, "data")] == 1
    assert (4, "spark") not in rows


def test_document_frequencies(docs):
    dfreq = {r["term"]: r["df"] for r in FE.document_frequencies(docs).collect()}
    assert dfreq["spark"] == 3  # docs 0,1,2 — doc 0 counts once despite tf=2
    assert dfreq["data"] == 3


def test_idf_formula_matches_mllib(spark, docs):
    """Our long-form IDF must equal the IDF the MLlib estimator fits."""
    from pyspark.ml.feature import IDF, HashingTF

    # wide hash space so no bucket collisions perturb document frequencies
    htf = HashingTF(inputCol="tokens", outputCol="raw", numFeatures=2**18)
    feat = htf.transform(docs)
    model = IDF(inputCol="raw", outputCol="out", minDocFreq=0).fit(feat)
    mllib_idf = model.idf.toArray()

    ours = {r["term"]: r["idf"] for r in FE.idf_weights(docs, min_doc_freq=0).collect()}
    # map each term through HashingTF's bucket and compare
    for term, idf_val in ours.items():
        bucket = htf.indexOf(term)
        assert mllib_idf[bucket] == pytest.approx(idf_val, abs=1e-12), term


def test_idf_min_doc_freq_zeroes(docs):
    out = {r["term"]: r["idf"] for r in FE.idf_weights(docs, min_doc_freq=3).collect()}
    assert out["hash"] == 0.0  # df=1 < 3
    assert out["spark"] > 0.0  # df=3


def test_tf_idf_values(docs):
    out = {
        (r["doc_id"], r["term"]): r["tf_idf"] for r in FE.tf_idf(docs).collect()
    }
    m = 5
    expected = 2 * math.log((m + 1) / (3 + 1))  # spark in doc 0: tf=2, df=3
    assert out[(0, "spark")] == pytest.approx(expected, abs=1e-12)


def test_count_vectorizer_vocab_tiebreak(docs):
    vocab = FE.count_vectorizer_vocab(docs, vocab_size=3, min_df=1).collect()
    # counts: spark=4, data=3, then ties at 1 broken by term asc
    assert [r["term"] for r in vocab[:2]] == ["spark", "data"]
    assert vocab[2]["term"] == "big"  # alphabetically first among count-1 terms
    assert [r["index"] for r in vocab] == [0, 1, 2]


def test_count_vectorize_matches_mllib(spark, docs):
    from pyspark.ml.feature import CountVectorizer

    cv = CountVectorizer(inputCol="tokens", outputCol="vec", vocabSize=10, minDF=1).fit(docs)
    mllib = {r["doc_id"]: r["vec"] for r in cv.transform(docs).collect()}
    vocab_idx = {t: i for i, t in enumerate(cv.vocabulary)}

    vocab = FE.count_vectorizer_vocab(docs, vocab_size=10, min_df=1)
    ours = {
        r["doc_id"]: r["term_counts"] for r in FE.count_vectorize(docs, vocab).collect()
    }
    our_vocab = {r["term"]: r["index"] for r in vocab.collect()}
    for doc_id, vec in mllib.items():
        got = ours.get(doc_id, {})
        # same multiset of (term, count) pairs, modulo index permutation on ties
        mllib_counts = {}
        arr = vec.toArray()
        for t, i in vocab_idx.items():
            if arr[i] > 0:
                mllib_counts[t] = int(arr[i])
        our_counts = {}
        inv = {v: k for k, v in our_vocab.items()}
        for idx, n in got.items():
            our_counts[inv[idx]] = int(n)
        assert mllib_counts == our_counts, doc_id


def test_hashing_tf_semantics_match_mllib(spark, docs):
    """The twin's per-doc count multiset must equal the ML stage's (bucket
    ids differ: ML uses murmur3 hashUnsafeBytes2, SQL hash() the v1 tail
    handling — same algorithm family, different string tail mixing)."""
    from pyspark.ml.feature import HashingTF

    htf = HashingTF(inputCol="tokens", outputCol="vec", numFeatures=2**18)
    mllib = {r["doc_id"]: r["vec"] for r in htf.transform(docs).collect()}
    ours = FE.hashing_tf_indices(docs, num_features=2**18).collect()
    got: dict[int, dict[int, int]] = {}
    for r in ours:
        got.setdefault(r["doc_id"], {})[r["bucket"]] = int(r["tf"])
    for doc_id, vec in mllib.items():
        arr = vec.toArray()
        expected = sorted(int(v) for v in arr if v > 0)
        assert sorted(got.get(doc_id, {}).values()) == expected, doc_id
        # buckets in range and deterministic
        assert all(0 <= b < 2**18 for b in got.get(doc_id, {}))


def test_hashing_tf_deterministic(docs):
    a = sorted(map(tuple, FE.hashing_tf_indices(docs, num_features=1024).collect()))
    b = sorted(map(tuple, FE.hashing_tf_indices(docs, num_features=1024).collect()))
    assert a == b


def test_unigram_logprob_hand_computed(spark):
    # corpus LM: a:3, b:1, total 4 → p(a)=0.75, p(b)=0.25
    df = spark.createDataFrame(
        [(0, ["a", "a"]), (1, ["a", "b"]), (2, [])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r for r in FE.unigram_logprob_scores(df).collect()}
    assert set(rows) == {0, 1}  # empty-token doc dropped
    assert rows[0]["n_tokens"] == 2
    assert rows[0]["avg_logprob"] == pytest.approx(round(math.log(0.75), 6))
    expected1 = round((math.log(0.75) + math.log(0.25)) / 2, 6)
    assert rows[1]["avg_logprob"] == pytest.approx(expected1)


def test_chi2_terms_hand_computed(spark):
    from pyspark.sql import Row

    # 4 docs, 2 classes (2 each). "hot" only in class A docs; "the" in all.
    df = spark.createDataFrame(
        [
            Row(label="A", tokens=["hot", "the"]),
            Row(label="A", tokens=["hot", "the", "hot"]),
            Row(label="B", tokens=["the", "cold"]),
            Row(label="B", tokens=["the"]),
        ]
    )
    got = {
        r.term: (r.df, r.chi2)
        for r in FE.chi2_terms(df, "label", "tokens", min_df=1).collect()
    }
    # "hot": df=2, per class E=1. O_A=2, O_B=0.
    # chi2 = (2-1)^2/1 + (1-2+1... ) present cells: (2-1)^2/1 + (0-1)^2/1 = 2
    # absent cells: (n_c - O - (n_c - E))^2/(n_c-E) = (E-O)^2/(n_c-E) = 1/1 + 1/1 = 2
    assert got["hot"] == (2, 4.0)
    assert got["cold"] == (1, pytest.approx(4 / 3, abs=1e-6))
    # "the" appears in every doc → absent cells degenerate (n_c == E), chi2 = 0
    assert got["the"] == (4, 0.0)


def test_chi2_terms_min_df(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(label="A", tokens=["rare"]),
            Row(label="B", tokens=["common"]),
            Row(label="A", tokens=["common"]),
        ]
    )
    got = FE.chi2_terms(df, "label", "tokens", min_df=2).collect()
    assert [r.term for r in got] == ["common"]


def test_chi2_presence_not_multiplicity(spark):
    from pyspark.sql import Row

    # token repeated inside one doc counts once (presence semantics)
    df = spark.createDataFrame(
        [
            Row(label="A", tokens=["x", "x", "x"]),
            Row(label="B", tokens=["x"]),
        ]
    )
    got = FE.chi2_terms(df, "label", "tokens", min_df=1).collect()
    assert [(r.term, r.df, r.chi2) for r in got] == [("x", 2, 0.0)]


def test_bigram_logprob_hand_computed(spark):
    # corpus bigrams: (a,b)x2, (b,a)x1 → c(a·)=2, c(b·)=1; V={a,b,x}=3
    # P(b|a) = (2+1)/(2+3) = 0.6 ; P(a|b) = (1+1)/(1+3) = 0.5
    df = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["a", "b", "a"]), (2, ["x"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r for r in FE.bigram_logprob_scores(df).collect()}
    assert set(rows) == {0, 1}  # single-token doc has no bigrams
    assert rows[0]["n_bigrams"] == 1
    assert rows[0]["avg_logprob"] == pytest.approx(round(math.log(0.6), 6))
    expected1 = round((math.log(0.6) + math.log(0.5)) / 2, 6)
    assert rows[1]["avg_logprob"] == pytest.approx(expected1)


def test_bigram_logprob_order_sensitive(spark):
    # ten docs share a dominant word order; one scrambles it. Unigram LM
    # can't tell them apart; the bigram LM must score the scramble lower.
    common = [(i, ["the", "quick", "brown", "fox"]) for i in range(10)]
    df = spark.createDataFrame(
        common + [(10, ["fox", "the", "brown", "quick"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r["avg_logprob"] for r in FE.bigram_logprob_scores(df).collect()}
    assert rows[10] < rows[0]


def test_hashed_embedding_properties(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b", "a"]), (1, ["a", "b", "a"]), (2, ["z"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    rows = FE.hashed_embedding_long(df, "doc_id", "tokens", dim=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], {})[r["dim_idx"]] = r["value"]
    # identical token multisets -> identical embeddings
    assert by_doc[0] == by_doc[1]
    # token counts are preserved in magnitude: |sum of values| <= n_tokens
    assert sum(abs(v) for v in by_doc[0].values()) <= 3
    # repeated token contributes with one sign: "a" twice lands in one
    # bucket with |value| 2 (unless "b" collides and cancels)
    assert 3 not in by_doc  # empty docs produce no rows
    assert all(0 <= k < 8 for d in by_doc.values() for k in d)


def test_dsir_logweights_hand_computed(spark):
    import hashlib
    from collections import Counter

    rows = [
        (0, ["the", "cat", "sat"], True, "en"),
        (1, ["the", "dog", "ran"], True, "en"),
        (2, ["der", "hund", "lief"], False, "de"),
        # off-domain label but token-identical to doc 0: must score like it
        (3, ["the", "cat", "sat"], False, "xx"),
        (4, [], False, "en"),  # empty docs produce no row
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, is_target boolean, lang string"
    )
    m = 16
    out = {
        r["doc_id"]: r
        for r in FE.dsir_logweights(df, m=m, keep_cols=("lang",)).collect()
    }
    assert set(out) == {0, 1, 2, 3}

    def grams(toks):
        return toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % m

    tgt: Counter = Counter()
    raw: Counter = Counter()
    per = {}
    for doc_id, toks, is_t, _lang in rows:
        c = Counter(bucket(g) for g in grams(toks))
        per[doc_id] = c
        raw.update(c)
        if is_t:
            tgt.update(c)
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())
    for doc_id, _toks, _is_t, lang in rows[:4]:
        w = sum(
            n
            * (
                math.log((tgt.get(b, 0) + 1) / (t_tot + m))
                - math.log((raw[b] + 1) / (r_tot + m))
            )
            for b, n in per[doc_id].items()
        )
        assert out[doc_id]["log_weight"] == pytest.approx(round(w, 6), abs=2e-6)
        assert out[doc_id]["n_grams"] == sum(per[doc_id].values())
        assert out[doc_id]["lang"] == lang
    # token-identical docs get identical weights regardless of their label…
    assert out[3]["log_weight"] == out[0]["log_weight"]
    # …and an in-domain lookalike outscores the out-of-domain doc
    assert out[3]["log_weight"] > out[2]["log_weight"]
