"""Tests for affinity operators: co-occurrence and sparse TF-IDF cosine."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import affinity


class TestCoOccurrence:
    def _baskets(self, spark):
        rows = [
            Row(b=1, i="x"), Row(b=1, i="y"), Row(b=1, i="z"),
            Row(b=2, i="x"), Row(b=2, i="y"),
            Row(b=3, i="x"), Row(b=3, i="y"),
            Row(b=4, i="x"), Row(b=4, i="x"),  # duplicate item in basket
        ]
        return spark.createDataFrame(rows)

    def test_hand_computed(self, spark):
        got = {
            (r.item_a, r.item_b): r.support
            for r in affinity.co_occurrence_pairs(
                self._baskets(spark), "b", "i", min_support=1
            ).collect()
        }
        assert got == {("x", "y"): 3, ("x", "z"): 1, ("y", "z"): 1}

    def test_min_support(self, spark):
        got = affinity.co_occurrence_pairs(
            self._baskets(spark), "b", "i", min_support=3
        ).collect()
        assert [(r.item_a, r.item_b, r.support) for r in got] == [("x", "y", 3)]

    def test_max_basket_guard(self, spark):
        got = {
            (r.item_a, r.item_b): r.support
            for r in affinity.co_occurrence_pairs(
                self._baskets(spark), "b", "i", min_support=1, max_basket=2
            ).collect()
        }
        # basket 1 (3 items) dropped → x,y from baskets 2 and 3 only
        assert got == {("x", "y"): 2}


class TestSparseCosine:
    def _docs(self, spark):
        rows = [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma delta"),  # exact dup of 1
            Row(doc_id=3, text="alpha beta gamma epsilon"),  # near dup
            Row(doc_id=4, text="zeta eta theta iota"),  # unrelated
        ]
        return spark.createDataFrame(rows)

    def test_postings_l2_normalized(self, spark):
        p = affinity.tfidf_postings(self._docs(spark))
        norms = (
            p.groupBy("doc")
            .agg(F.sum(F.col("weight") * F.col("weight")).alias("sq"))
            .collect()
        )
        assert norms and all(r.sq == pytest.approx(1.0) for r in norms)

    def test_exact_dup_cosine_one(self, spark):
        pairs = {
            (r.doc_a, r.doc_b): r.cosine
            for r in affinity.sparse_cosine_pairs(
                self._docs(spark), threshold=0.0, max_df=None
            ).collect()
        }
        assert pairs[(1, 2)] == pytest.approx(1.0)
        # near-dup scores below the exact dup but well above unrelated
        assert 0.1 < pairs[(1, 3)] < 1.0
        assert (1, 4) not in pairs and (2, 4) not in pairs

    def test_max_df_cap_drops_hot_terms(self, spark):
        # 'alpha' appears in docs 1,2,3 → df=3; cap at 2 removes it
        p = affinity.tfidf_postings(self._docs(spark), max_df=2)
        assert p.filter(F.col("term") == "alpha").count() == 0
        assert p.filter(F.col("term") == "epsilon").count() == 1

    def test_threshold_filters(self, spark):
        pairs = affinity.sparse_cosine_pairs(
            self._docs(spark), threshold=0.99, max_df=None
        ).collect()
        assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]


class TestCollocationPMI:
    def test_hand_computed(self, spark):
        # Corpus: "a b" x3, "a c", "c a"  → N=10 tokens, B=5 bigrams
        # unigrams: a=5, b=3, c=2; bigram "a b" n=3
        # PMI(a,b) = ln( (3/5) / ((5/10)*(3/10)) ) = ln(4)
        df = spark.createDataFrame(
            [Row(tokens=["a", "b"])] * 3
            + [Row(tokens=["a", "c"]), Row(tokens=["c", "a"])]
        )
        got = {
            r.bigram: (r.n_pair, r.pmi)
            for r in affinity.collocation_pmi(df, "tokens", min_count=1).collect()
        }
        assert got["a b"] == (3, round(math.log(4.0), 6))
        assert got["a c"] == (1, round(math.log((1 / 5) / (0.5 * 0.2)), 6))
        assert set(got) == {"a b", "a c", "c a"}

    def test_min_count_prunes_before_join(self, spark):
        df = spark.createDataFrame(
            [Row(tokens=["a", "b"])] * 3 + [Row(tokens=["a", "c"])]
        )
        got = affinity.collocation_pmi(df, "tokens", min_count=2).collect()
        assert [r.bigram for r in got] == ["a b"]

    def test_short_docs_no_bigrams(self, spark):
        df = spark.createDataFrame(
            [Row(tokens=["solo"]), Row(tokens=[]), Row(tokens=["x", "y"])]
        )
        got = affinity.collocation_pmi(df, "tokens", min_count=1).collect()
        assert [r.bigram for r in got] == ["x y"]


class TestAssociationRules:
    def _baskets(self, spark):
        # 4 baskets: x in all 4, y in 3, z in 1
        rows = [
            Row(b=1, i="x"), Row(b=1, i="y"), Row(b=1, i="z"),
            Row(b=2, i="x"), Row(b=2, i="y"),
            Row(b=3, i="x"), Row(b=3, i="y"),
            Row(b=4, i="x"),
        ]
        return spark.createDataFrame(rows)

    def test_hand_computed(self, spark):
        got = {
            (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
            for r in affinity.association_rules(
                self._baskets(spark), "b", "i", min_support=1
            ).collect()
        }
        # support(x,y)=3, support(x)=4, support(y)=3, N=4
        # x→y: conf 3/4, lift (3/4)/(3/4)=1.0 ; y→x: conf 1, lift 1/(4/4)=1.0
        assert got[("x", "y")] == (3, 0.75, 1.0)
        assert got[("y", "x")] == (3, 1.0, 1.0)
        # x→z: conf 1/4, lift (1/4)/(1/4)=1 ; z→x: conf 1, lift 1.0
        assert got[("x", "z")] == (1, 0.25, 1.0)
        assert got[("z", "y")] == (1, 1.0, round(1 / 0.75, 6))

    def test_min_confidence_filters(self, spark):
        got = affinity.association_rules(
            self._baskets(spark), "b", "i", min_support=1, min_confidence=0.9
        ).collect()
        assert all(r.confidence >= 0.9 for r in got)
        assert {(r.antecedent, r.consequent) for r in got} == {
            ("y", "x"), ("z", "x"), ("z", "y")
        }


class TestBm25:
    def _corpus(self, spark):
        rows = [
            Row(doc_id=1, text="cat sat mat"),
            Row(doc_id=2, text="cat cat cat cat"),
            Row(doc_id=3, text="dog ran far away today"),
            Row(doc_id=4, text="cat dog"),
        ]
        return spark.createDataFrame(rows)

    def test_hand_computed_single_term(self, spark):
        import math

        docs = self._corpus(spark)
        q = spark.createDataFrame([Row(query_id=0, terms=["dog"])])
        got = {
            r.doc: r.score
            for r in affinity.bm25_scores(docs, q, top_k=10).collect()
        }
        # df(dog)=2, N=4 → idf = ln(1 + 2.5/2.5) = ln 2; avgdl = 14/4
        k1, b = 1.2, 0.75
        avgdl = 14 / 4

        def s(tf, dl):
            return math.log(2) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert set(got) == {3, 4}
        assert abs(got[3] - s(1, 5)) < 1e-9
        assert abs(got[4] - s(1, 2)) < 1e-9
        # shorter doc outranks at equal tf (length normalization)
        assert got[4] > got[3]

    def test_saturation_and_dup_query_terms(self, spark):
        docs = self._corpus(spark)
        q = spark.createDataFrame(
            [Row(query_id=0, terms=["cat"]), Row(query_id=1, terms=["cat", "cat"])]
        )
        out = affinity.bm25_scores(docs, q, top_k=10).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, {})[r.doc] = r.score
        # duplicate query terms count once
        assert by_q[0] == by_q[1]
        # tf saturation: 4 occurrences score < 4× one occurrence
        one = by_q[0][1]
        four = by_q[0][2]
        assert four < 4 * one

    def test_rank_order_and_limit(self, spark):
        docs = self._corpus(spark)
        q = spark.createDataFrame([Row(query_id=9, terms=["cat", "dog"])])
        out = affinity.bm25_scores(docs, q, top_k=2).collect()
        assert len(out) == 2
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
