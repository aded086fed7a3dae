"""Unit tests for the text expression library (SURVEY §5.3: tiny in-memory
frames, exact expected rows; golden (raw, clean) pairs per FIXTURES.md §2).
"""

from __future__ import annotations

import pytest

from sentiment_analysis_bigdata_spark.functions import text as TXT


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text string").select(expr.alias("v")).first()["v"]


class TestCleanChain:
    # golden pairs exercising every regex in the reference chain
    # (reference preprocessing.py:100-106)
    CASES = [
        ("Hello @user check https://x.co #cool 123!!", "hello check cool"),
        ("@OnlyMention http://t.co/abc 42!!!", ""),  # becomes empty → filtered later
        ("  UPPER   lower\tMiXeD  ", "upper lower mixed"),
        ("#hash#tags keep words", "hashtags keep words"),
        ("emoji 😀 and punct!?", "emoji and punct"),
        ("", ""),
    ]

    def test_golden_pairs(self, spark):
        for raw, expected in self.CASES:
            assert _one(spark, raw, TXT.clean_text("text")) == expected, raw

    def test_urls_http_and_https(self, spark):
        assert _one(spark, "a http://x.co/1 b https://y.io/2 c", TXT.clean_text("text")) == "a b c"


class TestNormalizeLabel:
    def test_four_to_one(self, spark):
        df = spark.createDataFrame([(0,), (4,), (2,)], "sentiment int")
        out = [r["label"] for r in df.select(TXT.normalize_label("sentiment").alias("label")).collect()]
        assert out == [0, 1, 0]


class TestTokenize:
    def test_ml_tokenizer_empty_string_edge(self, spark):
        # ML Tokenizer fidelity (SURVEY §7.6): "" → [""]
        assert _one(spark, "", TXT.tokenize("text")) == [""]

    def test_nonempty_variant_drops_empties(self, spark):
        assert _one(spark, "  a  b ", TXT.tokenize_nonempty("text")) == ["a", "b"]
        assert _one(spark, "", TXT.tokenize_nonempty("text")) == []

    def test_lowercases(self, spark):
        assert _one(spark, "Foo BAR", TXT.tokenize("text")) == ["foo", "bar"]


class TestStopwords:
    def test_preserves_order_and_duplicates(self, spark):
        df = spark.createDataFrame([(["the", "cat", "the", "cat", "sat"],)], "toks array<string>")
        out = df.select(TXT.remove_stopwords("toks").alias("v")).first()["v"]
        assert out == ["cat", "cat", "sat"]  # array_except would have deduped

    def test_case_insensitive(self, spark):
        df = spark.createDataFrame([(["The", "CAT"],)], "toks array<string>")
        assert df.select(TXT.remove_stopwords("toks").alias("v")).first()["v"] == ["CAT"]

    def test_list_matches_reference_metadata(self):
        # frozen from the serialized StopWordsRemover stage (181 words)
        assert len(TXT.ENGLISH_STOPWORDS) == 181
        assert "i'll" in TXT.ENGLISH_STOPWORDS and "would" in TXT.ENGLISH_STOPWORDS


class TestNgrams:
    def test_bigrams(self, spark):
        df = spark.createDataFrame([(["a", "b", "c"],)], "toks array<string>")
        assert df.select(TXT.ngrams("toks", 2).alias("v")).first()["v"] == ["a b", "b c"]

    def test_short_array_yields_empty(self, spark):
        df = spark.createDataFrame([(["a"],), ([],)], "toks array<string>")
        rows = df.select(TXT.ngrams("toks", 2).alias("v")).collect()
        assert rows[0]["v"] == [] and rows[1]["v"] == []

    def test_trigram_matches_ml_ngram(self, spark):
        from pyspark.ml.feature import NGram

        df = spark.createDataFrame(
            [(["x", "y", "z", "w"],), (["x"],)], "toks array<string>"
        )
        ml = NGram(n=3, inputCol="toks", outputCol="ml").transform(df)
        both = ml.withColumn("ours", TXT.ngrams("toks", 3)).collect()
        for r in both:
            assert r["ml"] == r["ours"]


class TestCountsAndQuality:
    def test_token_count(self, spark):
        assert _one(spark, "one two  three", TXT.token_count("text")) == 3

    def test_word_like_token_count(self, spark):
        # 'ab' '12' 'c' '!' → 4 pieces
        assert _one(spark, "ab 12 c!", TXT.word_like_token_count("text")) == 4

    def test_quality_bounds(self, spark):
        for t in ["", "x", "the cat sat on the mat and looked at the dog", "!!!! ####"]:
            q = _one(spark, t, TXT.quality_score("text"))
            assert 0.0 <= q <= 1.0, t

    def test_prose_beats_junk(self, spark):
        prose = "the cat sat on the mat and it was a very good day for all of them"
        junk = "zzz 123 @@@ ### !!!"
        assert _one(spark, prose, TXT.quality_score("text")) > _one(
            spark, junk, TXT.quality_score("text")
        )


class TestFingerprint:
    def test_normalization_collides(self, spark):
        df = spark.createDataFrame(
            [("Hello  World",), ("hello world ",)], "text string"
        )
        fps = [r["fp"] for r in df.select(TXT.fingerprint("text").alias("fp")).collect()]
        assert fps[0] == fps[1]

    def test_different_texts_differ(self, spark):
        df = spark.createDataFrame([("abc",), ("abd",)], "text string")
        fps = [r["fp"] for r in df.select(TXT.fingerprint("text").alias("fp")).collect()]
        assert fps[0] != fps[1]


class TestLangId:
    def test_obvious_languages(self, spark):
        cases = {
            "the cat is in the house and it is small": "en",
            "el perro y la casa de los grandes": "es",
            "der hund und die katze ist nicht da": "de",
        }
        for text, lang in cases.items():
            assert _one(spark, text, TXT.lang_id("text")) == lang, text

    def test_unknown(self, spark):
        assert _one(spark, "zzzz qqqq wwww", TXT.lang_id("text")) == "und"

    def test_scores_map(self, spark):
        m = _one(spark, "the the el", TXT.lang_scores("text"))
        assert m["en"] == 2 and m["es"] == 1


class TestRedactPii:
    def test_redacts_each_kind(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail me at john.doe+x@sub.example.org today"),
                (2, "server at 192.168.1.254 went down"),
                (3, "call +12-555-0142 now"),
                (4, "clean text with no pii at all"),
            ],
            "id long, text string",
        )
        out = {r["id"]: r["t"] for r in df.select("id", TXT.redact_pii("text").alias("t")).collect()}
        assert out[1] == "mail me at <EMAIL> today"
        assert out[2] == "server at <IP> went down"
        assert out[3] == "call <PHONE> now"
        assert out[4] == "clean text with no pii at all"


class TestRepetitionRatio:
    def test_bounds_and_signal(self, spark):
        df = spark.createDataFrame(
            [
                (1, "spam spam spam spam spam spam spam spam"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "ab"),  # fewer than n tokens -> 0
            ],
            "id long, text string",
        )
        out = {
            r["id"]: r["rep"]
            for r in df.select(
                "id", TXT.repetition_ratio("text", n=3).alias("rep")
            ).collect()
        }
        # 6 trigrams, all identical -> 1 - 1/6
        assert out[1] == pytest.approx(1 - 1 / 6)
        assert out[2] == 0.0  # no repeated trigram
        assert out[3] == 0.0


class TestChunkText:
    def test_overlap_and_coverage(self, spark):
        df = spark.createDataFrame([(1, "abcdefghij"), (2, "")], "doc_id long, text string")
        out = TXT.chunk_text(df, chunk_chars=4, stride=3).collect()
        chunks = {(r["doc_id"], r["chunk_idx"]): r["chunk"] for r in out}
        # ceil(10/3) = 4 chunks; stride 3, width 4 -> 1-char overlap
        assert chunks == {
            (1, 0): "abcd",
            (1, 1): "defg",
            (1, 2): "ghij",
            (1, 3): "j",
        }
        assert not any(d == 2 for d, _ in chunks)  # empty text -> no chunks
        # reconstruction: stripping the overlap re-yields the source
        full = chunks[(1, 0)] + "".join(
            chunks[(1, i)][4 - 3:] for i in range(1, 4)
        )
        assert full == "abcdefghij"


class TestChunkTokens:
    def test_overlapping_windows_and_tail(self, spark):
        from sentiment_analysis_bigdata_spark.operators.chunking import chunk_tokens

        df = spark.createDataFrame(
            [(1, list("abcdefgh")), (2, ["x"]), (3, [])],
            "doc_id int, toks array<string>",
        )
        out = chunk_tokens(df, "toks", size=4, stride=3)
        got = {
            (r["doc_id"], r["chunk_id"]): (r["chunk_tokens"], r["chunk_len"])
            for r in out.collect()
        }
        # doc 1: starts 0,3,6 -> abcd, defg, gh (short tail kept)
        assert got[(1, 0)] == (list("abcd"), 4)
        assert got[(1, 1)] == (list("defg"), 4)
        assert got[(1, 2)] == (list("gh"), 2)
        # single-token and empty docs stay represented with one chunk
        assert got[(2, 0)] == (["x"], 1)
        assert got[(3, 0)] == ([], 0)
        assert len(got) == 5

    def test_no_shuffle(self, spark):
        from sentiment_analysis_bigdata_spark.operators.chunking import chunk_tokens
        from sentiment_analysis_bigdata_spark.plans import explain

        df = spark.createDataFrame([(1, ["a", "b"])], "doc_id int, toks array<string>")
        assert explain.num_shuffles(chunk_tokens(df, "toks", 4, 3)) == 0

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from sentiment_analysis_bigdata_spark.operators.chunking import chunk_tokens

        df = spark.createDataFrame([(1, ["a"])], "doc_id int, toks array<string>")
        with _pytest.raises(ValueError, match="size and stride"):
            chunk_tokens(df, "toks", size=0, stride=3)


class TestLexicalStats:
    def test_entropy_and_ttr_known_values(self, spark):
        import math

        from sentiment_analysis_bigdata_spark.workloads.text_q import q_lexical_stats

        # inline twin of the query path on a tiny frame via the operator
        # composition: uniform tokens -> entropy ln(k); all-same -> 0
        from pyspark.sql import Window, functions as F
        from sentiment_analysis_bigdata_spark.functions import text as TXT

        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "x x x x"), (3, "a a b b")],
            "doc_id long, text string",
        )
        tok = docs.select("doc_id", F.explode(TXT.tokenize_nonempty("text")).alias("t"))
        counts = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("doc_id")
        p = (F.col("c") / F.col("n")).cast("double")
        out = {
            r["doc_id"]: r
            for r in counts.withColumn("n", F.sum("c").over(w))
            .withColumn("plogp", p * F.log(p))
            .groupBy("doc_id")
            .agg(
                F.max("n").alias("n_tokens"),
                F.count(F.lit(1)).alias("n_types"),
                F.round(-F.sum("plogp"), 6).alias("entropy"),
            )
            .collect()
        }
        assert out[1]["n_types"] == 4
        assert abs(out[1]["entropy"] - math.log(4)) < 1e-6
        assert out[2]["entropy"] == 0.0 and out[2]["n_types"] == 1
        assert abs(out[3]["entropy"] - math.log(2)) < 1e-6


class TestCorpusFilterReport:
    def test_rule_counts_and_keep_bound(self, spark, sf_dir):
        from sentiment_analysis_bigdata_spark.workloads.text_q import (
            q_corpus_filter_report,
        )

        rows = {r["rule"]: r for r in q_corpus_filter_report(spark, sf_dir).collect()}
        assert set(rows) == {
            "r_len", "r_lang", "r_quality", "r_rep", "r_dedup", "keep_all",
        }
        n = rows["r_len"]["n_pass"] + rows["r_len"]["n_fail"]
        for r in rows.values():
            assert r["n_pass"] + r["n_fail"] == n
        # keep_all is an AND of all rules: can't exceed any single rule's passes
        keep = rows["keep_all"]["n_pass"]
        assert all(
            keep <= rows[k]["n_pass"] for k in rows if k != "keep_all"
        )


class TestNfcNormalize:
    def test_composes_decomposed_pairs(self, spark):
        from sentiment_analysis_bigdata_spark.operators import normalize as NORM

        df = spark.createDataFrame(
            [(1, "café"), (2, "plain"), (3, None)],
            "id long, t string",
        )
        got = {
            r.id: r.nfc
            for r in NORM.nfc_normalize_text(df, "t", out_col="nfc").collect()
        }
        assert got[1] == "café"          # e + U+0301 → precomposed é
        assert got[2] == "plain"               # ASCII is a fixed point
        assert got[3] is None                  # nulls pass through

    def test_idempotent_on_composed(self, spark):
        from sentiment_analysis_bigdata_spark.operators import normalize as NORM

        df = spark.createDataFrame([(1, "déjà vu")], "id long, t string")
        out = NORM.nfc_normalize_text(df, "t", out_col="nfc").first()
        assert out.nfc == out.t


class TestStripAccents:
    def test_folds_marks_keeps_nondecomposable(self, spark):
        from sentiment_analysis_bigdata_spark.operators import normalize as NORM

        df = spark.createDataFrame(
            [(1, "café déjà"), (2, "søren ß"), (3, None)],
            "id long, t string",
        )
        got = {
            r.id: r.f
            for r in NORM.strip_accents_text(df, "t", out_col="f").collect()
        }
        assert got[1] == "cafe deja"
        assert got[2] == "søren ß"   # no canonical decomposition → unchanged
        assert got[3] is None
