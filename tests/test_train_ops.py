"""Tests for the training-pipeline batch-2 operators: BPE pair counting,
Z-order layout, group-wise regression, embedding centroids."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import (
    layout,
    regression,
    tokenizer_train,
)


class TestBpePairCounts:
    def test_hand_computed(self, spark):
        # corpus: "ab ab abc" → words {ab:2, abc:1}
        df = spark.createDataFrame([Row(text="ab ab abc")])
        wf = tokenizer_train.word_frequencies(df)
        assert {(r.word, r.freq) for r in wf.collect()} == {("ab", 2), ("abc", 1)}
        pairs = tokenizer_train.bpe_pair_counts(wf)
        # ab→{ab:2}; abc→{ab:1, bc:1}
        assert {(r.pair, r.n) for r in pairs.collect()} == {("ab", 3), ("bc", 1)}

    def test_short_and_empty_words(self, spark):
        df = spark.createDataFrame([Row(text="a b  cd")])
        got = {
            (r.pair, r.n)
            for r in tokenizer_train.bpe_pair_counts(
                tokenizer_train.word_frequencies(df)
            ).collect()
        }
        assert got == {("cd", 1)}  # 1-char words emit nothing

    def test_topk_deterministic_ties(self, spark):
        df = spark.createDataFrame([Row(text="xy ab")])
        rows = tokenizer_train.top_merge_candidates(df, k=10).collect()
        assert [r.pair for r in rows] == ["ab", "xy"]  # equal n → pair asc


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent single-node Sennrich BPE (arXiv:1508.07909 fig. 1
    shape) with the engine's tie-break (n desc, lhs asc, rhs asc)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (lhs, rhs), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, lhs + rhs, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


class TestTrainBpe:
    # the classic Sennrich example vocabulary
    WORD_FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def _corpus(self, spark):
        text = " ".join(w for w, f in self.WORD_FREQS.items() for _ in range(f))
        return spark.createDataFrame([Row(text=text)])

    def test_matches_reference_implementation(self, spark):
        merges, vocab = tokenizer_train.train_bpe(self._corpus(spark), n_merges=6)
        expected, _ = _py_bpe(self.WORD_FREQS, 6)
        assert merges == expected
        # first two merges are the textbook ones: e+s (9), es+t (9)
        assert merges[0][1:4] == ("e", "s", "es")
        assert merges[1][1:4] == ("es", "t", "est")
        # final vocab re-segments every word consistently
        segs = {
            r["word"]: r["seg"].strip().split("  ") for r in vocab.collect()
        }
        py_final = {"".join(s): list(s) for s in _py_bpe(self.WORD_FREQS, 6)[1]}
        for w, s in segs.items():
            assert s == py_final[w], (w, s, py_final[w])

    def test_batched_rounds_equal_sequential(self, spark):
        """The batched merge application (top-m disjoint pairs per round)
        must reproduce the one-merge-per-round sequence EXACTLY — ranks,
        pairs, and recorded counts — on real corpus text where tie and
        symbol-sharing cases actually occur."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        seq, _ = tokenizer_train.train_bpe(docs, n_merges=24, batch_merges=1)
        bat, _ = tokenizer_train.train_bpe(docs, n_merges=24, batch_merges=8)
        assert bat == seq

    def test_256_merge_train_is_batch_fast(self, spark):
        """VERDICT r3 #3 done-criterion: a 256-merge-budget train at
        sf0.01 completes inside a bound that one-merge-per-round driver
        latency would blow (sequential ≈ 2 driver-coordinated jobs per
        merge). The synthetic corpus has only 31 distinct words, so
        training EXHAUSTS the vocabulary (every word collapses to a
        single symbol, 89 merges) before the 256 budget — which maximizes
        round count and still must finish fast. Generous wall bound to
        absorb CI machine-load swings."""
        import time

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        t0 = time.monotonic()
        merges, vocab = tokenizer_train.train_bpe(
            docs, n_merges=256, batch_merges=16
        )
        elapsed = time.monotonic() - t0
        assert len({m[3] for m in merges}) == len(merges)  # merged symbols distinct
        # vocabulary fully merged: every word is one symbol
        n_multi = vocab.filter("seg like '%  %'").count()
        assert n_multi == 0
        assert elapsed < 120, elapsed

    def test_driver_exact_matches_reference(self, spark):
        """train_bpe_from_word_counts (the hybrid driver-loop path) must
        reproduce the independent single-node Sennrich implementation
        merge-for-merge, including recorded counts."""
        wf = tokenizer_train.word_frequencies(self._corpus(spark))
        got = tokenizer_train.train_bpe_from_word_counts(wf, n_merges=6)
        expected, _ = _py_bpe(self.WORD_FREQS, 6)
        assert got == expected

    def test_driver_exact_matches_distributed_on_real_corpus(self, spark):
        """Hybrid path ≡ distributed batched path on real corpus text
        (ties and symbol-sharing chains present)."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        wf = tokenizer_train.word_frequencies(docs)
        drv = tokenizer_train.train_bpe_from_word_counts(wf, n_merges=24)
        dist, _ = tokenizer_train.train_bpe(docs, n_merges=24, batch_merges=8)
        assert drv == dist

    def test_driver_exact_matches_distributed_trigram_120(self, spark):
        """Equality at REALISTIC merge depth on the tie-heavy trigram
        corpus (the bpe_merges_1k corpus shape, where symbol-sharing
        serializes the distributed batch — the case that motivated the
        hybrid path)."""
        from sentiment_analysis_bigdata_spark.workloads.train_q import (
            _trigram_corpus,
        )

        tri = _trigram_corpus(spark, "/root/testdata/sf0.001")
        wf = tokenizer_train.word_frequencies(tri)
        drv = tokenizer_train.train_bpe_from_word_counts(wf, n_merges=120)
        dist, _ = tokenizer_train.train_bpe(tri, n_merges=120, batch_merges=16)
        assert drv == dist

    def test_driver_exact_max_rows_guard(self, spark):
        wf = tokenizer_train.word_frequencies(self._corpus(spark))
        with pytest.raises(ValueError, match="max_rows"):
            tokenizer_train.train_bpe_from_word_counts(
                wf, n_merges=2, max_rows=2
            )

    def test_driver_exact_min_freq_floor(self, spark):
        # rare word "qz" (freq 1) is dropped by min_freq=2, so the (q,z)
        # pair never becomes a candidate
        df = spark.createDataFrame([Row(text="ab ab ab qz")])
        wf = tokenizer_train.word_frequencies(df)
        merges = tokenizer_train.train_bpe_from_word_counts(
            wf, n_merges=10, min_freq=2
        )
        assert [(m[1], m[2]) for m in merges] == [("a", "b")]

    def test_bpe_merges_1k_bounded_jobs_and_wall(self, spark):
        """VERDICT r4 #5 done-criterion: 1,000 merges complete in bounded
        wall time with a CONSTANT number of Spark jobs (the
        jobs-per-merge figure), not O(n_merges) driver rounds. Generous
        wall bound absorbs CI machine-load swings."""
        import time

        from sentiment_analysis_bigdata_spark.workloads.train_q import (
            q_bpe_merges_1k,
        )

        t0 = time.monotonic()
        row = q_bpe_merges_1k(spark, "/root/testdata/sf0.001").first()
        elapsed = time.monotonic() - t0
        assert row["n_merges"] == 1000
        assert row["spark_jobs"] <= 10
        assert row["jobs_per_merge"] <= 0.01
        assert row["first_merge"] == "er"
        assert row["witness_pinned"] is True
        assert elapsed < 120, elapsed

    def test_bpe_1k_golden_witnesses_pinned(self, spark):
        """VERDICT r5 #3 done-criterion: the two no-oracle 1,000-merge
        queries assert their data-deterministic scalars against golden
        constants in-query (raise on mismatch) and report it via
        witness_pinned, so a silent semantic break can't hide behind a
        green row count."""
        import pytest

        from sentiment_analysis_bigdata_spark.workloads import train_q

        row = train_q.q_bpe_encode_1k(spark, "/root/testdata/sf0.001").first()
        assert row["witness_pinned"] is True
        assert row["n_subword_types"] == 928

        # A drifted golden constant must raise, not pass silently.
        orig = train_q._BPE_1K_GOLDEN["0.001"]
        train_q._BPE_1K_GOLDEN["0.001"] = dict(orig, merged_mass=orig["merged_mass"] + 1)
        try:
            with pytest.raises(ValueError, match="golden witness mismatch"):
                train_q.q_bpe_merges_1k(spark, "/root/testdata/sf0.001").first()
        finally:
            train_q._BPE_1K_GOLDEN["0.001"] = orig

        # Unknown SFs (user corpora) skip the pin: witness_pinned=false.
        assert train_q._assert_golden({}, train_q._BPE_1K_GOLDEN, "/tmp/mydata", "x") is False

    def test_bpe_golden_gated_on_fixture_fingerprint(self, monkeypatch):
        """ADVICE r6: goldens were keyed only by the sfX.Y path token, so a
        regenerated fixture at the same SF made the 1k queries raise
        everywhere (bench extras included). The pin must skip — not raise —
        when documents.parquet's byte size no longer matches the size the
        goldens were measured against, and under SPARK_GRAFT_SKIP_GOLDEN=1."""
        from sentiment_analysis_bigdata_spark.workloads import train_q

        sf = "/root/testdata/sf0.001"
        # A full golden-shaped row with one drifted value: mismatches iff
        # the pins actually apply.
        row = dict(train_q._BPE_1K_GOLDEN["0.001"], n_merges=-1)

        # Real fixture → pins apply → the drifted row raises.
        import pytest

        with pytest.raises(ValueError, match="golden witness mismatch"):
            train_q._assert_golden(row, train_q._BPE_1K_GOLDEN, sf, "x")

        # Regenerated fixture (content fingerprint mismatch) → pins skipped,
        # no raise.
        monkeypatch.setitem(
            train_q._GOLDEN_DOCS_MD5, "0.001", "0" * 32,
        )
        assert train_q._assert_golden(row, train_q._BPE_1K_GOLDEN, sf, "x") is False
        monkeypatch.undo()

        # Absent fixture → loud failure, never a silent unpin (ADVICE r7).
        with pytest.raises(FileNotFoundError, match="golden fixture absent"):
            train_q._fixture_matches("/nonexistent-sfdir", "0.001")

        # Explicit env override → pins skipped.
        monkeypatch.setenv("SPARK_GRAFT_SKIP_GOLDEN", "1")
        assert train_q._assert_golden(row, train_q._BPE_1K_GOLDEN, sf, "x") is False

    def test_bpe_1k_vs_reference_impl(self, spark):
        """VERDICT r7 #2: independent cross-checked evidence for the
        1,000-merge path. The hybrid trainer (heap + lazy invalidation +
        incremental pair deltas — the machinery bpe_merges_1k runs) is
        compared MERGE-BY-MERGE against the naive Sennrich reference
        (_py_bpe: full recount every round, no shared code) on the real
        sf0.001 trigram vocabulary (16.5k words); then an independent
        min-rank pure-Python encoder reproduces bpe_encode_1k's golden
        corpus totals from the same merge list. Until now both 1k queries
        were witness-pinned only (goldens measured from the same Spark
        implementation they test)."""
        from sentiment_analysis_bigdata_spark.workloads import train_q

        tri = train_q._trigram_corpus(spark, "/root/testdata/sf0.001")
        wf = tokenizer_train.word_frequencies(tri)
        word_freqs = {r["word"]: r["freq"] for r in wf.collect()}
        assert len(word_freqs) > 10_000  # genuinely corpus-shaped vocab

        merges = tokenizer_train.train_bpe_from_word_counts(wf, n_merges=1000)
        expected, _ = _py_bpe(word_freqs, 1000)
        assert len(merges) == 1000
        assert merges == expected  # rank, lhs, rhs, merged, count — all 1000

        # Independent encode twin: leftmost-lowest-rank iterative merge
        # application per word (the canonical BPE encoder), reproducing
        # the bpe_encode_1k golden totals without the Arrow kernel.
        ranks = {(m[1], m[2]): m[0] for m in merges}

        def encode(word: str) -> list[str]:
            syms = list(word)
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [
                    syms[best_i] + syms[best_i + 1]
                ]
            return syms

        n_tokens = n_subwords = 0
        types: set[str] = set()
        for w, f in word_freqs.items():
            seg = encode(w)
            n_tokens += f
            n_subwords += f * len(seg)
            types.update(seg)
        golden = train_q._BPE_ENC_1K_GOLDEN["0.001"]
        assert n_tokens == golden["n_tokens"]
        assert n_subwords == golden["n_subwords"]
        assert len(types) == golden["n_subword_types"]

    def test_adjacent_repeat_merge_is_non_overlapping(self, spark):
        # "aaaa" + merge (a,a) must give [aa, aa]; "aaa" gives [aa, a]
        df = spark.createDataFrame([Row(text="aaaa aaaa aaa")])
        merges, vocab = tokenizer_train.train_bpe(df, n_merges=1)
        assert merges[0][1:4] == ("a", "a", "aa")
        segs = {r["word"]: r["seg"].strip().split("  ") for r in vocab.collect()}
        assert segs["aaaa"] == ["aa", "aa"]
        assert segs["aaa"] == ["aa", "a"]

    def test_bpe_segment_applies_merge_list(self, spark):
        merges, _ = tokenizer_train.train_bpe(self._corpus(spark), n_merges=6)
        df = spark.createDataFrame([Row(toks=["lowest", "low"])])
        out = df.select(
            tokenizer_train.bpe_segment(
                F.col("toks"), [(m[1], m[2]) for m in merges]
            ).alias("s")
        ).first()["s"]
        py_merges = [(m[1], m[2]) for m in _py_bpe(self.WORD_FREQS, 6)[0]]

        def py_seg(word):
            syms = list(word)
            for lhs, rhs in py_merges:
                out_s, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                        out_s.append(lhs + rhs)
                        i += 2
                    else:
                        out_s.append(syms[i])
                        i += 1
                syms = out_s
            return syms

        assert [list(x) for x in out] == [py_seg("lowest"), py_seg("low")]


class TestMortonKey:
    @staticmethod
    def _py_morton(x: int, y: int, bits: int) -> int:
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    def test_matches_python_interleave(self, spark):
        cases = [(0, 0), (1, 0), (0, 1), (5, 3), (1023, 0), (0, 1023), (777, 1022)]
        df = spark.createDataFrame([Row(x=x, y=y) for x, y in cases])
        got = df.select(
            "x", "y", layout.morton_key("x", "y", bits=10).alias("m")
        ).collect()
        for r in got:
            assert r.m == self._py_morton(r.x, r.y, 10), (r.x, r.y)

    def test_locality(self, spark):
        # adjacent cells differ in few low bits → small key distance
        df = spark.createDataFrame([Row(x=4, y=4), Row(x=5, y=4), Row(x=4, y=5)])
        keys = [
            r.m
            for r in df.select(layout.morton_key("x", "y", bits=4).alias("m")).collect()
        ]
        base = keys[0]
        assert all(abs(k - base) <= 2 for k in keys[1:])

    def test_zorder_write_clusters_files(self, spark, tmp_path):
        n = 4096
        df = spark.range(n).select(
            (F.col("id") % 64).alias("x"),
            ((F.col("id") * 7) % 64).alias("y"),
            F.col("id").alias("payload"),
        )
        out = str(tmp_path / "zorder")
        layout.zorder_write(df, out, "x", "y", bits=6, num_files=8)
        back = spark.read.parquet(out)
        assert back.count() == n
        assert set(back.columns) == {"x", "y", "payload"}
        # per-file morton ranges must not overlap (range partitioning)
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        assert len(files) > 1
        ranges = []
        for f in files:
            stats = (
                spark.read.parquet(f)
                .select(layout.morton_key("x", "y", bits=6).alias("m"))
                .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
                .first()
            )
            if stats.lo is not None:
                ranges.append((stats.lo, stats.hi))
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, "file Z-ranges overlap"


class TestGroupwiseRegression:
    def _frame(self, spark):
        rows = [
            Row(g="a", x=1.0, y=2.0),
            Row(g="a", x=2.0, y=4.1),
            Row(g="a", x=3.0, y=5.9),
            Row(g="b", x=1.0, y=10.0),
            Row(g="b", x=2.0, y=8.0),
            Row(g="c", x=5.0, y=1.0),  # single row → no fit
            Row(g="d", x=2.0, y=1.0),  # zero x-variance → no fit
            Row(g="d", x=2.0, y=3.0),
        ]
        return spark.createDataFrame(rows)

    def test_expr_matches_pandas(self, spark):
        df = self._frame(spark)
        ex = {
            r.g: (r.slope, r.intercept, r.r2, r.n)
            for r in regression.groupwise_ols_expr(df, ["g"], "x", "y").collect()
        }
        pd_ = {
            r.g: (r.slope, r.intercept, r.r2, r.n)
            for r in regression.groupwise_ols_pandas(df, ["g"], "x", "y").collect()
        }
        assert set(ex) == set(pd_) == {"a", "b", "c", "d"}
        for g in ["a", "b"]:
            for u, v in zip(ex[g], pd_[g]):
                assert u == pytest.approx(v, abs=1e-9), g

    def test_known_slope(self, spark):
        df = self._frame(spark)
        got = {
            r.g: r
            for r in regression.groupwise_ols_expr(df, ["g"], "x", "y").collect()
        }
        assert got["b"].slope == pytest.approx(-2.0)
        assert got["b"].intercept == pytest.approx(12.0)
        assert got["b"].r2 == pytest.approx(1.0)

    def test_degenerate_groups(self, spark):
        df = self._frame(spark)
        pd_ = {
            r.g: r
            for r in regression.groupwise_ols_pandas(df, ["g"], "x", "y").collect()
        }
        assert pd_["c"].slope is None and pd_["c"].n == 1
        assert pd_["d"].slope is None and pd_["d"].n == 2


class TestWordpieceScores:
    def test_prefers_rare_but_exclusive_pairs(self, spark):
        # corpus: "ab" ×3, "cd" ×1 →
        #   BPE count rank:       (a,b) n=3  beats (c,d) n=1
        #   WordPiece score rank: (c,d) 1/(1·1)=1 beats (a,b) 3/(3·3)=1/3
        df = spark.createDataFrame(
            [Row(text="ab ab ab cd")], "text string"
        )
        vocab = tokenizer_train.segment_words(
            tokenizer_train.word_frequencies(df)
        )
        scored = {
            (r.lhs, r.rhs): r
            for r in tokenizer_train.wordpiece_scores(vocab).collect()
        }
        ab, cd = scored[("a", "b")], scored[("c", "d")]
        assert (ab.n, ab.n_lhs, ab.n_rhs) == (3, 3, 3)
        assert (cd.n, cd.n_lhs, cd.n_rhs) == (1, 1, 1)
        import math

        assert ab.score_ln == round(math.log(3) - 2 * math.log(3), 6)
        assert cd.score_ln == 0.0
        assert cd.score_ln > ab.score_ln  # the WordPiece inversion

    def test_unigram_counts_freq_weighted(self, spark):
        df = spark.createDataFrame(
            [Row(text="xy xy"), Row(text="xy")], "text string"
        )
        vocab = tokenizer_train.segment_words(
            tokenizer_train.word_frequencies(df)
        )
        r = tokenizer_train.wordpiece_scores(vocab).collect()
        assert len(r) == 1
        assert (r[0].lhs, r[0].rhs, r[0].n, r[0].n_lhs, r[0].n_rhs) == (
            "x", "y", 3, 3, 3,
        )


class TestUnigramSegment:
    def _vocab(self, spark, entries):
        return spark.createDataFrame(
            [(p, 1, lp) for p, lp in entries], "piece string, n long, logp double"
        )

    def test_prefers_higher_likelihood_split(self, spark):
        from sentiment_analysis_bigdata_spark.operators import tokenizer_unigram as TU

        vocab = self._vocab(
            spark, [("a", -3.0), ("b", -3.0), ("ab", -2.0)]
        )
        words = spark.createDataFrame([("abab",)], "word string")
        r = TU.viterbi_segment(words, vocab).collect()[0]
        # ab|ab = -4 beats a|b|a|b = -12 and ab|a|b = -8
        assert r.seg == "ab|ab"
        assert r.logp == -4.0

    def test_oov_character_null(self, spark):
        from sentiment_analysis_bigdata_spark.operators import tokenizer_unigram as TU

        vocab = self._vocab(spark, [("a", -1.0)])
        words = spark.createDataFrame([("az",)], "word string")
        r = TU.viterbi_segment(words, vocab).collect()[0]
        assert r.seg is None and r.logp is None

    def test_tie_breaks_smallest_split(self, spark):
        from sentiment_analysis_bigdata_spark.operators import tokenizer_unigram as TU

        # "ab" as a|b (= -2-2 = -4) vs "ab" piece (-4.0): exact tie →
        # the smaller split point j wins at each step → prefers the
        # single piece "ab" (j=0) over extending a|b (j=1)
        vocab = self._vocab(spark, [("a", -2.0), ("b", -2.0), ("ab", -4.0)])
        words = spark.createDataFrame([("ab",)], "word string")
        r = TU.viterbi_segment(words, vocab).collect()[0]
        assert r.seg == "ab"

    def test_alphabet_coverage_end_to_end(self, spark):
        from sentiment_analysis_bigdata_spark.operators import tokenizer_unigram as TU
        from sentiment_analysis_bigdata_spark.operators.tokenizer_train import (
            word_frequencies,
        )

        docs = spark.createDataFrame(
            [("zq xxyy xxyy zq zq",)], "text string"
        )
        vocab = TU.piece_vocab(docs, min_freq=2, max_pieces=10)
        wf = word_frequencies(docs)
        segs = {r.word: r for r in TU.viterbi_segment(wf, vocab).collect()}
        # every corpus word is segmentable (single chars always in vocab)
        assert all(r.seg is not None for r in segs.values())
        counts = {
            r.piece: r.n
            for r in TU.unigram_piece_counts(
                TU.viterbi_segment(wf, vocab), wf
            ).collect()
        }
        # hard-EM counts are freq-weighted over the chosen segmentation
        assert sum(n for n in counts.values()) > 0


class TestQuantileBins:
    def test_equi_depth_and_cover(self, spark):
        from sentiment_analysis_bigdata_spark.workloads.train_q import q_quantile_bins

        out = q_quantile_bins(spark, "/root/testdata/sf0.001").collect()
        n = sum(r["n_orders"] for r in out)
        assert len(out) == 10
        # equi-depth: every decile holds ~n/10 rows (ties can skew slightly)
        for r in out:
            assert abs(r["n_orders"] - n / 10) <= max(2, 0.02 * n)
        # bins tile the value range in order
        by_bin = sorted(out, key=lambda r: r["bin"])
        for lo, hi in zip(by_bin, by_bin[1:]):
            assert lo["max_price"] <= hi["min_price"]


class TestBpeEncodeKernel:
    def test_matches_expression_path_small(self, spark):
        from pyspark.sql import Row

        from sentiment_analysis_bigdata_spark.functions import text as TXT

        corpus = spark.createDataFrame(
            [Row(text="low low low low low lower lower newest newest newest "
                      "newest newest newest widest widest widest")]
        )
        merges, _ = tokenizer_train.train_bpe(corpus, n_merges=6)
        pairs = [(m[1], m[2]) for m in merges]
        df = spark.createDataFrame(
            [(0, ["lowest", "low", "newest", "wide", "x"])],
            "doc_id long, toks array<string>",
        )
        expr = df.select(
            tokenizer_train.bpe_segment(F.col("toks"), pairs).alias("s")
        ).first()["s"]
        kern = tokenizer_train.bpe_encode_kernel(df, pairs).first()["subwords"]
        assert [list(t) for t in kern] == [list(t) for t in expr]

    def test_matches_expression_path_saturation_vocab(self, spark):
        """Kernel ≡ expression encoder under the FULL saturation merge
        list of the fixture corpus (~89 merges, deep merge chains), over
        every distinct corpus word."""
        from sentiment_analysis_bigdata_spark.functions import text as TXT

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        merges, _ = tokenizer_train.train_bpe(
            docs, n_merges=256, batch_merges=16
        )
        pairs = [(m[1], m[2]) for m in merges]
        words = (
            docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("w"))
            .distinct()
            .select(F.col("w").alias("doc_id"), F.array("w").alias("toks"))
        )
        expr = {
            r["doc_id"]: [list(t) for t in r["s"]]
            for r in words.select(
                "doc_id",
                tokenizer_train.bpe_segment(F.col("toks"), pairs).alias("s"),
            ).collect()
        }
        kern = {
            r["doc_id"]: [list(t) for t in r["subwords"]]
            for r in tokenizer_train.bpe_encode_kernel(words, pairs).collect()
        }
        assert kern == expr

    def test_memoization_cache_consistency(self, spark):
        # repeated tokens in one batch hit the cache; results identical
        pairs = [("a", "b"), ("ab", "c")]
        df = spark.createDataFrame(
            [(0, ["abc", "abc", "ab", "abcabc"])],
            "doc_id long, toks array<string>",
        )
        out = tokenizer_train.bpe_encode_kernel(df, pairs).first()["subwords"]
        # rank 1 (a,b) applies at BOTH sites of "abcabc" before rank 2
        assert [list(t) for t in out] == [
            ["abc"], ["abc"], ["ab"], ["abc", "abc"]
        ]
