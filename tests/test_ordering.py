"""Deterministic shuffle / hash split / decontamination operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import dedup as DD
from sentiment_analysis_bigdata_spark.operators import ordering
from sentiment_analysis_bigdata_spark.operators import ordering as ORD


class TestDeterministicShuffle:
    def test_permutation_invariants(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        out = ordering.deterministic_shuffle(df, n_shards=8).collect()
        assert len(out) == 1000
        assert len({r["doc_id"] for r in out}) == 1000  # exactly once
        shards = {r["shard"] for r in out}
        assert shards <= set(range(8))
        # ordinals within each shard are exactly 1..count(shard)
        by_shard: dict[int, list[int]] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["ordinal"])
        for s, ords in by_shard.items():
            assert sorted(ords) == list(range(1, len(ords) + 1)), s

    def test_layout_independent(self, spark):
        df = spark.range(500).withColumnRenamed("id", "doc_id")
        a = ordering.deterministic_shuffle(df.repartition(13), n_shards=8)
        b = ordering.deterministic_shuffle(df.coalesce(1), n_shards=8)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_seed_changes_permutation(self, spark):
        df = spark.range(300).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: (r["shard"], r["ordinal"])
             for r in ordering.deterministic_shuffle(df, seed=1).collect()}
        b = {r["doc_id"]: (r["shard"], r["ordinal"])
             for r in ordering.deterministic_shuffle(df, seed=2).collect()}
        assert any(a[k] != b[k] for k in a)


class TestSplitByHash:
    WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_proportions_and_stability_under_growth(self, spark):
        df = spark.range(10_000).withColumnRenamed("id", "doc_id")
        out = ordering.split_by_hash(df, self.WEIGHTS)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts["train"] == pytest.approx(8000, rel=0.05)
        assert counts["val"] == pytest.approx(1000, rel=0.2)
        assert counts["test"] == pytest.approx(1000, rel=0.2)
        # growing the data must NOT move existing rows between splits
        # (this is the property randomSplit lacks)
        small = {r["doc_id"]: r["split"] for r in
                 ordering.split_by_hash(
                     spark.range(1000).withColumnRenamed("id", "doc_id"),
                     self.WEIGHTS).collect()}
        big = {r["doc_id"]: r["split"] for r in out.collect()}
        assert all(big[k] == v for k, v in small.items())

    def test_rejects_bad_weights(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="sum to 1"):
            ordering.split_by_hash(df, {"a": 0.5, "b": 0.6})


class TestBalanceSources:
    def test_downsamples_majority_deterministically(self, spark):
        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = ordering.balance_sources(df)
        counts = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts["small"] == 100  # accept rate 1.0 keeps all
        assert counts["big"] == pytest.approx(100, abs=35)  # expected-size sampler
        # deterministic: identical row set on re-run and under other layouts
        again = ordering.balance_sources(df.repartition(7))
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    def test_weighted_sample_fraction_column(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id").withColumn(
            "p", F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0)
        )
        out = ordering.weighted_sample_by_hash(df, F.col("p"))
        got = [r["doc_id"] for r in out.collect()]
        assert len(got) == 1000 and all(d % 2 == 0 for d in got)


class TestDedupSegments:
    def test_first_occurrence_wins_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "b a b c a a d"), (2, "x x x"), (3, "unique words only")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in DD.dedup_segments(df).collect()}
        assert out[1]["text_deduped"] == "b a c d"
        assert (out[1]["n_segments"], out[1]["n_unique_segments"]) == (7, 4)
        assert out[2]["text_deduped"] == "x"
        assert out[3]["text_deduped"] == "unique words only"
        assert out[3]["n_segments"] == out[3]["n_unique_segments"] == 3

    def test_line_separator(self, spark):
        df = spark.createDataFrame(
            [(1, "copy line\nreal text\ncopy line\nmore text")],
            "doc_id long, text string",
        )
        r = DD.dedup_segments(df, sep="\n").collect()[0]
        assert r["text_deduped"] == "copy line\nreal text\nmore text"


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        bench = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (10, "a quick brown fox appeared"),       # shares 'quick brown fox'
                (11, "totally different words entirely"),  # clean
                (12, "the lazy dog slept and the lazy dog snored"),  # shares 'the lazy dog'
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["n_matching_grams"]
               for r in DD.decontaminate(corpus, bench, n=3, min_matches=1).collect()}
        assert set(out) == {10, 12}
        assert out[10] == 1
        assert out[12] == 1  # distinct grams per doc — repeats count once

    def test_min_matches_threshold(self, spark):
        bench = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [(10, "alpha beta gamma delta zeta")],  # 2 shared 3-grams
            "doc_id long, text string",
        )
        assert DD.decontaminate(corpus, bench, n=3, min_matches=3).count() == 0
        assert DD.decontaminate(corpus, bench, n=3, min_matches=2).count() == 1


class TestSamplePerGroup:
    def _df(self, spark, n=200):
        rows = [(i, "a" if i % 2 == 0 else "b") for i in range(n)]
        return spark.createDataFrame(rows, "id long, grp string")

    def test_k_per_group_and_determinism(self, spark):
        out = ordering.sample_per_group(self._df(spark), ["grp"], k=5, id_col="id")
        rows = out.collect()
        by_grp = {}
        for r in rows:
            by_grp.setdefault(r["grp"], []).append((r["sample_rank"], r["id"]))
        assert set(by_grp) == {"a", "b"}
        for g, picked in by_grp.items():
            assert sorted(r for r, _ in picked) == [1, 2, 3, 4, 5]
        again = ordering.sample_per_group(
            self._df(spark).repartition(7), ["grp"], k=5, id_col="id"
        ).collect()
        assert {(r["grp"], r["sample_rank"], r["id"]) for r in again} == {
            (r["grp"], r["sample_rank"], r["id"]) for r in rows
        }

    def test_growth_stability(self, spark):
        # adding rows only displaces a selection when a new id hashes lower:
        # selections from the small corpus remain a superset source of the
        # overlap; ranks of surviving ids stay consistent with hash order
        small = ordering.sample_per_group(self._df(spark, 100), ["grp"], 5, "id")
        big = ordering.sample_per_group(self._df(spark, 200), ["grp"], 5, "id")
        s = {(r["grp"], r["id"]) for r in small.collect()}
        b = {(r["grp"], r["id"]) for r in big.collect()}
        # every selected-in-big id that existed in the small corpus was
        # selected there too (k smallest hashes can only be displaced, and
        # old ids' hashes are unchanged)
        old_in_big = {(g, i) for g, i in b if i < 100}
        assert old_in_big <= s


# --- mixture_sample (target-ratio mixing with up/down-sampling) -----------------


def test_mixture_sample_hits_target_shares(spark):
    rows = [(i, "big" if i < 800 else "small", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = ORD.mixture_sample(
        df, {"big": 0.5, "small": 0.5}, weight_col="w"
    )
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.sum("w").alias("n")).collect()}
    total = sum(got.values())
    # equal char share requested: each source within 10% of half the budget
    assert abs(got["big"] / total - 0.5) < 0.1
    assert abs(got["small"] / total - 0.5) < 0.1
    # small source (20% of corpus, target 50%) upsamples: rate 2.5 means
    # every row appears >= 2 times
    copies = (
        out.filter(F.col("source") == "small")
        .groupBy("doc_id")
        .count()
        .agg(F.min("count").alias("mn"), F.max("count").alias("mx"))
        .collect()[0]
    )
    assert copies["mn"] >= 2 and copies["mx"] <= 3


def test_mixture_sample_deterministic_and_drops_untargeted(spark):
    rows = [(i, ["a", "b", "c"][i % 3], 10 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    t = {"a": 0.6, "b": 0.4}
    one = sorted((r["doc_id"], r["copy_id"]) for r in ORD.mixture_sample(df, t, "w").collect())
    two = sorted((r["doc_id"], r["copy_id"]) for r in ORD.mixture_sample(df, t, "w").collect())
    assert one == two and len(one) > 0
    assert not any(
        r["source"] == "c" for r in ORD.mixture_sample(df, t, "w").collect()
    )


class TestDatasetFingerprint:
    def test_layout_and_order_invariant(self, spark):
        from sentiment_analysis_bigdata_spark.operators import ordering

        rows = [(i, f"t{i}") for i in range(200)]
        a = spark.createDataFrame(rows, "id long, t string").repartition(7)
        b = spark.createDataFrame(list(reversed(rows)), "id long, t string").repartition(2)
        fa = ordering.dataset_fingerprint(a).collect()[0]
        fb = ordering.dataset_fingerprint(b).collect()[0]
        assert (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint)

    def test_any_row_change_changes_fingerprint(self, spark):
        from sentiment_analysis_bigdata_spark.operators import ordering

        rows = [(i, f"t{i}") for i in range(50)]
        base = spark.createDataFrame(rows, "id long, t string")
        mut = spark.createDataFrame(
            [(i, "t999" if i == 7 else f"t{i}") for i in range(50)],
            "id long, t string",
        )
        dropped = base.filter("id <> 7")
        f0 = ordering.dataset_fingerprint(base).collect()[0].fingerprint
        assert ordering.dataset_fingerprint(mut).collect()[0].fingerprint != f0
        assert ordering.dataset_fingerprint(dropped).collect()[0].fingerprint != f0

    def test_null_canonicalization(self, spark):
        from pyspark.sql import Row

        from sentiment_analysis_bigdata_spark.operators import ordering

        a = spark.createDataFrame([Row(id=1, t=None)], "id long, t string")
        b = spark.createDataFrame([Row(id=1, t="␀")], "id long, t string")
        # NULL canonicalizes to the sentinel string — documented identity
        fa = ordering.dataset_fingerprint(a).collect()[0].fingerprint
        fb = ordering.dataset_fingerprint(b).collect()[0].fingerprint
        assert fa == fb


class TestBandedGlobalOrdinal:
    """operators/ordering.banded_global_ordinal (r11): exact global
    position without a single-partition sort. Equality against the
    naive row_number window is the whole contract."""

    def _naive(self, df, value_col, tiebreak_col, descending):
        from pyspark.sql.window import Window

        val = F.col(value_col)
        order = [val.desc() if descending else val.asc(), F.col(tiebreak_col).asc()]
        w = Window.orderBy(*order)
        return {
            r[0]: r[1]
            for r in df.select(
                tiebreak_col, F.row_number().over(w).cast("bigint")
            ).collect()
        }

    @pytest.mark.parametrize("descending", [False, True])
    def test_matches_naive_row_number_with_heavy_ties(self, spark, descending):
        # values collide 10 ways so ties MUST sit at band boundaries
        rows = [(i, float(i % 10)) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, v double")
        got = {
            r["id"]: r["pos"]
            for r in ordering.banded_global_ordinal(
                df, "v", "id", descending=descending, n_bands=8
            ).collect()
        }
        assert got == self._naive(df, "v", "id", descending)

    def test_more_bands_than_rows(self, spark):
        df = spark.createDataFrame([(1, 5.0), (2, 3.0), (3, 9.0)], "id long, v double")
        got = {
            r["id"]: r["pos"]
            for r in ordering.banded_global_ordinal(
                df, "v", "id", n_bands=32
            ).collect()
        }
        assert got == {2: 1, 1: 2, 3: 3}

    def test_single_value_all_one_band(self, spark):
        df = spark.createDataFrame([(i, 7.0) for i in range(9)], "id long, v double")
        got = {
            r["id"]: r["pos"]
            for r in ordering.banded_global_ordinal(df, "v", "id").collect()
        }
        assert got == {i: i + 1 for i in range(9)}

    def test_long_count_column_equals_window_rank(self, spark):
        """The ppjoin_pairs / token_gini shape (VERDICT r11 #2/#3): a
        LONG count column ('df'/'c') with heavy Zipf-like ties and a
        string tiebreak — banded positions must equal the naive
        (count asc, token asc) global row_number window rank."""
        rows = [(f"t{i:04d}", (i % 7) + 1) for i in range(300)]
        df = spark.createDataFrame(rows, "token string, c long")
        got = {
            r["token"]: r["pos"]
            for r in ordering.banded_global_ordinal(
                df, "c", "token", n_bands=8
            ).collect()
        }
        assert got == self._naive(df, "c", "token", False)

    def test_positions_are_a_permutation(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, rng.uniform(-100, 100)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, v double")
        pos = [
            r["pos"]
            for r in ordering.banded_global_ordinal(
                df, "v", "id", n_bands=16
            ).collect()
        ]
        assert sorted(pos) == list(range(1, 501))


class TestBandedGroupedOrdinal:
    """operators/ordering.banded_grouped_ordinal (r12): exact in-group
    position + group size for enum-keyed groups, without the per-group
    single-task sort a group-partitioned ranking window compiles to.
    Contract: equality against the naive grouped row_number window and
    the group count."""

    def test_matches_naive_grouped_row_number(self, spark):
        from pyspark.sql.window import Window

        rows = [
            (i, "FOP"[i % 3], float((i * 37) % 11))  # heavy value ties
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            r["id"]: (r["pos"], r["n_in_group"])
            for r in ordering.banded_grouped_ordinal(
                df, ["g"], "v", "id", n_bands=8
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
        wn = Window.partitionBy("g")
        want = {
            r["id"]: (r["rn"], r["n"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("bigint").alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            ).collect()
        }
        assert got == want

    def test_descending_and_multi_group(self, spark):
        from pyspark.sql.window import Window

        rows = [
            (i, "ab"[i % 2], "xy"[(i // 2) % 2], float(i % 5)) for i in range(80)
        ]
        df = spark.createDataFrame(rows, "id long, g1 string, g2 string, v double")
        got = {
            r["id"]: r["pos"]
            for r in ordering.banded_grouped_ordinal(
                df, ["g1", "g2"], "v", "id", descending=True, n_bands=4
            ).collect()
        }
        w = Window.partitionBy("g1", "g2").orderBy(
            F.col("v").desc(), F.col("id").asc()
        )
        want = {
            r["id"]: r["rn"]
            for r in df.select(
                "id", F.row_number().over(w).cast("bigint").alias("rn")
            ).collect()
        }
        assert got == want

    def test_corpus_scaled_group_key_fails_loud(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i}", float(i)) for i in range(50)], "id long, g string, v double"
        )
        with pytest.raises(ValueError, match="enum-like"):
            ordering.banded_grouped_ordinal(
                df, ["g"], "v", "id", n_bands=4, max_entries=16
            )
