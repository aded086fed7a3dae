"""Property-based tests (hypothesis): invariants that must hold for
arbitrary inputs, batched into single DataFrames so each property costs one
Spark job, not one per example."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import hashing as H
from sentiment_analysis_bigdata_spark.functions import text as TXT

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
        max_size=80,
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(texts=TEXTS)
def test_clean_text_invariants(spark, texts):
    """clean_text output is always lowercase [a-z ], single-spaced, trimmed
    (the invariants the reference's sink contract relies on, FIXTURES §2)."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(TXT.clean_text("text").alias("c")).collect()
    for r in out:
        c = r["c"]
        assert c == c.strip()
        assert "  " not in c
        assert all(ch.islower() or ch == " " for ch in c), repr(c)


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5), max_size=20),
    n=st.integers(min_value=1, max_value=4),
)
def test_ngram_count_property(spark, toks, n):
    """len(ngrams(t, n)) == max(0, len(t) - n + 1)."""
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    out = df.select(F.size(TXT.ngrams("toks", n)).alias("k")).first()["k"]
    assert out == max(0, len(toks) - n + 1)


@settings(max_examples=6, deadline=None)
@given(
    a=st.sets(st.text(alphabet="abcdefghij", min_size=1, max_size=4), min_size=1, max_size=15),
    b=st.sets(st.text(alphabet="abcdefghij", min_size=1, max_size=4), min_size=1, max_size=15),
)
def test_minhash_estimates_jaccard(spark, a, b):
    """Expected band-agreement of MinHash signatures tracks true Jaccard:
    identical sets → identical signatures; disjoint sets (almost surely)
    differ; agreement fraction within a loose statistical band otherwise."""
    true_j = len(a & b) / len(a | b)
    df = spark.createDataFrame(
        [(0, sorted(a)), (1, sorted(b))], "doc_id long, toks array<string>"
    )
    sigs = [
        r["sig"]
        for r in df.orderBy("doc_id")
        .select(H.minhash_signature("toks", 32).alias("sig"))
        .collect()
    ]
    agree = sum(x == y for x, y in zip(*sigs)) / 32
    if true_j == 1.0:
        assert agree == 1.0
    else:
        # 32 hashes → sd ≈ sqrt(j(1-j)/32) ≤ 0.09; allow 4 sd
        assert abs(agree - true_j) < 0.4


@settings(max_examples=8, deadline=None)
@given(
    labels=st.lists(st.integers(min_value=0, max_value=1), min_size=4, max_size=40).filter(
        lambda ls: 0 < sum(ls) < len(ls)
    ),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_roc_auc_monotone_invariance(spark, labels, seed):
    """AUC is invariant under strictly monotone score transforms and
    complements to 1 − AUC under score negation."""
    import random

    from sentiment_analysis_bigdata_spark.operators import evaluation as EV

    rng = random.Random(seed)
    rows = [(y, rng.random() + 0.5 * y) for y in labels]
    df = spark.createDataFrame(rows, "label int, score double")
    auc = EV.roc_auc(df, score_col="score")
    df2 = df.withColumn("score", F.exp(F.col("score") * 3))  # strictly monotone
    assert EV.roc_auc(df2, score_col="score") == pytest.approx(auc, abs=1e-9)
    df3 = df.withColumn("score", -F.col("score"))
    assert EV.roc_auc(df3, score_col="score") == pytest.approx(1 - auc, abs=1e-9)
    assert 0.0 <= auc <= 1.0


@settings(max_examples=8, deadline=None)
@given(texts=TEXTS)
def test_tokenize_ml_exact_matches_ml_tokenizer(spark, texts):
    """The exact twin must equal ML Tokenizer on ARBITRARY input — interior
    empty tokens from whitespace runs, trailing-empty dropping, ''→['']
    (SURVEY §7.6)."""
    from pyspark.ml.feature import Tokenizer

    # force the hard cases into every run alongside the random ones
    texts = texts + ["a  b", "  lead", "trail  ", "", " ", "a\tb\nc"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    ml = Tokenizer(inputCol="text", outputCol="ml_toks").transform(df)
    both = ml.withColumn("ours", TXT.tokenize_ml_exact("text")).collect()
    for r in both:
        assert r["ml_toks"] == r["ours"], repr(r["text"])


def test_nb_auc_uses_rawprediction(spark):
    """Reference parity (BASELINE.md NB caveat): AUC must come from the NB
    rawPrediction ordering, exactly matching BinaryClassificationEvaluator —
    including when that ordering is miscalibrated vs probability."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from sentiment_analysis_bigdata_spark.operators import ml as ML

    rows = []
    for i in range(300):
        label = i % 2
        words = ("good nice fine" if label else "bad poor sad").split()
        rows.append((label, " ".join(words[: 1 + i % 3] + [f"w{i % 23}", f"v{i % 7}"])))
    df = spark.createDataFrame(rows, "label int, text string")

    cfg = ML.PipelineConfig(num_features=2**10)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    fitted = ML.build_pipeline("nb", cfg).fit(train)
    scored = fitted.transform(test)
    expected = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(scored)

    _, metrics = ML.train_and_evaluate(df, "nb", cfg)
    assert metrics["roc_auc"] == pytest.approx(expected, abs=1e-9)


@settings(max_examples=8, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_interval_union_sweep_equals_bruteforce(spark, intervals):
    """The running-max-end sweep window (dup_ngram_spans_ladder /
    span_corruption_plan share it) must equal the brute-force position
    union for ARBITRARY mixed-length interval sets."""
    from pyspark.sql import Window

    rows = [(0, s, s + ln) for s, ln in intervals]
    df = spark.createDataFrame(rows, "doc_id long, start int, end int")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = (
        df.withColumn("run_end", F.max("end").over(w))
        .select(
            F.greatest(
                F.lit(0),
                F.col("end")
                - F.greatest(
                    F.coalesce(F.col("run_end"), F.lit(0)),
                    F.col("start") - 1,
                ),
            ).alias("contrib")
        )
        .agg(F.sum("contrib"))
        .first()[0]
    )
    want = len({p for s, ln in intervals for p in range(s, s + ln + 1)})
    assert got == want, (sorted(rows), got, want)


@settings(max_examples=5, deadline=None)
@given(
    words=st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    n=st.integers(min_value=1, max_value=8),
)
def test_driver_bpe_matches_naive_reference(spark, words, n):
    """train_bpe_from_word_counts (heap + incremental deltas + lazy
    where-index) ≡ the naive recount-everything reference for arbitrary
    small vocabularies — ranks, pairs, and counts."""
    from tests.test_train_ops import _py_bpe
    from sentiment_analysis_bigdata_spark.operators import tokenizer_train

    wf = spark.createDataFrame(
        list(words.items()), "word string, freq long"
    )
    got = tokenizer_train.train_bpe_from_word_counts(wf, n_merges=n)
    want, _ = _py_bpe(words, n)
    assert got == want, (words, n)


@settings(max_examples=6, deadline=None)
@given(
    keys=st.lists(
        st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=12),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    m=st.sampled_from([256, 1024, 4096]),
    k=st.integers(min_value=1, max_value=4),
)
def test_bloom_never_false_negative(spark, keys, m, k):
    """For ANY key set and (m, k): every inserted key probes positive —
    the Bloom guarantee the decontamination pre-filter rests on."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    df = spark.createDataFrame([(x,) for x in keys], "key string")
    sketch = sketches.bloom_build(df, "key", m=m, k=k, seed=0)
    got = sketches.bloom_probe(sketch, df, "key", m=m, k=k, seed=0).collect()
    assert len(got) == len(keys)
    assert all(r.bloom_member for r in got)


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=120,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
def test_narrowed_quantile_equals_sorted_rank(spark, vals, q):
    """exact_quantile_narrowed == the rank-⌈q·n⌉ element of the sorted
    list, for arbitrary floats including duplicates and negatives."""
    import math

    from sentiment_analysis_bigdata_spark.operators import normalize as NORM

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got, n, _ = NORM.exact_quantile_narrowed(df, "v", q, bins=16, max_rounds=3)
    s = sorted(vals)
    want = float(s[max(1, math.ceil(q * len(s))) - 1])
    assert n == len(vals)
    assert got == want, (q, got, want, s[:5])


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    dim=st.integers(min_value=1, max_value=64),
)
def test_grid_quantized_distance_is_order_invariant(data, dim):
    """The r6 gemm-assign exactness contract (clustering.quantize_grid):
    after flooring vectors onto the 2^-16 lattice (|x| < 2), the squared
    L2 distance is EXACTLY representable in float64, so every evaluation
    strategy — sequential left-to-right fold (the DuckDB list_sum / HOF
    zip_with order), reversed fold, numpy pairwise summation, and the
    BLAS decomposition |x|^2 + |c|^2 - 2 x.c — yields identical bits.
    Pure-arithmetic property, no Spark session needed."""
    import math

    import numpy as np

    fl = st.floats(min_value=-1.999, max_value=1.999,
                   allow_nan=False, allow_infinity=False)
    x = [data.draw(fl) for _ in range(dim)]
    c = [data.draw(fl) for _ in range(dim)]
    q = lambda v: math.floor(v * 65536.0) / 65536.0
    xq = [q(v) for v in x]
    cq = [q(v) for v in c]

    # sequential left-to-right (the SQL fold)
    seq = 0.0
    for a, b in zip(xq, cq):
        seq = seq + (a - b) * (a - b)
    # reversed order
    rev = 0.0
    for a, b in reversed(list(zip(xq, cq))):
        rev = rev + (a - b) * (a - b)
    # numpy pairwise summation
    xn, cn = np.array(xq, dtype="float64"), np.array(cq, dtype="float64")
    npsum = float(((xn - cn) ** 2).sum())
    # BLAS decomposition (dot products via numpy, any internal order)
    decomp = float(xn @ xn + cn @ cn - 2.0 * (xn @ cn))

    assert seq == rev == npsum == decomp


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(min_value=2, max_value=5),
)
def test_exact_substring_spans_equals_bruteforce(spark, docs, min_len):
    """exact_substring_spans == the brute-force position union: for every
    stride-1 window whose text occurs >= 2 times across all (doc, offset)
    positions, union the [off, off+L) intervals per doc and emit maximal
    spans. A 2-letter alphabet makes duplicate windows (incl. periodic
    intra-doc self-matches) the common case, not the corner case."""
    from collections import Counter

    from sentiment_analysis_bigdata_spark.operators.dedup import (
        exact_substring_spans,
    )

    L = min_len
    # brute force, 1-based offsets
    occ: Counter[str] = Counter()
    per_doc: dict[int, list[int]] = {}
    for d, t in enumerate(docs):
        for i in range(1, len(t) - L + 2):
            occ[t[i - 1 : i - 1 + L]] += 1
    for d, t in enumerate(docs):
        offs = [
            i for i in range(1, len(t) - L + 2) if occ[t[i - 1 : i - 1 + L]] > 1
        ]
        if offs:
            per_doc[d] = offs
    want = set()
    for d, offs in per_doc.items():
        start, end = offs[0], offs[0] + L
        for o in offs[1:]:
            if o <= end:
                end = o + L
            else:
                want.add((d, start, end, end - start))
                start, end = o, o + L
        want.add((d, start, end, end - start))

    df = spark.createDataFrame(
        [(d, t) for d, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in exact_substring_spans(df, min_len=L).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(min_value=2, max_value=5),
)
def test_exact_substring_attribution_equals_bruteforce(spark, docs, min_len):
    """exact_substring_attribution == brute force: per maximal duplicated
    span, the distinct OTHER docs sharing any of the span's duplicated
    windows, plus the min such doc_id (None when the span is an
    intra-doc-only repeat). The 2-letter alphabet makes multi-doc and
    intra-doc duplicate windows dense, exercising both match classes."""
    from collections import Counter, defaultdict

    from sentiment_analysis_bigdata_spark.operators.dedup import (
        exact_substring_attribution,
    )

    L = min_len
    occ: Counter[str] = Counter()
    win_docs: dict[str, set[int]] = defaultdict(set)
    for d, t in enumerate(docs):
        for i in range(1, len(t) - L + 2):
            w = t[i - 1 : i - 1 + L]
            occ[w] += 1
            win_docs[w].add(d)
    want = set()
    for d, t in enumerate(docs):
        offs = [
            i for i in range(1, len(t) - L + 2) if occ[t[i - 1 : i - 1 + L]] > 1
        ]
        if not offs:
            continue
        spans: list[list[int]] = [[offs[0], offs[0] + L]]
        for o in offs[1:]:
            if o <= spans[-1][1]:
                spans[-1][1] = o + L
            else:
                spans.append([o, o + L])
        for start, end in spans:
            matches: set[int] = set()
            for o in range(start, end - L + 1):
                if o in set(offs):
                    matches |= win_docs[docs[d][o - 1 : o - 1 + L]] - {d}
            want.add(
                (
                    d,
                    start,
                    end,
                    end - start,
                    len(matches),
                    min(matches) if matches else None,
                )
            )

    df = spark.createDataFrame(
        [(d, t) for d, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (
            r["doc_id"],
            r["span_start"],
            r["span_end"],
            r["span_len"],
            r["n_match_docs"],
            r["first_match_doc"],
        )
        for r in exact_substring_attribution(df, min_len=L).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(min_value=2, max_value=5),
)
def test_exact_substring_removal_equals_bruteforce(spark, docs, min_len):
    """exact_substring_removal == delete-the-brute-force-union: compute the
    duplicated-position set per doc directly, keep exactly the characters
    no duplicated window covers, and compare the rebuilt strings plus the
    accounting columns character-for-character."""
    from collections import Counter

    from sentiment_analysis_bigdata_spark.operators.dedup import (
        exact_substring_removal,
    )

    L = min_len
    occ: Counter[str] = Counter()
    for t in docs:
        for i in range(1, len(t) - L + 2):
            occ[t[i - 1 : i - 1 + L]] += 1
    want = {}
    for d, t in enumerate(docs):
        covered = [False] * len(t)
        for i in range(1, len(t) - L + 2):
            if occ[t[i - 1 : i - 1 + L]] > 1:
                for j in range(i - 1, i - 1 + L):
                    covered[j] = True
        clean = "".join(c for c, cov in zip(t, covered) if not cov)
        # n_spans = number of maximal covered runs
        n_spans = sum(
            1
            for k, cov in enumerate(covered)
            if cov and (k == 0 or not covered[k - 1])
        )
        want[d] = (clean, n_spans, len(clean), len(t) - len(clean))

    df = spark.createDataFrame(
        [(d, t) for d, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_spans"],
            r["kept_chars"],
            r["removed_chars"],
        )
        for r in exact_substring_removal(df, min_len=L).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=90),
        min_size=1,
        max_size=6,
    ),
    min_len=st.integers(min_value=24, max_value=33),
)
def test_exact_substring_spans_prefilter_equals_bruteforce(spark, docs, min_len):
    """The winnowing-anchor PREFILTER path (auto-on for min_len >= 24) ==
    brute force. Same oracle as test_exact_substring_spans_equals_bruteforce
    but at L >= _ANCHOR_MIN_L over longer 2-letter strings, so the doubling
    sliding-min/max anchor selection, the candidate-region expansion
    clipping, and the downstream exact verification are all exercised on
    periodic/overlapping intra-doc matches — the adversarial case for a
    content-defined sampler. Also pins that the prefilter actually engaged
    (a silent fall-through to the stride-1 path would vacuously pass)."""
    from collections import Counter

    from sentiment_analysis_bigdata_spark.operators import dedup as DD

    L = min_len
    assert L >= DD._ANCHOR_MIN_L  # the path under test is the prefilter
    occ: Counter[str] = Counter()
    for t in docs:
        for i in range(1, len(t) - L + 2):
            occ[t[i - 1 : i - 1 + L]] += 1
    want = set()
    for d, t in enumerate(docs):
        offs = [
            i for i in range(1, len(t) - L + 2) if occ[t[i - 1 : i - 1 + L]] > 1
        ]
        if not offs:
            continue
        start, end = offs[0], offs[0] + L
        for o in offs[1:]:
            if o <= end:
                end = o + L
            else:
                want.add((d, start, end, end - start))
                start, end = o, o + L
        want.add((d, start, end, end - start))

    df = spark.createDataFrame(
        [(d, t) for d, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in DD.exact_substring_spans(df, min_len=L).collect()
    }
    assert got == want
    # prefilter-off twin must agree position-for-position
    marked_on = {
        (r["doc_id"], r["off"])
        for r in DD._exactsubstr_marked(df, "text", "doc_id", L, prefilter=True).collect()
    }
    marked_off = {
        (r["doc_id"], r["off"])
        for r in DD._exactsubstr_marked(df, "text", "doc_id", L, prefilter=False).collect()
    }
    assert marked_on == marked_off


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-50, max_value=50).map(float),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    descending=st.booleans(),
    n_bands=st.integers(min_value=1, max_value=8),
)
def test_banded_global_ordinal_matches_window_property(
    spark, vals, descending, n_bands
):
    """banded_global_ordinal == global row_number() for ARBITRARY value
    multisets — heavy ties (the integer strategy collides constantly),
    negatives, float extremes — at any band count including the
    degenerate n_bands=1, in both directions. The deterministic
    equality tests in test_ordering.py pin chosen edge cases; this
    fuzzes the space between them."""
    from pyspark.sql import Window

    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_global_ordinal,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "tid long, v double"
    )
    got = banded_global_ordinal(
        df, "v", "tid", descending=descending, n_bands=n_bands
    )
    order = [
        F.col("v").desc() if descending else F.col("v").asc(),
        F.col("tid").asc(),
    ]
    exp = df.withColumn(
        "wpos", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    mism = (
        got.join(exp.select("tid", "wpos"), "tid")
        .filter(F.col("pos") != F.col("wpos"))
        .count()
    )
    assert mism == 0


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=100,
    ),
    descending=st.booleans(),
)
def test_banded_grouped_ordinal_matches_window_property(
    spark, rows, descending
):
    """banded_grouped_ordinal == per-group row_number() and group-count
    for arbitrary (enum, tied-value) multisets in both directions."""
    from pyspark.sql import Window

    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_grouped_ordinal,
    )

    df = spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)],
        "tid long, grp string, v double",
    )
    got = banded_grouped_ordinal(
        df, ["grp"], "v", "tid", descending=descending, n_bands=4
    )
    order = [
        F.col("v").desc() if descending else F.col("v").asc(),
        F.col("tid").asc(),
    ]
    w = Window.partitionBy("grp").orderBy(*order)
    wn = Window.partitionBy("grp")
    exp = df.withColumn(
        "wpos", F.row_number().over(w).cast("bigint")
    ).withColumn("wn", F.count(F.lit(1)).over(wn).cast("bigint"))
    mism = (
        got.join(exp.select("tid", "wpos", "wn"), "tid")
        .filter(
            (F.col("pos") != F.col("wpos")) | (F.col("n_in_group") != F.col("wn"))
        )
        .count()
    )
    assert mism == 0
