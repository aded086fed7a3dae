"""Distributed tokenizer-training primitives (BPE-style pair counting).

The expensive step of byte-pair-encoding training is counting adjacent
symbol pairs across a corpus, weighted by word frequency. The classic
single-node implementation (Sennrich et al. 2016) loops over a word-freq
dict; at 100 TB the corpus doesn't fit, but the *vocabulary* does — so the
distributed form is:

  1. reduce the corpus to a (word, freq) table — one explode + one
     aggregation; output cardinality is vocabulary-sized (Heaps' law:
     sublinear in corpus size), not corpus-sized;
  2. per distinct word, emit its adjacent character pairs weighted by
     freq — a narrow generate over the small vocab frame;
  3. aggregate pair weights and take the top-k merge candidates.

Corpus-scale data is touched exactly once (step 1); every later stage
operates on vocab-sized frames. Iterating merges re-runs steps 2-3 on the
re-segmented vocab only — the corpus is never rescanned, which is the same
observation that makes single-node BPE trainers viable, applied to the
distributed setting.

Everything is built-in expressions (sequence/transform/explode) — no UDFs.

Reference: the reference tokenizes with ML ``Tokenizer`` only (SURVEY §2.6
M1, `model_logistic_regression.py:88-91`); subword tokenizer training is a
north-star LLM-pipeline extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): tokenize, explode, aggregate.

    The single corpus-sized pass. Partial (map-side) aggregation makes the
    shuffle vocabulary-sized per partition; skew on stopword-like hot words
    is bounded because the combine step caps per-partition output at the
    distinct-word count.
    """
    return (
        df.select(
            F.explode(tokenize_nonempty(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_pairs(word: Column | str) -> Column:
    """Adjacent character pairs of a word: ``substring(word, i, 2)`` for
    i in 1..len-1 (empty array for words shorter than 2 chars)."""
    w = F.col(word) if isinstance(word, str) else word
    return _pairs_expr(w)


def _pairs_expr(w: Column) -> Column:
    return F.when(
        F.length(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(w) - 1),
            lambda i: w.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(
    word_freq: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """(word, freq) → (pair, n): freq-weighted adjacent-pair counts.

    Runs entirely on the vocab-sized frame; the generate (≤ word-length
    pairs per word) and the final pair aggregation are both tiny relative
    to any corpus scan.
    """
    w = F.col(word_col)
    return (
        word_freq.select(
            F.explode(_pairs_expr(w)).alias("pair"),
            F.col(freq_col).alias("freq"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def top_merge_candidates(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """End-to-end single BPE round: corpus → top-k merge candidates.

    Deterministic tie-break (n desc, pair asc) so results are stable
    across engines and partitionings; top-k is TakeOrderedAndProject —
    no global sort.
    """
    return (
        bpe_pair_counts(word_frequencies(df, text_col))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )
