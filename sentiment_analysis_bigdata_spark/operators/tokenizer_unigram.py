"""Unigram-LM subword segmentation (the SentencePiece unigram model,
Kudo 2018): given a piece vocabulary with log-probabilities, segment each
word into its maximum-likelihood piece sequence by Viterbi DP — the
inference step of the unigram tokenizer family, and (iterated with count
re-estimation) the hard-EM training step.

Distributed shape, same argument as BPE (operators/tokenizer_train.py):
the corpus reduces ONCE to the vocab-sized (word, freq) frame; vocabulary
candidates (all substrings of length ≤ max_len) are one explode over that
frame; the piece inventory is a bounded model (`max_pieces` + the full
single-character alphabet — the alphabet guarantees every corpus word is
segmentable, SentencePiece's required-character rule). Viterbi then runs
per DISTINCT word in an Arrow kernel against the collected (bounded)
vocab dict — the corpus is never rescanned.

Everything is deterministic, so a DuckDB oracle replays it end-to-end:
piece log-probs are rounded to 12 dp on BOTH engines before the DP (ln()
may differ in the last ulp across libm implementations — rounding makes
the DP inputs bit-identical, after which both engines run the same
additions in the same order), and the argmax tie-breaks on the smallest
split point (strict-> scan in the kernel ≡ ORDER BY score DESC, j ASC in
SQL). The DP recursion is depth-bounded by the word-length cap, so the
oracle unrolls it as MATERIALIZED CTEs (the PCA/BPE technique).

Reference parity: none (reference tokenizes by whitespace only); this is
the third trainer family next to BPE (merge-based) and WordPiece
(likelihood-ratio scoring).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators.tokenizer_train import (
    word_frequencies,
)

NEG_INF = float("-inf")


def piece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_freq: int = 5,
    max_pieces: int = 2000,
) -> DataFrame:
    """Candidate piece inventory: every substring of length 1..max_len of
    every corpus word, freq-weighted; log-prob ln(n/total) with the total
    taken over ALL candidates (so pruning doesn't move the normalizer).
    Kept pieces: the top ``max_pieces`` multi-char pieces by (n desc,
    piece asc) with n ≥ min_freq, plus EVERY single character (coverage:
    all corpus words stay segmentable). Returns (piece, n, logp) with
    logp pre-rounded to 12 dp (cross-engine DP-input stability).
    """
    wf = word_frequencies(docs, text_col)
    # substring with Column-valued (start, len) needs the SQL expr form
    grid = wf.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, {max_len}), ln ->
                  CASE WHEN length(word) >= ln THEN
                    transform(sequence(1, length(word) - ln + 1),
                              i -> substring(word, i, ln))
                  ELSE array() END))
                """
            )
        ).alias("piece"),
    )
    counts = grid.groupBy("piece").agg(F.sum("freq").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("total"))
    multi = (
        counts.filter((F.length("piece") >= 2) & (F.col("n") >= min_freq))
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(max_pieces)
    )
    kept = counts.filter(F.length("piece") == 1).unionByName(multi)
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        "n",
        F.round(F.log(F.col("n") / F.col("total")), 12).alias("logp"),
    )


def viterbi_segment(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    max_piece_len: int = 4,
) -> DataFrame:
    """Maximum-likelihood segmentation of each word under the piece LM:
    (word, seg, logp) with seg the '|'-joined piece sequence.

    The vocab is a bounded model (collected once); the DP runs per word in
    an Arrow kernel — O(len × max_piece_len) dict lookups per word, on the
    DISTINCT-word frame, never per corpus token. Ties take the smallest
    split point (identical to the oracle's ORDER BY score DESC, j ASC).
    Unsegmentable words (an out-of-vocab character) yield NULL seg/logp.
    """
    table = {
        r["piece"]: float(r["logp"]) for r in vocab.select("piece", "logp").collect()
    }

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_w, out_s, out_p = [], [], []
        for pdf in batches:
            for w in pdf[word_col]:
                L = len(w)
                best = [0.0] + [NEG_INF] * L
                seg: list[str | None] = [""] + [None] * L
                for i in range(1, L + 1):
                    for j in range(max(0, i - max_piece_len), i):
                        lp = table.get(w[j:i])
                        if lp is None or best[j] == NEG_INF:
                            continue
                        cand = best[j] + lp
                        if cand > best[i]:
                            best[i] = cand
                            seg[i] = (seg[j] + "|" + w[j:i]) if seg[j] else w[j:i]
                out_w.append(w)
                if best[L] == NEG_INF:
                    out_s.append(None)
                    out_p.append(None)
                else:
                    out_s.append(seg[L])
                    out_p.append(best[L])
        yield pd.DataFrame({"word": out_w, "seg": out_s, "logp": out_p})

    return words.select(F.col(word_col).alias("word")).mapInPandas(
        segment, schema="word string, seg string, logp double"
    )


def unigram_piece_counts(segmented: DataFrame, freq_df: DataFrame) -> DataFrame:
    """Hard-EM count re-estimation: corpus piece counts under the current
    Viterbi segmentation (seg split on '|', freq-weighted) — the M-step a
    unigram-LM trainer alternates with :func:`viterbi_segment`."""
    joined = segmented.join(freq_df, "word")
    return (
        joined.filter(F.col("seg").isNotNull())
        .select(F.explode(F.split("seg", r"\|")).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )
