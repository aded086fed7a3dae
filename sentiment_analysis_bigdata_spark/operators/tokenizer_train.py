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
from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager


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


# --- full BPE training loop -------------------------------------------------------

def segment_words(word_freq: DataFrame, word_col: str = "word") -> DataFrame:
    """Add the ``seg`` column: the word's symbol sequence encoded as a
    space-bracketed string (``"low"`` → ``" l  o  w "`` — every symbol
    wrapped in single spaces, so adjacent symbols are separated by TWO).

    Why a string and not an array: applying a merge (a, b)→ab to this
    encoding is a LITERAL ``replace(seg, " a  b ", " ab ")``, whose
    left-to-right non-overlapping scan is exactly Sennrich's merge
    semantics ("aaa" + (a,a) → [aa, a]) — and ``replace`` behaves
    identically in Spark and DuckDB, so the oracle replays the whole
    training recursion verbatim. Tokens are whitespace-split upstream, so
    the space bracket can never collide with symbol content."""
    w = F.col(word_col)
    return word_freq.withColumn("seg", F.regexp_replace(w, "(.)", " $1 "))


def _symbols(seg: Column) -> Column:
    """seg string → array of current symbols."""
    return F.split(F.trim(seg), "  ")


def symbol_pair_counts(segmented: DataFrame, freq_col: str = "freq") -> DataFrame:
    """(seg, freq) → (lhs, rhs, n): freq-weighted adjacent SYMBOL pairs of
    the current segmentation (generalizes ``bpe_pair_counts``, which only
    handles the round-0 single-character case). Vocab-sized work."""
    syms = _symbols(F.col("seg"))
    # sequence(0, k) counts DOWN for k < 0 — guard 1-symbol words
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda j: F.struct(
                F.element_at(syms, j + 1).alias("lhs"),
                F.element_at(syms, j + 2).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        segmented.select(F.explode(pairs).alias("p"), F.col(freq_col))
        .select("p.lhs", "p.rhs", freq_col)
        .groupBy("lhs", "rhs")
        .agg(F.sum(freq_col).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_merges: int = 16,
    stats: dict | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Full BPE training (Sennrich et al. 2016, arXiv:1508.07909),
    distributed: returns (merges, final_vocab) where merges is
    ``[(rank, lhs, rhs, merged, n), ...]`` and final_vocab the segmented
    (word, freq, seg) frame after all merges.

    Scale shape (module docstring): the corpus is reduced ONCE to the
    vocab-sized (word, freq) frame; every merge ROUND then (1) counts
    adjacent symbol pairs on that frame — one vocab-sized shuffle, (2)
    collects a bounded top-of-list of candidates (driver action within the
    bounded-collect policy), (3) applies up to ``batch_merges`` merges as
    one narrow literal ``replace`` projection. ``localCheckpoint`` per
    ROUND keeps the lineage flat, so round k never recomputes earlier
    rounds (same guard as transitive dedup clustering, operators/dedup.py).
    Pass a dict as ``stats`` to receive ``{"rounds": r}`` — the number of
    driver-coordinated rounds actually used (the jobs-per-merge figure
    the bench records).
    Ties break (n desc, lhs asc, rhs asc) — engine- and
    partitioning-stable.

    Batched rounds are EXACTLY equivalent to one-merge-per-round Sennrich
    training (asserted in tests/test_train_ops.py), by this argument: the
    candidates are scanned in global rank order and accepted greedily
    while pairwise symbol-disjoint (sharing neither lhs, rhs, nor the
    merged string of any earlier accepted merge). A pair disjoint from
    all accepted merges has an INVARIANT count under them (its symbol
    slots cannot overlap theirs), while any pair whose count can change —
    including brand-new pairs involving a merged symbol — shares a symbol
    with some accepted merge, and every occurrence of such a new pair is
    produced from an occurrence of a sharing pair, so its count is
    bounded by the first sharing candidate's count ``stop_n``. Truncating
    the accepted list to merges with count STRICTLY above ``stop_n``
    (ties could flip the sequential argmax via lexicographic tie-break)
    therefore reproduces the sequential merge sequence and its recorded
    counts; when even the top candidate doesn't clear the bound the round
    degrades to a single merge, which is trivially sequential. Driver
    round-trips drop from O(n_merges) to ~O(n_merges / batch_merges): a
    30k-merge tokenizer run goes from ~60k driver-coordinated jobs to
    ~2-4k (VERDICT r3 ask #3).
    """
    vocab = segment_words(word_frequencies(df, text_col)).transform(barrier_eager)
    merges: list[tuple[int, str, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        m = min(batch_merges, n_merges - len(merges))
        fetch = max(4 * m + 1, 16)
        top = (
            symbol_pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("lhs"), F.col("rhs"))
            .limit(fetch)
            .collect()
        )
        if not top:  # every word fully merged to a single symbol
            break
        accepted: list[tuple[str, str, int]] = []
        touched: set[str] = set()
        stop_n = None  # count of the first candidate sharing a symbol
        for r in top:
            lhs, rhs, n = r["lhs"], r["rhs"], r["n"]
            if lhs in touched or rhs in touched or (lhs + rhs) in touched:
                stop_n = n
                break
            if len(accepted) < m:
                accepted.append((lhs, rhs, n))
                touched.update((lhs, rhs, lhs + rhs))
            # disjoint candidates beyond m don't bound anything; keep
            # scanning for the first SHARING candidate, which does
        if stop_n is None and len(top) == fetch:
            # sharing pairs may hide below the fetch horizon; every one of
            # them ranks at or below the last fetched row
            stop_n = top[-1]["n"]
        if stop_n is not None:
            safe = [t for t in accepted if t[2] > stop_n]
            # n is sorted desc, so the strict filter keeps a prefix
            accepted = safe if safe else accepted[:1]
        seg = F.col("seg")
        for lhs, rhs, n in accepted:
            merges.append((len(merges) + 1, lhs, rhs, lhs + rhs, n))
            seg = F.replace(
                seg, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
            )
        vocab = vocab.withColumn("seg", seg).transform(barrier_eager)
    if stats is not None:
        stats["rounds"] = rounds
    return merges, vocab


def train_bpe_from_word_counts(
    word_freq: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    max_rows: int = 2_000_000,
    min_freq: int = 1,
) -> list[tuple[int, str, str, str, int]]:
    """Exact BPE training from the (word, freq) table with the merge loop
    on the DRIVER — the industry-standard hybrid (HuggingFace tokenizers,
    SentencePiece train exactly this way): the corpus is touched once, by
    the distributed ``word_frequencies`` aggregation, and every later step
    operates on the vocabulary, which is model-sized state just like a
    CountVectorizer vocabulary (Spark MLlib itself collects that to the
    driver) or k-means centroids.

    Why this exists alongside ``train_bpe``: the distributed batched loop
    is SEQUENTIALLY EXACT but its batch acceptance must be conservative —
    a candidate sharing a symbol with an accepted merge can gain/lose
    count when that merge applies, so only candidates counted STRICTLY
    above the best conflicting one may ride the same round. Measured on
    the sf0.01 trigram corpus (16k-word vocab), top candidates chain-share
    symbols so pervasively that 1,000 merges needed 853 driver rounds
    (batch_merges=64) — ~0.85 rounds/merge, not the n/64 best case. The
    driver loop replaces O(n_merges) scheduler round-trips with ONE
    collect bounded by ``max_rows`` (ValueError beyond it — fall back to
    ``train_bpe``); at 100 TB Heaps' law plus the standard ``min_freq``
    floor keeps the table well under the default 2M cap.

    Identical contract to ``train_bpe``: Sennrich left-to-right
    non-overlapping merge application, tie-break (n desc, lhs asc,
    rhs asc), same (rank, lhs, rhs, merged, n) rows — pytest asserts
    merge-for-merge equality with the distributed loop on tie-heavy
    fixtures (tests/test_train_ops.py).
    """
    import heapq

    wf = word_freq.select(
        F.col(word_col).alias("w"), F.col(freq_col).cast("long").alias("f")
    )
    if min_freq > 1:
        wf = wf.filter(F.col("f") >= min_freq)
    # guard and fetch in ONE action: limit(max_rows+1) returns the whole
    # table while it fits, and its length alone reveals an overflow — a
    # separate count() would run the corpus-sized aggregation twice
    rows = wf.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"word-count table exceeds max_rows={max_rows}; "
            "raise min_freq or use the distributed train_bpe loop"
        )
    words: list[list[str]] = [list(r["w"]) for r in rows]
    freqs: list[int] = [r["f"] for r in rows]

    def word_pairs(syms: list[str]) -> list[tuple[str, str]]:
        return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for p in word_pairs(syms):
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(idx)

    # max-heap with lazy invalidation: each merge pushes ONE fresh entry
    # per pair whose global count changed (deltas batched across all
    # affected words first); stale entries are skipped on pop by
    # re-checking counts[p]
    heap: list[tuple[int, str, str]] = [
        (-n, p[0], p[1]) for p, n in counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges and heap:
        neg_n, lhs, rhs = heapq.heappop(heap)
        if counts.get((lhs, rhs), 0) != -neg_n:
            continue  # stale entry
        best, n = (lhs, rhs), -neg_n
        merged = lhs + rhs
        merges.append((len(merges) + 1, lhs, rhs, merged, n))
        delta: dict[tuple[str, str], int] = {}
        for idx in where.get(best, ()):
            syms = words[idx]
            # the where-index is maintained lazily (see below): a listed
            # word may no longer contain the pair — detect cheaply and
            # skip before paying the rebuild
            contains = False
            for i in range(len(syms) - 1):
                if syms[i] == lhs and syms[i + 1] == rhs:
                    contains = True
                    break
            if not contains:
                continue
            f = freqs[idx]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # pair-count delta over the DIFFERING window only (r13): pairs
            # inside the common prefix/suffix are identical before and
            # after the merge and cancel exactly, so subtracting/adding
            # them was pure dict churn — extend one position past the
            # window on each side so the boundary pairs (prefix_end,
            # first_changed) are still accounted. Provably the same delta
            # as the full old-bag/new-bag difference; merge-for-merge
            # equality is pinned by tests/test_train_ops.py.
            lo, ln = len(syms), len(out)
            m = min(lo, ln)
            p0 = 0
            while p0 < m and syms[p0] == out[p0]:
                p0 += 1
            s0 = 0
            while s0 < m - p0 and syms[lo - 1 - s0] == out[ln - 1 - s0]:
                s0 += 1
            d: dict[tuple[str, str], int] = {}
            a = p0 - 1 if p0 else 0
            old_end = (lo - s0) if s0 else lo - 1
            new_end = (ln - s0) if s0 else ln - 1
            for j in range(a, old_end):
                p = (syms[j], syms[j + 1])
                d[p] = d.get(p, 0) - 1
            for j in range(a, new_end):
                p = (out[j], out[j + 1])
                d[p] = d.get(p, 0) + 1
            words[idx] = out
            for p, dd in d.items():
                if dd:
                    delta[p] = delta.get(p, 0) + dd * f
                    if dd > 0:
                        # net-new pair in this word → index it; negative
                        # deltas may still leave occurrences, so stale
                        # entries are tolerated instead of tracked (the
                        # contains-scan above makes them a cheap no-op)
                        where.setdefault(p, set()).add(idx)
        for p, d2 in delta.items():
            c = counts.get(p, 0) + d2
            if c <= 0:
                counts.pop(p, None)
            else:
                counts[p] = c
                heapq.heappush(heap, (-c, p[0], p[1]))
        counts.pop(best, None)
        where.pop(best, None)
    return merges


def bpe_segment(tokens: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a trained merge list to a token array → array of subword
    arrays. Pure expressions: each token is bracket-encoded once, then the
    merges replay in rank order as literal replaces (the exact encoder a
    trained BPE vocabulary defines)."""
    def encode(t: Column) -> Column:
        seg = F.regexp_replace(t, "(.)", " $1 ")
        for lhs, rhs in merges:
            seg = F.replace(
                seg, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
            )
        return F.split(F.trim(seg), "  ")

    return F.transform(tokens, encode)


def bpe_encode_kernel(
    df: DataFrame,
    merges: list[tuple[str, str]],
    tokens_col: str = "toks",
    out_col: str = "subwords",
) -> DataFrame:
    """Corpus encoding with a LARGE trained merge list as an Arrow
    ``mapInPandas`` kernel — the production-scale counterpart of
    :func:`bpe_segment`, whose expression form chains one literal
    ``replace`` per merge: fine at oracle-sized vocabularies, but a
    1,000-merge tokenizer would codegen a 1,000-deep replace chain
    (plan build and compile blow up long before data does). The kernel
    carries the merge RANKS as a plain dict and encodes each token with
    the standard min-rank loop (repeatedly merge the lowest-rank adjacent
    pair, all its occurrences left-to-right — exactly the order applying
    merges rank-by-rank produces, which is :func:`bpe_segment`'s replace
    semantics; pytest asserts token-for-token equality against the
    expression path).

    Per-batch memoization on DISTINCT tokens (Zipf: a handful of types
    dominate) keeps the Python cost per batch at
    O(distinct tokens × token length), and the merge table broadcast is
    pickled once per executor — the same shape as the minhash/simhash
    kernels (operators/dedup.py). Input: ``tokens_col`` =
    ``array<string>`` per row; output adds ``out_col`` =
    ``array<array<string>>`` (per-token subword lists).

    Precondition (validated): the merge list must be WELL-FORMED — every
    multi-character side of a merge must be the product of an EARLIER
    merge, which every trained list satisfies by construction. The
    min-rank loop and rank-by-rank replacement are provably equal only
    then; a hand-edited list where a lower rank consumes a symbol that
    only a higher rank creates would silently diverge between the two
    paths, so it raises instead.
    """
    produced: set[str] = set()
    for r, (lhs, rhs) in enumerate(merges):
        for side in (lhs, rhs):
            if len(side) > 1 and side not in produced:
                raise ValueError(
                    f"malformed merge list: rank {r} consumes {side!r}, "
                    "which no earlier merge produces — not a trained "
                    "(rank-ordered) BPE merge list"
                )
        produced.add(lhs + rhs)
    rank = {pair: r for r, pair in enumerate(merges)}

    def encode_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w)
        while len(syms) > 1:
            best_r, best_p = None, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_r, best_p = r, (syms[i], syms[i + 1])
            if best_p is None:
                break
            lhs, rhs = best_p
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[w] = syms
        return syms

    def kernel(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            pdf[out_col] = pdf[tokens_col].map(
                lambda toks: [encode_word(t, cache) for t in toks]
            )
            yield pdf

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        kernel, schema=f"{in_schema}, {out_col} array<array<string>>"
    )


def wordpiece_scores(segmented: DataFrame, freq_col: str = "freq") -> DataFrame:
    """WordPiece merge scoring over the current segmentation (Schuster &
    Nakajima 2012; the likelihood-gain rule HuggingFace's WordPiece trainer
    uses): rank candidate merges by

        score(a, b) = count(ab) / (count(a) · count(b))

    instead of BPE's raw pair count — merging the pair that maximizes the
    unigram-LM likelihood gain rather than the most frequent one, which
    systematically prefers gluing RARE-but-always-together symbols over
    frequent-by-chance neighbors. Emitted as ``score_ln`` = ln n_pair −
    ln n_lhs − ln n_rhs (monotone in the ratio; 6-dp-rounded so the
    ranking key is ulp-stable across engines).

    Scale shape: identical to BPE's — pair counts AND freq-weighted
    unigram symbol counts are two vocab-sized aggregations over the
    segmented frame; the two score joins are symbol-keyed, vocab-sized on
    both sides (no hint, AQE owns the strategy). The corpus is never
    touched (it was reduced to (word, freq) once, upstream).

    Returns (lhs, rhs, n, n_lhs, n_rhs, score_ln).
    """
    pairs = symbol_pair_counts(segmented, freq_col)
    syms = (
        segmented.select(
            F.explode(_symbols(F.col("seg"))).alias("sym"), F.col(freq_col)
        )
        .groupBy("sym")
        .agg(F.sum(freq_col).alias("n_sym"))
    )
    lhs_n = syms.select(F.col("sym").alias("lhs"), F.col("n_sym").alias("n_lhs"))
    rhs_n = syms.select(F.col("sym").alias("rhs"), F.col("n_sym").alias("n_rhs"))
    return (
        pairs.join(lhs_n, "lhs")
        .join(rhs_n, "rhs")
        .select(
            "lhs",
            "rhs",
            "n",
            "n_lhs",
            "n_rhs",
            F.round(
                F.log(F.col("n").cast("double"))
                - F.log(F.col("n_lhs").cast("double"))
                - F.log(F.col("n_rhs").cast("double")),
                6,
            ).alias("score_ln"),
        )
    )
