"""Affinity analytics: item co-occurrence (market basket) and sparse
TF-IDF cosine similarity via an inverted-index join.

Both are "pairs within a bounded context" self-joins — the canonical way
to make pair generation tractable at 100 TB:

- co-occurrence joins a basket table to itself ON THE BASKET KEY, so the
  blow-up per basket is (items-per-basket choose 2), bounded by the
  ``max_basket`` guard — never corpus × corpus.
- sparse cosine joins the inverted index (term → posting list) to itself
  ON THE TERM, so the blow-up per term is (docs-per-term choose 2),
  bounded by the ``max_df`` hot-term cap (stopword-like terms carry no
  similarity signal anyway — dropping them is both the perf guard and a
  quality improvement, the standard trick from large-scale near-dup
  systems).

Everything is exact given the caps, order-independent, and runs as plain
joins + aggregations (AQE picks the strategies).

Reference parity: none (the reference has no pairwise surface); these are
north-star extensions alongside MinHash/SimHash (operators/dedup.py) —
sparse-cosine is the lexical complement to the dense embedding ANN
(operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty


def co_occurrence_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item pairs that appear in the same basket, with support counts.

    Distinct (basket, item) first (multiplicity inside one basket is not
    co-occurrence); optional ``max_basket`` drops pathological baskets
    whose pair blow-up would dominate the join (documented skew guard —
    the dropped baskets are boilerplate-like outliers). The guard anti
    joins against the OVERSIZED basket list (the outlier set — orders of
    magnitude smaller than the keep set) with no broadcast hint: the list
    size is data-dependent, so AQE owns the strategy."""
    b = baskets.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = b.groupBy("basket").agg(F.count(F.lit(1)).alias("__n"))
        oversize = sizes.filter(F.col("__n") > max_basket).select("basket")
        b = b.join(oversize, "basket", "left_anti")
    left = b.select("basket", F.col("item").alias("item_a"))
    right = b.select("basket", F.col("item").alias("item_b"))
    return (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def tfidf_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Inverted index with L2-normalized TF-IDF weights:
    (term, doc, weight) where Σ weight² = 1 per doc.

    idf = ln((N+1)/(df+1)) (the MLlib formula, operators/features.py);
    terms with document frequency above ``max_df`` are dropped BEFORE
    normalization (hot-term cap)."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokenize_nonempty(F.col(text_col))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.countDistinct(F.col(id_col)).alias("n"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    weighted = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "w", F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1))
        )
    )
    norm = Window.partitionBy("doc")
    return (
        weighted.withColumn(
            "weight", F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(norm))
        )
        .filter(F.col("weight").isNotNull())
        .select("term", "doc", "weight")
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """Document pairs with TF-IDF cosine ≥ threshold, exact given the
    ``max_df`` cap: postings self-join on term (bounded per-term fan-out),
    partial products aggregate per pair — one shuffle keyed (doc_a,
    doc_b). The lexical near-dup complement to embedding ANN."""
    p = tfidf_postings(docs, id_col, text_col, max_df=max_df)
    a = p.select("term", F.col("doc").alias("doc_a"), F.col("weight").alias("wa"))
    b = p.select("term", F.col("doc").alias("doc_b"), F.col("weight").alias("wb"))
    return (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def collocation_pmi(
    docs: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-bigram collocations ranked by pointwise mutual information.

    PMI(a, b) = ln( P(a,b) / (P(a) P(b)) ) with P(a,b) = n_ab / B (B =
    total adjacent bigrams) and P(a) = n_a / N (N = total tokens) — the
    classic collocation-mining statistic (Church & Hanks 1990): high-PMI
    pairs co-occur far more than their unigram frequencies predict
    ("boilerplate phrase" vs "two common words next to each other"), which
    is the signal a training-data pipeline uses to spot templated text.

    Scale shape: two vocab-sized aggregations (unigrams, bigrams), the
    ``min_count`` prune applied to the bigram side BEFORE either join (the
    long tail of hapax bigrams — the overwhelming majority — never reaches
    a join), then two term-keyed equi joins against the unigram counts
    (vocab-sized, no hint — AQE owns the strategy) and one 1-row totals
    cross join (auto-broadcast). N and B come from a single narrow agg
    over token-array lengths — no second pass over exploded rows. No
    all-pairs anything; the only fan-out is the explode, linear in corpus
    token count.

    Output: (bigram, n_pair, pmi) — pmi pre-rounded to 6 dp so the
    ordering key is identical across engines (ulp-stable vs the DuckDB
    oracle).
    """
    toks = docs.select(F.col(tokens_col).alias("l"))
    totals = toks.agg(
        F.sum(F.size("l")).cast("double").alias("n_tok"),
        F.sum(F.greatest(F.size("l") - F.lit(1), F.lit(0)))
        .cast("double")
        .alias("n_big"),
    )
    uni = (
        toks.select(F.explode("l").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from sentiment_analysis_bigdata_spark.functions.text import ngrams

    big = (
        docs.select(F.explode(ngrams(F.col(tokens_col), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .withColumn("parts", F.split("bigram", " "))
        .withColumn("term_a", F.col("parts").getItem(0))
        .withColumn("term_b", F.col("parts").getItem(1))
    )
    ua = uni.select(F.col("token").alias("term_a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("token").alias("term_b"), F.col("n").alias("n_b"))
    return (
        big.join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(totals)
        .select(
            "bigram",
            "n_pair",
            F.round(
                F.log(F.col("n_pair").cast("double"))
                - F.log("n_big")
                - F.log(F.col("n_a").cast("double"))
                - F.log(F.col("n_b").cast("double"))
                + F.lit(2.0) * F.log("n_tok"),
                6,
            ).alias("pmi"),
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    min_confidence: float = 0.0,
    max_basket: int | None = None,
) -> DataFrame:
    """Directed association rules a → b with support, confidence and lift.

    confidence(a → b) = support(a, b) / support(a)
    lift(a → b)       = confidence(a → b) / (support(b) / N)

    with N = number of distinct baskets — the Agrawal-style rule mining
    step a recommender / basket analysis runs on top of the co-occurrence
    pairs. Both rule directions are emitted (confidence is asymmetric;
    lift is shared).

    Scale shape: pair generation reuses :func:`co_occurrence_pairs`
    (basket-keyed self-join, ``max_basket`` skew guard — never corpus ×
    corpus). Item supports are an item-cardinality aggregate, joined to
    the pair table on the item key (vocab-sized side, no hint — AQE owns
    the strategy); the basket total N is a 1-row aggregate cross-joined
    in (auto-broadcast). Nothing here rescans the basket table beyond the
    two distinct-pass aggregates.

    Output columns: (antecedent, consequent, support, confidence, lift) —
    ratios pre-rounded to 6 dp for cross-engine value stability.
    """
    pairs = co_occurrence_pairs(
        baskets, basket_col, item_col, min_support=min_support,
        max_basket=max_basket,
    )
    b = baskets.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    item_support = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    totals = b.agg(F.countDistinct("basket").cast("double").alias("n_baskets"))
    # both directions: (a → b) and (b → a)
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "support",
        )
    )
    ante = item_support.select(
        F.col("item").alias("antecedent"), F.col("n_item").alias("n_ante")
    )
    cons = item_support.select(
        F.col("item").alias("consequent"), F.col("n_item").alias("n_cons")
    )
    conf = F.col("support") / F.col("n_ante")
    return (
        directed.join(ante, "antecedent")
        .join(cons, "consequent")
        .crossJoin(totals)
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(conf, 6).alias("confidence"),
            F.round(conf / (F.col("n_cons") / F.col("n_baskets")), 6).alias("lift"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents per query over the corpus
    inverted index (Robertson & Walker 1994) — the lexical ranking
    complement to dense ANN (operators/similarity.py) and the scoring
    standard for hybrid retrieval / RAG candidate generation.

        score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                                 / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene form)

    Scale shape: one corpus pass builds (doc, term, tf) postings plus the
    per-doc length; df/N/avgdl are term-/1-row-sized aggregates. The
    query side EXPLODES to (query, term) rows and equi-joins the postings
    on the term key — candidate generation touches only postings of query
    terms (index-pruned, never a corpus scan per query), and the final
    per-query top-k is a window over the candidate union. Duplicate query
    terms count once (set semantics, the standard convention).

    Returns (query_id, doc, score, rank), rank 1..top_k, tie-broken
    (score desc, doc asc).
    """
    tf = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokenize_nonempty(F.col(text_col))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qt.join(tf, "term")
        .join(dfreq, "term")
        .join(doclen, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc", (idf * tf_part).alias("partial")
        )
        .groupBy("query_id", "doc")
        .agg(F.sum("partial").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc", "score", "rank")
    )
