"""Affinity queries: market-basket co-occurrence and sparse TF-IDF cosine
document similarity (operators/affinity.py), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators import affinity
from sentiment_analysis_bigdata_spark.sources import load_table

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)


# --- market-basket co-occurrence -------------------------------------------------

def q_co_purchase_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Part pairs ordered together in ≥ 3 orders. The self-join is keyed
    on the order (basket) — per-order fan-out is (lines choose 2), bounded
    by TPC-H's ≤ 7 lines/order; the max_basket guard stays available for
    pathological baskets."""
    li = load_table(spark, sf, "lineitem")
    return affinity.co_occurrence_pairs(
        li, "l_orderkey", "l_partkey", min_support=3
    )


SQL_CO_PURCHASE_PAIRS = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem)
SELECT a.item AS item_a, c.item AS item_b, count(*) AS support
FROM b a JOIN b c ON a.basket = c.basket
WHERE a.item < c.item
GROUP BY 1, 2
HAVING count(*) >= 3
"""


# --- sparse TF-IDF cosine pairs --------------------------------------------------

def q_sparse_cosine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Document pairs with TF-IDF cosine ≥ 0.3 via the inverted-index
    join (term-keyed, df ≤ 100 hot-term cap). Exact given the cap; the
    lexical complement to embedding ANN."""
    docs = load_table(spark, sf, "documents")
    pairs = affinity.sparse_cosine_pairs(
        docs, threshold=0.3, max_df=100
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("cosine", 6).alias("cosine")
    )


SQL_SPARSE_COSINE_PAIRS = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_SQL_TOKS}) AS term
  FROM documents
),
tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 100),
w AS (
  SELECT term, doc, tf * ln((n + 1.0) / (df + 1.0)) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
nrm AS (SELECT doc, sqrt(sum(w * w)) AS nv FROM w GROUP BY 1),
p AS (SELECT term, doc, w / nv AS weight FROM w JOIN nrm USING (doc) WHERE nv > 0)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       round(sum(a.weight * b.weight), 6) AS cosine
FROM p a JOIN p b ON a.term = b.term AND a.doc < b.doc
GROUP BY 1, 2
HAVING sum(a.weight * b.weight) >= 0.3
"""


# --- association rules (confidence / lift) --------------------------------------

def q_association_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Directed part-pair association rules over TPC-H orders: rules with
    pair support ≥ 2 and confidence ≥ 0.1 — "customers who ordered part A
    also ordered part B". Pair generation is the basket-keyed self-join;
    supports and totals are item-/1-row-sized sides."""
    li = load_table(spark, sf, "lineitem")
    return affinity.association_rules(
        li, "l_orderkey", "l_partkey", min_support=2, min_confidence=0.1
    )


SQL_ASSOCIATION_RULES = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
pairs AS (
  SELECT a.item AS item_a, c.item AS item_b, count(*) AS support
  FROM b a JOIN b c ON a.basket = c.basket
  WHERE a.item < c.item
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, support FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, support FROM pairs
),
sup AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT basket) AS DOUBLE) AS n_baskets FROM b)
SELECT d.antecedent, d.consequent, d.support,
       round(d.support / sa.n_item, 6) AS confidence,
       round((d.support / sa.n_item) / (sc.n_item / t.n_baskets), 6) AS lift
FROM directed d
JOIN sup sa ON sa.item = d.antecedent
JOIN sup sc ON sc.item = d.consequent
CROSS JOIN tot t
WHERE d.support / sa.n_item >= 0.1
"""


# --- BM25 retrieval ---------------------------------------------------------------

def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-10 per query (operators/affinity.py bm25_scores):
    queries are the distinct first-5 tokens of the three smallest doc_ids
    (deterministic on both engines), candidates come only from the query
    terms' postings — index-pruned, never a per-query corpus scan."""
    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty

    docs = load_table(spark, sf, "documents")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.slice(tokenize_nonempty(F.col("text")), 1, 5).alias("terms"),
    )
    out = affinity.bm25_scores(docs, queries, top_k=10)
    return out.select(
        "query_id",
        "doc",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


SQL_BM25_SEARCH = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tf AS (
  SELECT doc_id AS doc, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(l) AS term FROM toks)
  GROUP BY 1, 2
),
dl AS (SELECT doc, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(l[1:5])) AS term
  FROM toks WHERE doc_id < 3
),
scored AS (
  SELECT q.query_id, tf.doc,
         sum(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc ASC) AS rank
  FROM scored
)
SELECT query_id, doc, round(score, 6) AS score, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
"""


def q_hybrid_rrf_search(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by reciprocal rank fusion
    (Cormack et al. 2009, the k=60 RRF recipe production RAG stacks
    default to): BM25 ranks from the token postings and exact-cosine
    ranks from the document embeddings (``documents.doc_id`` and
    ``embeddings.vec_id`` are 1:1 in the testdata) are full-outer-joined
    per (query, doc) and scored ``1/(60+r_lex) + 1/(60+r_sem)``; a lane
    that missed a doc contributes 0, which is RRF's whole point — no
    score calibration across heterogeneous retrievers, ranks only.

    Queries = the three smallest doc_ids (BM25 uses their first-5
    tokens, cosine their own embedding); self-matches drop AFTER ranking
    in both lanes, identically replayed in the oracle. Both rank lanes
    reuse pipelines that are independently oracle-proven (``bm25_search``,
    ``ann_bruteforce``), so the fusion itself adds one (query, doc)-keyed
    full-outer join over ≤ 2·DEPTH rows per query and a per-query top-k
    window — nothing here grows faster than the lanes themselves at
    100 TB (the brute-force cosine lane swaps for the IVF/PQ lanes at
    scale; RRF only consumes ranks, so the fusion is retriever-agnostic)."""
    from pyspark.sql import Window

    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty
    from sentiment_analysis_bigdata_spark.operators import similarity as SIM

    depth, k_rrf, final_k, n_q = 50, 60, 10, 3
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    queries = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id"),
        F.slice(tokenize_nonempty(F.col("text")), 1, 5).alias("terms"),
    )
    lex = (
        affinity.bm25_scores(docs, queries, top_k=depth)
        .filter(F.col("doc") != F.col("query_id"))
        .select("query_id", "doc", F.col("rank").alias("r_lex"))
    )
    qf = (
        emb.filter(F.col("vec_id") < n_q)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .limit(n_q)  # no-op; makes the broadcast side's boundedness plan-visible
    )
    sem = SIM.brute_force_topk(emb, qf, k=depth).select(
        "query_id", F.col("vec_id").alias("doc"), F.col("rank").alias("r_sem")
    )
    fused = lex.join(sem, ["query_id", "doc"], "full_outer").select(
        "query_id",
        "doc",
        (
            F.coalesce(F.lit(1.0) / (k_rrf + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (k_rrf + F.col("r_sem")), F.lit(0.0))
        ).alias("rrf_raw"),
        "r_lex",
        "r_sem",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_raw").desc(), F.col("doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= final_k)
        .select(
            "query_id",
            "doc",
            F.round("rrf_raw", 6).alias("rrf_score"),
            F.col("r_lex").cast("int").alias("r_lex"),
            F.col("r_sem").cast("int").alias("r_sem"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _sql_hybrid_rrf() -> str:
    from sentiment_analysis_bigdata_spark.workloads.dedup_sim import _sql_cosine

    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tf AS (
  SELECT doc_id AS doc, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(l) AS term FROM toks)
  GROUP BY 1, 2
),
dl AS (SELECT doc, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(l[1:5])) AS term
  FROM toks WHERE doc_id < 3
),
lex_scored AS (
  SELECT q.query_id, tf.doc,
         sum(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc ASC) AS r_lex
  FROM lex_scored
),
lexk AS (SELECT * FROM lex WHERE r_lex <= 50 AND doc <> query_id),
eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
sem_scored AS (
  SELECT eq.query_id, e.vec_id AS doc, {_sql_cosine('e.embedding', 'eq.qv')} AS cos
  FROM embeddings e CROSS JOIN eq
  WHERE e.vec_id <> eq.query_id
),
sem AS (
  SELECT query_id, doc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc ASC) AS r_sem
  FROM sem_scored
),
semk AS (SELECT * FROM sem WHERE r_sem <= 50),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc, s.doc) AS doc,
         COALESCE(1.0 / (60 + l.r_lex), 0) + COALESCE(1.0 / (60 + s.r_sem), 0) AS rrf_raw,
         l.r_lex, s.r_sem
  FROM lexk l FULL OUTER JOIN semk s
    ON l.query_id = s.query_id AND l.doc = s.doc
),
ranked AS (
  SELECT query_id, doc, rrf_raw, r_lex, r_sem,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_raw DESC, doc ASC) AS rank
  FROM fused
)
SELECT query_id, doc, round(rrf_raw, 6) AS rrf_score,
       CAST(r_lex AS INTEGER) AS r_lex, CAST(r_sem AS INTEGER) AS r_sem,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
"""


_RBO_P, _RBO_D = 0.9, 10
# truncated-RBO depth weights: a doc first present in both prefixes at
# depth m contributes w(m) = sum_{i=m}^{d} p^(i-1)/i. Computed once in
# Python and formatted into BOTH engines' literals, so every weight is
# the identical double.
_RBO_W = [
    sum(_RBO_P ** (i - 1) / i for i in range(m, _RBO_D + 1))
    for m in range(1, _RBO_D + 1)
]


def q_rbo_rankings(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between a query's BM25
    top-10 and the SAME query truncated to its first 3 terms — the
    ranking-robustness diagnostic (high RBO = the head terms carry the
    ranking and the long tail of the query is redundant; low RBO = every
    term matters and query rewriting is risky). Truncated RBO@10 with
    p = 0.9, computed WITHOUT per-depth prefix loops: a doc ranked
    ra/rb in the two rankings enters both prefixes at m = max(ra, rb),
    so its total contribution is the precomputed weight w(m) — one join
    of the two 10-row-per-query lanes, one literal-array lookup, one
    per-query sum (the weights are Python-computed once and formatted
    into BOTH engines' literals as identical doubles). Lanes reuse the
    independently-oracle-proven BM25 pipeline."""
    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty

    n_q = 3
    docs = load_table(spark, sf, "documents")
    base_q = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id"),
        tokenize_nonempty(F.col("text")).alias("toks"),
    )
    full_q = base_q.select("query_id", F.slice("toks", 1, 5).alias("terms"))
    trunc_q = base_q.select("query_id", F.slice("toks", 1, 3).alias("terms"))
    lane_a = (
        affinity.bm25_scores(docs, full_q, top_k=_RBO_D)
        .filter(F.col("doc") != F.col("query_id"))
        .select("query_id", "doc", F.col("rank").alias("r_full"))
    )
    lane_b = (
        affinity.bm25_scores(docs, trunc_q, top_k=_RBO_D)
        .filter(F.col("doc") != F.col("query_id"))
        .select("query_id", "doc", F.col("rank").alias("r_trunc"))
    )
    w_arr = F.array(*[F.lit(w) for w in _RBO_W])
    common = lane_a.join(lane_b, ["query_id", "doc"]).select(
        "query_id",
        F.element_at(
            w_arr, F.greatest(F.col("r_full"), F.col("r_trunc")).cast("int")
        ).alias("w"),
    )
    agg = common.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.round((1.0 - _RBO_P) * F.sum("w"), 6).alias("rbo"),
    )
    base = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id")
    )
    return (
        base.join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
        )
        .orderBy("query_id")
    )


def _sql_rbo() -> str:
    w_list = ", ".join(f"({m}, {w!r})" for m, w in enumerate(_RBO_W, start=1))
    lane = """
  SELECT q.query_id, tf.doc,
         sum(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM {Q} q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc = tf.doc
  CROSS JOIN stats s
  GROUP BY 1, 2
"""
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
tf AS (
  SELECT doc_id AS doc, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(l) AS term FROM toks)
  GROUP BY 1, 2
),
dl AS (SELECT doc, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qfull AS (
  SELECT doc_id AS query_id, unnest(list_distinct(l[1:5])) AS term
  FROM toks WHERE doc_id < 3
),
qtrunc AS (
  SELECT doc_id AS query_id, unnest(list_distinct(l[1:3])) AS term
  FROM toks WHERE doc_id < 3
),
full_scored AS ({lane.replace('{Q}', 'qfull')}),
trunc_scored AS ({lane.replace('{Q}', 'qtrunc')}),
lane_a AS (
  SELECT query_id, doc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc ASC) AS r_full
  FROM full_scored
),
lane_b AS (
  SELECT query_id, doc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc ASC) AS r_trunc
  FROM trunc_scored
),
ak AS (SELECT * FROM lane_a WHERE r_full <= {_RBO_D} AND doc <> query_id),
bk AS (SELECT * FROM lane_b WHERE r_trunc <= {_RBO_D} AND doc <> query_id),
wts AS (SELECT * FROM (VALUES {w_list}) AS t(m, w)),
common AS (
  SELECT a.query_id, w.w
  FROM ak a JOIN bk b ON a.query_id = b.query_id AND a.doc = b.doc
  JOIN wts w ON w.m = greatest(a.r_full, b.r_trunc)
),
agg AS (
  SELECT query_id, count(*) AS n_common,
         round((1.0 - {_RBO_P}) * sum(w), 6) AS rbo
  FROM common GROUP BY 1
)
SELECT d.doc_id AS query_id,
       CAST(coalesce(a.n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(a.rbo, 0.0) AS DOUBLE) AS rbo
FROM (SELECT doc_id FROM documents WHERE doc_id < 3) d
LEFT JOIN agg a ON a.query_id = d.doc_id
ORDER BY 1
"""


def q_frequent_triples(spark: SparkSession, sf: str) -> DataFrame:
    """Frequent 3-itemsets by the Apriori candidate-join step (Agrawal &
    Srikant 1994): triples come ONLY from extending frequent pairs that
    share their first item — (a,b) ⋈ (a,c) with b < c — then one
    basket-grained recount verifies true support ≥ 2. The classic
    anti-monotonicity prune: candidate volume is bounded by the frequent
    -pair table, never by items³, and baskets (TPC-H orders, ≤ 7 lines)
    bound the per-basket recount fan-out. The step that takes
    market-basket mining past ``co_purchase_pairs``/``association_rules``
    pair rules."""
    li = load_table(spark, sf, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    pairs = (
        baskets.alias("x")
        .join(baskets.alias("y"), F.col("x.basket") == F.col("y.basket"))
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    cand = (
        pairs.alias("p")
        .join(pairs.alias("q"), F.col("p.a") == F.col("q.a"))
        .filter(F.col("p.b") < F.col("q.b"))
        .select(
            F.col("p.a").alias("a"), F.col("p.b").alias("b"), F.col("q.b").alias("c")
        )
    )
    counted = (
        cand.join(baskets.alias("ba"), F.col("a") == F.col("ba.item"))
        .join(
            baskets.alias("bb"),
            (F.col("b") == F.col("bb.item"))
            & (F.col("ba.basket") == F.col("bb.basket")),
        )
        .join(
            baskets.alias("bc"),
            (F.col("c") == F.col("bc.item"))
            & (F.col("ba.basket") == F.col("bc.basket")),
        )
        .groupBy("a", "b", "c")
        .agg(F.countDistinct("ba.basket").alias("support"))
        .filter(F.col("support") >= 2)
    )
    return counted.orderBy("a", "b", "c")


SQL_FREQUENT_TRIPLES = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
pairs AS (
  SELECT x.item AS a, y.item AS bb, count(*) AS support
  FROM b x JOIN b y ON x.basket = y.basket
  WHERE x.item < y.item
  GROUP BY 1, 2 HAVING count(*) >= 2
),
cand AS (
  SELECT p.a, p.bb AS b2, q.bb AS c2
  FROM pairs p JOIN pairs q ON p.a = q.a
  WHERE p.bb < q.bb
)
SELECT cand.a, cand.b2 AS b, cand.c2 AS c,
       count(DISTINCT ba.basket) AS support
FROM cand
JOIN b ba ON cand.a = ba.item
JOIN b bbj ON cand.b2 = bbj.item AND ba.basket = bbj.basket
JOIN b bcj ON cand.c2 = bcj.item AND ba.basket = bcj.basket
GROUP BY 1, 2, 3
HAVING count(DISTINCT ba.basket) >= 2
ORDER BY 1, 2, 3
"""


def q_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Positional phrase search — the capability bag-of-words retrieval
    (BM25/TF-IDF) cannot express: match documents where two terms occur
    ADJACENTLY in order, via a positional postings join (posting_a.pos
    + 1 = posting_b.pos), the classic positional-inverted-index shape.
    Queries are the corpus's top-5 bigrams by document frequency (so
    the fixture always has matches); per phrase the report contrasts
    docs matching the exact phrase vs docs merely containing both terms
    — the gap is what positional indexing buys. Postings are one
    posexplode; the phrase join is term-keyed and position-filtered,
    never a text rescan per query."""
    from pyspark.sql.window import Window

    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_lazy

    # barrier the tokenized corpus and the postings ONCE (r12): the
    # postings frame is consumed under four different join keys (term /
    # term+doc+pos / two distincts) plus the bigram query derivation —
    # exchange reuse cannot span differently-keyed consumers, so the
    # tokenize+posexplode corpus pass used to run ~5x per query (first
    # run 14.3 s → 3.5 s at sf0.1). Materializing postings is exactly
    # what building a positional inverted index means in production.
    docs = _docs_phrase(spark, sf).transform(barrier_lazy)
    post = docs.select(
        "doc_id", F.posexplode(F.col("toks")).alias("pos", "term")
    ).transform(barrier_lazy)
    # top-5 bigrams by df = the deterministic query set. The size guard
    # matters beyond semantics: sequence(1, size-1) counts DOWN when
    # size < 2 (sequence(1, 0) = [1, 0]), and the resulting toks[-1] /
    # toks[size] subscripts ERROR under ANSI — a 1-token doc would crash
    # the query (docs with < 2 tokens contribute no bigrams either way).
    big = (
        docs.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS t1, toks[i] AS t2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.t1", "bg.t2")
        .distinct()
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.orderBy(F.col("df").desc(), F.col("t1").asc(), F.col("t2").asc())
    queries = big.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    phrase_hits = (
        queries.join(post.alias("a"), F.col("t1") == F.col("a.term"))
        .join(
            post.alias("b"),
            (F.col("t2") == F.col("b.term"))
            & (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.pos") + 1 == F.col("b.pos")),
        )
        .groupBy("t1", "t2")
        .agg(F.countDistinct("a.doc_id").alias("n_phrase_docs"))
    )
    both_hits = (
        queries.join(
            post.select("doc_id", "term").distinct().alias("a"),
            F.col("t1") == F.col("a.term"),
        )
        .join(
            post.select("doc_id", "term").distinct().alias("b"),
            (F.col("t2") == F.col("b.term"))
            & (F.col("a.doc_id") == F.col("b.doc_id")),
        )
        .groupBy("t1", "t2")
        .agg(F.countDistinct("a.doc_id").alias("n_both_docs"))
    )
    return (
        queries.join(phrase_hits, ["t1", "t2"], "left")
        .join(both_hits, ["t1", "t2"], "left")
        .select(
            F.concat_ws(" ", "t1", "t2").alias("phrase"),
            "df",
            F.coalesce("n_phrase_docs", F.lit(0)).alias("n_phrase_docs"),
            F.coalesce("n_both_docs", F.lit(0)).alias("n_both_docs"),
        )
        .orderBy("phrase")
    )


def _docs_phrase(spark: SparkSession, sf: str):
    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty

    return load_table(spark, sf, "documents").select(
        "doc_id", tokenize_nonempty(F.col("text")).alias("toks")
    )


SQL_PHRASE_SEARCH = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS l FROM documents),
post AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS term
  FROM toks, unnest(range(1, len(l) + 1)) AS r(i)
),
big AS (
  SELECT t1, t2, count(*) AS df FROM (
    SELECT DISTINCT doc_id, l[i] AS t1, l[i + 1] AS t2
    FROM toks, unnest(range(1, len(l))) AS r(i)
  ) GROUP BY 1, 2
),
queries AS (
  SELECT t1, t2, df FROM (
    SELECT t1, t2, df,
           row_number() OVER (ORDER BY df DESC, t1 ASC, t2 ASC) AS rk
    FROM big
  ) WHERE rk <= 5
),
phrase_hits AS (
  SELECT q.t1, q.t2, count(DISTINCT a.doc_id) AS n_phrase_docs
  FROM queries q
  JOIN post a ON a.term = q.t1
  JOIN post b ON b.term = q.t2 AND b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
dterms AS (SELECT DISTINCT doc_id, term FROM post),
both_hits AS (
  SELECT q.t1, q.t2, count(DISTINCT a.doc_id) AS n_both_docs
  FROM queries q
  JOIN dterms a ON a.term = q.t1
  JOIN dterms b ON b.term = q.t2 AND b.doc_id = a.doc_id
  GROUP BY 1, 2
)
SELECT q.t1 || ' ' || q.t2 AS phrase, q.df,
       CAST(coalesce(p.n_phrase_docs, 0) AS BIGINT) AS n_phrase_docs,
       CAST(coalesce(b.n_both_docs, 0) AS BIGINT) AS n_both_docs
FROM queries q
LEFT JOIN phrase_hits p ON p.t1 = q.t1 AND p.t2 = q.t2
LEFT JOIN both_hits b ON b.t1 = q.t1 AND b.t2 = q.t2
ORDER BY phrase
"""


QUERIES = {
    "co_purchase_pairs": (q_co_purchase_pairs, SQL_CO_PURCHASE_PAIRS),
    "rbo_rankings": (q_rbo_rankings, _sql_rbo()),
    "frequent_triples": (q_frequent_triples, SQL_FREQUENT_TRIPLES),
    "phrase_search": (q_phrase_search, SQL_PHRASE_SEARCH),
    "bm25_search": (q_bm25_search, SQL_BM25_SEARCH),
    "hybrid_rrf_search": (q_hybrid_rrf_search, _sql_hybrid_rrf()),
    "sparse_cosine_pairs": (q_sparse_cosine_pairs, SQL_SPARSE_COSINE_PAIRS),
    "association_rules": (q_association_rules, SQL_ASSOCIATION_RULES),
}
