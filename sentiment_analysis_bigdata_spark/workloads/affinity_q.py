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


QUERIES = {
    "co_purchase_pairs": (q_co_purchase_pairs, SQL_CO_PURCHASE_PAIRS),
    "bm25_search": (q_bm25_search, SQL_BM25_SEARCH),
    "sparse_cosine_pairs": (q_sparse_cosine_pairs, SQL_SPARSE_COSINE_PAIRS),
    "association_rules": (q_association_rules, SQL_ASSOCIATION_RULES),
}
