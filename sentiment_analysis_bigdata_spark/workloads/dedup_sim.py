"""Dedup & similarity queries (north-star operators) with DuckDB oracles.

The md5-based hashing (functions.hashing) makes MinHash/SimHash signatures
bit-identical between Spark and DuckDB, so even the sketch operators are
value-checked — not just row-counted. Approximate operators (LSH top-k)
have oracles that replicate the *exact same bucketing*, so the oracle
validates the algorithm, not merely the output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import hashing as H
from sentiment_analysis_bigdata_spark.functions import text as TXT
from sentiment_analysis_bigdata_spark.operators import dedup as DD
from sentiment_analysis_bigdata_spark.operators import similarity as SIM
from sentiment_analysis_bigdata_spark.sources import ensure_min_parallelism, load_table
from sentiment_analysis_bigdata_spark.workloads.text_q import SQL_FP, SQL_TOKS

# 60-bit md5-prefix hash of a token, as a DuckDB expression
SQL_H60 = "CAST(('0x' || substr(md5({t}), 1, 15)) AS BIGINT)"
SQL_H31 = f"({SQL_H60} % 2147483648)"
P = H.MERSENNE_P


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings")


# --- MinHash signatures --------------------------------------------------------

N_MINHASH = 4


def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    sigs = DD.minhash_signatures(
        docs, TXT.tokenize_nonempty("text"), "doc_id", N_MINHASH
    )
    return sigs.select(
        "doc_id", *[F.col("sig")[i].alias(f"mh{i}") for i in range(N_MINHASH)]
    )


def _sql_minhash_cols() -> str:
    cols = []
    for i, (a, b, s) in enumerate(H.minhash_params(N_MINHASH)):
        a31 = a % (1 << 31)
        h31 = SQL_H31.format(t="t")
        cols.append(
            f"CASE WHEN len(toks) > 0 THEN "
            f"list_min(list_transform(toks, t -> ({a31} * xor({h31}, {s}) + {b}) % {P})) "
            f"ELSE {P} END AS mh{i}"
        )
    return ",\n       ".join(cols)


SQL_MINHASH_SIGNATURES = f"""
WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
       {_sql_minhash_cols()}
FROM base
"""


# --- SimHash ---------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return DD.simhash_signatures(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )


def _sql_simhash() -> str:
    h60 = SQL_H60.format(t="t")
    bits = []
    for j in range(H.MD5_PREFIX_HEX_CHARS * 4):
        votes = (
            f"list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {votes} > 0 THEN {1 << j} ELSE 0 END)")
    total = "\n         + ".join(bits)
    return f"""
WITH base AS (
  SELECT doc_id, list_transform({SQL_TOKS}, t -> {h60}) AS hs FROM documents
)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash
FROM base
"""


SQL_SIMHASH = _sql_simhash()


def q_simhash_weighted(spark: SparkSession, sf: str) -> DataFrame:
    return DD.simhash_signatures(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        ),
        weighted=True,
        out_col="simhash_w",
    )


def _sql_simhash_weighted() -> str:
    h60 = SQL_H60.format(t="t")
    bits = []
    for j in range(H.MD5_PREFIX_HEX_CHARS * 4):
        votes = (
            f"list_sum(list_transform(hw, x -> "
            f"CASE WHEN (x.h >> {j}) & 1 = 1 THEN x.w ELSE -x.w END))"
        )
        bits.append(f"(CASE WHEN {votes} > 0 THEN {1 << j} ELSE 0 END)")
    total = "\n         + ".join(bits)
    return f"""
WITH base AS (
  SELECT doc_id,
         list_transform({SQL_TOKS}, t -> {{'h': {h60}, 'w': len(t)}}) AS hw
  FROM documents
)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash_w
FROM base
"""


SQL_SIMHASH_WEIGHTED = _sql_simhash_weighted()


# --- n-gram Jaccard on adjacent-id candidate pairs --------------------------------

def q_ngram_jaccard_adjacent(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    ids = docs.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
        .join(ids.select(F.col("doc_id").alias("b")), "b", "left_semi")
    )
    out = DD.ngram_jaccard_pairs(docs, pairs, n=2)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


SQL_NGRAM_JACCARD_ADJACENT = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(l) >= 2
              THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])
              ELSE [] END) AS g
  FROM toks
)
SELECT ga.doc_id AS a, gb.doc_id AS b,
       round(CASE WHEN (len(ga.g) + len(gb.g)) > 0 THEN
         CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x))) AS DOUBLE)
         / (len(ga.g) + len(gb.g) - len(list_filter(ga.g, x -> list_contains(gb.g, x))))
       ELSE 0.0 END, 6) AS jaccard
FROM grams ga JOIN grams gb ON gb.doc_id = ga.doc_id + 1
"""


# --- blocked fuzzy (edit-distance) matching -----------------------------------------

def q_fuzzy_part_names(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution candidate pairs over DISTINCT part names:
    blocking key = the name's last word (the noun — near-variants of the
    same product share it), exact Levenshtein ≤ 4 within the block
    (operators/dedup.py fuzzy_pairs). Never all-pairs: the self-join is
    block-keyed."""
    part = load_table(spark, sf, "part")
    names = part.select("p_name").distinct()
    return DD.fuzzy_pairs(
        names,
        "p_name",
        F.element_at(F.split(F.col("p_name"), " "), -1),
        max_distance=4,
    )


SQL_FUZZY_PART_NAMES = """
WITH names AS (
  SELECT DISTINCT p_name AS name,
         list_extract(string_split(p_name, ' '), -1) AS block
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS distance
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 4
"""


# --- prefix-filtered exact Jaccard join ---------------------------------------------

PPJOIN_T = 0.6


def q_ppjoin_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT token-set Jaccard ≥ 0.6 pairs via PPJoin prefix filtering
    (operators/dedup.py prefix_filtered_jaccard_pairs): rarest-first
    vocabulary order, per-doc prefixes, prefix-postings equi join, exact
    integer verify — the exact-threshold complement to minhash_near_dups.
    The oracle replays ranking, prefixes, candidates, AND the verify."""
    docs = _docs(spark, sf)
    return DD.prefix_filtered_jaccard_pairs(docs, PPJOIN_T)


SQL_PPJOIN_PAIRS = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_distinct({SQL_TOKS})) AS token FROM documents
),
dfreq AS (SELECT token, count(*) AS df FROM toks GROUP BY 1),
rnk AS (
  SELECT token, CAST(row_number() OVER (ORDER BY df ASC, token ASC) AS INT) AS rank
  FROM dfreq
),
ranked AS (SELECT doc, rank FROM toks JOIN rnk USING (token)),
sets AS (SELECT doc, list_sort(list(rank)) AS ranks FROM ranked GROUP BY 1),
pre AS (
  SELECT doc, ranks,
         list_slice(ranks, 1,
                    len(ranks) - CAST(ceil(len(ranks) * CAST({PPJOIN_T} AS DOUBLE)) AS INT) + 1)
           AS prefix
  FROM sets
),
postings AS (SELECT doc, unnest(prefix) AS rank FROM pre),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM postings x JOIN postings y ON x.rank = y.rank AND x.doc < y.doc
),
verified AS (
  SELECT c.a, c.b,
         round(CAST(len(list_intersect(sa.ranks, sb.ranks)) AS DOUBLE)
               / (len(sa.ranks) + len(sb.ranks)
                  - len(list_intersect(sa.ranks, sb.ranks))), 6) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc = c.a
  JOIN sets sb ON sb.doc = c.b
)
SELECT a, b, jaccard FROM verified WHERE jaccard >= CAST({PPJOIN_T} AS DOUBLE)
"""


# --- embedding near-duplicates ------------------------------------------------------

# cosine with explicit, order-identical arithmetic on both engines
def _sql_cosine(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    na = f"sqrt(list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform(range(1, len({b}) + 1), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    return f"(CASE WHEN {na} * {nb} > 0 THEN {dot} / ({na} * {nb}) ELSE 0.0 END)"


def _sql_sign_bucket(col: str, n_bits: int = 8) -> str:
    terms = [
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << (n_bits - 1 - i)} ELSE 0 END)"
        for i in range(n_bits)
    ]
    return "(" + " + ".join(terms) + ")"


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # testdata embeddings are near-isotropic (max pairwise cosine ≈ 0.46),
    # so the query uses a 0.25 threshold to yield a non-trivial result set;
    # production near-dup would use ≥0.9
    out = DD.embedding_near_duplicates(_emb(spark, sf), threshold=0.25, n_bits=8)
    return out.select("a", "b", F.round("cosine", 6).alias("cosine"))


SQL_EMBEDDING_NEAR_DUP = f"""
WITH base AS (
  SELECT vec_id AS id, embedding AS v, {_sql_sign_bucket('embedding')} AS bucket
  FROM embeddings
)
SELECT l.id AS a, r.id AS b, round({_sql_cosine('l.v', 'r.v')}, 6) AS cosine
FROM base l JOIN base r ON l.bucket = r.bucket AND l.id < r.id
WHERE {_sql_cosine('l.v', 'r.v')} >= 0.25
"""


# --- connected components over the near-dup graph --------------------------------------

def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clustering: embedding near-dup pairs → iterative
    min-label propagation → (node, component). The oracle replays the same
    fixed-point with a DuckDB recursive CTE (component = min reachable id),
    so the clustering itself is value-checked, not just row-counted."""
    pairs = DD.embedding_near_duplicates(_emb(spark, sf), threshold=0.25, n_bits=8)
    return DD.connected_components(pairs)


def q_dedup_components_star(spark: SparkSession, sf: str) -> DataFrame:
    """Same transitive clustering, computed by alternating large-star /
    small-star contraction (O(log n) rounds — the 100 TB-correct algorithm
    for high-diameter graphs; min-label propagation needs O(diameter)).
    Shares dedup_components' recursive-CTE oracle: both must produce the
    identical (node, min-reachable-id) labeling."""
    pairs = DD.embedding_near_duplicates(_emb(spark, sf), threshold=0.25, n_bits=8)
    return DD.connected_components_star(pairs)


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE
pairs AS (
  SELECT l.id AS a, r.id AS b
  FROM (SELECT vec_id AS id, embedding AS v, {_sql_sign_bucket('embedding')} AS bucket
        FROM embeddings) l
  JOIN (SELECT vec_id AS id, embedding AS v, {_sql_sign_bucket('embedding')} AS bucket
        FROM embeddings) r
    ON l.bucket = r.bucket AND l.id < r.id
  WHERE {_sql_cosine('l.v', 'r.v')} >= 0.25
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node, min(r) AS component FROM reach GROUP BY node
"""


# --- similarity search: exact brute-force top-k ---------------------------------------

N_QUERIES = 5
TOP_K = 5


def _queries_frame(emb: DataFrame) -> DataFrame:
    # The id filter yields exactly N_QUERIES rows, so limit() is a no-op —
    # but it makes the boundedness of the broadcast-side PLAN-VISIBLE
    # (GlobalLimit), which is what tools/plan_audit.py polices.
    return (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .limit(N_QUERIES)
    )


def q_ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    out = SIM.brute_force_topk(emb, _queries_frame(emb), k=TOP_K)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), F.col("rank").cast("int").alias("rank")
    )


SQL_ANN_BRUTEFORCE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


# --- similarity search: LSH-bucketed approximate top-k ---------------------------------

def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    out = SIM.lsh_topk(emb, _queries_frame(emb), k=TOP_K, n_bits=8, multiprobe=True)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), F.col("rank").cast("int").alias("rank")
    )


SQL_ANN_LSH = f"""
WITH c AS (
  SELECT vec_id, embedding AS cv, {_sql_sign_bucket('embedding')} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, {_sql_sign_bucket('embedding')} AS qbucket
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
probes AS (
  SELECT query_id, qv,
         unnest([qbucket, {", ".join(f"xor(qbucket, {1 << i})" for i in range(8))}]) AS bucket
  FROM q
),
scored AS (
  SELECT p.query_id, c.vec_id, {_sql_cosine('c.cv', 'p.qv')} AS cos_raw
  FROM c JOIN probes p ON c.bucket = p.bucket
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the ACTUALLY-approximate ANN configuration as a
    value-checked number: LSH single-probe (multiprobe=False — each query
    scans only its own sign bucket — the true approximation, unlike the
    exhaustive configs that ann_lsh/ann_ivf use for exactness) against the
    exact brute-force top-k, both computed inside Spark, per-query hit
    count + recall aggregated distributively. The sign-bucket function has
    an exact SQL twin, so the oracle recomputes BOTH sides and the recall
    number itself is hash-checked — approximation quality is a hard
    per-round number, not a pytest-only claim. The IVF nprobe<nlist recall
    floor is asserted in tests/test_similarity.py."""
    emb = _emb(spark, sf)
    exact = SIM.brute_force_topk(emb, _queries_frame(emb), k=TOP_K)
    approx = SIM.lsh_topk(
        emb, _queries_frame(emb), k=TOP_K, n_bits=8, multiprobe=False
    )
    hits = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id").withColumn("hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(TOP_K), 6))
        .orderBy("query_id")
    )


SQL_ANN_RECALL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
exact_scored AS (
  SELECT q.query_id, e.vec_id, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM exact_scored
  ) WHERE rank <= {TOP_K}
),
c AS (
  SELECT vec_id, embedding AS cv, {_sql_sign_bucket('embedding')} AS bucket FROM embeddings
),
qb AS (
  SELECT vec_id AS query_id, embedding AS qv, {_sql_sign_bucket('embedding')} AS bucket
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
approx_scored AS (
  SELECT p.query_id, c.vec_id, {_sql_cosine('c.cv', 'p.qv')} AS cos_raw
  FROM c JOIN qb p ON c.bucket = p.bucket
  WHERE c.vec_id <> p.query_id
),
approx_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM approx_scored
  ) WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST(count(a.vec_id) AS INTEGER) AS n_hits,
       round(count(a.vec_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_topk e
LEFT JOIN approx_topk a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


MAT_DIM = 16


def q_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka truncation quality (Kusupati et al. 2022): recall@k of
    brute-force cosine retrieval using only the FIRST {MAT_DIM} of 64
    embedding dimensions against the full-dimension exact top-k — the
    measured cost of the 4x memory/compute cut that MRL-trained embedding
    stacks exploit for coarse candidate generation. Both sides run inside
    Spark with the broadcast-query/corpus-scan shape of ann_bruteforce;
    the oracle recomputes both rankings (full and sliced lists) so the
    recall number itself is value-checked. On the isotropic test fixture
    truncation recall is honestly low — the number is the point."""
    emb = _emb(spark, sf)
    exact = SIM.brute_force_topk(emb, _queries_frame(emb), k=TOP_K)
    trunc_emb = emb.select(
        "vec_id", F.slice("embedding", 1, MAT_DIM).alias("embedding")
    )
    approx = SIM.brute_force_topk(trunc_emb, _queries_frame(trunc_emb), k=TOP_K)
    hits = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id").withColumn("hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(TOP_K), 6))
        .orderBy("query_id")
    )


SQL_MATRYOSHKA_RECALL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
exact_scored AS (
  SELECT q.query_id, e.vec_id, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM exact_scored
  ) WHERE rank <= {TOP_K}
),
tq AS (
  SELECT vec_id AS query_id, embedding[1:{MAT_DIM}] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
tc AS (SELECT vec_id, embedding[1:{MAT_DIM}] AS cv FROM embeddings),
trunc_scored AS (
  SELECT tq.query_id, tc.vec_id, {_sql_cosine('tc.cv', 'tq.qv')} AS cos_raw
  FROM tc CROSS JOIN tq
  WHERE tc.vec_id <> tq.query_id
),
trunc_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM trunc_scored
  ) WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST(count(a.vec_id) AS INTEGER) AS n_hits,
       round(count(a.vec_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_topk e
LEFT JOIN trunc_topk a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# --- rows-only checked (non-SQL-reproducible) operators ---------------------------------

def q_minhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline, value-checked end-to-end: the
    oracle replays the identical 16-hash signatures, md5 band keys, bucket
    self-join, and exact-Jaccard verify in SQL."""
    out = DD.minhash_near_duplicates(
        _docs(spark, sf), threshold=0.5, num_hashes=16, bands=4
    )
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def _sql_minhash_near_dups(
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    docs_src: str = "documents",
    bucket_cap: int | None = None,
) -> str:
    """CTE chain ending in ``mpairs`` (a, b, jaccard) — wrap with
    ``WITH`` (or chain after other CTEs) and select from ``mpairs``.
    ``bucket_cap`` replays the operator's ``max_bucket`` degenerate-
    bucket guard (buckets with more members generate no candidates)."""
    r = num_hashes // bands
    h31 = SQL_H31.format(t="t")
    sig_cols = []
    for i, (a, b, s) in enumerate(H.minhash_params(num_hashes)):
        a31 = a % (1 << 31)
        sig_cols.append(
            f"CASE WHEN len(toks) > 0 THEN "
            f"list_min(list_transform(toks, t -> ({a31} * xor({h31}, {s}) + {b}) % {P})) "
            f"ELSE {P} END AS mh{i}"
        )
    band_selects = []
    for bi in range(bands):
        key = " || ',' || ".join(
            f"CAST(mh{bi * r + j} AS VARCHAR)" for j in range(r)
        )
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, md5({key}) AS band_key FROM sigs"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    inter = "len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))"
    union = f"(len(ta.toks) + len(tb.toks) - {inter})"
    # mpairs is the reusable tail: the cascade oracle chains it over a
    # filtered doc source (docs_src) instead of the raw table
    return f"""base AS (
  SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM {docs_src}
),
sigs AS (
  SELECT doc_id, toks,
         {", ".join(sig_cols)}
  FROM base
),
bk0 AS (
{bands_sql}
),
bk AS ({"SELECT bk0.* FROM bk0 JOIN (SELECT band, band_key, count(*) AS bn FROM bk0 GROUP BY 1, 2) bs USING (band, band_key) WHERE bs.bn <= " + str(bucket_cap) if bucket_cap is not None else "SELECT * FROM bk0"}
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bk l JOIN bk r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
mpairs AS (
  SELECT c.a, c.b,
         round(CASE WHEN {union} > 0
                    THEN CAST({inter} AS DOUBLE) / {union} ELSE 0.0 END, 6) AS jaccard
  FROM cands c
  JOIN base ta ON ta.doc_id = c.a
  JOIN base tb ON tb.doc_id = c.b
  WHERE CASE WHEN {union} > 0
             THEN CAST({inter} AS DOUBLE) / {union} ELSE 0.0 END >= {threshold}
)"""


SQL_MINHASH_NEAR_DUPS = (
    "WITH " + _sql_minhash_near_dups() + "\nSELECT a, b, jaccard FROM mpairs"
)


def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash banded near-dup, value-checked: the oracle replays the
    15-bit chunk bucketing and bit_count(xor) Hamming verify in SQL."""
    return DD.simhash_near_duplicates(_docs(spark, sf), max_hamming=10, bands=4)


def _sql_simhash_near_dups(max_hamming: int = 10, bands: int = 4) -> str:
    chunk = H.MD5_PREFIX_HEX_CHARS * 4 // bands  # 15
    mask = (1 << chunk) - 1
    return f"""
WITH sigs AS ({SQL_SIMHASH}),
chunks AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {chunk})) & {mask} AS chunk_key
  FROM sigs, (SELECT unnest([{", ".join(str(i) for i in range(bands))}]) AS band)
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       bit_count(xor(l.simhash, r.simhash)) AS hamming
FROM chunks l JOIN chunks r
  ON l.band = r.band AND l.chunk_key = r.chunk_key AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
"""


SQL_SIMHASH_NEAR_DUPS = _sql_simhash_near_dups()


def q_hashing_tf(spark: SparkSession, sf: str) -> DataFrame:
    """HashingTF twin on Murmur3, verified through order-invariant integer
    aggregates of the full (doc, bucket, tf) frame.

    Spark's Murmur3 isn't SQL-expressible, so the oracle pairs
    SQL-recomputable totals (n_docs, total_tf — pure tokenization facts)
    with hash-dependent checksums pinned as golden constants (deterministic:
    the bucketing is a pure function of the tokens). Any change to
    tokenize→hash→mod→count moves at least one aggregate."""
    from sentiment_analysis_bigdata_spark.operators import features as FE

    docs = _docs(spark, sf).select("doc_id", TXT.tokenize_nonempty("text").alias("tokens"))
    tf = FE.hashing_tf_indices(docs, num_features=2**18)
    return tf.agg(
        F.count(F.lit(1)).alias("nnz"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.sum(F.col("bucket").cast("bigint") * F.col("tf")).cast("bigint").alias("bucket_tf_checksum"),
        F.max("bucket").cast("bigint").alias("max_bucket"),
    )


def _sql_hashing_tf(nnz: int, checksum: int, max_bucket: int) -> str:
    """n_docs/total_tf recomputed from the raw table; Murmur3-dependent
    aggregates are golden constants measured at sf0.01 (the driver's
    correctness scale)."""
    return f"""-- GOLDEN-CONSTANTS @ sf0.01 (data-dependent literals; other SFs skip)
SELECT CAST((SELECT count(*) FROM documents WHERE len({SQL_TOKS}) > 0) AS BIGINT) AS n_docs,
       CAST((SELECT sum(len({SQL_TOKS})) FROM documents) AS BIGINT) AS total_tf,
       CAST({nnz} AS BIGINT) AS nnz,
       CAST({checksum} AS BIGINT) AS bucket_tf_checksum,
       CAST({max_bucket} AS BIGINT) AS max_bucket
"""


def q_ann_ivf_index(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-IVF serving path: build the index (centroids + corpus
    partitioned by list_id) to disk, then probe it in exhaustive mode
    (nprobe = nlist) so the result is kmeans-independent and must equal
    the brute-force SQL oracle. Value-checks the full persisted chain —
    partitioned write, centroid reload, partition-pruned probe scan
    (pruning is plan-asserted in tests), scoring, top-k."""
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        emb = _emb(spark, sf)
        SIM.build_ivf_index(emb, idx, nlist=8)
        out = SIM.ivf_index_topk(
            spark, idx, _queries_frame(emb), k=TOP_K, nprobe=8
        )
        res = out.select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_ann_ivf_append(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental IVF maintenance, value-checked end-to-end: the index is
    BUILT from only the even-id half of the corpus, the odd-id half is
    APPENDED via similarity.append_to_ivf_index (nearest-centroid assign +
    mode=append partitioned write — no re-clustering), and the appended
    index is probed exhaustively (nprobe = nlist). Exhaustive probing
    makes the result kmeans-independent, so it must equal the brute-force
    SQL oracle over the FULL corpus — which only holds if the appended
    vectors actually landed in probe-readable partitions."""
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="ivf_append_")
    try:
        emb = _emb(spark, sf)
        base = emb.filter(F.col("vec_id") % 2 == 0)
        delta = emb.filter(F.col("vec_id") % 2 == 1)
        SIM.build_ivf_index(base, idx, nlist=8)
        SIM.append_to_ivf_index(spark, idx, delta)
        out = SIM.ivf_index_topk(
            spark, idx, _queries_frame(emb), k=TOP_K, nprobe=8
        )
        res = out.select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN in exhaustive-probe mode (nprobe = nlist): the probed lists
    cover the whole corpus, so the result must equal exact brute force
    REGARDLESS of the kmeans centroid model — which is what makes the IVF
    plumbing (assignment, probing, candidate scoring, top-k) value-checkable
    against the brute-force SQL oracle. The recall/cost trade of
    nprobe < nlist is covered by the planted-neighbor test
    (tests/test_similarity.py)."""
    emb = _emb(spark, sf)
    out = SIM.ivf_topk(emb, _queries_frame(emb), k=TOP_K, nlist=8, nprobe=8)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), F.col("rank").cast("int").alias("rank")
    )


def q_ann_gemm(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched numpy GEMM top-k (the high-dimension fast path where
    one BLAS call per batch beats per-element codegen). Exact math, same
    tie-break — must reproduce the brute-force SQL oracle."""
    emb = _emb(spark, sf)
    qpd = _queries_frame(emb).toPandas()  # 5-row broadcast-sized query set
    out = SIM.cosine_topk_pandas(emb, qpd, k=TOP_K)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end binary round trip at CONTENT level: synthesize real
    content-complete PNG bytes per doc (dims + fill pixel planted from
    doc_id / text length; zlib-deflated IDAT with per-row sentinels),
    then decode them back — signature + big-endian IHDR parse, IDAT
    inflate, filter-byte strip, pixel aggregation
    (operators/multimodal.py). The oracle recomputes dims AND the planted
    pixel count/sum in closed form from the source columns — a parser bug
    (endianness, chunk offset, scanline stride, filter handling) breaks
    the match."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    # single-row-group fixture parquet scans as ONE task; spread the
    # zlib-heavy synthesize+decode across cores (no-op at real scale,
    # where input splits provide natural parallelism)
    docs = MM.attach_png_payloads(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )
    out = MM.decode_and_featurize(docs)
    return out.select(
        "doc_id",
        "kind",
        "width",
        "height",
        "px_count",
        "px_sum",
        F.round(F.col("px_sum") / F.col("px_count"), 6).alias("px_mean"),
    )


SQL_MULTIMODAL_DECODE = """
WITH planted AS (
  SELECT doc_id,
         64 + doc_id % 192 AS w,
         64 + length(text) % 192 AS h,
         (7 * doc_id + length(text)) % 256 AS fill
  FROM documents
)
SELECT doc_id,
       'png' AS kind,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 * w * h AS BIGINT) AS px_count,
       CAST(3 * h * (h - 1) / 2 + 3 * h * (w - 1) * fill AS BIGINT) AS px_sum,
       round((3 * h * (h - 1) / 2 + 3 * h * (w - 1) * fill)
             / CAST(3 * w * h AS DOUBLE), 6) AS px_mean
FROM planted
"""


def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-neighbor 2× downsample over the REAL decoded pixels
    (operators/multimodal.resize_stats): the thumbnail step of an image
    pipeline, value-checked — the oracle recomputes the sampled grid's
    dims and pixel sum in closed form from the planted layout (row
    sentinels land on even rows only; fill pixels everywhere else), so a
    wrong stride, offset, or axis order breaks the match."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = MM.attach_png_payloads(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )
    return MM.resize_stats(docs, factor=2).select(
        "doc_id", "out_width", "out_height", "ds_px_count", "ds_px_sum"
    )


SQL_MULTIMODAL_RESIZE = """
WITH planted AS (
  SELECT doc_id,
         64 + doc_id % 192 AS w,
         64 + length(text) % 192 AS h,
         (7 * doc_id + length(text)) % 256 AS fill
  FROM documents
),
ds AS (
  SELECT doc_id, fill,
         CAST((w + 1) // 2 AS BIGINT) AS ow,
         CAST((h + 1) // 2 AS BIGINT) AS oh
  FROM planted
)
SELECT doc_id,
       CAST(ow AS INTEGER) AS out_width,
       CAST(oh AS INTEGER) AS out_height,
       CAST(3 * ow * oh AS BIGINT) AS ds_px_count,
       -- sampled rows are the even originals y = 2j: sentinel sum per
       -- channel = sum 2j = oh*(oh-1); plus (ow-1) fill pixels per row
       CAST(3 * oh * (oh - 1) + 3 * oh * (ow - 1) * fill AS BIGINT) AS ds_px_sum
FROM ds
"""


def q_multimodal_jpeg(spark: SparkSession, sf: str) -> DataFrame:
    """JPEG marker-walk lane — the dominant web-corpus image format:
    structurally valid JPEGs (correct segment length fields; SOF0 or
    SOF2, optional EXIF APP1, dims/flags planted from doc_id and text
    length) are walked marker-by-marker to recover dims, component
    count, the progressive flag (baseline-only decoders must transcode
    those), and EXIF presence (privacy scrubbing). Rows with doc_id ≡ 0
    mod 23 are truncated after APP0 (no SOF) and must degrade to
    kind='unknown' with null fields instead of failing the batch
    (operators/multimodal.py decode_jpeg_header)."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = MM.attach_jpeg_payloads(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )
    return MM.decode_jpeg_meta(docs).select(
        "doc_id", "kind", "width", "height", "n_components",
        "progressive", "has_exif",
    )


SQL_MULTIMODAL_JPEG = """
WITH planted AS (
  SELECT doc_id,
         32 + doc_id % 1000 AS w,
         32 + length(text) % 1000 AS h,
         doc_id % 3 = 0 AS prog,
         length(text) % 2 = 0 AS exif,
         doc_id % 23 = 0 AS corrupt
  FROM documents
)
SELECT doc_id,
       CASE WHEN corrupt THEN 'unknown' ELSE 'jpeg' END AS kind,
       CASE WHEN corrupt THEN NULL ELSE CAST(w AS INTEGER) END AS width,
       CASE WHEN corrupt THEN NULL ELSE CAST(h AS INTEGER) END AS height,
       CASE WHEN corrupt THEN NULL ELSE CAST(3 AS INTEGER) END AS n_components,
       CASE WHEN corrupt THEN NULL ELSE prog END AS progressive,
       CASE WHEN corrupt THEN NULL ELSE exif END AS has_exif
FROM planted
"""


def q_multimodal_audio(spark: SparkSession, sf: str) -> DataFrame:
    """Audio twin of multimodal_decode at content level: real RIFF/WAVE
    bytes (mono 16-bit PCM @ 8 kHz, sample count and constant sample
    value planted from text length — negative values included), duration
    read back by walking the little-endian fmt/data chunks and sample
    stats by reinterpreting the data chunk as int16 PCM."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = MM.attach_wav_payloads(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )
    out = MM.decode_and_featurize(docs)
    return out.select(
        "doc_id",
        "kind",
        "duration_ms",
        "sample_rate",
        "pcm_n_samples",
        "pcm_sum",
        "pcm_abs_max",
    )


SQL_MULTIMODAL_AUDIO = """
WITH planted AS (
  SELECT doc_id,
         (length(text) % 100 + 1) * 80 AS n,
         (length(text) % 17) - 8 AS v
  FROM documents
)
SELECT doc_id,
       'wav' AS kind,
       CAST(n / 8 AS INTEGER) AS duration_ms,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS pcm_n_samples,
       CAST(n * v AS BIGINT) AS pcm_sum,
       CAST(abs(v) AS BIGINT) AS pcm_abs_max
FROM planted
"""


def q_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-vs-corpus exact dedup: new docs (doc_id ≥ 400) whose
    normalized fingerprint already exists in the historical corpus
    (doc_id < 400) are dropped — the daily-crawl-ingest shape. The
    historical side reduces to distinct fingerprints; the delta is
    anti-joined (broadcast while small, shuffle beyond)."""
    docs = _docs(spark, sf)
    fp = TXT.fingerprint("text")
    history = docs.filter(F.col("doc_id") < 400).select(fp.alias("__fp")).distinct()
    delta = docs.filter(F.col("doc_id") >= 400).withColumn("__fp", fp)
    return (
        delta.join(history, "__fp", "left_anti")
        .select("doc_id", "lang", "source")
    )


SQL_INCREMENTAL_DEDUP = f"""
SELECT doc_id, lang, source
FROM documents
WHERE doc_id >= 400
  AND {SQL_FP} NOT IN (SELECT {SQL_FP} FROM documents WHERE doc_id < 400)
"""


def q_intradoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style intra-document segment dedup (first occurrence wins,
    order preserved), at token granularity on the synthetic corpus —
    before/after counts plus the fully deduplicated text, all replayed by
    the SQL twin's indexed list_filter."""
    out = DD.dedup_segments(_docs(spark, sf), sep=" ")
    return out.select("doc_id", "n_segments", "n_unique_segments", "text_deduped")


SQL_INTRADOC_DEDUP = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS segs FROM documents),
kept AS (
  SELECT doc_id, segs,
         list_filter(segs, (x, i) -> list_position(segs, x) = i) AS uniq
  FROM base
)
SELECT doc_id,
       CAST(len(segs) AS BIGINT) AS n_segments,
       CAST(len(uniq) AS BIGINT) AS n_unique_segments,
       array_to_string(uniq, ' ') AS text_deduped
FROM kept
"""


CROSSDOC_MAX_DF_PCT = 79


def q_crossdoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style cross-document boilerplate removal (operators/dedup.py
    ``crossdoc_segment_dedup``): drop every occurrence of any segment whose
    corpus document frequency is >= 79% of documents — the corpus-wide
    complement of ``intradoc_dedup``. The blocklist is ONE aggregation that
    collapses to a broadcast single-row array (bounded by
    segments-per-doc x 100/79, independent of corpus size); the document
    table is rewritten by a narrow HOF filter, never shuffled. The
    integer-exact threshold (df*100 >= n_docs*79) makes the kept set
    engine-reproducible, so the deduplicated TEXT itself is value-checked."""
    out = DD.crossdoc_segment_dedup(
        _docs(spark, sf), sep=" ", max_df_pct=CROSSDOC_MAX_DF_PCT
    )
    return out.select("doc_id", "n_segments", "n_kept", "text_deduped")


SQL_CROSSDOC_DEDUP = f"""
WITH segs AS (
  SELECT DISTINCT doc_id, seg FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS seg FROM documents
  )
),
n AS (SELECT count(*) AS n_docs FROM documents),
bl AS (
  SELECT coalesce(list(seg), []) AS bl FROM (
    SELECT seg FROM segs GROUP BY seg
    HAVING count(*) * 100 >= (SELECT n_docs FROM n) * {CROSSDOC_MAX_DF_PCT}
  )
),
base AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_segments,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, ' ') AS text_deduped
FROM (
  SELECT doc_id, s, list_filter(s, x -> NOT list_contains(bl, x)) AS kept
  FROM base CROSS JOIN bl
)
"""


def q_contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (doc_id ≥ 25) sharing ≥ 2
    distinct token 3-grams with the 'benchmark' slice (doc_id < 25) — the
    eval-set-leakage check every training corpus needs. Benchmark n-gram set
    broadcasts; corpus is never self-joined."""
    docs = _docs(spark, sf)
    bench = docs.filter(F.col("doc_id") < 25)
    corpus = docs.filter(F.col("doc_id") >= 25)
    return DD.decontaminate(corpus, bench, n=3, min_matches=2)


SQL_CONTAMINATION_CHECK = f"""
WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
         )) AS gram
  FROM base WHERE len(toks) >= 3
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 25)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_matching_grams
FROM grams g JOIN bench USING (gram)
WHERE g.doc_id >= 25
GROUP BY g.doc_id
HAVING count(*) >= 2
"""




# --- Winnowing fingerprints (MOSS passage-overlap detection) ---------------------

_WINNOW_K, _WINNOW_W = 20, 5


def q_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document winnowing fingerprint summary (operators/dedup.py
    ``winnow_fingerprints`` — k=20 char-grams, window w=5, md5-prefix
    hashes). The oracle replays gram hashing, the sliding window min, and
    the distinct-selection in SQL, so fingerprint VALUES (min/max/sum) are
    checked, not just counts."""
    fps = DD.winnow_fingerprints(
        _docs(spark, sf),
        k=_WINNOW_K,
        w=_WINNOW_W,
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        # checksum mod a prime: a raw sum of ~100 60-bit hashes overflows
        # BIGINT under ANSI arithmetic (and DuckDB would widen to HUGEINT)
        F.sum(F.pmod("fp", F.lit(1_000_003))).alias("fp_checksum"),
    )


def _sql_winnow_fps(k: int, w: int) -> str:
    gram = SQL_H60.format(t=f"substr(t, CAST(i AS INT), {k})")
    return f"""
WITH docs AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= {k + w - 1}
),
grams AS (
  SELECT doc_id, CAST(i AS INT) - 1 AS pos, length(t) - {k - 1} AS n_starts,
         {gram} AS h
  FROM docs, unnest(range(1, length(t) - {k} + 2)) AS u(i)
),
wins AS (
  SELECT doc_id, pos, n_starts,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
),
fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE pos <= n_starts - {w})
"""


SQL_WINNOW_FINGERPRINTS = _sql_winnow_fps(_WINNOW_K, _WINNOW_W) + """
SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp, max(fp) AS max_fp,
       CAST(sum(fp % 1000003) AS BIGINT) AS fp_checksum
FROM fps GROUP BY 1
"""


def q_winnow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Passage-overlap candidate pairs via shared winnowing fingerprints
    (operators/dedup.py ``winnow_overlap``): df-capped fingerprint-bucket
    equi self-join — the MOSS index shape, never O(n^2)."""
    return DD.winnow_overlap(
        _docs(spark, sf),
        k=_WINNOW_K,
        w=_WINNOW_W,
        max_df=3,
        min_shared=3,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


SQL_WINNOW_OVERLAP = _sql_winnow_fps(_WINNOW_K, _WINNOW_W) + """
, rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 3
),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS n_shared
FROM kept l JOIN kept r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
"""



# --- similarity search: scalar-quantized (SQ8) top-k ----------------------------

def q_ann_sq8(spark: SparkSession, sf: str) -> DataFrame:
    """SQ8 compressed-corpus top-k (operators/similarity.py ``sq8_topk``):
    per-dim [min,max] codes 0..255, dequantized scoring vs float queries.
    The oracle replays the quantizer bit-for-bit (floor-based rounding —
    engine-neutral, unlike banker's/half-up round), so compression AND
    ranking are value-checked, not just the output shape."""
    emb = _emb(spark, sf)
    # floor the scan parallelism: the per-element quantize+score projection
    # is the hot loop and the fixture parquet is a single row group
    corpus = ensure_min_parallelism(
        emb, spark.sparkContext.defaultParallelism, "vec_id"
    )
    out = SIM.sq8_topk(corpus, _queries_frame(emb), k=TOP_K)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


SQL_ANN_SQ8 = f"""
WITH stats AS (
  SELECT CAST(i AS INT) AS pos,
         min(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mn,
         max(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mx
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  GROUP BY 1
),
arrs AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM stats),
dq AS (
  SELECT vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> CASE WHEN maxs[i] > mins[i]
                     THEN mins[i] + floor((CAST(embedding[i] AS DOUBLE) - mins[i])
                                          / (maxs[i] - mins[i]) * 255.0 + 0.5)
                          * (maxs[i] - mins[i]) / 255.0
                     ELSE mins[i] END) AS v
  FROM embeddings CROSS JOIN arrs
),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, d.vec_id, {_sql_cosine('d.v', 'q.qv')} AS cos_raw
  FROM dq d CROSS JOIN q
  WHERE d.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""



# --- leakage-safe splitting & hard-negative mining -------------------------------

def q_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """Contamination-proof train/val/test split: assignment hashes the
    near-dup CLUSTER id (transitive closure of near-duplicate pairs), not
    the row id, so near-copies can never straddle train and eval — the
    leakage mode a per-row split is blind to. Singletons cluster as
    themselves; membership stays content-addressed and rerun-stable.
    Output: per-split document and cluster counts (the cluster-atomicity
    invariant — no cluster in two splits — is structural: one hash per
    cluster). Oracle replays pairs → recursive closure → split."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    emb = _emb(spark, sf)
    pairs = DD.embedding_near_duplicates(emb, threshold=0.25, n_bits=8)
    comp = DD.connected_components(pairs)
    clustered = emb.select("vec_id").join(
        comp, emb["vec_id"] == comp["node"], "left"
    ).select(
        "vec_id", F.coalesce("component", "vec_id").alias("cluster")
    )
    split = ordering.split_by_hash(
        clustered, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="cluster"
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster").alias("n_clusters"),
    )


def _sql_leakage_safe_split() -> str:
    from sentiment_analysis_bigdata_spark.operators.ordering import sql_split_expr

    split = sql_split_expr({"train": 0.8, "val": 0.1, "test": 0.1}, "cluster", 42)
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT l.id AS a, r.id AS b
  FROM (SELECT vec_id AS id, embedding AS v, {_sql_sign_bucket('embedding')} AS bucket
        FROM embeddings) l
  JOIN (SELECT vec_id AS id, embedding AS v, {_sql_sign_bucket('embedding')} AS bucket
        FROM embeddings) r
    ON l.bucket = r.bucket AND l.id < r.id
  WHERE {_sql_cosine('l.v', 'r.v')} >= 0.25
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
clustered AS (
  SELECT e.vec_id, coalesce(c.component, e.vec_id) AS cluster
  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
)
SELECT {split} AS split, count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters
FROM clustered
GROUP BY 1
"""


SQL_LEAKAGE_SAFE_SPLIT = _sql_leakage_safe_split()


def q_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (operators/similarity.hard_negative_topk): per anchor, the top-k
    most-similar vectors with a DIFFERENT label — the negatives that
    actually move a contrastive loss (random negatives are trivially
    separable). Same broadcast-query/corpus-scan shape as ann_bruteforce
    plus a label-mismatch predicate; at scale the candidate generation
    swaps to the IVF/LSH index, identical downstream."""
    emb = _emb(spark, sf)
    anchors = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        # no-op (the filter already yields N_QUERIES rows) but makes the
        # broadcast side's boundedness plan-visible for tools/plan_audit.py
        .limit(N_QUERIES)
    )
    out = SIM.hard_negative_topk(emb, anchors, k=TOP_K)
    return out.select(
        "query_id",
        "vec_id",
        "label",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


SQL_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel
),
ranked AS (
  SELECT query_id, vec_id, label, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, label, round(cos_raw, 6) AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""



def q_ann_sq8_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the SQ8 compressed scan vs the exact float scan, both
    computed in Spark and the number itself value-checked (the oracle
    recomputes BOTH top-k sets with the quantizer replayed in SQL) — the
    compression/recall trade is a hard per-round number, like ann_recall
    is for the LSH path."""
    emb = _emb(spark, sf)
    corpus = ensure_min_parallelism(
        emb, spark.sparkContext.defaultParallelism, "vec_id"
    )
    exact = SIM.brute_force_topk(emb, _queries_frame(emb), k=TOP_K)
    approx = SIM.sq8_topk(corpus, _queries_frame(emb), k=TOP_K)
    hits = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id").withColumn("hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(TOP_K), 6))
        .orderBy("query_id")
    )


SQL_ANN_SQ8_RECALL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
exact_scored AS (
  SELECT q.query_id, e.vec_id, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM exact_scored
  ) WHERE rank <= {TOP_K}
),
stats AS (
  SELECT CAST(i AS INT) AS pos,
         min(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mn,
         max(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mx
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  GROUP BY 1
),
arrs AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM stats),
dq AS (
  SELECT vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> CASE WHEN maxs[i] > mins[i]
                     THEN mins[i] + floor((CAST(embedding[i] AS DOUBLE) - mins[i])
                                          / (maxs[i] - mins[i]) * 255.0 + 0.5)
                          * (maxs[i] - mins[i]) / 255.0
                     ELSE mins[i] END) AS v
  FROM embeddings CROSS JOIN arrs
),
approx_scored AS (
  SELECT q.query_id, d.vec_id, {_sql_cosine('d.v', 'q.qv')} AS cos_raw
  FROM dq d CROSS JOIN q
  WHERE d.vec_id <> q.query_id
),
approx_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM approx_scored
  ) WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST(count(a.vec_id) AS INTEGER) AS n_hits,
       round(count(a.vec_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_topk e
LEFT JOIN approx_topk a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# --- retrieval-quality metrics (MRR / nDCG@k / P@k / R@k) --------------------------

_RM_QUERIES = 20
_RM_K = 5


def q_retrieval_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Mean MRR, nDCG@k, precision@k, recall@k of exact cosine retrieval
    with label-match relevance (operators/evaluation.py ranking_metrics)
    — the RAG-eval IR metrics next to ann_recall's approximation check.
    Ground-truth R per query = same-label corpus size minus self."""
    from sentiment_analysis_bigdata_spark.operators import evaluation as EV

    emb = _emb(spark, sf)
    q = (
        emb.filter(F.col("vec_id") < _RM_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("qlabel"),
        )
        .limit(_RM_QUERIES)  # no-op; makes broadcast boundedness plan-visible
    )
    ranked = SIM.brute_force_topk(
        emb, q.select("query_id", "query_vec"), k=_RM_K
    )
    rel = (
        ranked.join(emb.select("vec_id", "label"), "vec_id")
        .join(q.select("query_id", "qlabel"), "query_id")
        .withColumn("rel", (F.col("label") == F.col("qlabel")).cast("int"))
    )
    label_counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    total_rel = q.join(
        label_counts, q["qlabel"] == label_counts["label"]
    ).select("query_id", (F.col("n_lab") - F.lit(1)).alias("n_rel_total"))
    out = EV.ranking_metrics(rel, total_rel, k=_RM_K)
    return out.select(
        "n_queries",
        F.round("mrr", 6).alias("mrr"),
        F.round("ndcg_at_k", 6).alias("ndcg_at_k"),
        F.round("precision_at_k", 6).alias("precision_at_k"),
        F.round("recall_at_k", 6).alias("recall_at_k"),
    )


SQL_RETRIEVAL_METRICS = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {_RM_QUERIES}
),
ranked AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_sql_cosine('e.embedding', 'q.qv')} DESC, e.vec_id ASC
         ) AS rank
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
topk AS (
  SELECT query_id, rank, CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE rank <= {_RM_K}
),
per_q AS (
  SELECT query_id,
         sum(rel) AS nrel_k,
         sum(rel / log2(rank + 1.0)) AS dcg,
         min(CASE WHEN rel = 1 THEN rank END) AS first_rel
  FROM topk GROUP BY query_id
),
tot AS (
  SELECT q.query_id, count(*) - 1 AS n_rel_total
  FROM q JOIN embeddings e ON e.label = q.qlabel
  GROUP BY q.query_id
),
scored AS (
  SELECT p.query_id,
         COALESCE(1.0 / p.first_rel, 0.0) AS rr,
         CASE WHEN t.n_rel_total >= 1 THEN
           p.dcg / list_sum(list_transform(
             range(1, least({_RM_K}, t.n_rel_total) + 1),
             i -> 1.0 / log2(i + 1.0)))
         ELSE 0.0 END AS ndcg,
         p.nrel_k / {_RM_K}.0 AS prec,
         CASE WHEN t.n_rel_total > 0 THEN CAST(p.nrel_k AS DOUBLE) / t.n_rel_total
              ELSE 0.0 END AS rec
  FROM per_q p JOIN tot t USING (query_id)
)
SELECT count(*) AS n_queries,
       round(avg(rr), 6) AS mrr,
       round(avg(ndcg), 6) AS ndcg_at_k,
       round(avg(prec), 6) AS precision_at_k,
       round(avg(rec), 6) AS recall_at_k
FROM scored
"""


# --- product-quantization ANN -----------------------------------------------------

PQ_M = 8          # sub-spaces
PQ_K = 16         # codes per sub-space
PQ_DSUB = 8       # dims per sub-space (64 / PQ_M)


def q_ann_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate cosine top-k over 4-byte PQ codes (64× compression):
    deterministic one-Lloyd-iteration codebooks (init = k smallest-id
    rows), Arrow-kernel encode + asymmetric scoring against the codebook
    reconstruction (operators/pq.py). The oracle replays the ENTIRE
    trainer — init, argmin assignment, grouped means with empty-cluster
    fallback — plus encoding and scoring in SQL, so the compressed
    index's contents are value-checked, not just its output shape."""
    from sentiment_analysis_bigdata_spark.operators import pq as PQ

    emb = ensure_min_parallelism(
        _emb(spark, sf), spark.sparkContext.defaultParallelism, "vec_id"
    )
    out = PQ.pq_topk(
        emb, _queries_frame(emb), k=TOP_K, m=PQ_M, n_codes=PQ_K, dim=64
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def _sql_ann_pq_ctes() -> str:
    """The shared MATERIALIZED CTE chain replaying PQ end-to-end in
    DuckDB: codebook training (deterministic init → argmin assignment →
    per-dim means, empty clusters keep init), encoding, and asymmetric
    cosine scoring. MATERIALIZED stops DuckDB's CTE inlining from
    re-expanding the chain (same trick as the PCA oracle)."""
    m, k, dsub, d1 = PQ_M, PQ_K, PQ_DSUB, PQ_DSUB + 1
    d2 = (
        "list_sum(list_transform(range(1, {d1}), "
        "j -> (x.xvec[j] - {b}.cvec[j]) * (x.xvec[j] - {b}.cvec[j])))"
    )
    return f"""
WITH dims AS MATERIALIZED (SELECT CAST(s AS INT) AS s FROM range({m}) t(s)),
init AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
),
initsub AS MATERIALIZED (
  SELECT i.code, d.s,
         list_transform(range(1, {d1}),
                        j -> CAST(i.embedding[d.s * {dsub} + j] AS DOUBLE)) AS cvec
  FROM init i CROSS JOIN dims d
),
corsub AS MATERIALIZED (
  SELECT e.vec_id, d.s,
         list_transform(range(1, {d1}),
                        j -> CAST(e.embedding[d.s * {dsub} + j] AS DOUBLE)) AS xvec
  FROM embeddings e CROSS JOIN dims d
),
assign0 AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, i.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {d2.format(d1=d1, b='i')} ASC, i.code ASC
           ) AS rn
    FROM corsub x JOIN initsub i ON i.s = x.s
  ) WHERE rn = 1
),
means AS MATERIALIZED (
  SELECT a.s, a.code, t.j, avg(x.xvec[t.j]) AS v
  FROM assign0 a
  JOIN corsub x ON x.vec_id = a.vec_id AND x.s = a.s
  CROSS JOIN (SELECT CAST(j AS INT) AS j FROM range(1, {d1}) t(j)) t
  GROUP BY 1, 2, 3
),
mlists AS MATERIALIZED (
  SELECT s, code, list(v ORDER BY j) AS cvec FROM means GROUP BY 1, 2
),
books AS MATERIALIZED (
  SELECT i.s, i.code, coalesce(ml.cvec, i.cvec) AS cvec
  FROM initsub i LEFT JOIN mlists ml ON ml.s = i.s AND ml.code = i.code
),
assign1 AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, b.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {d2.format(d1=d1, b='b')} ASC, b.code ASC
           ) AS rn
    FROM corsub x JOIN books b ON b.s = x.s
  ) WHERE rn = 1
),
recon AS MATERIALIZED (
  SELECT a.vec_id, a.s, b.cvec
  FROM assign1 a JOIN books b ON b.s = a.s AND b.code = a.code
),
rnorm AS MATERIALIZED (
  SELECT vec_id,
         sum(list_sum(list_transform(range(1, {d1}), j -> cvec[j] * cvec[j]))) AS n2
  FROM recon GROUP BY 1
),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qv,
         sqrt(list_sum(list_transform(range(1, {m * dsub + 1}),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS qn
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
qsub AS MATERIALIZED (
  SELECT q.query_id, d.s,
         list_transform(range(1, {d1}),
                        j -> CAST(q.qv[d.s * {dsub} + j] AS DOUBLE)) AS qvec
  FROM q CROSS JOIN dims d
),
pdots AS MATERIALIZED (
  SELECT qs.query_id, r.vec_id,
         sum(list_sum(list_transform(range(1, {d1}),
             j -> qs.qvec[j] * r.cvec[j]))) AS dot
  FROM qsub qs JOIN recon r ON r.s = qs.s
  GROUP BY 1, 2
),
pq_scored AS MATERIALIZED (
  SELECT p.query_id, p.vec_id,
         CASE WHEN q.qn * sqrt(rn.n2) > 0
              THEN p.dot / (q.qn * sqrt(rn.n2)) ELSE 0.0 END AS score_raw
  FROM pdots p
  JOIN q ON q.query_id = p.query_id
  JOIN rnorm rn ON rn.vec_id = p.vec_id
  WHERE p.vec_id <> p.query_id
),
pq_ranked AS MATERIALIZED (
  SELECT query_id, vec_id, score_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_raw DESC, vec_id ASC) AS rank
  FROM pq_scored
)"""


SQL_ANN_PQ = (
    _sql_ann_pq_ctes()
    + f"""
SELECT query_id, vec_id, round(score_raw, 6) AS score, CAST(rank AS INTEGER) AS rank
FROM pq_ranked WHERE rank <= {TOP_K}
"""
)


IVFPQ_NLIST = 8
IVFPQ_NPROBE = 2


def q_ann_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ serving (FAISS IVF8,PQ8 shape): deterministic coarse
    quantizer (= the PQ trainer with m=1) prunes each query to its
    nprobe=2 of nlist=8 inverted lists, PQ codes score the survivors
    (operators/pq.py ivfpq_topk). The oracle replays BOTH quantizers'
    training, the corpus list assignment, the query probes, and the
    pruned ADC ranking — the complete index is value-checked."""
    from sentiment_analysis_bigdata_spark.operators import pq as PQ

    emb = ensure_min_parallelism(
        _emb(spark, sf), spark.sparkContext.defaultParallelism, "vec_id"
    )
    out = PQ.ivfpq_topk(
        emb,
        _queries_frame(emb),
        k=TOP_K,
        nlist=IVFPQ_NLIST,
        nprobe=IVFPQ_NPROBE,
        m=PQ_M,
        n_codes=PQ_K,
        dim=64,
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def _sql_ann_ivfpq() -> str:
    """IVF-PQ oracle: the PQ chain (training/encoding/scoring) plus a
    coarse-quantizer chain (the same one-Lloyd recipe at m=1), query
    probes, and candidate-pruned ranking."""
    nlist, nprobe, d = IVFPQ_NLIST, IVFPQ_NPROBE, 64
    d1 = d + 1
    cd2 = (
        f"list_sum(list_transform(range(1, {d1}), "
        "j -> ({x}[j] - {c}[j]) * ({x}[j] - {c}[j])))"
    )
    coarse = f""",
initc AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS lc,
         list_transform(range(1, {d1}),
                        j -> CAST(embedding[j] AS DOUBLE)) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nlist})
),
corfull AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, {d1}),
                        j -> CAST(embedding[j] AS DOUBLE)) AS xvec
  FROM embeddings
),
cassign0 AS MATERIALIZED (
  SELECT vec_id, lc FROM (
    SELECT x.vec_id, i.lc,
           row_number() OVER (
             PARTITION BY x.vec_id
             ORDER BY {cd2.format(x='x.xvec', c='i.cvec')} ASC, i.lc ASC
           ) AS rn
    FROM corfull x CROSS JOIN initc i
  ) WHERE rn = 1
),
cmeans AS MATERIALIZED (
  SELECT a.lc, t.j, avg(x.xvec[t.j]) AS v
  FROM cassign0 a
  JOIN corfull x USING (vec_id)
  CROSS JOIN (SELECT CAST(j AS INT) AS j FROM range(1, {d1}) t(j)) t
  GROUP BY 1, 2
),
cml AS MATERIALIZED (SELECT lc, list(v ORDER BY j) AS cvec FROM cmeans GROUP BY 1),
cbooks AS MATERIALIZED (
  SELECT i.lc, coalesce(ml2.cvec, i.cvec) AS cvec
  FROM initc i LEFT JOIN cml ml2 USING (lc)
),
cassign1 AS MATERIALIZED (
  SELECT vec_id, lc AS list_id FROM (
    SELECT x.vec_id, b.lc,
           row_number() OVER (
             PARTITION BY x.vec_id
             ORDER BY {cd2.format(x='x.xvec', c='b.cvec')} ASC, b.lc ASC
           ) AS rn
    FROM corfull x CROSS JOIN cbooks b
  ) WHERE rn = 1
),
qfull AS MATERIALIZED (
  SELECT query_id,
         list_transform(range(1, {d1}), j -> CAST(qv[j] AS DOUBLE)) AS xvec
  FROM q
),
qprobes AS MATERIALIZED (
  SELECT query_id, lc AS list_id FROM (
    SELECT qf.query_id, b.lc,
           row_number() OVER (
             PARTITION BY qf.query_id
             ORDER BY {cd2.format(x='qf.xvec', c='b.cvec')} ASC, b.lc ASC
           ) AS rn
    FROM qfull qf CROSS JOIN cbooks b
  ) WHERE rn <= {nprobe}
),
cands AS MATERIALIZED (
  SELECT p.query_id, a.vec_id
  FROM qprobes p JOIN cassign1 a ON a.list_id = p.list_id
),
ivfpq_ranked AS MATERIALIZED (
  SELECT s.query_id, s.vec_id, s.score_raw,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score_raw DESC, s.vec_id ASC) AS rank
  FROM pq_scored s
  JOIN cands c ON c.query_id = s.query_id AND c.vec_id = s.vec_id
)"""
    return (
        _sql_ann_pq_ctes()
        + coarse
        + f"""
SELECT query_id, vec_id, round(score_raw, 6) AS score, CAST(rank AS INTEGER) AS rank
FROM ivfpq_ranked WHERE rank <= {TOP_K}
"""
    )


SQL_ANN_IVFPQ = _sql_ann_ivfpq()


def q_ann_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the PQ index against the exact brute-force top-k, both
    inside Spark — the compression/recall trade as a value-checked number
    (the SQ8/LSH pattern applied to PQ)."""
    from sentiment_analysis_bigdata_spark.operators import pq as PQ

    emb = _emb(spark, sf)
    exact = SIM.brute_force_topk(emb, _queries_frame(emb), k=TOP_K)
    approx = PQ.pq_topk(
        ensure_min_parallelism(
            emb, spark.sparkContext.defaultParallelism, "vec_id"
        ),
        _queries_frame(emb),
        k=TOP_K,
        m=PQ_M,
        n_codes=PQ_K,
        dim=64,
    )
    hits = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id").withColumn("hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(TOP_K), 6))
        .orderBy("query_id")
    )


SQL_ANN_PQ_RECALL = (
    _sql_ann_pq_ctes()
    + f""",
pq_topk AS MATERIALIZED (
  SELECT query_id, vec_id FROM pq_ranked WHERE rank <= {TOP_K}
),
exact_scored AS MATERIALIZED (
  SELECT q.query_id, e.vec_id, {_sql_cosine('e.embedding', 'q.qv')} AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact_topk AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_raw DESC, vec_id ASC) AS rank
    FROM exact_scored
  ) WHERE rank <= {TOP_K}
)
SELECT x.query_id,
       CAST(count(p.vec_id) AS INTEGER) AS n_hits,
       round(count(p.vec_id) / {TOP_K}.0, 6) AS recall
FROM exact_topk x
LEFT JOIN pq_topk p ON p.query_id = x.query_id AND p.vec_id = x.vec_id
GROUP BY 1
ORDER BY 1
"""
)


# --- PCA over the embedding table ------------------------------------------------

def q_embedding_pca(spark: SparkSession, sf: str) -> DataFrame:
    """Dominant principal component of the 64-dim embedding corpus:
    one-pass d²-sized moments (Arrow GEMM kernel), algebraic covariance,
    12 fixed power-iteration rounds on the driver's 64×64 matrix
    (operators/pca.py). The oracle independently recomputes the covariance
    and replays the identical iteration unrolled as SQL CTEs."""
    from sentiment_analysis_bigdata_spark.operators import pca

    emb = ensure_min_parallelism(
        load_table(spark, sf, "embeddings"),
        spark.sparkContext.defaultParallelism,
        "vec_id",
    )
    out = pca.pca_top_component(emb, "embedding", dim=64, iters=12)
    return out.select(
        "i",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
        F.round("explained_ratio", 6).alias("explained_ratio"),
    )


def _sql_embedding_pca(dim: int = 64, iters: int = 12) -> str:
    """Unrolled power-iteration oracle (same technique as the BPE CTE
    recursion): covariance from first principles, then v0 → v12, λ = vᵀCv,
    trace, and the max-|loading| sign rule."""
    ctes = [
        f"idx AS MATERIALIZED (SELECT CAST(i AS INT) AS i FROM range({dim}) t(i))",
        "nr AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)",
        """xs AS MATERIALIZED (
  SELECT vec_id, idx.i AS i, CAST(embedding[idx.i + 1] AS DOUBLE) AS x
  FROM embeddings, idx
)""",
        "mu AS MATERIALIZED (SELECT i, sum(x) AS s FROM xs GROUP BY 1)",
        """gram AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS g
  FROM xs a JOIN xs b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
)""",
        """cov AS MATERIALIZED (
  SELECT g.i, g.j, (g.g - mi.s * mj.s / nr.n) / (nr.n - 1) AS c
  FROM gram g JOIN mu mi ON mi.i = g.i JOIN mu mj ON mj.i = g.j, nr
)""",
        f"v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt({dim}) AS x FROM idx)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"y{t} AS MATERIALIZED (SELECT c.j AS i, sum(c.c * v.x) AS y "
            f"FROM cov c JOIN v{t - 1} v ON v.i = c.i GROUP BY c.j)"
        )
        ctes.append(
            f"v{t} AS MATERIALIZED (SELECT i, y / (SELECT sqrt(sum(y * y)) FROM y{t}) AS x "
            f"FROM y{t})"
        )
    vf = f"v{iters}"
    ctes += [
        f"""cv AS MATERIALIZED (
  SELECT c.j AS i, sum(c.c * v.x) AS y
  FROM cov c JOIN {vf} v ON v.i = c.i GROUP BY c.j
)""",
        f"lam AS MATERIALIZED (SELECT sum(cv.y * v.x) AS l FROM cv JOIN {vf} v USING (i))",
        "tr AS MATERIALIZED (SELECT sum(c) AS t FROM cov WHERE i = j)",
        f"""sgn AS MATERIALIZED (
  SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
  FROM {vf} ORDER BY abs(x) DESC, i ASC LIMIT 1
)""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.i, round(sgn.s * v.x, 6) AS loading,
       round(lam.l, 6) AS eigenvalue,
       round(lam.l / tr.t, 6) AS explained_ratio
FROM {vf} v, sgn, lam, tr
"""
    )


SQL_EMBEDDING_PCA = _sql_embedding_pca()


def q_minhash_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall of MinHash-LSH near-dup detection against EXACT ground
    truth — the text-side analogue of ``ann_recall``: PPJoin
    (prefix-filtered, exact) enumerates ALL Jaccard ≥ 0.5 pairs, the
    banded MinHash pipeline finds what its buckets surface (precision is
    1.0 by construction — candidates are exact-verified), and the ratio
    makes the LSH banding's probabilistic recall a value-checked number
    per round instead of a pytest-only claim. Both sides are the
    already-audited standalone operators; the oracle recomputes truth
    brute-force over the same token sets (fine at oracle scale; the
    Spark side stays prefix-filtered)."""
    docs = _docs(spark, sf)
    truth = DD.prefix_filtered_jaccard_pairs(docs, 0.5)
    found = DD.minhash_near_duplicates(
        docs, threshold=0.5, num_hashes=16, bands=4
    )
    t = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    f_ = found.agg(F.count(F.lit(1)).alias("n_found_pairs"))
    return t.crossJoin(f_).select(
        "n_true_pairs",
        "n_found_pairs",
        F.round(
            F.col("n_found_pairs") / F.greatest(F.col("n_true_pairs"), F.lit(1)),
            6,
        ).alias("recall"),
    )


def _sql_minhash_recall() -> str:
    inter = "len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))"
    union = f"(len(ta.toks) + len(tb.toks) - {inter})"
    jac = f"CASE WHEN {union} > 0 THEN CAST({inter} AS DOUBLE) / {union} ELSE 0.0 END"
    return f"""
WITH {_sql_minhash_near_dups()},
truth AS (
  SELECT ta.doc_id AS a, tb.doc_id AS b
  FROM base ta JOIN base tb ON ta.doc_id < tb.doc_id
  WHERE {jac} >= 0.5
)
SELECT (SELECT count(*) FROM truth) AS n_true_pairs,
       (SELECT count(*) FROM mpairs) AS n_found_pairs,
       round((SELECT count(*) FROM mpairs)
             / greatest((SELECT count(*) FROM truth), 1), 6) AS recall
"""


SQL_MINHASH_RECALL = _sql_minhash_recall()


_SPAN_K = 5


def q_dup_ngram_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact duplicated-substring accounting per document
    (operators/dedup.duplicated_span_stats — the fixed-k distributed
    analogue of Lee et al. 2022's suffix-array substring dedup): fraction
    of each doc's tokens covered by a 5-gram that repeats anywhere in the
    corpus."""
    return DD.duplicated_span_stats(_docs(spark, sf), k=_SPAN_K)


SQL_DUP_NGRAM_SPANS = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
sized AS (SELECT doc_id, CAST(len(l) AS INT) AS n_tokens, l FROM toks),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(list_slice(l, CAST(i AS INT), CAST(i AS INT) + {_SPAN_K - 1}), ' ') AS gram
  FROM sized, unnest(range(1, n_tokens - {_SPAN_K - 2})) AS t(i)
  WHERE n_tokens >= {_SPAN_K}
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
dp AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
cov AS (
  SELECT doc_id,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
              THEN {_SPAN_K}
              ELSE least({_SPAN_K},
                         pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos))
         END AS contrib
  FROM dp
),
pd AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS dup_tokens FROM cov GROUP BY 1)
SELECT s.doc_id, s.n_tokens,
       coalesce(pd.dup_tokens, 0) AS dup_tokens,
       round(coalesce(pd.dup_tokens, 0) / greatest(s.n_tokens, 1), 6) AS dup_fraction
FROM sized s LEFT JOIN pd USING (doc_id)
"""


_SPAN_LADDER = (5, 10, 20)


def q_dup_ngram_spans_ladder(spark: SparkSession, sf: str) -> DataFrame:
    """Variable-length duplicated-substring accounting
    (operators/dedup.duplicated_span_stats_ladder): gram marking at each
    rung of the k-ladder {5, 10, 20}, then a longest-match merge (union
    of the mixed-length intervals per doc) so a long repeated passage
    that fires at every rung counts each token once — the step toward
    Lee et al. 2022's variable-length suffix-array semantics. Rung sizes
    are fixture-scaled (docs are 10-99 tokens); the planted-100-token
    case runs at {25, 50, 100} in pytest."""
    return DD.duplicated_span_stats_ladder(
        _docs(spark, sf), ks=_SPAN_LADDER
    )


def _sql_span_rung(k: int) -> str:
    """One ladder rung: duplicated k-gram start positions as [start, end]
    token intervals (mirrors the fixed-k CTEs with the rung's k)."""
    return f"""
  SELECT g.doc_id, g.pos AS s, g.pos + {k - 1} AS e
  FROM (
    SELECT doc_id, CAST(i AS INT) AS pos,
           array_to_string(list_slice(l, CAST(i AS INT), CAST(i AS INT) + {k - 1}), ' ') AS gram
    FROM sized, unnest(range(1, n_tokens - {k - 2})) AS t(i)
    WHERE n_tokens >= {k}
  ) g
  JOIN (
    SELECT gram FROM (
      SELECT doc_id, array_to_string(list_slice(l, CAST(i AS INT), CAST(i AS INT) + {k - 1}), ' ') AS gram
      FROM sized, unnest(range(1, n_tokens - {k - 2})) AS t(i)
      WHERE n_tokens >= {k}
    ) GROUP BY gram HAVING count(*) >= 2
  ) d USING (gram)"""


SQL_DUP_NGRAM_SPANS_LADDER = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
sized AS (SELECT doc_id, CAST(len(l) AS INT) AS n_tokens, l FROM toks),
iv AS ({" UNION ALL ".join(_sql_span_rung(k) for k in _SPAN_LADDER)}
),
cov AS (
  SELECT doc_id,
         greatest(0, e - greatest(
           coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
           s - 1)) AS contrib
  FROM iv
),
pd AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS dup_tokens FROM cov GROUP BY 1)
SELECT s.doc_id, s.n_tokens,
       coalesce(pd.dup_tokens, 0) AS dup_tokens,
       round(coalesce(pd.dup_tokens, 0) / greatest(s.n_tokens, 1), 6) AS dup_fraction
FROM sized s LEFT JOIN pd USING (doc_id)
"""


_SUBSTR_L = 40


def q_exact_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-offset duplicated spans (operators/dedup.exact_substring_spans
    — Lee et al. 2022 ExactSubstr removal semantics, VERDICT r6's reserved
    registry slot): per document, the maximal 1-based [span_start,
    span_end) character intervals covered by a 40-char window whose text
    repeats anywhere in the corpus — the literal offsets a curation pass
    cuts, where dup_ngram_spans only reports token-coverage counts.

    Parallelism floor on the input (3.2× at sf0.1): the stride-1 window
    explode is compute-dense (substring + xxhash64 per position) and the
    single-row-group fixture would otherwise run it as ONE task."""
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    return DD.exact_substring_spans(docs, min_len=_SUBSTR_L)


SQL_EXACT_SUBSTRING_SPANS = f"""
WITH base AS (
  SELECT doc_id, text AS t FROM documents WHERE length(text) >= {_SUBSTR_L}
),
wins AS (
  SELECT doc_id, CAST(i AS BIGINT) AS off,
         substring(t, CAST(i AS INT), {_SUBSTR_L}) AS w
  FROM base, unnest(range(1, length(t) - {_SUBSTR_L} + 2)) AS u(i)
),
dup AS (SELECT w FROM wins GROUP BY 1 HAVING count(*) > 1),
marked AS (SELECT doc_id, off FROM wins JOIN dup USING (w)),
brk AS (
  SELECT doc_id, off,
         CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off)
                  <= {_SUBSTR_L}
              THEN 0 ELSE 1 END AS b
  FROM marked
),
grp AS (
  SELECT doc_id, off,
         sum(b) OVER (PARTITION BY doc_id ORDER BY off
                      ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
)
SELECT doc_id,
       min(off) AS span_start,
       max(off) + {_SUBSTR_L} AS span_end,
       max(off) + {_SUBSTR_L} - min(off) AS span_len
FROM grp
GROUP BY doc_id, g
"""


def q_exactsubstr_removal(spark: SparkSession, sf: str) -> DataFrame:
    """ExactSubstr removal MATERIALIZED (operators/dedup.
    exact_substring_removal): the curation pipeline's actual output —
    every document's text with its duplicated spans cut out, plus span /
    kept / removed accounting. Docs without duplicated spans pass through
    verbatim; a fully-duplicated doc keeps ''. The oracle replays the
    whole span pipeline AND the string surgery, so the reconstruction is
    value-checked character-for-character."""
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    return DD.exact_substring_removal(docs, min_len=_SUBSTR_L)


SQL_EXACTSUBSTR_REMOVAL = f"""
WITH base AS (
  SELECT doc_id, text AS t FROM documents WHERE length(text) >= {_SUBSTR_L}
),
wins AS (
  SELECT doc_id, CAST(i AS BIGINT) AS off,
         substring(t, CAST(i AS INT), {_SUBSTR_L}) AS w
  FROM base, unnest(range(1, length(t) - {_SUBSTR_L} + 2)) AS u(i)
),
dup AS (SELECT w FROM wins GROUP BY 1 HAVING count(*) > 1),
marked AS (SELECT doc_id, off FROM wins JOIN dup USING (w)),
brk AS (
  SELECT doc_id, off,
         CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off)
                  <= {_SUBSTR_L}
              THEN 0 ELSE 1 END AS b
  FROM marked
),
grp AS (
  SELECT doc_id, off,
         sum(b) OVER (PARTITION BY doc_id ORDER BY off
                      ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
),
spans AS (
  SELECT doc_id, min(off) AS span_start,
         max(off) + {_SUBSTR_L} AS span_end
  FROM grp GROUP BY doc_id, g
),
gaps AS (
  SELECT doc_id, span_start, span_end,
         lag(span_end, 1, 1) OVER (PARTITION BY doc_id
                                   ORDER BY span_start) AS prev_end
  FROM spans
),
rebuilt AS (
  SELECT g.doc_id,
         string_agg(
           substring(b.t, CAST(g.prev_end AS INT),
                     CAST(g.span_start - g.prev_end AS INT)),
           '' ORDER BY g.span_start)
           || substring(b.t, CAST(max(g.span_end) AS INT),
                        CAST(length(b.t) - max(g.span_end) + 1 AS INT))
           AS clean_text,
         CAST(count(*) AS BIGINT) AS n_spans,
         length(b.t) AS orig_len
  FROM gaps g JOIN base b USING (doc_id)
  GROUP BY g.doc_id, b.t
)
SELECT doc_id, clean_text, n_spans,
       CAST(length(clean_text) AS BIGINT) AS kept_chars,
       CAST(orig_len - length(clean_text) AS BIGINT) AS removed_chars
FROM rebuilt
UNION ALL
SELECT d.doc_id, d.text AS clean_text, CAST(0 AS BIGINT) AS n_spans,
       CAST(length(d.text) AS BIGINT) AS kept_chars,
       CAST(0 AS BIGINT) AS removed_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM rebuilt)
"""


def q_exactsubstr_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-doc attribution for ExactSubstr spans
    (operators/dedup.exact_substring_attribution — VERDICT r7's reserved
    registry slot): each duplicated span from exact_substring_spans paired
    with HOW MANY other documents share its content and the smallest such
    doc_id — the contamination-forensics view (intra-doc repeats report
    n_match_docs = 0 / NULL match). Attribution join runs at
    candidate-set size; exact here (no df-cap) to honor the oracle."""
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    return DD.exact_substring_attribution(docs, min_len=_SUBSTR_L)


SQL_EXACTSUBSTR_ATTRIBUTION = f"""
WITH base AS (
  SELECT doc_id, text AS t FROM documents WHERE length(text) >= {_SUBSTR_L}
),
wins AS (
  SELECT doc_id, CAST(i AS BIGINT) AS off,
         substring(t, CAST(i AS INT), {_SUBSTR_L}) AS w
  FROM base, unnest(range(1, length(t) - {_SUBSTR_L} + 2)) AS u(i)
),
dup AS (SELECT w FROM wins GROUP BY 1 HAVING count(*) > 1),
marked AS MATERIALIZED (
  SELECT doc_id, off, w FROM wins JOIN dup USING (w)
),
grp AS MATERIALIZED (
  SELECT doc_id, off, w,
         sum(b) OVER (PARTITION BY doc_id ORDER BY off
                      ROWS UNBOUNDED PRECEDING) AS g
  FROM (
    SELECT doc_id, off, w,
           CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off)
                    <= {_SUBSTR_L}
                THEN 0 ELSE 1 END AS b
    FROM marked
  )
),
wd AS (SELECT DISTINCT w, doc_id AS match_doc FROM marked),
spans AS (
  SELECT doc_id, g, min(off) AS span_start,
         max(off) + {_SUBSTR_L} AS span_end
  FROM grp GROUP BY doc_id, g
),
m AS (
  SELECT grp.doc_id, grp.g,
         count(DISTINCT wd.match_doc) AS n_match_docs,
         min(wd.match_doc) AS first_match_doc
  FROM grp JOIN wd USING (w)
  WHERE wd.match_doc <> grp.doc_id
  GROUP BY grp.doc_id, grp.g
)
SELECT s.doc_id, s.span_start, s.span_end,
       s.span_end - s.span_start AS span_len,
       CAST(coalesce(m.n_match_docs, 0) AS BIGINT) AS n_match_docs,
       m.first_match_doc
FROM spans s LEFT JOIN m ON s.doc_id = m.doc_id AND s.g = m.g
"""


def q_exactsubstr_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """ExactSubstr duplicate families (operators/dedup.
    exact_substring_clusters — VERDICT r8 #5's reserved registry slot):
    documents transitively connected by shared duplicated 40-char windows,
    labeled with the family min doc_id and the family size. Star edges
    (doc -> per-window min doc) preserve connectivity without a pair
    join; bounded-round label propagation via connected_components."""
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    return DD.exact_substring_clusters(docs, min_len=_SUBSTR_L)


SQL_EXACTSUBSTR_CLUSTERS = f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, text AS t FROM documents WHERE length(text) >= {_SUBSTR_L}
),
wins AS (
  SELECT doc_id, substring(t, CAST(i AS INT), {_SUBSTR_L}) AS w
  FROM base, unnest(range(1, length(t) - {_SUBSTR_L} + 2)) AS u(i)
),
dup AS (SELECT w FROM wins GROUP BY 1 HAVING count(*) > 1),
wd AS MATERIALIZED (
  SELECT DISTINCT w, doc_id FROM wins JOIN dup USING (w)
),
star AS (
  SELECT DISTINCT wr.root AS a, wd.doc_id AS b
  FROM wd JOIN (SELECT w, min(doc_id) AS root FROM wd GROUP BY 1) wr USING (w)
  WHERE wd.doc_id <> wr.root
),
edges AS (SELECT a AS src, b AS dst FROM star UNION SELECT b, a FROM star),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT node AS doc_id, min(r) AS family_id FROM reach GROUP BY node)
SELECT doc_id, family_id,
       CAST(count(*) OVER (PARTITION BY family_id) AS BIGINT) AS family_size
FROM comp
"""



_CLIQUE_K = 2
_CLIQUE_ROUNDS = 3


def q_neardup_cliques(spark: SparkSession, sf: str) -> DataFrame:
    """Mutually-near-duplicate COMMUNITIES: the MinHash-LSH candidate
    pairs (the minhash_near_dups shape, production bucket cap 50) form a
    similarity graph; bounded k-core peeling (operators/graph.kcore_peel,
    k=2, 3 rounds) strips pendant chance-collisions and keeps the dense
    boilerplate/template cliques — the communities a pairwise threshold
    alone can't separate from incidental pairs. Composition of two
    independently-oracled operators; the oracle chains both replays."""
    from sentiment_analysis_bigdata_spark.operators.graph import kcore_peel

    pairs = DD.minhash_near_duplicates(
        _docs(spark, sf),
        threshold=0.5,
        num_hashes=16,
        bands=4,
        max_bucket=50,
    ).select("a", "b")
    return kcore_peel(
        pairs, k=_CLIQUE_K, rounds=_CLIQUE_ROUNDS
    ).orderBy("node")


def _sql_neardup_cliques() -> str:
    # every e{r} is AS MATERIALIZED: DuckDB inlines plain CTEs, and each
    # peel round references its predecessor 3x — without materialization
    # the whole MinHash pipeline would re-evaluate 3^rounds times
    rounds = []
    prev = "e0"
    for r in range(1, _CLIQUE_ROUNDS + 1):
        rounds.append(f"""
kd{r} AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM {prev} UNION ALL SELECT b AS node FROM {prev}
  ) GROUP BY 1
),
kk{r} AS (SELECT node FROM kd{r} WHERE degree >= {_CLIQUE_K}),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN kk{r} ka ON ka.node = e.a
  JOIN kk{r} kb ON kb.node = e.b
)""")
        prev = f"e{r}"
    return f"""
WITH {_sql_minhash_near_dups(bucket_cap=50)},
e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM mpairs WHERE a <> b),
{",".join(rounds)},
last_removed AS (
  SELECT (SELECT count(*) FROM e{_CLIQUE_ROUNDS - 1})
       - (SELECT count(*) FROM e{_CLIQUE_ROUNDS}) AS n
)
SELECT node, degree,
       (SELECT n FROM last_removed) = 0 AS converged
FROM (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM e{_CLIQUE_ROUNDS}
    UNION ALL SELECT b AS node FROM e{_CLIQUE_ROUNDS}
  ) GROUP BY 1
)
ORDER BY node
"""


SQL_NEARDUP_CLIQUES = _sql_neardup_cliques()


def q_dedup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Three-stage dedup pipeline report (exact → MinHash-LSH →
    semantic), keep-first removal policy (operators/dedup.dedup_cascade).
    Stage thresholds match the standalone queries (minhash 0.5 over 16
    hashes / 4 bands; cosine 0.25 over 8 sign bits — see
    q_embedding_near_dup's isotropy note), so the oracle can chain the
    SAME SQL twins over each stage's survivor set and every stage count
    is value-checked end-to-end.

    The LSH stage runs with the production ``max_bucket=50`` guard: the
    synthetic corpus is pathologically self-similar (30-word vocab — the
    majority of ALL pairs clear Jaccard 0.5), so uncapped banding
    degenerates to a near-quadratic candidate set; the cap bounds
    candidates at the documented recall cost (``minhash_recall`` is the
    query that measures exactly that trade)."""
    from sentiment_analysis_bigdata_spark.sources import ensure_min_parallelism

    par = spark.sparkContext.defaultParallelism
    return DD.dedup_cascade(
        ensure_min_parallelism(_docs(spark, sf), par, "doc_id"),
        ensure_min_parallelism(_emb(spark, sf), par, "vec_id"),
        minhash_threshold=0.5,
        num_hashes=16,
        bands=4,
        minhash_max_bucket=50,
        cosine_threshold=0.25,
        n_bits=8,
    )


SQL_DEDUP_CASCADE = f"""
WITH ex AS (
  SELECT * FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY {SQL_FP})
),
{_sql_minhash_near_dups(docs_src="ex", bucket_cap=50)},
mh_removed AS (SELECT DISTINCT b AS doc_id FROM mpairs),
s2 AS (
  SELECT doc_id FROM ex
  WHERE doc_id NOT IN (SELECT doc_id FROM mh_removed)
),
sem_base AS (
  SELECT e.vec_id AS id, e.embedding AS v, {_sql_sign_bucket('e.embedding')} AS bucket
  FROM embeddings e JOIN s2 ON s2.doc_id = e.vec_id
),
sem_pairs AS (
  SELECT l.id AS a, r.id AS b
  FROM sem_base l JOIN sem_base r ON l.bucket = r.bucket AND l.id < r.id
  WHERE {_sql_cosine('l.v', 'r.v')} >= 0.25
),
sem_removed AS (SELECT DISTINCT b AS doc_id FROM sem_pairs),
c AS (
  SELECT (SELECT count(*) FROM documents) AS n0,
         (SELECT count(*) FROM ex) AS n1,
         (SELECT count(*) FROM mh_removed) AS rm2,
         (SELECT count(*) FROM sem_removed) AS rm3
)
SELECT 'exact' AS stage, CAST(1 AS INT) AS stage_order,
       n0 AS n_in, n0 - n1 AS n_removed, n1 AS n_out FROM c
UNION ALL
SELECT 'minhash', CAST(2 AS INT), n1, rm2, n1 - rm2 FROM c
UNION ALL
SELECT 'semantic', CAST(3 AS INT), n1 - rm2, rm3, n1 - rm2 - rm3 FROM c
"""



def q_image_ahash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup via 64-bit average hash
    (operators/multimodal.py ``ahash_64`` — the standard web-scale
    image near-dup primitive): per doc a REAL gradient PNG is
    synthesized with parameters planted from the id (ids congruent mod
    60 produce byte-identical images), decoded, and hashed by 8x8
    block-mean thresholding where every bit is an INTEGER cross-multiply
    (block_sum*region_count > region_sum*block_count) — no float decides
    a bit, so the oracle replays the hash pixel-exactly from the planted
    parameters. Output: the duplicate-cluster report (hash halves,
    cluster size, min doc id).

    100 TB shape: decode+hash is one narrow Arrow pass; the dedup is a
    hash-cardinality aggregation — the image analogue of
    fingerprint_clusters, with hamming-ball expansion (bucketed like
    SimHash) the documented extension for NEAR-dup."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    hashed = MM.ahash_64(MM.attach_gradient_payloads(docs))
    return (
        hashed.groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


SQL_IMAGE_AHASH_DEDUP = """
WITH params AS (
  SELECT doc_id,
         64 + (doc_id % 4) * 16 AS w,
         64 + (doc_id % 3) * 32 AS h,
         1 + doc_id % 3 AS ax,
         2 + doc_id % 5 AS ayy
  FROM documents
),
px AS (
  SELECT p.doc_id,
         (p.ax * ux.x + p.ayy * uy.y) % 256 AS v,
         ux.x // (p.w // 8) AS bx,
         uy.y // (p.h // 8) AS byi
  FROM params p,
       unnest(range(8 * (p.w // 8))) AS ux(x),
       unnest(range(8 * (p.h // 8))) AS uy(y)
),
blocks AS (
  SELECT doc_id, bx, byi, CAST(sum(v) AS BIGINT) AS bsum,
         CAST(count(*) AS BIGINT) AS bcnt
  FROM px GROUP BY 1, 2, 3
),
region AS (
  SELECT doc_id, CAST(sum(v) AS BIGINT) AS rsum,
         CAST(count(*) AS BIGINT) AS rcnt
  FROM px GROUP BY 1
),
bits AS (
  SELECT b.doc_id,
         CAST(sum(CASE WHEN bx + 8 * byi >= 32
                        AND b.bsum * r.rcnt > r.rsum * b.bcnt
                       THEN (1::BIGINT << CAST(bx + 8 * byi - 32 AS INT))
                       ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(sum(CASE WHEN bx + 8 * byi < 32
                        AND b.bsum * r.rcnt > r.rsum * b.bcnt
                       THEN (1::BIGINT << CAST(bx + 8 * byi AS INT))
                       ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM blocks b JOIN region r USING (doc_id)
  GROUP BY 1
)
SELECT ahash_hi, ahash_lo, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc_id
FROM bits GROUP BY 1, 2 HAVING count(*) >= 2
"""


_AHASH_HAM_MAX = 7


def q_image_ahash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """NEAR-duplicate images via hamming-banded aHash — the scale path
    the exact-cluster report documents: each 64-bit hash splits into 8
    bands of 8 bits; any two hashes within hamming distance ≤ 7 share at
    least one intact band (pigeonhole), so a band-bucket equi-join finds
    ALL such pairs with zero false negatives, and the exact
    bit_count(xor) verify prunes the rest. Output is the bounded pair
    HISTOGRAM (n_pairs per hamming distance ≤ 7) — the fixture's planted
    mod-60 parameter classes make identical-hash pairs abundant, and
    near-identical gradients fill the 1..7 shells.

    100 TB shape: bands explode ×8 (constant), the join is an equi join
    on (band_id, band_value) — never all-pairs — and the verify is two
    bit_counts per candidate. The histogram output stays 8 rows at any
    scale; materializing the pairs themselves is the caller's
    (documented) choice."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_lazy

    # barrier the 3-column hash frame (projected FIRST so the persisted
    # blocks never carry the PNG payload): the band self-join consumes it
    # on both sides, and the executed plan otherwise runs the
    # synthesize+decode+hash Arrow kernel once per side (r12 third
    # session; paired prototype 7.2/4.5 -> 4.0/3.2 s with identical rows)
    hashed = barrier_lazy(
        MM.ahash_64(MM.attach_gradient_payloads(docs))
        .filter(F.col("ahash_hi").isNotNull())
        .select("doc_id", "ahash_hi", "ahash_lo")
    )
    bands = hashed.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.expr(
                            f"(ahash_{'hi' if i >= 4 else 'lo'} >> {8 * (i % 4)}) & 255"
                        ).alias("band_val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "ahash_hi", "ahash_lo", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            (
                F.bit_count(
                    F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi"))
                )
                + F.bit_count(
                    F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo"))
                )
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= _AHASH_HAM_MAX)
        .distinct()
    )
    return cand.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


SQL_IMAGE_AHASH_NEAR_DUP = SQL_IMAGE_AHASH_DEDUP[
    : SQL_IMAGE_AHASH_DEDUP.index("SELECT ahash_hi")
] + f"""
, hashes AS (SELECT doc_id, ahash_hi, ahash_lo FROM bits),
bands AS (
  SELECT doc_id, ahash_hi, ahash_lo, bi.i AS band_id,
         CASE WHEN bi.i >= 4
              THEN (ahash_hi >> CAST(8 * (bi.i % 4) AS INT)) & 255
              ELSE (ahash_lo >> CAST(8 * (bi.i % 4) AS INT)) & 255 END AS band_val
  FROM hashes, unnest(range(8)) AS bi(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
         bit_count(xor(a.ahash_hi, b.ahash_hi))
           + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS hamming
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM cand WHERE hamming <= {_AHASH_HAM_MAX}
GROUP BY hamming
"""

def _cosine_col(a, b):
    """Cosine of two float-array columns, all higher-order expressions
    (zip_with dot product + per-side norms) — JVM-side, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return F.when(na * nb > 0, dot / (na * nb)).otherwise(F.lit(0.0))


# Deterministic md5-shard count for embedding_alignment's two lead()
# pairings. 64 bounds every window partition to ~n/64 rows at any scale;
# a real cluster would raise it to >= total cores so each shard is one
# task's worth of sort.
ALIGN_SHARDS = 64


def q_embedding_alignment(spark: SparkSession, sf: str) -> DataFrame:
    """Alignment & uniformity of the embedding space (Wang & Isola 2020,
    arXiv:2005.10242) — the two-number health check of a contrastive
    embedding model: alignment = E‖u−v‖² over positive pairs (same
    label; lower = positives sit together), uniformity =
    ln E exp(−2‖u−v‖²) over random pairs (lower = mass spreads over the
    sphere; a collapsed space scores near 0). On unit vectors
    ‖u−v‖² = 2−2cos, so both reduce to the same JVM-side cosine.

    Pairing is deterministic and O(n) — each vector pairs with the NEXT
    vector of its label (alignment) and the next vector in
    content-addressed md5 order (uniformity), one lead() window each —
    never the O(n²) expectation the definitions literally state, which
    is the difference between a metric and a job that cannot finish at
    100 TB. Both lead() windows are PARTITIONED by a deterministic
    md5 shard of vec_id (``ALIGN_SHARDS`` = 64; raise it on a real
    cluster so each shard fits one task): an unpartitioned — or
    label-partitioned, with two labels — window would single-partition
    the whole embedding table at 100 TB. Each shard (and each
    (label, shard) group) forfeits its last vector's pair, which only
    thins the sampled expectation. The oracle replays both shardings
    exactly."""
    from pyspark.sql.window import Window

    emb = _emb(spark, sf)
    hkey = H.md5_hash64(F.col("vec_id").cast("string"))
    sharded = emb.select(
        "label", "vec_id", "embedding", (hkey % ALIGN_SHARDS).alias("shard"), hkey.alias("hkey")
    )
    w_pos = Window.partitionBy("label", "shard").orderBy("vec_id")
    pos = (
        sharded.withColumn("nxt", F.lead("embedding").over(w_pos))
        .filter(F.col("nxt").isNotNull())
        .select(_cosine_col(F.col("embedding"), F.col("nxt")).alias("cos"))
        .agg(
            F.count(F.lit(1)).alias("n_pos_pairs"),
            F.round(F.avg(2.0 - 2.0 * F.col("cos")), 6).alias("alignment"),
        )
    )
    w_rnd = Window.partitionBy("shard").orderBy(F.col("hkey").asc(), F.col("vec_id").asc())
    rnd = (
        sharded.withColumn("nxt", F.lead("embedding").over(w_rnd))
        .filter(F.col("nxt").isNotNull())
        .select(_cosine_col(F.col("embedding"), F.col("nxt")).alias("cos"))
        .agg(
            F.count(F.lit(1)).alias("n_rand_pairs"),
            F.round(
                F.log(F.avg(F.exp(-2.0 * (2.0 - 2.0 * F.col("cos"))))), 6
            ).alias("uniformity"),
        )
    )
    return pos.crossJoin(F.broadcast(rnd))


SQL_EMBEDDING_ALIGNMENT = f"""
WITH sharded AS (
  SELECT label, vec_id, embedding,
         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hkey
  FROM embeddings
),
pos AS (
  SELECT embedding AS a,
         lead(embedding) OVER (PARTITION BY label, hkey % {ALIGN_SHARDS} ORDER BY vec_id) AS b
  FROM sharded
),
posn AS (SELECT {_sql_cosine('a', 'b')} AS cos FROM pos WHERE b IS NOT NULL),
rnd AS (
  SELECT embedding AS a,
         lead(embedding) OVER (PARTITION BY hkey % {ALIGN_SHARDS} ORDER BY hkey, vec_id) AS b
  FROM sharded
),
rndn AS (SELECT {_sql_cosine('a', 'b')} AS cos FROM rnd WHERE b IS NOT NULL)
SELECT (SELECT count(*) FROM posn) AS n_pos_pairs,
       (SELECT round(avg(2 - 2 * cos), 6) FROM posn) AS alignment,
       (SELECT count(*) FROM rndn) AS n_rand_pairs,
       (SELECT round(ln(avg(exp(-2 * (2 - 2 * cos)))), 6) FROM rndn) AS uniformity
"""


SWEEP_T_FLOOR = 0.5


def q_jaccard_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup threshold sweep — the curve a curation team reads BEFORE
    committing to a near-dup threshold: one exact PPJoin pass at the
    floor t=0.5 enumerates every pair any candidate threshold could
    use, then each threshold in {0.50, 0.55, …, 1.00} reports its
    surviving pair count, how many documents min-id survivorship would
    remove, and the corpus dedup rate. Choosing t by re-running the
    join per threshold is 11 corpus joins; this is ONE (the pair set is
    filtered 11 ways against a broadcast 11-row edge frame), which is
    the only affordable shape when the join input is 100 TB."""
    docs = _docs(spark, sf)
    pairs = DD.prefix_filtered_jaccard_pairs(docs, SWEEP_T_FLOOR)
    edges = spark.createDataFrame(
        [(t / 100.0,) for t in range(50, 105, 5)], "threshold double"
    )
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        pairs.crossJoin(F.broadcast(edges))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("b").alias("n_docs_removed"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "threshold",
            "n_pairs",
            "n_docs_removed",
            F.round(F.col("n_docs_removed") / F.col("n_docs").cast("double"), 6).alias(
                "dedup_rate"
            ),
        )
        .orderBy("threshold")
    )


SQL_JACCARD_THRESHOLD_SWEEP = f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_distinct({{toks}})) AS token FROM documents
),
dfreq AS (SELECT token, count(*) AS df FROM toks GROUP BY 1),
rnk AS (
  SELECT token, CAST(row_number() OVER (ORDER BY df ASC, token ASC) AS INT) AS rank
  FROM dfreq
),
ranked AS (SELECT doc, rank FROM toks JOIN rnk USING (token)),
sets AS (SELECT doc, list_sort(list(rank)) AS ranks FROM ranked GROUP BY 1),
pre AS (
  SELECT doc, ranks,
         list_slice(ranks, 1,
                    len(ranks) - CAST(ceil(len(ranks) * CAST({SWEEP_T_FLOOR} AS DOUBLE)) AS INT) + 1)
           AS prefix
  FROM sets
),
postings AS (SELECT doc, unnest(prefix) AS rank FROM pre),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM postings x JOIN postings y ON x.rank = y.rank AND x.doc < y.doc
),
verified AS (
  SELECT c.a, c.b,
         round(CAST(len(list_intersect(sa.ranks, sb.ranks)) AS DOUBLE)
               / (len(sa.ranks) + len(sb.ranks)
                  - len(list_intersect(sa.ranks, sb.ranks))), 6) AS jaccard
  FROM cand c
  JOIN sets sa ON sa.doc = c.a
  JOIN sets sb ON sb.doc = c.b
  WHERE round(CAST(len(list_intersect(sa.ranks, sb.ranks)) AS DOUBLE)
              / (len(sa.ranks) + len(sb.ranks)
                 - len(list_intersect(sa.ranks, sb.ranks))), 6)
        >= CAST({SWEEP_T_FLOOR} AS DOUBLE)
),
edges_t AS (SELECT CAST(unnest([0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0]) AS DOUBLE) AS threshold),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT threshold, count(*) AS n_pairs,
       count(DISTINCT b) AS n_docs_removed,
       round(count(DISTINCT b) / CAST(any_value(n_docs) AS DOUBLE), 6) AS dedup_rate
FROM verified CROSS JOIN edges_t CROSS JOIN nd
WHERE jaccard >= threshold
GROUP BY threshold
ORDER BY threshold
""".replace("{toks}", SQL_TOKS)


def q_audio_peak_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Frequency analysis over real PCM audio bytes
    (operators/multimodal.py ``audio_peak_bin``): per document a planted
    512-sample pure tone at DFT bin k = 1 + doc_id mod 200 is
    synthesized, round-tripped through RIFF bytes, and recovered by an
    rFFT-magnitude argmax — the tone/hum/DTMF detection step of an
    audio-curation pipeline. Because the tone sits exactly on the DFT
    grid, the peak bin is a CLOSED-FORM function of the id, so the
    oracle verifies a Fourier analysis without running one; the derived
    frequency k·rate/N is the same double arithmetic on both engines."""
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = MM.attach_tone_payloads(
        ensure_min_parallelism(
            _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
        )
    )
    out = MM.audio_peak_bin(docs)
    return out.select(
        "doc_id",
        "peak_bin",
        "n_samples",
        F.round(
            F.col("peak_bin") * F.col("sample_rate") / F.col("n_samples").cast("double"),
            6,
        ).alias("peak_freq_hz"),
    )


SQL_AUDIO_PEAK_FREQ = """
SELECT doc_id,
       CAST(1 + doc_id % 200 AS INTEGER) AS peak_bin,
       512 AS n_samples,
       round((1 + doc_id % 200) * 8000 / CAST(512 AS DOUBLE), 6) AS peak_freq_hz
FROM documents
"""


def q_bagofwords_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Bag-of-words (order-insensitive) exact dedup: the fingerprint is
    the md5 of the SORTED DISTINCT token set, so documents that differ
    only by word order or repetition collapse into one group — the
    dedup rung between byte-exact fingerprinting (misses any reorder)
    and MinHash (pays the approximate machinery for what is here an
    exact question). One narrow per-row expression (sort + join + md5,
    all JVM-side) and one fingerprint-keyed count; reports each
    multi-document group with its min-id survivor and size."""
    docs = _docs(spark, sf)
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(TXT.tokenize_nonempty("text"))), " ")
    )
    groups = (
        docs.select("doc_id", fp.alias("bag_fp"))
        .groupBy("bag_fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("survivor_id"),
        )
        .filter(F.col("group_size") >= 2)
    )
    return groups.select("bag_fp", "survivor_id", "group_size").orderBy("bag_fp")


SQL_BAGOFWORDS_DEDUP = f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({SQL_TOKS})), ' ')) AS bag_fp
  FROM documents
)
SELECT bag_fp, min(doc_id) AS survivor_id, count(*) AS group_size
FROM fp GROUP BY 1 HAVING count(*) >= 2
ORDER BY bag_fp
"""


QUERIES = {
    "image_ahash_near_dup": (q_image_ahash_near_dup, SQL_IMAGE_AHASH_NEAR_DUP),
    "embedding_alignment": (q_embedding_alignment, SQL_EMBEDDING_ALIGNMENT),
    "jaccard_threshold_sweep": (q_jaccard_threshold_sweep, SQL_JACCARD_THRESHOLD_SWEEP),
    "audio_peak_freq": (q_audio_peak_freq, SQL_AUDIO_PEAK_FREQ),
    "bagofwords_dedup": (q_bagofwords_dedup, SQL_BAGOFWORDS_DEDUP),
    "image_ahash_dedup": (q_image_ahash_dedup, SQL_IMAGE_AHASH_DEDUP),
    "dedup_cascade": (q_dedup_cascade, SQL_DEDUP_CASCADE),
    "dup_ngram_spans": (q_dup_ngram_spans, SQL_DUP_NGRAM_SPANS),
    "exact_substring_spans": (q_exact_substring_spans, SQL_EXACT_SUBSTRING_SPANS),
    "exactsubstr_attribution": (
        q_exactsubstr_attribution,
        SQL_EXACTSUBSTR_ATTRIBUTION,
    ),
    "exactsubstr_removal": (q_exactsubstr_removal, SQL_EXACTSUBSTR_REMOVAL),
    "exactsubstr_clusters": (q_exactsubstr_clusters, SQL_EXACTSUBSTR_CLUSTERS),
    "dup_ngram_spans_ladder": (
        q_dup_ngram_spans_ladder,
        SQL_DUP_NGRAM_SPANS_LADDER,
    ),
    "minhash_recall": (q_minhash_recall, SQL_MINHASH_RECALL),
    "contamination_check": (q_contamination_check, SQL_CONTAMINATION_CHECK),
    "embedding_pca": (q_embedding_pca, SQL_EMBEDDING_PCA),
    "intradoc_dedup": (q_intradoc_dedup, SQL_INTRADOC_DEDUP),
    "crossdoc_dedup": (q_crossdoc_dedup, SQL_CROSSDOC_DEDUP),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "simhash_signatures": (q_simhash, SQL_SIMHASH),
    "simhash_weighted": (q_simhash_weighted, SQL_SIMHASH_WEIGHTED),
    "ngram_jaccard_adjacent": (q_ngram_jaccard_adjacent, SQL_NGRAM_JACCARD_ADJACENT),
    "fuzzy_part_names": (q_fuzzy_part_names, SQL_FUZZY_PART_NAMES),
    "ppjoin_pairs": (q_ppjoin_pairs, SQL_PPJOIN_PAIRS),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "dedup_components_star": (q_dedup_components_star, SQL_DEDUP_COMPONENTS),
    "ann_bruteforce": (q_ann_bruteforce, SQL_ANN_BRUTEFORCE),
    "ann_lsh": (q_ann_lsh, SQL_ANN_LSH),
    "ann_recall": (q_ann_recall, SQL_ANN_RECALL),
    "matryoshka_recall": (q_matryoshka_recall, SQL_MATRYOSHKA_RECALL),
    "retrieval_metrics": (q_retrieval_metrics, SQL_RETRIEVAL_METRICS),
    "minhash_near_dups": (q_minhash_near_dups, SQL_MINHASH_NEAR_DUPS),
    "simhash_near_dups": (q_simhash_near_dups, SQL_SIMHASH_NEAR_DUPS),
    "hashing_tf": (q_hashing_tf, _sql_hashing_tf(11695, 3796098974, 251817)),
    "ann_ivf": (q_ann_ivf, SQL_ANN_BRUTEFORCE),
    "ann_ivf_index": (q_ann_ivf_index, SQL_ANN_BRUTEFORCE),
    "ann_ivf_append": (q_ann_ivf_append, SQL_ANN_BRUTEFORCE),
    "ann_gemm": (q_ann_gemm, SQL_ANN_BRUTEFORCE),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "multimodal_audio": (q_multimodal_audio, SQL_MULTIMODAL_AUDIO),
    "multimodal_jpeg": (q_multimodal_jpeg, SQL_MULTIMODAL_JPEG),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "ann_pq": (q_ann_pq, SQL_ANN_PQ),
    "ann_ivfpq": (q_ann_ivfpq, SQL_ANN_IVFPQ),
    "ann_pq_recall": (q_ann_pq_recall, SQL_ANN_PQ_RECALL),
    "ann_sq8": (q_ann_sq8, SQL_ANN_SQ8),
    "ann_sq8_recall": (q_ann_sq8_recall, SQL_ANN_SQ8_RECALL),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "neardup_cliques": (q_neardup_cliques, SQL_NEARDUP_CLIQUES),
    "leakage_safe_split": (q_leakage_safe_split, SQL_LEAKAGE_SAFE_SPLIT),
    "winnow_overlap": (q_winnow_overlap, SQL_WINNOW_OVERLAP),
}
