"""Text-operator queries (SURVEY §2.2 F1-F8, §2.6 M1-M6 oracle twins, plus
north-star text analysis) over the ``documents`` table, each with a DuckDB
oracle that reimplements the identical semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import hashing as HH
from sentiment_analysis_bigdata_spark.functions import text as TXT
from sentiment_analysis_bigdata_spark.operators import affinity as AFF
from sentiment_analysis_bigdata_spark.operators import dedup as DD
from sentiment_analysis_bigdata_spark.operators import features as FE
from sentiment_analysis_bigdata_spark.sources import ensure_min_parallelism, load_table

# SQL fragments shared by the oracles -----------------------------------------

# tokenize_nonempty(text): lowercase, split \s+, drop empties
SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def _sql_stoplist() -> str:
    words = ", ".join("'" + w.replace("'", "''") + "'" for w in TXT.ENGLISH_STOPWORDS)
    return f"[{words}]"


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


# --- F1-F8: the clean chain ---------------------------------------------------

def q_clean_documents(spark: SparkSession, sf: str) -> DataFrame:
    return _docs(spark, sf).select("doc_id", TXT.clean_text("text").alias("clean_text"))


SQL_CLEAN_DOCUMENTS = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(text),
           '@[A-Za-z0-9_]+', '', 'g'),
           'https?://\S+', '', 'g'),
           '#', '', 'g'),
           '[^a-zA-Z\s]', ' ', 'g'),
           '\s+', ' ', 'g')) AS clean_text
FROM documents
"""


# --- M1: tokenize + explode + count (the flagship shape) ----------------------

def q_token_topk(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return (
        docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


SQL_TOKEN_TOPK = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


# --- M2: stopword removal ------------------------------------------------------

def q_token_topk_nostop(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-filtered token top-k.

    Scale-chosen plan: explode first, then a broadcast LEFT ANTI join
    against the 181-row stopword table — a hash probe per token. The
    array-level ``remove_stopwords`` (linear scan of the literal list per
    token, used where ML-stage parity matters) produces identical results
    but benches slower and compiles a much larger codegen unit.
    """
    docs = _docs(spark, sf)
    stopwords = spark.createDataFrame(
        [(w,) for w in TXT.ENGLISH_STOPWORDS], "token string"
    )
    return (
        docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
        .join(F.broadcast(stopwords), "token", "left_anti")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


SQL_TOKEN_TOPK_NOSTOP = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest(list_filter({SQL_TOKS}, t -> NOT list_contains({_sql_stoplist()}, t))) AS token
      FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


# --- M5: n-grams -----------------------------------------------------------------

def q_bigram_topk(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    grams = TXT.ngrams(TXT.tokenize_nonempty("text"), 2)
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


SQL_BIGRAM_TOPK = f"""
WITH toks AS (SELECT {SQL_TOKS} AS l FROM documents)
SELECT bigram, count(*) AS n
FROM (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bigram
      FROM toks WHERE len(l) >= 2)
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


# --- M4: document frequency + IDF -------------------------------------------------

def q_doc_frequency_idf(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    out = FE.idf_weights(docs, min_doc_freq=5)
    return out.select("term", "df", F.round("idf", 6).alias("idf"))


SQL_DOC_FREQUENCY_IDF = f"""
WITH doc_terms AS (
  SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS term FROM documents
),
dfreq AS (SELECT term, count(*) AS df FROM doc_terms GROUP BY term),
m AS (SELECT count(*) AS m FROM documents)
SELECT term, df,
       round(CASE WHEN df >= 5 THEN ln((m + 1.0) / (df + 1.0)) ELSE 0.0 END, 6) AS idf
FROM dfreq, m
"""


# --- M3×M4: TF-IDF long form --------------------------------------------------------

def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    out = FE.tf_idf(docs, min_doc_freq=5)
    return (
        out.select("doc_id", "term", "tf", F.round("tf_idf", 6).alias("tf_idf"))
        .orderBy(F.col("tf_idf").desc(), F.col("doc_id").asc(), F.col("term").asc())
        .limit(50)
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(l) AS term FROM toks)
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(l)) AS term FROM toks)
  GROUP BY term
),
m AS (SELECT count(*) AS m FROM documents)
SELECT doc_id, term, tf,
       round(tf * (CASE WHEN df >= 5 THEN ln((m + 1.0) / (df + 1.0)) ELSE 0.0 END), 6) AS tf_idf
FROM tf JOIN dfreq USING (term), m
ORDER BY tf_idf DESC, doc_id ASC, term ASC
LIMIT 50
"""


# --- M6: CountVectorizer vocabulary ----------------------------------------------------

def q_countvec_vocab(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    vocab = FE.count_vectorizer_vocab(docs, vocab_size=100, min_df=5)
    return vocab.select("term", F.col("index").cast("int").alias("index"), "total", "df")


SQL_COUNTVEC_VOCAB = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
counts AS (
  SELECT term, count(*) AS total
  FROM (SELECT unnest(l) AS term FROM toks) GROUP BY term
),
dfreq AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(l)) AS term FROM toks) GROUP BY term
)
SELECT term, CAST(row_number() OVER (ORDER BY total DESC, term ASC) - 1 AS INTEGER) AS index,
       total, df
FROM counts JOIN dfreq USING (term)
WHERE df >= 5
ORDER BY total DESC, term ASC
LIMIT 100
"""


# --- text analysis: counting / quality / lang-id / stats ---------------------------------

def q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return docs.select(
        "doc_id",
        TXT.token_count("text").alias("n_tokens"),
        TXT.word_like_token_count("text").alias("n_bpeish"),
    )


SQL_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish
FROM documents
"""


def q_doc_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc mean unigram log-probability against the corpus's own LM
    (operators/features.py unigram_logprob_scores — CCNet-style fluency
    proxy). One LM aggregation + one term join (AQE-planned, no forced
    broadcast) + one per-doc fold."""
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    return FE.unigram_logprob_scores(docs)


SQL_DOC_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
),
lm AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM lm)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(ln(CAST(cnt AS DOUBLE) / t)), 6) AS avg_logprob
FROM toks JOIN lm USING (term) CROSS JOIN total
GROUP BY doc_id
"""


def q_hashed_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-free signed-feature-hash text embeddings, long form
    (operators/features.hashed_embedding_long) — the engine-native text→
    vector bridge; the oracle replays the md5 bucket/sign arithmetic
    bit-for-bit."""
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    return FE.hashed_embedding_long(docs, "doc_id", "tokens", dim=16).select(
        F.col("id").alias("doc_id"), "dim_idx", "value"
    )


SQL_HASHED_EMBEDDINGS = f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS t FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h FROM toks)
SELECT doc_id,
       CAST(h % 16 AS INT) AS dim_idx,
       CAST(sum(CASE WHEN (h >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS value
FROM h
GROUP BY 1, 2
"""


def q_corpus_filter_report(spark: SparkSession, sf: str) -> DataFrame:
    """Composed Gopher/C4-style corpus filter gate (Rae et al. 2021
    §A1.1 flavor, over this engine's own signals): five keep rules —
    length ≥ 50 chars, lang-id 'en', quality ≥ 0.5, 3-gram repetition
    ≤ 0.2, exact-dedup survivor — reported as per-rule pass/fail counts
    and the final all-rules keep count. This is the decision report a
    curation run publishes before materializing the filtered corpus;
    every count is value-checked by chaining the individual rules' SQL
    twins. Rule thresholds compare the ROUNDED scores on both engines
    (cross-engine float-safe cuts).

    The dedup-survivor flag is ``groupBy(fingerprint).agg(min(doc_id))``
    (map-side partial — a mega-duplicated boilerplate/empty document
    cannot concentrate its cluster into one task the way the
    ``min(doc_id) OVER (PARTITION BY fingerprint)`` window it replaces
    did, VERDICT r11 #1), and since doc_id is unique, a row is its
    group's survivor iff its doc_id appears in the first-doc frame — a
    UNIFORM-key left join on doc_id, never a fingerprint-keyed join
    back. The four score rules fold into one aggregation pass over the
    joined scan."""
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    firsts = (
        docs.select(TXT.fingerprint("text").alias("__fp"), "doc_id")
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("__first"))
    )
    flags = docs.join(firsts, "doc_id", "left").select(
        (F.length("text") >= 50).alias("r_len"),
        (TXT.lang_id("text") == "en").alias("r_lang"),
        (
            F.round(TXT.quality_score("text") * 10000).cast("bigint") >= 5000
        ).alias("r_quality"),
        (F.round(TXT.repetition_ratio("text"), 6) <= 0.2).alias("r_rep"),
        F.coalesce(F.col("__first"), F.lit(False)).alias("r_dedup"),
    )
    rules = ["r_len", "r_lang", "r_quality", "r_rep", "r_dedup"]
    agg = flags.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.col(r).cast("bigint")).alias(f"_p_{r}") for r in rules],
        F.sum(
            F.expr(" AND ".join(rules)).cast("bigint")
        ).alias("_p_all"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("rule"),
                F.col(f"_p_{r}").alias("n_pass"),
                (F.col("_n") - F.col(f"_p_{r}")).alias("n_fail"),
            )
            for r in rules
        ],
        F.struct(
            F.lit("keep_all").alias("rule"),
            F.col("_p_all").alias("n_pass"),
            (F.col("_n") - F.col("_p_all")).alias("n_fail"),
        ),
    )
    return agg.select(F.explode(rows).alias("s")).select("s.*")


def _sql_corpus_filter_report() -> str:
    return f"""
WITH q AS ({SQL_TEXT_QUALITY}),
lg AS ({SQL_LANG_ID}),
rp AS ({SQL_REPETITION_RATIO}),
dups AS (
  SELECT doc_id,
         doc_id = min(doc_id) OVER (PARTITION BY {SQL_FP}) AS r_dedup
  FROM documents
),
flags AS (
  SELECT d.doc_id,
         length(d.text) >= 50 AS r_len,
         lg.lang_guess = 'en' AS r_lang,
         q.quality_bp >= 5000 AS r_quality,
         rp.rep3 <= 0.2 AS r_rep,
         dups.r_dedup
  FROM documents d
  JOIN q USING (doc_id) JOIN lg USING (doc_id)
  JOIN rp USING (doc_id) JOIN dups USING (doc_id)
),
c AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS p_len,
         CAST(sum(CASE WHEN r_lang THEN 1 ELSE 0 END) AS BIGINT) AS p_lang,
         CAST(sum(CASE WHEN r_quality THEN 1 ELSE 0 END) AS BIGINT) AS p_quality,
         CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS p_rep,
         CAST(sum(CASE WHEN r_dedup THEN 1 ELSE 0 END) AS BIGINT) AS p_dedup,
         CAST(sum(CASE WHEN r_len AND r_lang AND r_quality AND r_rep AND r_dedup
                  THEN 1 ELSE 0 END) AS BIGINT) AS p_all
  FROM flags
)
SELECT 'r_len' AS rule, p_len AS n_pass, n - p_len AS n_fail FROM c
UNION ALL SELECT 'r_lang', p_lang, n - p_lang FROM c
UNION ALL SELECT 'r_quality', p_quality, n - p_quality FROM c
UNION ALL SELECT 'r_rep', p_rep, n - p_rep FROM c
UNION ALL SELECT 'r_dedup', p_dedup, n - p_dedup FROM c
UNION ALL SELECT 'keep_all', p_all, n - p_all FROM c
"""


def q_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc mean add-one-smoothed bigram log-probability against the
    corpus's own bigram LM (operators/features.bigram_logprob_scores) —
    the word-order-sensitive quality score one rung above
    ``doc_logprob``."""
    docs = _docs(spark, sf).select(
        "doc_id", TXT.tokenize_nonempty("text").alias("tokens")
    )
    return FE.bigram_logprob_scores(docs)


SQL_BIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKS} AS l FROM documents
),
bg AS (
  SELECT doc_id, l[CAST(i AS INT)] AS a, l[CAST(i AS INT) + 1] AS b
  FROM toks, unnest(range(1, len(l))) AS t(i)
),
m AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
ctx AS (SELECT a, count(*) AS c_a FROM bg GROUP BY 1),
v AS (
  SELECT count(DISTINCT term) AS vs
  FROM (SELECT unnest({SQL_TOKS}) AS term FROM documents)
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(ln((c_ab + 1.0) / (c_a + vs))), 6) AS avg_logprob
FROM bg JOIN m USING (a, b) JOIN ctx USING (a) CROSS JOIN v
GROUP BY doc_id
"""


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    # regex-dense narrow projection: floor the scan parallelism (the
    # single-row-group fixture otherwise runs it on one core; no-op at scale)
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    # integer ten-thousandths, not round(double, 4): both engines compute
    # bit-identical score doubles, but rounding-to-DOUBLE takes different
    # paths (Spark BigDecimal HALF_UP on the shortest decimal repr vs
    # DuckDB binary rounding) and diverged in the 4th decimal on two sf0.1
    # docs. round-to-INTEGER agrees in both engines (x.5 is dyadic, both
    # round it away from zero) — the same convention as money cents.
    return docs.select(
        "doc_id",
        F.round(TXT.quality_score("text") * 10000).cast("bigint").alias("quality_bp"),
    )


SQL_TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha,
         {SQL_TOKS} AS toks
  FROM documents
)
SELECT doc_id,
       CAST(round((
         0.4 * least(n / 200.0, 1.0)
         + 0.3 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
         + 0.3 * (CASE WHEN len(toks) > 0
                       THEN least(CAST(len(list_filter(toks, t -> list_contains({_sql_stoplist()}, t))) AS DOUBLE)
                                  / len(toks) * 3.0, 1.0)
                       ELSE 0.0 END)) * 10000) AS BIGINT) AS quality_bp
FROM base
"""


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    return docs.select("doc_id", TXT.lang_id("text").alias("lang_guess"))


def _sql_lang_markers(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TXT._LANG_MARKERS[lang])
    return f"[{words}]"


SQL_LANG_ID = f"""
WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
scores AS (
  SELECT doc_id,
         unnest(['de', 'en', 'es', 'fr', 'zh']) AS lang2,
         unnest([
           len(list_filter(toks, t -> list_contains({_sql_lang_markers('de')}, t))),
           len(list_filter(toks, t -> list_contains({_sql_lang_markers('en')}, t))),
           len(list_filter(toks, t -> list_contains({_sql_lang_markers('es')}, t))),
           len(list_filter(toks, t -> list_contains({_sql_lang_markers('fr')}, t))),
           len(list_filter(toks, t -> list_contains({_sql_lang_markers('zh')}, t)))
         ]) AS hits
  FROM base
),
ranked AS (
  SELECT doc_id, lang2, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang2 ASC) AS rn
  FROM scores
)
SELECT doc_id, CASE WHEN hits > 0 THEN lang2 ELSE 'und' END AS lang_guess
FROM ranked WHERE rn = 1
"""


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A4 distributed re-expression: per-language length stats."""
    docs = _docs(spark, sf)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text")), 6).alias("avg_len"),
        F.min(F.length("text")).cast("int").alias("min_len"),
        F.max(F.length("text")).cast("int").alias("max_len"),
    )


SQL_TEXT_STATS = """
SELECT lang, count(*) AS n_docs,
       round(avg(length(text)), 6) AS avg_len,
       CAST(min(length(text)) AS INTEGER) AS min_len,
       CAST(max(length(text)) AS INTEGER) AS max_len
FROM documents
GROUP BY lang
"""


def q_label_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2 shape: group-by count over a categorical column."""
    docs = _docs(spark, sf)
    return docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


SQL_LABEL_DISTRIBUTION = "SELECT source, count(*) AS n FROM documents GROUP BY source"


# --- fingerprint / exact dedup ----------------------------------------------------------

def q_fingerprint_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # min_cluster_size=1: the synthetic corpus has no exact duplicates at
    # small sf, so the >1 filter would pass vacuously (0 rows on both
    # engines); singletons make the oracle actually check the fingerprint.
    return DD.duplicate_clusters(_docs(spark, sf), min_cluster_size=1)


SQL_FP = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"

SQL_FINGERPRINT_CLUSTERS = f"""
SELECT {SQL_FP} AS fingerprint, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
"""


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return DD.exact_dedup(_docs(spark, sf)).select("doc_id", "lang", "source")


SQL_DEDUP_EXACT = f"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents GROUP BY {SQL_FP}
)
"""


def q_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware exact dedup (operators/dedup.py
    ``exact_dedup_keep_best``): per fingerprint cluster the survivor is
    argmax(raw length, tie → min doc_id) — "keep the most complete
    capture", the survivor rule production crawls actually use (min-id
    keeps whichever copy was crawled first, including truncated ones).
    The score is an INTEGER (raw char length), so the argmax never rides
    a float comparison; the oracle replays the same (score desc, id asc)
    selection as a per-fingerprint rank-1 window."""
    survivors = DD.exact_dedup_keep_best(
        _docs(spark, sf), F.length("text"), text_col="text", id_col="doc_id"
    )
    return survivors.select(
        "doc_id", "source", F.length("text").cast("long").alias("n_raw_chars")
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH ranked AS (
  SELECT doc_id,
         row_number() OVER (
           PARTITION BY {SQL_FP}
           ORDER BY length(text) DESC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT d.doc_id, d.source, CAST(length(d.text) AS BIGINT) AS n_raw_chars
FROM documents d JOIN (SELECT doc_id FROM ranked WHERE rn = 1) b USING (doc_id)
"""


# --- multimodal payload stats (binary column plumbing) -----------------------------------

def q_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of text lengths — the distributed data source
    for the reference's driver-side histogram/boxplot charts
    (reference preprocessing.py:72-84,125-145): bin = floor(len/50)*50."""
    docs = _docs(spark, sf)
    bin_ = (F.floor(F.length("text") / 50) * 50).cast("bigint")
    return (
        docs.groupBy(bin_.alias("len_bin"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_LENGTH_HISTOGRAM = """
SELECT CAST(floor(length(text) / 50) * 50 AS BIGINT) AS len_bin, count(*) AS n_docs
FROM documents
GROUP BY 1
"""


def q_rolling_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint per document (order-sensitive)."""
    docs = _docs(spark, sf)
    return docs.select("doc_id", TXT.rolling_hash("text").alias("rhash"))


SQL_ROLLING_FINGERPRINT = """
WITH chars AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS codes
  FROM documents
)
SELECT doc_id,
       CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                                 (h, c) -> (h * 131 + c) % 2147483647), 0) AS BIGINT) AS rhash
FROM chars
"""


def q_approx_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based aggregates (HLL count-distinct, KLL-ish percentile).

    The estimates themselves are implementation-specific, so the oracle
    checks BOUNDS: the query emits the exact values (SQL-recomputable) plus
    booleans asserting each sketch landed within its error band — HLL within
    ±10% (default rsd 5%, so 2σ) and the approx median between the exact
    45th/55th percentiles (accuracy 1000 ⇒ rank error ≲ n/1000). The oracle
    recomputes the exact values and expects every bound check TRUE."""
    li = load_table(spark, sf, "lineitem")
    raw = li.agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_suppkey").alias("asup"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("amed"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.expr("percentile(l_extendedprice, 0.45D)").alias("p45"),
        F.expr("percentile(l_extendedprice, 0.55D)").alias("p55"),
    )
    return raw.select(
        "exact_parts",
        "exact_suppliers",
        (F.abs(F.col("ap") - F.col("exact_parts")) <= 0.10 * F.col("exact_parts")).alias(
            "parts_within_10pct"
        ),
        (F.abs(F.col("asup") - F.col("exact_suppliers")) <= 0.10 * F.col("exact_suppliers")).alias(
            "suppliers_within_10pct"
        ),
        ((F.col("amed") >= F.col("p45")) & (F.col("amed") <= F.col("p55"))).alias(
            "median_within_decile"
        ),
    )


SQL_APPROX_AGGREGATES = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       TRUE AS parts_within_10pct,
       TRUE AS suppliers_within_10pct,
       TRUE AS median_within_decile
FROM lineitem
"""


def q_corpus_health(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus health report — the dashboard aggregation a data
    curator runs before training: volume, token mass, mean quality score,
    English share, mean repetition. One pass, one shuffle (the groupBy);
    every per-doc signal is a narrow expression."""
    docs = _docs(spark, sf)
    enriched = docs.select(
        "source",
        F.size(TXT.tokenize_nonempty("text")).cast("bigint").alias("n_toks"),
        TXT.quality_score("text").alias("q"),
        (TXT.lang_id("text") == "en").cast("int").alias("is_en"),
        TXT.repetition_ratio("text").alias("rep"),
    )
    return enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.round(F.avg("is_en"), 6).alias("english_share"),
        F.round(F.avg("rep"), 6).alias("avg_repetition"),
    )


def _sql_corpus_health() -> str:
    # unrounded per-doc twins of quality_score / lang_id / repetition_ratio
    # (the standalone oracles round per doc; the health report averages the
    # raw signals, so the twins here must stay unrounded until the avg)
    return f"""
WITH base AS (
  SELECT doc_id, source, {SQL_TOKS} AS l,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha
  FROM documents
),
qual AS (
  SELECT doc_id, source, len(l) AS n_toks,
         0.4 * least(n / 200.0, 1.0)
         + 0.3 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
         + 0.3 * (CASE WHEN len(l) > 0
                       THEN least(CAST(len(list_filter(l, t -> list_contains({_sql_stoplist()}, t))) AS DOUBLE)
                                  / len(l) * 3.0, 1.0)
                       ELSE 0.0 END) AS q
  FROM base
),
scores AS (
  SELECT doc_id,
         unnest(['de', 'en', 'es', 'fr', 'zh']) AS lang2,
         unnest([
           len(list_filter(l, t -> list_contains({_sql_lang_markers('de')}, t))),
           len(list_filter(l, t -> list_contains({_sql_lang_markers('en')}, t))),
           len(list_filter(l, t -> list_contains({_sql_lang_markers('es')}, t))),
           len(list_filter(l, t -> list_contains({_sql_lang_markers('fr')}, t))),
           len(list_filter(l, t -> list_contains({_sql_lang_markers('zh')}, t)))
         ]) AS hits
  FROM base
),
ranked AS (
  SELECT doc_id, lang2, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang2 ASC) AS rn
  FROM scores
),
langg AS (
  SELECT doc_id,
         CASE WHEN hits > 0 AND lang2 = 'en' THEN 1 ELSE 0 END AS is_en
  FROM ranked WHERE rn = 1
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(l) >= 3
              THEN list_transform(range(1, len(l) - 1),
                                  i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])
              ELSE [] END AS g
  FROM base
),
rep AS (
  SELECT doc_id,
         CASE WHEN len(g) > 0
              THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
              ELSE 0.0 END AS r
  FROM grams
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       round(avg(q), 6) AS avg_quality,
       round(avg(is_en), 6) AS english_share,
       round(avg(r), 6) AS avg_repetition
FROM qual
JOIN langg USING (doc_id)
JOIN rep USING (doc_id)
GROUP BY source
"""



def q_payload_stats(spark: SparkSession, sf: str) -> DataFrame:
    from sentiment_analysis_bigdata_spark.operators import multimodal as MM

    docs = MM.attach_payload(_docs(spark, sf))
    return MM.payload_stats(docs).select("doc_id", "byte_len", "sha256")


SQL_PAYLOAD_STATS = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


# --- PII redaction ---------------------------------------------------------------

# deterministic synthesized PII so the scrub is non-trivially exercised on
# every row (testdata text contains no natural emails/IPs/phones)
def _pii_suffix_spark() -> list:
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +12-555-01"),
        (F.col("doc_id") % 90 + 10).cast("string"),
    ]


_PII_SUFFIX_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 tel +12-555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)"
)


def q_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    with_pii = docs.select(
        "doc_id", F.concat(F.col("text"), *_pii_suffix_spark()).alias("text")
    )
    return with_pii.select(
        "doc_id", TXT.redact_pii("text").alias("text")
    )


def _sql_pii_redaction() -> str:
    expr = _PII_SUFFIX_SQL
    for pat, repl in TXT.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


SQL_PII_REDACTION = _sql_pii_redaction()


# --- document chunking (overlapping context windows) -------------------------------

CHUNK_CHARS = 120
CHUNK_STRIDE = 90


def q_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    return TXT.chunk_text(
        _docs(spark, sf), chunk_chars=CHUNK_CHARS, stride=CHUNK_STRIDE
    )


SQL_CHUNK_DOCUMENTS = f"""
SELECT doc_id,
       CAST(unnest(range(0, CAST(ceil(len(text) / {CHUNK_STRIDE}.0) AS INT))) AS INT)
         AS chunk_idx,
       substr(text,
              CAST(unnest(range(0, CAST(ceil(len(text) / {CHUNK_STRIDE}.0) AS INT))) AS INT)
                * {CHUNK_STRIDE} + 1,
              {CHUNK_CHARS}) AS chunk
FROM documents
WHERE len(text) > 0
"""


# --- token-window chunking (training-sequence prep) --------------------------------

TOKWIN_SIZE = 32
TOKWIN_STRIDE = 24


def q_chunk_token_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Token-level overlapping windows (the training-sequence counterpart
    of the character-level ``chunk_documents`` retrieval prep)."""
    from sentiment_analysis_bigdata_spark.operators.chunking import chunk_tokens

    docs = _docs(spark, sf).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    out = chunk_tokens(docs, "toks", size=TOKWIN_SIZE, stride=TOKWIN_STRIDE)
    return out.select(
        "doc_id",
        "chunk_id",
        F.array_join("chunk_tokens", " ").alias("chunk_text"),
        F.col("chunk_len").cast("int").alias("chunk_len"),
    )


SQL_CHUNK_TOKEN_WINDOWS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
st AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(len(t), 1), {TOKWIN_STRIDE})) AS s
  FROM toks
)
SELECT doc_id,
       CAST(s // {TOKWIN_STRIDE} AS INT) AS chunk_id,
       array_to_string(t[s + 1 : s + {TOKWIN_SIZE}], ' ') AS chunk_text,
       CAST(len(t[s + 1 : s + {TOKWIN_SIZE}]) AS INT) AS chunk_len
FROM st
"""


# --- repetition ratio (Gopher-style boilerplate signal) ----------------------------

def q_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return docs.select(
        "doc_id", F.round(TXT.repetition_ratio("text", n=3), 6).alias("rep3")
    )


SQL_REPETITION_RATIO = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(l) >= 3
              THEN list_transform(range(1, len(l) - 1),
                                  i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])
              ELSE [] END AS g
  FROM toks
)
SELECT doc_id,
       round(CASE WHEN len(g) > 0
                  THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                  ELSE 0.0 END, 6) AS rep3
FROM grams
"""



def q_lexical_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document lexical statistics: token count, type count,
    type-token ratio, and Shannon entropy of the within-doc token
    distribution — the repetitiveness/diversity signals quality filters
    threshold on (low entropy = boilerplate/keyword stuffing).

    Shape: explode → (doc, token) counts → per-doc total (window on the
    counts frame, which is already partitioned by the groupBy) → one
    aggregate. Exact integer counts feed the rounded doubles, so the
    result is cross-engine stable at 6 dp."""
    from pyspark.sql import Window

    docs = _docs(spark, sf)
    tok = docs.select(
        "doc_id", F.explode(TXT.tokenize_nonempty("text")).alias("t")
    )
    counts = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id")
    p = (F.col("c") / F.col("n")).cast("double")
    withp = counts.withColumn("n", F.sum("c").over(w)).withColumn(
        "plogp", p * F.log(p)
    )
    return withp.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round((F.count(F.lit(1)) / F.max("n")).cast("double"), 6).alias("ttr"),
        F.round(-F.sum("plogp"), 6).alias("entropy"),
    )


SQL_LEXICAL_STATS = f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS t FROM documents
),
counts AS (
  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, sum(c) AS n FROM counts GROUP BY 1
)
SELECT c.doc_id,
       CAST(t.n AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       round(count(*) / CAST(t.n AS DOUBLE), 6) AS ttr,
       round(-sum((c.c / CAST(t.n AS DOUBLE)) * ln(c.c / CAST(t.n AS DOUBLE))), 6) AS entropy
FROM counts c JOIN tot t USING (doc_id)
GROUP BY c.doc_id, t.n
"""


# --- collocation mining: adjacent-bigram PMI --------------------------------------

def q_bigram_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Top collocations by pointwise mutual information (min_count=3 at
    harness sf; the ordering key is the 6-dp-rounded PMI so Spark and the
    oracle sort identically)."""
    docs = _docs(spark, sf).select(TXT.tokenize_nonempty("text").alias("tokens"))
    out = AFF.collocation_pmi(docs, "tokens", min_count=3)
    return out.orderBy(F.col("pmi").desc(), F.col("bigram").asc()).limit(25)


SQL_BIGRAM_PMI = f"""
WITH toks AS (SELECT {SQL_TOKS} AS l FROM documents),
tot AS (
  SELECT CAST(sum(len(l)) AS DOUBLE) AS n_tok,
         CAST(sum(greatest(len(l) - 1, 0)) AS DOUBLE) AS n_big
  FROM toks
),
uni AS (
  SELECT t AS token, count(*) AS n
  FROM (SELECT unnest(l) AS t FROM toks) GROUP BY t
),
big AS (
  SELECT bigram, count(*) AS n_pair
  FROM (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bigram
        FROM toks WHERE len(l) >= 2)
  GROUP BY bigram
  HAVING count(*) >= 3
)
SELECT b.bigram, b.n_pair,
       round(ln(CAST(b.n_pair AS DOUBLE)) - ln(t.n_big)
             - ln(CAST(ua.n AS DOUBLE)) - ln(CAST(ub.n AS DOUBLE))
             + 2 * ln(t.n_tok), 6) AS pmi
FROM big b
JOIN uni ua ON ua.token = string_split(b.bigram, ' ')[1]
JOIN uni ub ON ub.token = string_split(b.bigram, ' ')[2]
CROSS JOIN tot t
ORDER BY pmi DESC, bigram ASC
LIMIT 25
"""


# --- feature selection: chi-squared term-vs-language association -------------------

def q_chi2_lang_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Terms most associated with a specific language (presence chi2 over
    the 2×L contingency table) — the distinctive-vocabulary signal a
    lang-ID or source-mix pipeline selects features with."""
    docs = _docs(spark, sf).select(
        F.col("lang"), TXT.tokenize_nonempty("text").alias("tokens")
    )
    out = FE.chi2_terms(docs, label_col="lang", tokens_col="tokens", min_df=5)
    return out.orderBy(F.col("chi2").desc(), F.col("term").asc()).limit(30)


SQL_CHI2_LANG_TERMS = f"""
WITH pres AS (
  SELECT lang, t AS term
  FROM (SELECT lang, unnest(list_distinct({SQL_TOKS})) AS t FROM documents)
),
otc AS (SELECT term, lang, count(*) AS o FROM pres GROUP BY term, lang),
dft AS (SELECT term, sum(o) AS df FROM otc GROUP BY term HAVING sum(o) >= 5),
nc AS (SELECT lang, count(*) AS n_c FROM documents GROUP BY lang),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
grid AS (
  SELECT d.term, d.df, c.n_c,
         COALESCE(o.o, 0) AS o,
         d.df * c.n_c / n.n AS e
  FROM dft d CROSS JOIN nc c CROSS JOIN n
  LEFT JOIN otc o ON o.term = d.term AND o.lang = c.lang
)
SELECT term, CAST(df AS BIGINT) AS df,
       round(sum((o - e) * (o - e) / e
                 + CASE WHEN n_c > e THEN (e - o) * (e - o) / (n_c - e) ELSE 0 END), 6) AS chi2
FROM grid
GROUP BY term, df
ORDER BY chi2 DESC, term ASC
LIMIT 30
"""


def q_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the top-100 corpus terms: OLS slope of
    ln(freq) on ln(rank) — the corpus-health number that flags templated
    or synthetic text (natural language sits near slope −1; flat slopes
    mean boilerplate-dominated frequency mass). One vocab-sized aggregate,
    a support-sized rank window (deterministic (freq desc, token asc)
    tie-break), then the regr_* algebraic aggregates — constant-width
    state, no corpus re-scan."""
    from sentiment_analysis_bigdata_spark.operators.profiling import zipf_fit

    docs = load_table(spark, sf, "documents")
    return zipf_fit(docs, top_n=100)


SQL_ZIPF_FIT = f"""
WITH freqs AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
  GROUP BY 1
),
top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rank
  FROM freqs QUALIFY rank <= 100
),
pts AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM top)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM pts
"""


_CORRUPT_MOD = 20  # 1-in-20 positions start a mask span
_CORRUPT_SPAN = 3  # tokens per span (pre-merge)
_CORRUPT_SEED = 42


def q_span_corruption_plan(spark: SparkSession, sf: str) -> DataFrame:
    """T5-style span-corruption PLAN (Raffel et al. 2020 §3.1.4): decide
    deterministically which token spans of each document get masked for
    a denoising objective — content-addressed (md5 of doc_id:position:
    seed), so the plan is identical across engines, reruns, and
    partitionings, and a training run can recompute rather than store
    it. ~5% of positions start a 3-token span (≈15% corruption before
    overlap merge); overlapping spans union via the same running-max-end
    sweep as the dedup ladder. Returns per doc: token count, span
    starts, masked-token union, mask fraction."""
    from sentiment_analysis_bigdata_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents")
    sized = docs.select(
        "doc_id", F.size(TXT.tokenize_nonempty("text")).alias("n_tokens")
    )
    starts = sized.where(F.col("n_tokens") >= 1).select(
        "doc_id",
        "n_tokens",
        F.explode(F.sequence(F.lit(1), F.col("n_tokens"))).alias("i"),
    ).where(
        H.md5_hash64(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("i").cast("string"),
                F.lit(str(_CORRUPT_SEED)),
            )
        )
        % _CORRUPT_MOD
        == 0
    ).select(
        "doc_id",
        F.col("i").alias("start"),
        F.least(
            F.col("i") + (_CORRUPT_SPAN - 1), F.col("n_tokens")
        ).alias("end"),
    )
    per_doc = (
        DD.interval_union_contrib(starts)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("contrib").alias("n_masked"),
        )
    )
    return (
        sized.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
            F.round(
                F.coalesce("n_masked", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("mask_fraction"),
        )
    )


SQL_SPAN_CORRUPTION_PLAN = f"""
WITH sized AS (
  SELECT doc_id, CAST(len({SQL_TOKS}) AS INT) AS n_tokens FROM documents
),
starts AS (
  SELECT doc_id, CAST(i AS INT) AS s,
         least(CAST(i AS INT) + {_CORRUPT_SPAN - 1}, n_tokens) AS e
  FROM sized, unnest(range(1, n_tokens + 1)) AS t(i)
  WHERE n_tokens >= 1
    AND CAST(('0x' || substr(md5(doc_id || ':' || i || ':{_CORRUPT_SEED}'), 1, 15)) AS BIGINT)
        % {_CORRUPT_MOD} = 0
),
cov AS (
  SELECT doc_id,
         greatest(0, e - greatest(
           coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
           s - 1)) AS contrib
  FROM starts
),
pd AS (
  SELECT doc_id, count(*) AS n_spans, CAST(sum(contrib) AS BIGINT) AS n_masked
  FROM cov GROUP BY 1
)
SELECT s.doc_id, s.n_tokens,
       coalesce(pd.n_spans, 0) AS n_spans,
       coalesce(pd.n_masked, 0) AS n_masked,
       round(coalesce(pd.n_masked, 0) / greatest(s.n_tokens, 1), 6) AS mask_fraction
FROM sized s LEFT JOIN pd USING (doc_id)
"""


_OVERLAP_K = 5


def q_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise cross-source content overlap
    (operators/dedup.source_overlap_matrix): Jaccard of distinct token
    5-gram sets between every source pair — the pre-mixture curation
    check for sources republishing each other (overlapping sources
    otherwise get double mixture weight). Per-gram source-set expansion,
    never a row-level self-join."""
    return DD.source_overlap_matrix(
        load_table(spark, sf, "documents"), k=_OVERLAP_K
    ).orderBy("src_a", "src_b")


SQL_SOURCE_OVERLAP = f"""
WITH grams AS (
  SELECT DISTINCT source AS src,
         array_to_string(list_slice(l, i, i + {_OVERLAP_K - 1}), ' ') AS gram
  FROM (SELECT source, {SQL_TOKS} AS l FROM documents),
       unnest(range(1, len(l) - {_OVERLAP_K - 2})) AS t(i)
  WHERE len(l) >= {_OVERLAP_K}
),
sizes AS (SELECT src, count(*) AS n_grams FROM grams GROUP BY 1),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       sa.n_grams + sb.n_grams - n_common AS n_union,
       round(n_common / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE),
             6) AS jaccard
FROM inter
JOIN sizes sa ON sa.src = src_a
JOIN sizes sb ON sb.src = src_b
ORDER BY src_a, src_b
"""


# --- corpus diversity: distinct-n ratios per source ---------------------------

def q_ngram_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus diversity: distinct-1/2/3 ratios (the distinct-n
    metric of Li et al. 2016, the standard generation/corpus diversity
    gate) plus the raw gram totals.

    ONE corpus pass: tokenization is hoisted into its own projection
    (computed once per row — codegen CSE covers the three gram builds),
    the 1/2/3-grams ride a single explode as tag-prefixed strings
    (n-digit + gram, bijective within a tag group), and ONE
    (source, n)-keyed count+count_distinct agg — two-stage with map-side
    partials — feeds a 3-column pivot on the per-source result (rows =
    sources × 3, tiny). Measured 2.2x over the naive
    one-explode-per-n form at sf0.1. No joins, no windows, no all-pairs
    work; distinct state is bounded by per-source gram vocabulary."""
    docs = _docs(spark, sf)
    toked = docs.select("source", TXT.tokenize_nonempty("text").alias("l"))
    tagged = F.concat(
        F.transform(F.col("l"), lambda t: F.concat(F.lit("1"), t)),
        F.transform(TXT.ngrams(F.col("l"), 2), lambda g: F.concat(F.lit("2"), g)),
        F.transform(TXT.ngrams(F.col("l"), 3), lambda g: F.concat(F.lit("3"), g)),
    )
    per = (
        toked.select("source", F.explode(tagged).alias("tg"))
        .select("source", F.substring("tg", 1, 1).alias("n"), F.col("tg").alias("g"))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count_distinct("g").alias("dst"),
        )
    )
    wide = per.groupBy("source").pivot("n", ["1", "2", "3"]).agg(
        F.first("total").alias("total"), F.first("dst").alias("distinct")
    )
    ratio = lambda d, t: F.round(F.col(d) / F.col(t), 6)
    return wide.select(
        "source",
        F.col("1_total").alias("uni_total"),
        F.col("1_distinct").alias("uni_distinct"),
        ratio("1_distinct", "1_total").alias("distinct_1"),
        F.col("2_total").alias("bi_total"),
        F.col("2_distinct").alias("bi_distinct"),
        ratio("2_distinct", "2_total").alias("distinct_2"),
        F.col("3_total").alias("tri_total"),
        F.col("3_distinct").alias("tri_distinct"),
        ratio("3_distinct", "3_total").alias("distinct_3"),
    ).orderBy("source")


SQL_NGRAM_DIVERSITY = f"""
WITH toks AS (SELECT source, {SQL_TOKS} AS l FROM documents),
uni AS (
  SELECT source, count(*) AS uni_total, count(DISTINCT g) AS uni_distinct
  FROM (SELECT source, unnest(l) AS g FROM toks) GROUP BY source
),
bi AS (
  SELECT source, count(*) AS bi_total, count(DISTINCT g) AS bi_distinct
  FROM (SELECT source, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS g
        FROM toks WHERE len(l) >= 2) GROUP BY source
),
tri AS (
  SELECT source, count(*) AS tri_total, count(DISTINCT g) AS tri_distinct
  FROM (SELECT source,
               unnest(list_transform(range(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS g
        FROM toks WHERE len(l) >= 3) GROUP BY source
)
SELECT source,
       uni_total, uni_distinct,
       round(CAST(uni_distinct AS DOUBLE) / uni_total, 6) AS distinct_1,
       bi_total, bi_distinct,
       round(CAST(bi_distinct AS DOUBLE) / bi_total, 6) AS distinct_2,
       tri_total, tri_distinct,
       round(CAST(tri_distinct AS DOUBLE) / tri_total, 6) AS distinct_3
FROM uni JOIN bi USING (source) JOIN tri USING (source)
ORDER BY source
"""


def q_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, Data Selection
    via Importance Resampling): score every raw document by how much it
    looks like the target domain under two bag-of-hashed-ngrams LMs.

    Target domain here = the ``lang = 'en'`` slice of the corpus; raw =
    the whole corpus. Features are hashed unigram+bigram counts into
    m = 64 buckets (the engine's md5 hash — same value contract as
    ``hashed_embeddings``). Both LMs are add-1-smoothed bucket
    distributions; the per-doc log importance weight is

        log w(d) = sum_b n_b(d) * (ln p_target[b] - ln q_raw[b])

    and selection is the deterministic top-25 by (rounded weight desc,
    doc_id) — the rank-preserving stand-in for Gumbel top-k, which the
    cross-engine gate cannot replay.

    Plan shape (operators/features.py dsir_logweights): ONE corpus
    explode (uni+bi grams ride a single array concat), one (doc, bucket)
    agg, two m-row LM aggs that join back (fixed 64 rows at ANY corpus
    scale — AQE broadcasts them at runtime; no hint, per the broadcast
    policy), one per-doc fold, one global top-k. LM state is O(m); no
    all-pairs work anywhere."""
    docs = _docs(spark, sf).select(
        "doc_id",
        "lang",
        "source",
        TXT.tokenize_nonempty("text").alias("tokens"),
        (F.col("lang") == "en").alias("is_target"),
    )
    return (
        FE.dsir_logweights(docs, m=64, keep_cols=("lang", "source"))
        .orderBy(F.col("log_weight").desc(), F.col("doc_id").asc())
        .limit(25)
    )


_SQL_DSIR_WEIGHTS = f"""toks AS (SELECT doc_id, lang, source, {SQL_TOKS} AS l FROM documents),
grams AS (
  SELECT doc_id, lang, source, unnest(l) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, source,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS g
  FROM toks WHERE len(l) >= 2
),
b AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 64 AS bucket
  FROM grams
),
per_doc AS (
  SELECT doc_id, lang, source, bucket, count(*) AS n FROM b GROUP BY 1, 2, 3, 4
),
tgt AS (SELECT bucket, count(*) AS t_cnt FROM b WHERE lang = 'en' GROUP BY 1),
raw AS (SELECT bucket, count(*) AS r_cnt FROM b GROUP BY 1),
tot AS (
  SELECT (SELECT CAST(sum(t_cnt) AS DOUBLE) FROM tgt) AS t_total,
         (SELECT CAST(sum(r_cnt) AS DOUBLE) FROM raw) AS r_total
),
weights AS (
  SELECT doc_id, lang, source,
         CAST(sum(n) AS BIGINT) AS n_grams,
         round(sum(n * (ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE) / (t_total + 64))
                      - ln(CAST(r_cnt + 1 AS DOUBLE) / (r_total + 64)))), 6) AS log_weight
  FROM per_doc LEFT JOIN tgt USING (bucket) JOIN raw USING (bucket) CROSS JOIN tot
  GROUP BY 1, 2, 3
)"""

SQL_DSIR_IMPORTANCE = f"""
WITH {_SQL_DSIR_WEIGHTS}
SELECT doc_id, lang, source, n_grams, log_weight
FROM weights
ORDER BY log_weight DESC, doc_id ASC
LIMIT 25
"""


def q_dsir_sample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR selection step realized as Gumbel-top-k (Kool et al. 2019):
    drawing k docs WITHOUT replacement with probability ∝ exp(log_weight)
    is exactly taking the top-k of ``log_weight + Gumbel(0,1)``. The
    Gumbel noise is CONTENT-ADDRESSED — u = (md5(doc_id:seed) mod 10^6
    + 0.5)/10^6, g = -ln(-ln(u)) — so the 'random' sample is a pure
    function of the row ids: reruns, retries, engine changes, and the
    DuckDB oracle all select the same docs (the same contract as
    ``hash_split``/``weighted_sample_by_hash``). The final cut orders by
    the 6dp-ROUNDED key (ties → doc_id), keeping the boundary immune to
    last-ULP ln() differences across engines.

    Plan shape: the dsir_logweights pipeline plus one narrow per-row
    expression and one global top-k — selection adds NO shuffle."""
    docs = _docs(spark, sf).select(
        "doc_id",
        "lang",
        "source",
        TXT.tokenize_nonempty("text").alias("tokens"),
        (F.col("lang") == "en").alias("is_target"),
    )
    w = FE.dsir_logweights(docs, m=64, keep_cols=("lang", "source"))
    u = (
        F.pmod(
            HH.md5_hash64(
                F.concat(F.col("doc_id").cast("string"), F.lit(":gumbel42"))
            ),
            F.lit(1_000_000),
        )
        + 0.5
    ) / 1_000_000.0
    gkey = F.round(F.col("log_weight") + (-F.log(-F.log(u))), 6)
    return (
        w.select("doc_id", "lang", "source", "log_weight", gkey.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id").asc())
        .limit(20)
    )


SQL_DSIR_SAMPLE = f"""
WITH {_SQL_DSIR_WEIGHTS},
keyed AS (
  SELECT doc_id, lang, source, log_weight,
         round(log_weight
               + (-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':gumbel42'), 1, 15)) AS BIGINT)
                           % 1000000 + 0.5) / 1000000.0))), 6) AS gumbel_key
  FROM weights
)
SELECT doc_id, lang, source, log_weight, gumbel_key
FROM keyed
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT 20
"""


def q_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3): per language, split documents into
    head / middle / tail terciles of LM fluency and report each bucket's
    size and mean score — the report a curation run uses to decide which
    perplexity band to keep per language.

    The LM score is the engine's corpus-self unigram mean log-probability
    (``doc_logprob``; higher = more fluent, so 'head' = top tercile).
    Tercile edges are EXACT interpolated percentiles per language over the
    ROUNDED scores (both engines interpolate identically over identical
    rounded doubles, making the band cuts cross-engine-deterministic).

    Plan shape: one LM agg + one term join + one per-doc fold (the
    doc_logprob pipeline), one langs-row percentile agg that joins back
    (AQE broadcasts it at runtime — keyed agg, so no hint per the
    broadcast policy), one (lang, bucket) agg. The edge frame is |langs|
    rows at any corpus scale; for the 100 TB path swap the exact
    percentile for the mergeable ``approx_percentile`` sketch (SCALING.md
    "PSI drift" — exact edges keep state per DISTINCT score, fine for the
    6dp-rounded scores here, wrong for raw doubles)."""
    docs = _docs(spark, sf)
    scores = FE.unigram_logprob_scores(
        docs.select("doc_id", TXT.tokenize_nonempty("text").alias("tokens"))
    ).join(docs.select("doc_id", "lang"), "doc_id")
    edges = scores.groupBy("lang").agg(
        F.percentile("avg_logprob", F.lit(1.0 / 3)).alias("e1"),
        F.percentile("avg_logprob", F.lit(2.0 / 3)).alias("e2"),
    )
    # |langs|-row frame, but a keyed agg — no hint; AQE broadcasts it.
    bucketed = scores.join(edges, "lang").select(
        "lang",
        F.when(F.col("avg_logprob") >= F.col("e2"), "head")
        .when(F.col("avg_logprob") >= F.col("e1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "avg_logprob",
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("avg_logprob"), 6).alias("mean_logprob"),
        )
        .orderBy("lang", "bucket")
    )


SQL_PERPLEXITY_BUCKETS = f"""
WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
lm AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM lm),
scores AS (
  SELECT doc_id, round(avg(ln(CAST(cnt AS DOUBLE) / t)), 6) AS lp
  FROM toks JOIN lm USING (term) CROSS JOIN total
  GROUP BY doc_id
),
sl AS (SELECT s.doc_id, d.lang, s.lp FROM scores s JOIN documents d USING (doc_id)),
edges AS (
  SELECT lang, quantile_cont(lp, 1.0 / 3) AS e1, quantile_cont(lp, 2.0 / 3) AS e2
  FROM sl GROUP BY 1
)
SELECT lang,
       CASE WHEN lp >= e2 THEN 'head'
            WHEN lp >= e1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(avg(lp), 6) AS mean_logprob
FROM sl JOIN edges USING (lang)
GROUP BY 1, 2
ORDER BY lang, bucket
"""


def q_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary coverage curve: the share of corpus token mass covered
    by the top-k most frequent types, at k ∈ {100, 1k, 10k} — the number
    that sizes a tokenizer/vocab budget (the cumulative form of the Zipf
    mass that ``zipf_fit`` regresses) and flags templated corpora (a few
    types covering nearly everything).

    One vocab-sized count agg (barriered — both consumers below read the
    materialized frame, so the corpus explode runs once) → a
    ``TakeOrderedAndProject`` top-10,000 under the deterministic
    (count desc, token asc) total order — NEVER a full ``row_number()``
    rank window, which compiles to a single-partition sort of the whole
    vocabulary (VERDICT r11 #3: the vocab grows with the corpus under
    Heaps' law, so that window's one task scales with the data; the
    ladder only needs k ≤ 10,000 cutoffs, which a bounded top-k answers
    exactly). Ranks WITHIN the bounded 10k-row frame come from a window
    whose input is limit-bounded by the constant k — one task over
    ≤ 10,000 rows at any corpus size. Totals are one keyless aggregate;
    ladders where k exceeds the vocab degrade to full coverage
    naturally."""
    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

    counts = (
        _docs(spark, sf)
        .select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(barrier_eager)
    )
    ks = [100, 1000, 10000]
    topk = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(max(ks))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    ranked_top = topk.withColumn("r", F.row_number().over(w))
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_types")
    )
    agg = ranked_top.agg(
        *[
            F.sum(F.when(F.col("r") <= k, F.col("n")).otherwise(F.lit(0))).alias(
                f"_c{k}"
            )
            for k in ks
        ],
    ).crossJoin(F.broadcast(totals))
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.col("_types").alias("n_types"),
                F.col(f"_c{k}").alias("covered_tokens"),
                F.col("_total").alias("total_tokens"),
                F.round(F.col(f"_c{k}") / F.col("_total"), 6).alias("coverage"),
            )
            for k in ks
        ]
    )
    return agg.select(F.explode(rows).alias("s")).select("s.*").orderBy("k")


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (SELECT unnest({SQL_TOKS}) AS token FROM documents),
counts AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS r FROM counts
),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         count(*) AS n_types,
         CAST(sum(CASE WHEN r <= 100 THEN n ELSE 0 END) AS BIGINT) AS c100,
         CAST(sum(CASE WHEN r <= 1000 THEN n ELSE 0 END) AS BIGINT) AS c1000,
         CAST(sum(CASE WHEN r <= 10000 THEN n ELSE 0 END) AS BIGINT) AS c10000
  FROM ranked
)
SELECT k, n_types, covered_tokens, total_tokens,
       round(CAST(covered_tokens AS DOUBLE) / total_tokens, 6) AS coverage
FROM (
  SELECT 100 AS k, n_types, c100 AS covered_tokens, total AS total_tokens FROM agg
  UNION ALL
  SELECT 1000, n_types, c1000, total FROM agg
  UNION ALL
  SELECT 10000, n_types, c10000, total FROM agg
)
ORDER BY k
"""


def q_code_prose_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Code-vs-prose corpus profiling — the curation step that routes
    code-like payloads away from the prose quality gates (a Gopher/CCNet
    pipeline always runs some form of it). Two origins are profiled side
    by side: ``documents.text`` (prose) and ``events.props`` (JSON — the
    fixture's stand-in for code-like content). Per row three char-class
    counts (structural {}[]();=:,\" chars, letters, digits) come from
    length-after-regexp_replace deltas — native JVM expressions, one pass,
    no UDF — and the per-origin report derives every ratio from INTEGER
    sums (the code-row flag is the integer cross-multiply
    100·code_chars ≥ 8·n, so no float ever decides a count), which makes
    the cross-engine value contract exact by construction.

    100 TB shape: a narrow projection feeding a 2-group aggregate with
    map-side partials; output is origin-cardinality-sized."""
    docs = load_table(spark, sf, "documents").select(
        F.lit("documents").alias("origin"), F.col("text").alias("s")
    )
    props = load_table(spark, sf, "events").select(
        F.lit("events_props").alias("origin"), F.col("props").alias("s")
    )
    u = docs.unionByName(props).filter(
        F.col("s").isNotNull() & (F.length("s") > 0)
    )

    def class_count(pattern: str):
        return F.length("s") - F.length(F.regexp_replace("s", pattern, ""))

    f = u.select(
        "origin",
        F.length("s").cast("long").alias("n"),
        class_count(r'[{}()\[\];=:,"]').cast("long").alias("code_chars"),
        class_count("[A-Za-z]").cast("long").alias("letters"),
        class_count("[0-9]").cast("long").alias("digits"),
    )
    return f.groupBy("origin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n").alias("total_chars"),
        F.round(F.sum("code_chars") / F.sum("n"), 6).alias("code_char_ratio"),
        F.round(F.sum("letters") / F.sum("n"), 6).alias("alpha_ratio"),
        F.round(F.sum("digits") / F.sum("n"), 6).alias("digit_ratio"),
        F.sum(
            (F.col("code_chars") * 100 >= F.col("n") * 8).cast("long")
        ).alias("n_code_rows"),
    )


SQL_CODE_PROSE_PROFILE = r"""
WITH u AS (
  SELECT 'documents' AS origin, text AS s FROM documents
  UNION ALL
  SELECT 'events_props' AS origin, props AS s FROM events
),
f AS (
  SELECT origin,
         CAST(length(s) AS BIGINT) AS n,
         CAST(length(s) - length(regexp_replace(s, '[{}()\[\];=:,"]', '', 'g'))
              AS BIGINT) AS code_chars,
         CAST(length(s) - length(regexp_replace(s, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS letters,
         CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g'))
              AS BIGINT) AS digits
  FROM u WHERE s IS NOT NULL AND length(s) > 0
)
SELECT origin,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n) AS BIGINT) AS total_chars,
       round(CAST(sum(code_chars) AS DOUBLE) / sum(n), 6) AS code_char_ratio,
       round(CAST(sum(letters) AS DOUBLE) / sum(n), 6) AS alpha_ratio,
       round(CAST(sum(digits) AS DOUBLE) / sum(n), 6) AS digit_ratio,
       CAST(sum(CASE WHEN code_chars * 100 >= n * 8 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_code_rows
FROM f
GROUP BY origin
"""


def q_unicode_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC canonicalization (operators/normalize.py
    ``nfc_normalize_text`` — Arrow kernel, no Spark built-in exists).
    The fixture text is ASCII, so the query first DECOMPOSES it
    deterministically on both engines (every 'e' → 'e' + U+0301 combining
    acute) and then normalizes back; NFC must compose each pair into a
    single precomposed U+00E9. The oracle compares md5 CONTENT hashes of
    the normalized text against DuckDB's native ``nfc_normalize`` —
    byte-identical output, not just matching lengths — plus the
    char-count contraction (n_nfc = n_decomposed − n_composed_pairs).

    100 TB shape: one narrow Arrow pass, embarrassingly parallel, no
    shuffle; the per-doc report is the same width as the input."""
    from sentiment_analysis_bigdata_spark.operators import normalize as NORM

    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    dec = docs.select(
        "doc_id",
        F.regexp_replace("text", "e", "e\u0301").alias("dec_text"),
    )
    nfc = NORM.nfc_normalize_text(dec, "dec_text", out_col="nfc_text")
    return nfc.select(
        "doc_id",
        F.length("dec_text").cast("long").alias("n_decomposed"),
        F.length("nfc_text").cast("long").alias("n_nfc"),
        HH.md5_hash64(F.col("nfc_text")).alias("nfc_hash"),
    )


SQL_UNICODE_NFC = """
WITH dec AS (
  SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS dec_text
  FROM documents
),
nfc AS (
  SELECT doc_id, dec_text, nfc_normalize(dec_text) AS nfc_text FROM dec
)
SELECT doc_id,
       CAST(length(dec_text) AS BIGINT) AS n_decomposed,
       CAST(length(nfc_text) AS BIGINT) AS n_nfc,
       CAST(('0x' || substr(md5(nfc_text), 1, 15)) AS BIGINT) AS nfc_hash
FROM nfc
"""



def q_accent_fold(spark: SparkSession, sf: str) -> DataFrame:
    """Accent folding round trip (operators/normalize.py
    ``strip_accents_text`` — NFD + drop combining marks): the ASCII
    fixture text is deterministically ACCENTED on both engines
    (a→á, e→é, i→ï, all precomposed), folded back, and the fold must
    restore the original byte-for-byte (roundtrip_ok value-checked per
    doc, plus an md5 content hash of the folded text against DuckDB's
    native ``strip_accents``). One narrow Arrow pass, no shuffle."""
    from sentiment_analysis_bigdata_spark.operators import normalize as NORM

    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    acc = docs.select(
        "doc_id",
        "text",
        F.translate("text", "aei", "áéï").alias("acc_text"),
    )
    folded = NORM.strip_accents_text(acc, "acc_text", out_col="folded")
    return folded.select(
        "doc_id",
        F.length("acc_text").cast("long").alias("n_chars"),
        HH.md5_hash64(F.col("folded")).alias("fold_hash"),
        (F.col("folded") == F.col("text")).alias("roundtrip_ok"),
    )


SQL_ACCENT_FOLD = """
WITH acc AS (
  SELECT doc_id, text,
         translate(text, 'aei', chr(225) || chr(233) || chr(239)) AS acc_text
  FROM documents
),
f AS (SELECT doc_id, text, acc_text, strip_accents(acc_text) AS folded FROM acc)
SELECT doc_id,
       CAST(length(acc_text) AS BIGINT) AS n_chars,
       CAST(('0x' || substr(md5(folded), 1, 15)) AS BIGINT) AS fold_hash,
       folded = text AS roundtrip_ok
FROM f
"""

_DISP_MIN_N, _DISP_TOPK = 50, 25


def q_term_dispersion(spark: SparkSession, sf: str) -> DataFrame:
    """Term dispersion across sources (Gries' DP): for each frequent
    term, DP = ½·Σ_s |share of the term's occurrences in source s −
    source s's share of the whole corpus| — 0 for a term spread exactly
    like the corpus, → 1 for a term concentrated in one source. High-DP
    terms are the boilerplate/template/source-id markers a curation
    pipeline wants to inspect (frequency alone can't find them: a
    navigation-bar token can be corpus-frequent yet live in one crawl).
    Report: top 25 by DP among terms with ≥ 50 occurrences, with the
    deterministic (rounded-DP desc, term asc) cut.

    100 TB shape: one token explode → (term, source) counts; source
    masses are a |sources|-row agg joined back unhinted (AQE broadcasts);
    the top-k is TakeOrdered over the vocabulary-sized DP frame."""
    docs = load_table(spark, sf, "documents")
    tokens = docs.select(
        "source", F.explode(TXT.tokenize_nonempty("text")).alias("term")
    )
    ts = tokens.groupBy("term", "source").agg(
        F.count(F.lit(1)).alias("n_ts")
    )
    term_tot = ts.groupBy("term").agg(F.sum("n_ts").alias("n_t"))
    src_tot = tokens.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    corpus_tot = src_tot.agg(F.sum("n_s").alias("n_all"))
    # every (term, source) cell, including zeros, contributes |0 − p_s|
    # — realize the dense grid by crossing terms with the source frame
    grid = term_tot.filter(F.col("n_t") >= _DISP_MIN_N).crossJoin(
        src_tot.crossJoin(F.broadcast(corpus_tot))
    )
    dp = (
        grid.join(ts, ["term", "source"], "left")
        .select(
            "term",
            "n_t",
            (
                F.abs(
                    F.coalesce(F.col("n_ts"), F.lit(0)) / F.col("n_t")
                    - F.col("n_s") / F.col("n_all")
                )
            ).alias("gap"),
        )
        .groupBy("term", "n_t")
        .agg(F.round(F.sum("gap") / 2.0, 6).alias("dp"))
    )
    return (
        dp.select("term", "n_t", "dp")
        .orderBy(F.col("dp").desc(), F.col("term").asc())
        .limit(_DISP_TOPK)
    )


SQL_TERM_DISPERSION = f"""
WITH tokens AS (
  SELECT source, unnest({SQL_TOKS}) AS term FROM documents
),
ts AS (SELECT term, source, CAST(count(*) AS BIGINT) AS n_ts
       FROM tokens GROUP BY 1, 2),
term_tot AS (SELECT term, CAST(sum(n_ts) AS BIGINT) AS n_t FROM ts GROUP BY 1),
src_tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
            FROM tokens GROUP BY 1),
corpus_tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_all FROM src_tot),
grid AS (
  SELECT t.term, t.n_t, s.source, s.n_s, c.n_all
  FROM term_tot t CROSS JOIN src_tot s CROSS JOIN corpus_tot c
  WHERE t.n_t >= {_DISP_MIN_N}
),
dp AS (
  SELECT g.term, g.n_t,
         round(sum(abs(CAST(coalesce(x.n_ts, 0) AS DOUBLE) / g.n_t
                       - CAST(g.n_s AS DOUBLE) / g.n_all)) / 2.0, 6) AS dp
  FROM grid g LEFT JOIN ts x ON x.term = g.term AND x.source = g.source
  GROUP BY g.term, g.n_t
)
SELECT term, n_t, dp FROM dp
ORDER BY dp DESC, term ASC LIMIT {_DISP_TOPK}
"""


def q_readability_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch-style readability per document — the classic prose-quality
    feature (curation gates bucket corpora by it; school-grade formulas
    are all affine in the same two ratios): words/sentence and
    syllables/word, with syllables approximated as vowel-group runs
    ([aeiouy]+ matches) — the standard dictionary-free heuristic. Every
    count is INTEGER (regexp_replace length deltas for vowel groups,
    split sizes for words/sentences), the two ratios are ratios of those
    integers, and the final score rounds at 4dp — so the cross-engine
    contract is exact-by-construction. Score = 206.835 − 1.015·(W/S) −
    84.6·(Syl/W), clamped to [0, 121.22].

    100 TB shape: one narrow projection, no shuffle, no UDF."""
    docs = load_table(spark, sf, "documents")
    toks = TXT.tokenize_nonempty("text")
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != F.lit(""),
            )
        ),
        F.lit(1),
    )
    words = F.greatest(F.size(toks), F.lit(1))
    low = F.lower(F.col("text"))
    # vowel-group count = (#chars after collapsing each run to one) delta
    syllables = F.length(
        F.regexp_replace(low, "[aeiouy]+", "V")
    ) - F.length(F.regexp_replace(low, "[aeiouy]", ""))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.round(
            F.least(F.greatest(score, F.lit(0.0)), F.lit(121.22)), 4
        ).alias("flesch"),
    )


SQL_READABILITY_SCORES = """
WITH base AS (
  SELECT doc_id, text, lower(text) AS low,
         greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> trim(s) <> '')), 1) AS n_sentences,
         greatest(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')), 1) AS n_words
  FROM documents
),
counted AS (
  SELECT doc_id, n_words, n_sentences,
         length(regexp_replace(low, '[aeiouy]+', 'V', 'g'))
           - length(regexp_replace(low, '[aeiouy]', '', 'g')) AS n_syllables
  FROM base
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(least(greatest(206.835
                            - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                            - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                            0.0), 121.22), 4) AS flesch
FROM counted
"""


def q_dedup_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup loss attribution — the per-source accounting a data-release
    note needs: after min-id exact dedup, how many of each source's docs
    survived, how many were removed, and how many of the removals lost
    to a copy in a DIFFERENT source (cross-source duplication — licensing
    and contamination both care about exactly this split). One fingerprint
    aggregation computes each cluster's survivor and whether the cluster
    spans sources; the report joins it back and reduces to
    source-cardinality rows."""
    docs = _docs(spark, sf)
    keyed = docs.select(
        "doc_id", "source", TXT.fingerprint("text").alias("fp")
    )
    clusters = keyed.groupBy("fp").agg(
        F.min("doc_id").alias("survivor_id"),
        F.countDistinct("source").alias("n_sources"),
    )
    tagged = keyed.join(clusters, "fp").select(
        "source",
        (F.col("doc_id") == F.col("survivor_id")).alias("survived"),
        (F.col("n_sources") > 1).alias("cross_source_cluster"),
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("survived").cast("long")).alias("n_survivors"),
        F.sum((~F.col("survived")).cast("long")).alias("n_removed"),
        F.sum(
            ((~F.col("survived")) & F.col("cross_source_cluster")).cast(
                "long"
            )
        ).alias("n_lost_cross_source"),
        F.round(
            F.sum((~F.col("survived")).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("loss_rate"),
    )


SQL_DEDUP_ATTRIBUTION = f"""
WITH keyed AS (
  SELECT doc_id, source, {SQL_FP} AS fp FROM documents
),
clusters AS (
  SELECT fp, min(doc_id) AS survivor_id,
         count(DISTINCT source) AS n_sources
  FROM keyed GROUP BY fp
),
tagged AS (
  SELECT k.source,
         k.doc_id = c.survivor_id AS survived,
         c.n_sources > 1 AS cross_source_cluster
  FROM keyed k JOIN clusters c USING (fp)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN survived THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(sum(CASE WHEN NOT survived THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN NOT survived AND cross_source_cluster
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_cross_source,
       round(CAST(sum(CASE WHEN NOT survived THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS loss_rate
FROM tagged
GROUP BY source
"""


def q_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source character-entropy profile — the gibberish/low-diversity
    quality signal (a doc whose byte distribution collapses to a few
    symbols is boilerplate, padding, or encoding damage): per document
    the Shannon entropy of its lowercase character distribution in nats
    (H = ln n − Σ c·ln c / n over exact integer counts), then per source
    the doc count, mean/min/max entropy, and how many docs fall under
    the 2.75-nat low-diversity line.

    Scale shape: explode-to-chars feeds a (doc_id, char) groupBy whose
    map-side partial combine collapses each partition to docs×alphabet
    rows before the shuffle — shuffle volume is bounded by the alphabet,
    not by corpus bytes — and every later stage is aggregate-over-
    aggregate. Per-doc entropies are rounded to 6dp before the source
    rollup so the low-diversity cut compares identical doubles on both
    engines."""
    docs = _docs(spark, sf).select("doc_id", "source", F.lower(F.col("text")).alias("t"))
    chars = docs.select(
        "doc_id",
        "source",
        F.explode(F.filter(F.split("t", ""), lambda c: c != F.lit(""))).alias("ch"),
    )
    per = chars.groupBy("doc_id", "source", "ch").agg(F.count(F.lit(1)).alias("c"))
    ent = (
        per.groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("clnc"),
        )
        .select(
            "doc_id",
            "source",
            F.round(
                F.log(F.col("n").cast("double")) - F.col("clnc") / F.col("n"), 6
            ).alias("h"),
        )
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.min("h").alias("min_entropy"),
            F.max("h").alias("max_entropy"),
            F.sum((F.col("h") < 2.75).cast("bigint")).alias("n_low"),
        )
        .orderBy("source")
    )


SQL_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, source, c
  FROM documents,
       unnest(list_filter(string_split_regex(lower(text), ''), x -> x <> '')) AS u(c)
),
per AS (SELECT doc_id, source, c, count(*) AS cnt FROM chars GROUP BY 1, 2, 3),
ent AS (
  SELECT doc_id, source,
         round(ln(CAST(sum(cnt) AS DOUBLE))
               - sum(cnt * ln(CAST(cnt AS DOUBLE))) / sum(cnt), 6) AS h
  FROM per GROUP BY 1, 2
)
SELECT source, count(*) AS n_docs, round(avg(h), 4) AS avg_entropy,
       min(h) AS min_entropy, max(h) AS max_entropy,
       CAST(count(*) FILTER (h < 2.75) AS BIGINT) AS n_low
FROM ent GROUP BY 1 ORDER BY 1
"""


def q_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source boilerplate detection — the headers/footers/templates
    sweep of a web-corpus curation run (C4's 'three-sentence' rule at
    n-gram granularity): a trigram is boilerplate WITHIN a source when
    it appears in ≥ max(2, 8% of that source's docs) distinct documents;
    report per source the boilerplate-gram count, how many docs carry at
    least one (with the coverage share), and the top offender (highest
    doc frequency, ties broken lexicographically).

    Scale shape: distinct (source, doc, gram) → groupBy df is the same
    map-side-combining shingle rollup as winnowing; the coverage pass
    joins docs' distinct grams against the per-source boilerplate set
    on the (source, gram) key — both sides are post-aggregation, and no
    pair of documents is ever compared directly."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf).select(
        "doc_id", "source", TXT.tokenize_nonempty("text").alias("ts")
    )
    grams = docs.select(
        "doc_id", "source", F.explode(TXT.ngrams("ts", 3)).alias("g")
    ).distinct()
    n_docs = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    df_tbl = (
        grams.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(n_docs, "source")
        .filter(F.col("df") >= F.greatest(F.lit(2), F.ceil(0.08 * F.col("n_docs"))))
    )
    w = Window.partitionBy("source").orderBy(F.col("df").desc(), F.col("g").asc())
    top = (
        df_tbl.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("source", F.col("g").alias("top_gram"), F.col("df").alias("top_df"))
    )
    covered = (
        grams.join(df_tbl.select("source", "g"), ["source", "g"], "left_semi")
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("docs_covered"))
    )
    stats = df_tbl.groupBy("source").agg(F.count(F.lit(1)).alias("n_boiler_grams"))
    return (
        n_docs.join(stats, "source")
        .join(covered, "source")
        .join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_boiler_grams",
            "docs_covered",
            F.round(F.col("docs_covered") / F.col("n_docs").cast("double"), 6).alias(
                "coverage"
            ),
            "top_gram",
            "top_df",
        )
        .orderBy("source")
    )


SQL_BOILERPLATE_NGRAMS = f"""
WITH toks AS (
  SELECT doc_id, source, {SQL_TOKS} AS ts FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS g
  FROM toks, unnest(range(1, len(ts) - 1)) AS r(i)
),
nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM toks GROUP BY 1),
df AS (
  SELECT source, g, count(*) AS df FROM grams GROUP BY 1, 2
),
boiler AS (
  SELECT df.source, df.g, df.df
  FROM df JOIN nd USING (source)
  WHERE df.df >= greatest(2, CAST(ceil(0.08 * n_docs) AS BIGINT))
),
top AS (
  SELECT source, g AS top_gram, df AS top_df
  FROM (SELECT source, g, df,
               row_number() OVER (PARTITION BY source ORDER BY df DESC, g ASC) AS rn
        FROM boiler)
  WHERE rn = 1
),
covered AS (
  SELECT g.source, count(DISTINCT g.doc_id) AS docs_covered
  FROM grams g JOIN boiler b ON g.source = b.source AND g.g = b.g
  GROUP BY 1
),
stats AS (SELECT source, count(*) AS n_boiler_grams FROM boiler GROUP BY 1)
SELECT source, n_docs, n_boiler_grams, docs_covered,
       round(docs_covered / CAST(n_docs AS DOUBLE), 6) AS coverage,
       top_gram, top_df
FROM nd JOIN stats USING (source) JOIN covered USING (source) JOIN top USING (source)
ORDER BY source
"""


_HILL_K = 100


def q_hill_tail_index(spark: SparkSession, sf: str) -> DataFrame:
    """Hill estimator of the document-length tail exponent (Hill 1975)
    — the heavy-tail profile a packing/chunking plan reads before
    sizing sequence budgets (α near 1 = lengths are wildly heavy-tailed
    and a max-length cut loses real mass; α ≥ 3 = tails are thin and
    truncation is cheap): α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k
    order statistics.

    The ONLY corpus-sized operation is a top-(k+1) selection, which
    Spark plans as TakeOrderedAndProject (per-partition heaps, k+1-row
    driver merge) — never a global sort. Ties at the boundary are
    value-ties, so the selected multiset (all the estimator sees) is
    deterministic on both engines; tied rows contribute ln(1) = 0."""
    docs = _docs(spark, sf)
    top = (
        docs.select(F.col("n_chars").cast("double").alias("x"))
        .orderBy(F.col("x").desc())
        .limit(_HILL_K + 1)
    )
    xmin = top.agg(F.min("x").alias("xmin"))
    return (
        top.crossJoin(F.broadcast(xmin))
        .groupBy("xmin")
        .agg(
            F.lit(_HILL_K).alias("k"),
            F.round(
                _HILL_K / F.nullif(F.sum(F.log(F.col("x") / F.col("xmin"))), F.lit(0.0)),
                6,
            ).alias("hill_alpha"),
        )
        .select("k", "xmin", "hill_alpha")
    )


SQL_HILL_TAIL_INDEX = f"""
WITH top AS (
  SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
  ORDER BY n_chars DESC LIMIT {_HILL_K + 1}
),
b AS (SELECT min(x) AS xmin FROM top)
SELECT {_HILL_K} AS k, xmin,
       round({_HILL_K} / nullif(sum(ln(x / xmin)), 0), 6) AS hill_alpha
FROM top CROSS JOIN b GROUP BY xmin
"""


def q_token_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of the token frequency distribution — the
    single-number inequality readout of corpus vocabulary concentration
    (Gini → 1 means a few types carry all the mass, the signature of
    templated/boilerplate text; natural corpora sit high but not
    degenerate under Zipf): G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n over
    counts ranked ascending.

    One corpus explode feeds a vocab-sized count agg. The global rank
    comes from ``operators/ordering.banded_global_ordinal`` — NOT a
    global ``row_number()`` window, which compiles to a single-partition
    sort of the whole vocabulary (VERDICT r11 #3: "vocabulary-sized" is
    not bounded — type count grows with the corpus under Heaps' law, so
    at 100 TB of web text one task would sort billions of types). The
    banded ordinal is exact and tie-stable (value asc, token asc — the
    identical total order), so the Gini rational is unchanged; the count
    frame is barriered first so the ordinal's bounded side passes read a
    materialized vocab frame instead of re-running the corpus explode.
    Every term in the formula is an exact integer sum, so both engines
    round the identical rational (the oracle keeps the naive window)."""
    from sentiment_analysis_bigdata_spark.operators.ordering import (
        banded_global_ordinal,
    )
    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

    counts = (
        _docs(spark, sf)
        .select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(barrier_eager)
    )
    ranked = banded_global_ordinal(counts, "c", "token", out_col="i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("total_tokens"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("c"))
            / (F.count(F.lit(1)) * F.sum("c")).cast("double")
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("gini"),
    )


SQL_TOKEN_GINI = f"""
WITH counts AS (
  SELECT token, count(*) AS c
  FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
  GROUP BY 1
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c ASC, token ASC) AS i FROM counts
)
SELECT count(*) AS n_types,
       CAST(sum(c) AS BIGINT) AS total_tokens,
       round(2.0 * sum(i * c) / CAST(count(*) * sum(c) AS DOUBLE)
             - (count(*) + 1) / CAST(count(*) AS DOUBLE), 6) AS gini
FROM ranked
"""


def q_symspell_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Typo/variant detection via SymSpell deletion neighborhoods (Garbe
    2012): two tokens within edit distance 1 necessarily share a
    1-deletion variant (or one IS the other's deletion), so candidates
    come from an equi join on deletion keys — the scale path for fuzzy
    vocabulary matching, O(vocab × token_len) keys instead of the O(v²)
    all-pairs Levenshtein. Survivors are exact-verified with
    levenshtein = 1 and reported as (rare → ≥10× more frequent)
    correction pairs, the normalize-before-dedup step of a text cleaner.

    The synthetic vocabulary is typo-free, so the fixture PLANTS typos
    deterministically — every 17th document's first token loses its 2nd
    character — and the oracle replays both the corruption and the
    detection, so every planted typo's (typo, correction, counts) row
    is value-checked. Vocab-sized work end to end; the corpus is
    touched once for counts."""
    toks = _docs(spark, sf).select(
        "doc_id", F.posexplode(TXT.tokenize_nonempty("text")).alias("pos", "raw")
    )
    corrupted = toks.select(
        F.when(
            (F.col("doc_id") % 17 == 0) & (F.col("pos") == 0) & (F.length("raw") >= 4),
            F.expr("concat(substring(raw, 1, 1), substring(raw, 3))"),
        )
        .otherwise(F.col("raw"))
        .alias("token")
    )
    counts = (
        corrupted.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("token") >= 3)
    )
    # deletion keys: the token itself + each single-char deletion
    # (substring with a lambda-bound position needs the SQL form — the
    # Python F.substring signature takes int literals only)
    keyed = counts.select(
        "token",
        "c",
        F.explode(
            F.array_union(
                F.array(F.col("token")),
                F.expr(
                    "transform(sequence(1, length(token)), i -> "
                    "concat(substring(token, 1, i - 1), substring(token, i + 1)))"
                ),
            )
        ).alias("key"),
    )
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), F.col("a.key") == F.col("b.key"))
        .filter(F.col("a.token") < F.col("b.token"))
        .select(
            F.col("a.token").alias("t1"),
            F.col("a.c").alias("c1"),
            F.col("b.token").alias("t2"),
            F.col("b.c").alias("c2"),
        )
        .distinct()
        .filter(F.levenshtein("t1", "t2") == 1)
    )
    return (
        cand.select(
            F.when(F.col("c1") <= F.col("c2"), F.col("t1")).otherwise(F.col("t2")).alias("typo"),
            F.when(F.col("c1") <= F.col("c2"), F.col("c1")).otherwise(F.col("c2")).alias("typo_count"),
            F.when(F.col("c1") <= F.col("c2"), F.col("t2")).otherwise(F.col("t1")).alias("correction"),
            F.when(F.col("c1") <= F.col("c2"), F.col("c2")).otherwise(F.col("c1")).alias("corr_count"),
        )
        .filter(F.col("corr_count") >= 10 * F.col("typo_count"))
        .orderBy("typo", "correction")
    )


SQL_SYMSPELL_VARIANTS = f"""
WITH raw AS (
  SELECT doc_id, i AS pos, l[i] AS rawtok
  FROM (SELECT doc_id, {SQL_TOKS} AS l FROM documents),
       unnest(range(1, len(l) + 1)) AS r(i)
),
stream AS (
  SELECT CASE WHEN doc_id % 17 = 0 AND pos = 1 AND length(rawtok) >= 4
              THEN substr(rawtok, 1, 1) || substr(rawtok, 3)
              ELSE rawtok END AS token
  FROM raw
),
counts AS (
  SELECT token, count(*) AS c FROM stream GROUP BY 1
  HAVING length(token) >= 3
),
keyed AS (
  SELECT token, c, key
  FROM counts,
       unnest(list_distinct(
         list_append(
           list_transform(range(1, length(token) + 1),
                          i -> substr(token, 1, i - 1) || substr(token, i + 1)),
           token)
       )) AS u(key)
),
cand AS (
  SELECT DISTINCT a.token AS t1, a.c AS c1, b.token AS t2, b.c AS c2
  FROM keyed a JOIN keyed b ON a.key = b.key
  WHERE a.token < b.token
),
verified AS (
  SELECT * FROM cand WHERE levenshtein(t1, t2) = 1
)
SELECT CASE WHEN c1 <= c2 THEN t1 ELSE t2 END AS typo,
       CASE WHEN c1 <= c2 THEN c1 ELSE c2 END AS typo_count,
       CASE WHEN c1 <= c2 THEN t2 ELSE t1 END AS correction,
       CASE WHEN c1 <= c2 THEN c2 ELSE c1 END AS corr_count
FROM verified
WHERE (CASE WHEN c1 <= c2 THEN c2 ELSE c1 END)
      >= 10 * (CASE WHEN c1 <= c2 THEN c1 ELSE c2 END)
ORDER BY typo, correction
"""


def q_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram novelty curve (the memorization-risk / diminishing-returns
    readout of corpus growth): processing documents in id order, what
    share of each document's distinct trigrams has never appeared in any
    earlier document? Reported per corpus-order decile — the curve's
    decay rate tells a collection effort when new data stops adding new
    content. First occurrence is ``groupBy(g).agg(min(doc_id))`` — a
    MAP-SIDE-PARTIAL aggregate, so a boilerplate trigram appearing in a
    constant fraction of all documents costs one partial row per task,
    never one task-local sort of its whole posting (the
    ``min(doc_id) OVER (PARTITION BY g)`` window this replaces — VERDICT
    r11 #1 — cannot split a hot gram's partition, so its hot task scaled
    WITH the corpus). ``n_new`` per doc then falls out of
    ``groupBy(first_doc).count()`` over the vocab-sized first-seen frame
    — the gram table is never joined back — and ``n_grams`` per doc is a
    narrow ``size(gs)`` projection; the two doc-keyed frames meet in one
    uniform-key left join. Zero skew exposure end to end; no sequential
    scan over the corpus order is ever executed.

    The per-doc distinct-gram ARRAYS are materialized once behind a
    barrier (the stage-materialization posture a production run gets by
    writing tokenized grams to parquet between stages): three consumers
    — the gram explode, the per-doc gram counts, and the eligibility
    frame the decile narrowing ranks over (``size(gs) > 0`` ⟺ ≥ 3
    tokens) — read the checkpointed frame instead of re-running the
    tokenize+ngram pipeline once each, which benched at 2× the whole
    query.

    Deciles use the registry's PARTITIONED-DECILE pattern (the scale-safe
    default any new decile query should copy), with the cut points from
    ``operators/normalize.exact_quantiles_narrowed_multi`` — iterative
    histogram narrowing where all nine ranks SHARE each round's single
    aggregation (~4 column passes total, not one narrowing per rank) —
    because doc_id is CORPUS-CARDINALITY: Spark's exact ``percentile``
    aggregate (fine for
    quantile_bins' money-domain values) would buffer every distinct
    doc_id in one reducer's memory here. The nine rank-k cut points are
    DATA doc_ids (rank = max(1, ceil(k·n/10)) over eligible docs — ≥3
    tokens, exactly the per-doc frame's membership), so the oracle
    replays them bit-for-bit by ranking; a codegen'd strictly-greater
    fold over the 9-literal array assigns each doc its bin. NEVER a
    global ``ntile() OVER (ORDER BY …)`` — that window single-partitions
    the whole corpus at 100 TB."""
    import math

    from sentiment_analysis_bigdata_spark.operators import normalize as NORM

    from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

    docs = ensure_min_parallelism(
        _docs(spark, sf), spark.sparkContext.defaultParallelism, "doc_id"
    )
    gram_arrays = docs.select(
        "doc_id",
        F.array_distinct(
            TXT.ngrams(TXT.tokenize_nonempty("text"), 3)
        ).alias("gs"),
    ).transform(barrier_eager)
    grams = gram_arrays.select("doc_id", F.explode("gs").alias("g"))
    new_per_doc = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    grams_per_doc = gram_arrays.select(
        "doc_id", F.size("gs").alias("n_grams")
    ).filter(F.col("n_grams") > 0)
    per_doc = (
        grams_per_doc.join(
            new_per_doc, F.col("doc_id") == F.col("first_doc"), "left"
        )
        .select(
            "doc_id",
            (
                F.coalesce(F.col("n_new"), F.lit(0).cast("long"))
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )
    # eligible set == per_doc's doc set (≥3 tokens ⟺ ≥1 trigram ⟺
    # size(gs) > 0) — read from the SAME checkpointed frame, so the
    # narrowing's ~4 bounded passes never re-tokenize
    eligible = gram_arrays.filter(F.size("gs") > 0).select("doc_id")
    # distinct ranks (derived from the operator's own count — no
    # separate count() pass): at tiny n adjacent deciles share a
    # rank, and the oracle's IN-list dedups — mirror that exactly
    by_rank, _n, _rounds = NORM.exact_quantiles_narrowed_multi(
        eligible,
        "doc_id",
        ranks_fn=lambda n: sorted(
            {max(1, math.ceil(k * n / 10)) for k in range(1, 10)}
        ),
    )
    cuts = [by_rank[r] for r in sorted(by_rank)]
    cut_arr = F.array(*[F.lit(c) for c in cuts])
    binned = per_doc.select(
        (
            1
            + F.aggregate(
                cut_arr,
                F.lit(0),
                lambda acc, b: acc + F.when(F.col("doc_id") > b, F.lit(1)).otherwise(F.lit(0)),
            )
        ).alias("decile"),
        "novelty",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
        )
        .orderBy("decile")
    )


SQL_NGRAM_NOVELTY = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
  FROM toks, unnest(range(1, len(ts) - 1)) AS r(i)
),
first_seen AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY 1),
per_doc AS (
  SELECT doc_id,
         sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
           / CAST(count(*) AS DOUBLE) AS novelty
  FROM grams JOIN first_seen USING (g)
  GROUP BY 1
),
eligible AS (SELECT doc_id FROM toks WHERE len(ts) >= 3),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM eligible),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM eligible
),
cuts AS (
  SELECT list(r.doc_id) AS cuts
  FROM ranked r CROSS JOIN nn
  WHERE r.rn IN (
    greatest(1, CAST(ceil(1 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(2 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(3 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(4 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(5 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(6 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(7 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(8 * n / 10.0) AS BIGINT)),
    greatest(1, CAST(ceil(9 * n / 10.0) AS BIGINT))
  )
),
binned AS (
  SELECT CAST(1 + len(list_filter(c.cuts, x -> doc_id > x)) AS INT) AS decile,
         novelty
  FROM per_doc CROSS JOIN cuts c
)
SELECT decile, count(*) AS n_docs, round(avg(novelty), 6) AS avg_novelty
FROM binned GROUP BY 1 ORDER BY 1
"""


def q_vocab_richness(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary richness and unseen-mass estimation — the "how much
    vocabulary have we NOT seen yet" number a tokenizer/vocab budget is
    sized against: observed types V, token count N, hapax/dis legomena
    (N1/N2), the Good-Turing unseen-probability mass N1/N, and the
    BIAS-CORRECTED Chao1 richness floor V + N1(N1−1)/(2(N2+1)) — the
    form that stays defined when the corpus has no dis legomena. One
    vocab-sized count agg plus a constant-size rollup; every input an
    exact integer."""
    counts = (
        _docs(spark, sf)
        .select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.agg(
        F.count(F.lit(1)).alias("v_types"),
        F.sum("c").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).alias("n1_hapax"),
        F.sum((F.col("c") == 2).cast("long")).alias("n2_dis"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")) / F.sum("c").cast("double"), 6
        ).alias("good_turing_unseen"),
        F.round(
            F.count(F.lit(1))
            + F.sum((F.col("c") == 1).cast("long"))
            * (F.sum((F.col("c") == 1).cast("long")) - 1)
            / (2.0 * (F.sum((F.col("c") == 2).cast("long")) + 1)),
            4,
        ).alias("chao1_richness"),
    )


SQL_VOCAB_RICHNESS = f"""
WITH counts AS (
  SELECT token, count(*) AS c
  FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
  GROUP BY 1
)
SELECT count(*) AS v_types,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_hapax,
       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_dis,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6)
         AS good_turing_unseen,
       round(count(*) + sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
             / (2.0 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)), 4) AS chao1_richness
FROM counts
"""


# zero-width + bidi-control codepoints, embedded as literal characters so
# both engines' regex engines see identical patterns
_ZW_CHARS = "​‌‍﻿"
_BIDI_CHARS = "‪‫‬‭‮⁦⁧⁨⁩"


def q_unicode_hygiene(spark: SparkSession, sf: str) -> DataFrame:
    """Invisible-character hygiene screen — the prompt-injection /
    text-smuggling sweep a curation pipeline runs before training
    (zero-width characters hide payloads inside innocuous text; bidi
    control characters reorder what reviewers see vs what models read,
    CVE-2021-42574 'Trojan Source'): per source, how many documents
    carry zero-width or bidi-control codepoints. The plain-ASCII fixture
    is corrupted deterministically — every 19th doc gains a zero-width
    space, every 23rd a right-to-left override — and the oracle replays
    BOTH the corruption and the detection, so each flag is value-checked.
    One narrow rlike projection + one source-cardinality rollup."""
    docs = _docs(spark, sf)
    t = (
        F.when(
            F.col("doc_id") % 19 == 0,
            F.concat(F.lit("​"), F.col("text")),
        )
        .otherwise(F.col("text"))
    )
    t = F.when(F.col("doc_id") % 23 == 0, F.concat(t, F.lit("‮"))).otherwise(t)
    flagged = docs.select(
        "source",
        t.rlike(f"[{_ZW_CHARS}]").cast("bigint").alias("has_zw"),
        t.rlike(f"[{_BIDI_CHARS}]").cast("bigint").alias("has_bidi"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_zw").alias("n_zero_width"),
            F.sum("has_bidi").alias("n_bidi"),
            F.sum(
                ((F.col("has_zw") + F.col("has_bidi")) > 0).cast("bigint")
            ).alias("n_flagged"),
        )
        .orderBy("source")
    )


SQL_UNICODE_HYGIENE = f"""
WITH corrupted AS (
  SELECT source,
         CASE WHEN doc_id % 23 = 0
              THEN (CASE WHEN doc_id % 19 = 0 THEN chr(8203) || text ELSE text END) || chr(8238)
              ELSE (CASE WHEN doc_id % 19 = 0 THEN chr(8203) || text ELSE text END)
         END AS t
  FROM documents
),
flagged AS (
  SELECT source,
         CASE WHEN regexp_matches(t, '[{_ZW_CHARS}]') THEN 1 ELSE 0 END AS has_zw,
         CASE WHEN regexp_matches(t, '[{_BIDI_CHARS}]') THEN 1 ELSE 0 END AS has_bidi
  FROM corrupted
)
SELECT source, count(*) AS n_docs,
       CAST(sum(has_zw) AS BIGINT) AS n_zero_width,
       CAST(sum(has_bidi) AS BIGINT) AS n_bidi,
       CAST(sum(CASE WHEN has_zw + has_bidi > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM flagged GROUP BY 1 ORDER BY 1
"""


# --- Gopher quality rules (Rae et al. 2021, Appendix A) -----------------------

# The canonical composite doc-level gate every large-scale curation run
# applies before anything else. All rule comparisons are INTEGER
# cross-multiplications (no float ratios can drift cross-engine).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORDS = 2


def gopher_rules_frame(docs: DataFrame, keep_cols: list[str]) -> DataFrame:
    """Per-document Gopher rule booleans (ok_wc, ok_mwl, ok_sym,
    ok_alpha, ok_stop) alongside ``keep_cols`` — the reusable core shared
    by the ``gopher_quality_gate`` query and the 200k-doc corpus-scale
    pipeline (tools/corpus_scale.py). One pass, whole-stage codegen, all
    integer cross-multiplied comparisons."""
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    d = docs.select(
        *keep_cols,
        F.expr(
            "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
        ).alias("words"),
    ).select(
        *keep_cols,
        F.size("words").alias("wc"),
        F.expr(
            "aggregate(words, 0L, (a, w) -> a + length(w))"
        ).alias("sum_len"),
        F.expr(
            "size(filter(words, w -> w rlike '[a-zA-Z]'))"
        ).alias("alpha_words"),
        F.expr(
            "size(filter(words, w -> w rlike '[#…]' or w like '%...%'))"
        ).alias("symbol_words"),
        F.size(
            F.filter(stops, lambda s: F.array_contains(F.col("words"), s))
        ).alias("stop_hits"),
    )
    return d.select(
        *keep_cols,
        (
            (F.col("wc") >= GOPHER_MIN_WORDS) & (F.col("wc") <= GOPHER_MAX_WORDS)
        ).alias("ok_wc"),
        (
            (F.col("sum_len") >= 3 * F.col("wc"))
            & (F.col("sum_len") <= 10 * F.col("wc"))
        ).alias("ok_mwl"),
        (10 * F.col("symbol_words") <= F.col("wc")).alias("ok_sym"),
        (5 * F.col("alpha_words") >= 4 * F.col("wc")).alias("ok_alpha"),
        (F.col("stop_hits") >= GOPHER_MIN_STOPWORDS).alias("ok_stop"),
    )


def q_gopher_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher rules (Rae et al. 2021, Appendix A), the composite
    document-level quality gate: word count in [50, 100k], mean word
    length in [3, 10], symbol-to-word ratio (# or ellipsis) <= 0.1,
    >= 80% of words contain an alphabetic character, and >= 2 distinct
    required stopwords present. Per-source report of docs passing and a
    per-rule failure breakdown (failures are not mutually exclusive —
    each rule is counted independently, which is what you tune).

    100 TB shape: one corpus pass, all per-doc math inside whole-stage
    codegen over the token array; the report is sources-sized. Every
    rule compares INTEGERS (cross-multiplied thresholds: e.g.
    3*count <= sum_len <= 10*count), so the oracle replay cannot drift."""
    rules = gopher_rules_frame(_docs(spark, sf), ["source"])
    passed = (
        F.col("ok_wc") & F.col("ok_mwl") & F.col("ok_sym")
        & F.col("ok_alpha") & F.col("ok_stop")
    )
    return (
        rules.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(passed.cast("bigint")).alias("n_pass"),
            F.sum((~F.col("ok_wc")).cast("bigint")).alias("n_fail_word_count"),
            F.sum((~F.col("ok_mwl")).cast("bigint")).alias("n_fail_mean_word_len"),
            F.sum((~F.col("ok_sym")).cast("bigint")).alias("n_fail_symbol_ratio"),
            F.sum((~F.col("ok_alpha")).cast("bigint")).alias("n_fail_alpha"),
            F.sum((~F.col("ok_stop")).cast("bigint")).alias("n_fail_stopwords"),
        )
        .orderBy("source")
    )


def _sql_gopher_stoplist() -> str:
    return "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"


SQL_GOPHER_QUALITY_GATE = f"""
WITH words AS (
  SELECT source, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS w
  FROM documents
),
d AS (
  SELECT source,
         len(w) AS wc,
         list_sum(list_transform(w, x -> length(x))) AS sum_len,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
         len(list_filter(w, x -> regexp_matches(x, '[#…]') OR x LIKE '%...%')) AS symbol_words,
         len(list_filter({_sql_gopher_stoplist()}, s -> list_contains(w, s))) AS stop_hits
  FROM words
),
rules AS (
  SELECT source,
         (wc >= {GOPHER_MIN_WORDS} AND wc <= {GOPHER_MAX_WORDS}) AS ok_wc,
         (sum_len >= 3 * wc AND sum_len <= 10 * wc) AS ok_mwl,
         (10 * symbol_words <= wc) AS ok_sym,
         (5 * alpha_words >= 4 * wc) AS ok_alpha,
         (stop_hits >= {GOPHER_MIN_STOPWORDS}) AS ok_stop
  FROM d
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN ok_wc AND ok_mwl AND ok_sym AND ok_alpha AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN NOT ok_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_count,
       CAST(sum(CASE WHEN NOT ok_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_word_len,
       CAST(sum(CASE WHEN NOT ok_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbol_ratio,
       CAST(sum(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
       CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords
FROM rules GROUP BY 1 ORDER BY 1
"""


# --- C4 line-level filters (Raffel et al. 2020 §2.2) --------------------------

# The fixture corpus is single-line, so line structure is PLANTED
# deterministically from (doc_id, line_no) — the same synthesize→process→
# closed-form-oracle pattern as the multimodal PNG lane: terminal
# punctuation on lines where (doc_id + line_no) % 3 != 0, a policy term
# injected on line doc_id % 7, lines are 8-word chunks (the tail chunk
# is shorter, exercising the min-words rule).
C4_LINE_WORDS = 8
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_POLICY_TERMS = ["cookie", "javascript", "lorem ipsum"]


def q_c4_line_filters(spark: SparkSession, sf: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): a line is kept
    only if it ends in terminal punctuation, has >= 5 words, and carries
    no policy boilerplate term; a document survives only with >= 3 kept
    lines. This is the famous line-grained gate between raw crawl and
    every downstream doc-level operator — finer than doc-level
    text_quality and coarser than span dedup.

    100 TB shape: one posexplode to line grain (bounded fan-out:
    len/8 lines per doc), whole-stage-codegen predicates per line, two
    hash aggs (doc then source). All counts are integers."""
    docs = _docs(spark, sf)
    lines = (
        docs.select(
            "doc_id",
            "source",
            F.expr("filter(split(text, '\\\\s+'), t -> t <> '')").alias("words"),
        )
        .select(
            "doc_id",
            "source",
            # empty-doc guard: F.sequence counts DOWN when the end bound is
            # below the start (sequence(0, -1) = [0, -1]), which would
            # fabricate two bogus lines where DuckDB's range(1, 1) yields
            # none — gate on size(words) > 0 so both engines emit no lines
            F.posexplode(
                F.expr(
                    f"CASE WHEN size(words) > 0 THEN "
                    f"transform(sequence(0, CAST(ceil(size(words) / {C4_LINE_WORDS}.0) AS INT) - 1),"
                    f" i -> array_join(slice(words, i * {C4_LINE_WORDS} + 1, {C4_LINE_WORDS}), ' '))"
                    f" ELSE array() END"
                )
            ).alias("line_no", "line"),
        )
        .select(
            "doc_id",
            "source",
            "line_no",
            # plant terminal punctuation and the policy term
            F.when(
                F.col("line_no") == F.col("doc_id") % 7,
                F.concat(F.col("line"), F.lit(" cookie")),
            )
            .otherwise(F.col("line"))
            .alias("l0"),
        )
        .select(
            "doc_id",
            "source",
            "line_no",
            F.when(
                (F.col("doc_id") + F.col("line_no")) % 3 != 0,
                F.concat(F.col("l0"), F.lit(".")),
            )
            .otherwise(F.col("l0"))
            .alias("line"),
        )
    )
    policy = "|".join(C4_POLICY_TERMS)
    judged = lines.select(
        "doc_id",
        "source",
        F.col("line").rlike(r"[.!?\"]$").alias("ok_punct"),
        (
            F.size(F.expr("filter(split(line, '\\\\s+'), t -> t <> '')"))
            >= C4_MIN_LINE_WORDS
        ).alias("ok_len"),
        (~F.lower(F.col("line")).rlike(policy)).alias("ok_policy"),
    )
    per_doc = judged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("ok_punct") & F.col("ok_len") & F.col("ok_policy")).cast("bigint")
        ).alias("n_kept"),
        F.sum((~F.col("ok_punct")).cast("bigint")).alias("f_punct"),
        F.sum((~F.col("ok_len")).cast("bigint")).alias("f_len"),
        F.sum((~F.col("ok_policy")).cast("bigint")).alias("f_policy"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").alias("n_lines"),
            F.sum("n_kept").alias("n_lines_kept"),
            F.sum("f_punct").alias("n_fail_punct"),
            F.sum("f_len").alias("n_fail_short"),
            F.sum("f_policy").alias("n_fail_policy"),
            F.sum(
                (F.col("n_kept") >= C4_MIN_KEPT_LINES).cast("bigint")
            ).alias("n_docs_kept"),
        )
        .orderBy("source")
    )


SQL_C4_LINE_FILTERS = f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS words
  FROM documents
),
raw_lines AS (
  SELECT doc_id, source, u.i - 1 AS line_no,
         array_to_string(words[(u.i - 1) * {C4_LINE_WORDS} + 1 : (u.i) * {C4_LINE_WORDS}], ' ') AS line
  FROM w, unnest(range(1, CAST(ceil(len(words) / {C4_LINE_WORDS}.0) AS BIGINT) + 1)) AS u(i)
),
planted AS (
  SELECT doc_id, source, line_no,
         CASE WHEN (doc_id + line_no) % 3 <> 0
              THEN l0 || '.' ELSE l0 END AS line
  FROM (
    SELECT doc_id, source, line_no,
           CASE WHEN line_no = doc_id % 7
                THEN line || ' cookie' ELSE line END AS l0
    FROM raw_lines)
),
judged AS (
  SELECT doc_id, source,
         regexp_matches(line, '[.!?"]$') AS ok_punct,
         len(list_filter(string_split_regex(line, '\\s+'), t -> t <> '')) >= {C4_MIN_LINE_WORDS} AS ok_len,
         NOT regexp_matches(lower(line), '{"|".join(C4_POLICY_TERMS)}') AS ok_policy
  FROM planted
),
per_doc AS (
  SELECT doc_id, source, count(*) AS n_lines,
         sum(CASE WHEN ok_punct AND ok_len AND ok_policy THEN 1 ELSE 0 END) AS n_kept,
         sum(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS f_punct,
         sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS f_len,
         sum(CASE WHEN NOT ok_policy THEN 1 ELSE 0 END) AS f_policy
  FROM judged GROUP BY 1, 2
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(sum(n_kept) AS BIGINT) AS n_lines_kept,
       CAST(sum(f_punct) AS BIGINT) AS n_fail_punct,
       CAST(sum(f_len) AS BIGINT) AS n_fail_short,
       CAST(sum(f_policy) AS BIGINT) AS n_fail_policy,
       CAST(sum(CASE WHEN n_kept >= {C4_MIN_KEPT_LINES} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept
FROM per_doc GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "gopher_quality_gate": (q_gopher_quality_gate, SQL_GOPHER_QUALITY_GATE),
    "c4_line_filters": (q_c4_line_filters, SQL_C4_LINE_FILTERS),
    "accent_fold": (q_accent_fold, SQL_ACCENT_FOLD),
    "char_entropy": (q_char_entropy, SQL_CHAR_ENTROPY),
    "boilerplate_ngrams": (q_boilerplate_ngrams, SQL_BOILERPLATE_NGRAMS),
    "hill_tail_index": (q_hill_tail_index, SQL_HILL_TAIL_INDEX),
    "token_gini": (q_token_gini, SQL_TOKEN_GINI),
    "symspell_variants": (q_symspell_variants, SQL_SYMSPELL_VARIANTS),
    "unicode_hygiene": (q_unicode_hygiene, SQL_UNICODE_HYGIENE),
    "ngram_novelty": (q_ngram_novelty, SQL_NGRAM_NOVELTY),
    "vocab_richness": (q_vocab_richness, SQL_VOCAB_RICHNESS),
    "term_dispersion": (q_term_dispersion, SQL_TERM_DISPERSION),
    "readability_scores": (q_readability_scores, SQL_READABILITY_SCORES),
    "dedup_attribution": (q_dedup_attribution, SQL_DEDUP_ATTRIBUTION),
    "clean_documents": (q_clean_documents, SQL_CLEAN_DOCUMENTS),
    "code_prose_profile": (q_code_prose_profile, SQL_CODE_PROSE_PROFILE),
    "unicode_nfc": (q_unicode_nfc, SQL_UNICODE_NFC),
    "zipf_fit": (q_zipf_fit, SQL_ZIPF_FIT),
    "ngram_diversity": (q_ngram_diversity, SQL_NGRAM_DIVERSITY),
    "dsir_importance": (q_dsir_importance, SQL_DSIR_IMPORTANCE),
    "dsir_sample": (q_dsir_sample, SQL_DSIR_SAMPLE),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "perplexity_buckets": (q_perplexity_buckets, SQL_PERPLEXITY_BUCKETS),
    "lexical_stats": (q_lexical_stats, SQL_LEXICAL_STATS),
    "pii_redaction": (q_pii_redaction, SQL_PII_REDACTION),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "chunk_token_windows": (q_chunk_token_windows, SQL_CHUNK_TOKEN_WINDOWS),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION_RATIO),
    "doc_logprob": (q_doc_logprob, SQL_DOC_LOGPROB),
    "bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "token_topk": (q_token_topk, SQL_TOKEN_TOPK),
    "token_topk_nostop": (q_token_topk_nostop, SQL_TOKEN_TOPK_NOSTOP),
    "bigram_topk": (q_bigram_topk, SQL_BIGRAM_TOPK),
    "bigram_pmi": (q_bigram_pmi, SQL_BIGRAM_PMI),
    "chi2_lang_terms": (q_chi2_lang_terms, SQL_CHI2_LANG_TERMS),
    "doc_frequency_idf": (q_doc_frequency_idf, SQL_DOC_FREQUENCY_IDF),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "countvec_vocab": (q_countvec_vocab, SQL_COUNTVEC_VOCAB),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "corpus_filter_report": (q_corpus_filter_report, _sql_corpus_filter_report()),
    "source_overlap": (q_source_overlap, SQL_SOURCE_OVERLAP),
    "span_corruption_plan": (q_span_corruption_plan, SQL_SPAN_CORRUPTION_PLAN),
    "hashed_embeddings": (q_hashed_embeddings, SQL_HASHED_EMBEDDINGS),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "label_distribution": (q_label_distribution, SQL_LABEL_DISTRIBUTION),
    "corpus_health": (q_corpus_health, _sql_corpus_health()),
    "fingerprint_clusters": (q_fingerprint_clusters, SQL_FINGERPRINT_CLUSTERS),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "length_histogram": (q_length_histogram, SQL_LENGTH_HISTOGRAM),
    "rolling_fingerprint": (q_rolling_fingerprint, SQL_ROLLING_FINGERPRINT),
    "approx_aggregates": (q_approx_aggregates, SQL_APPROX_AGGREGATES),
    "payload_stats": (q_payload_stats, SQL_PAYLOAD_STATS),
}
