"""Scale-mechanism queries: salted aggregation (oracle = the plain GROUP BY
it must be equivalent to), bucketed join, stateful streaming EWMA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions import text as TXT
from sentiment_analysis_bigdata_spark.operators import skew
from sentiment_analysis_bigdata_spark.sources import (
    ensure_min_parallelism,
    load_table,
)
from sentiment_analysis_bigdata_spark.workloads.text_q import SQL_TOKS
from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager, barrier_lazy


def q_salted_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation of token counts — the hot-key-resilient
    plan for stopword-like skew. Must equal the direct GROUP BY (oracle)."""
    docs = load_table(spark, sf, "documents")
    tokens = docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
    return skew.salted_agg(tokens, ["token"], {"n": ("token", "count")}, salt=16)


SQL_SALTED_TOKEN_COUNTS = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
GROUP BY token
"""


def q_salted_supplier_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salt-replicated join (left-skew remedy) — equals the plain join."""
    li = load_table(spark, sf, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        skew.salted_join_left_skewed(li, supp, "l_suppkey", salt=8)
        .groupBy("l_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


SQL_SALTED_SUPPLIER_JOIN = """
SELECT l_suppkey, s_name, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY l_suppkey, s_name
"""


def q_salted_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-salted two-phase COUNT(DISTINCT) (operators/skew.
    salted_count_distinct): distinct users per event type. event_type has
    single-digit cardinality, so EVERY key is a hot key — the exact shape
    where plain count_distinct ships all distinct (key, user) pairs to one
    reducer per key and salting by hash(value) spreads each key over
    ``salt`` reducers with exactly-summable disjoint partials. Must equal
    the direct COUNT(DISTINCT) (oracle); wall-time A/B at bench scale in
    SCALING.md (tools/skew_stress_bench.py)."""
    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    return skew.salted_count_distinct(
        ev, ["event_type"], "user_id", out="n_distinct_users", salt=16
    )


SQL_SALTED_DISTINCT_USERS = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events
GROUP BY event_type
"""


def q_stateful_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    EWMA of event values, run as a real incremental stream.

    Value-checkable: the fold is deterministic over (ts, event_id) order with
    alpha = 0.3, and IEEE gives 1 - 0.3 == 0.7 exactly, so DuckDB's
    list_reduce over the same ordered values reproduces the final state
    bit-for-bit (also asserted against the batch twin in
    tests/test_scale_ops.py)."""
    from sentiment_analysis_bigdata_spark.streaming import jobs as SJ
    from sentiment_analysis_bigdata_spark.streaming import stateful

    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    out = stateful.ewma_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("q_stateful_ewma")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    SJ._await_or_raise(q, 120)
    res = spark.table("q_stateful_ewma")
    return res.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("ewma", "n_events"), 6).alias("ewma"),
    )


# the lambda mirrors _fold_ewma: e ← 0.3·v + 0.7·e, seeded with the first
# value, over the user's (ts, event_id)-ordered history
SQL_STATEFUL_EWMA = """
WITH ordered AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       round(list_reduce(vals, (acc, v) -> 0.3 * v + 0.7 * acc), 6) AS ewma
FROM ordered
"""


def q_dataset_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Order-independent content fingerprint of the documents table
    (operators/ordering.py dataset_fingerprint): Σ md5-row-hashes mod 2⁶¹
    + row count — identical under any partitioning or row order, so the
    oracle's sequential scan must land on the same value. The dataset-
    version id a reproducible pipeline records next to its outputs."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    docs = load_table(spark, sf, "documents")
    return ordering.dataset_fingerprint(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )


SQL_DATASET_FINGERPRINT = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(('0x' || substr(md5(
              concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), '␀'),
                        coalesce(text, '␀'),
                        coalesce(lang, '␀'),
                        coalesce(source, '␀'),
                        coalesce(CAST(n_chars AS VARCHAR), '␀'))
            ), 1, 15)) AS BIGINT)) % 2305843009213693952 AS BIGINT) AS fingerprint
FROM documents
"""


def q_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Two-pass exact-count top-k tokens: map-side bounded candidate
    generation (no full-keyspace shuffle), then an exact recount of only the
    candidates. Counts are exact, so the plain SQL top-k is the oracle."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    docs = load_table(spark, sf, "documents")
    tokens = docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
    return sketches.heavy_hitters(tokens, "token", k=20, per_partition=500)


SQL_HEAVY_HITTERS = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({SQL_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy per-partition sequence packing into 512-token training shards.

    Shard ids depend on the partition layout, so the value check is over the
    packing INVARIANTS, which are layout-independent: every doc packed
    exactly once (n_docs, distinct_docs, total_tokens all SQL-recomputable
    from the raw table), oversize docs flagged exactly when n_tokens > 512,
    and no multi-doc shard overfilled (violations ≡ 0). Per-shard structure
    is further covered by tests/test_packing.py."""
    from sentiment_analysis_bigdata_spark.operators import packing

    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.size(TXT.tokenize_nonempty("text")).cast("long").alias("n_tokens")
    )
    packed = packing.pack_sequences(docs, max_tokens=512)
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("distinct_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.col("oversize").cast("bigint")).cast("bigint").alias("oversize_docs"),
        F.sum(
            ((F.col("shard_fill") > 512) & ~F.col("oversize")).cast("bigint")
        ).cast("bigint").alias("overfill_violations"),
    )


SQL_PACK_SEQUENCES = f"""
WITH toks AS (SELECT doc_id, len({SQL_TOKS}) AS n_tokens FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS distinct_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(*) FILTER (n_tokens > 512) AS BIGINT) AS oversize_docs,
       CAST(0 AS BIGINT) AS overfill_violations
FROM toks
"""


def q_global_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle: content-addressed shard + in-shard
    ordinal (reproducible global permutation, no global sort). Full per-row
    value check — shard AND position must match the SQL replay."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    docs = load_table(spark, sf, "documents").select("doc_id")
    return ordering.deterministic_shuffle(docs, n_shards=16).select(
        "doc_id", "shard", "ordinal"
    )


def _sql_global_shuffle() -> str:
    from sentiment_analysis_bigdata_spark.operators.ordering import sql_shuffle_exprs

    shard, ordinal = sql_shuffle_exprs("doc_id", 42, 16)
    return f"SELECT doc_id, {shard} AS shard, {ordinal} AS ordinal FROM documents"


SQL_GLOBAL_SHUFFLE = _sql_global_shuffle()


def q_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Content-addressed train/val/test split — per-row membership is a pure
    function of md5(doc_id:seed), so it is stable across engines, reruns,
    partitionings, and incremental data arrival (randomSplit is none of
    those). Every row's split label is value-checked."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    docs = load_table(spark, sf, "documents").select("doc_id")
    return ordering.split_by_hash(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def _sql_hash_split() -> str:
    from sentiment_analysis_bigdata_spark.operators.ordering import sql_split_expr

    expr = sql_split_expr({"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id", 42)
    return f"SELECT doc_id, {expr} AS split FROM documents"


SQL_HASH_SPLIT = _sql_hash_split()


def q_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-split leakage check — the decontamination step BETWEEN a
    dataset's own splits: after the content-addressed hash split, any
    normalized-content fingerprint appearing in two splits means an
    eval example leaks into training (split membership keys on doc_id,
    so textual duplicates land in different splits freely). Reports, per
    split pair, the shared fingerprint count and per-split totals —
    per-fingerprint split-set expansion bounded by C(3,2), the same
    never-self-join shape as source_overlap."""
    from sentiment_analysis_bigdata_spark.functions import text as TXT
    from sentiment_analysis_bigdata_spark.operators import ordering

    docs = load_table(spark, sf, "documents")
    split = ordering.split_by_hash(
        docs.select("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    fps = (
        docs.select("doc_id", TXT.fingerprint("text").alias("fp"))
        .join(split, "doc_id")
        .select("split", "fp")
        .distinct()
        .transform(barrier_eager)
    )
    sizes = fps.groupBy("split").agg(F.count(F.lit(1)).alias("n_fps"))
    shared = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set("split")).alias("splits"))
        .where(F.size("splits") >= 2)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("splits"),
                            lambda a: F.transform(
                                F.col("splits"),
                                lambda b: F.struct(
                                    a.alias("split_a"), b.alias("split_b")
                                ),
                            ),
                        )
                    ),
                    lambda p: p["split_a"] < p["split_b"],
                )
            ).alias("p")
        )
        .groupBy("p.split_a", "p.split_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    sa = sizes.select(F.col("split").alias("split_a"), F.col("n_fps").alias("n_fps_a"))
    sb = sizes.select(F.col("split").alias("split_b"), F.col("n_fps").alias("n_fps_b"))
    # every split pair reports, leaky or not — "0 leaked" is the result a
    # release gate asserts on, so it must be a row, not an absence. The
    # split names are compile-time constants, so the pair skeleton is a
    # LITERAL frame (equi joins only — no non-equi join in the plan).
    names = sorted(["train", "val", "test"])
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(names) for b in names[i + 1:]],
        "split_a string, split_b string",
    )
    return (
        pairs.join(sa, "split_a", "left")
        .join(sb, "split_b", "left")
        .join(shared, ["split_a", "split_b"], "left")
        .select(
            "split_a",
            "split_b",
            F.coalesce("n_shared_fps", F.lit(0)).alias("n_shared_fps"),
            # a split that received no docs still reports (size 0) — the
            # skeleton is the contract, sizes only decorate it
            F.coalesce("n_fps_a", F.lit(0)).alias("n_fps_a"),
            F.coalesce("n_fps_b", F.lit(0)).alias("n_fps_b"),
        )
        .orderBy("split_a", "split_b")
    )


def _sql_split_leakage() -> str:
    from sentiment_analysis_bigdata_spark.operators.ordering import sql_split_expr
    from sentiment_analysis_bigdata_spark.workloads.text_q import SQL_FP

    expr = sql_split_expr({"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id", 42)
    return f"""
WITH fps AS (
  SELECT DISTINCT {expr} AS split, {SQL_FP} AS fp FROM documents
),
sizes AS (SELECT split, count(*) AS n_fps FROM fps GROUP BY 1),
shared AS (
  SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_shared_fps
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.split < b.split
  GROUP BY 1, 2
)
SELECT p.split_a, p.split_b,
       coalesce(sh.n_shared_fps, 0) AS n_shared_fps,
       coalesce(sa.n_fps, 0) AS n_fps_a, coalesce(sb.n_fps, 0) AS n_fps_b
FROM (VALUES ('test', 'train'), ('test', 'val'), ('train', 'val'))
     p(split_a, split_b)
LEFT JOIN sizes sa ON sa.split = p.split_a
LEFT JOIN sizes sb ON sb.split = p.split_b
LEFT JOIN shared sh ON sh.split_a = p.split_a AND sh.split_b = p.split_b
ORDER BY p.split_a, p.split_b
"""


SQL_SPLIT_LEAKAGE = _sql_split_leakage()


def q_balance_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Domain balancing: deterministically downsample every source to the
    smallest source's size (expected-size, content-addressed membership) —
    the data-mixing primitive of a pre-training pipeline. Per-row
    membership is replayed exactly by the SQL twin."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    # balance on lang — the skewed domain column (en dominates the corpus);
    # source is uniform in the testdata, which would make rejection vacuous
    docs = load_table(spark, sf, "documents").select("doc_id", "lang")
    return ordering.balance_sources(docs, source_col="lang").select("doc_id", "lang")


SQL_BALANCE_SOURCES = """
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS mn FROM counts),
rates AS (SELECT lang, (mn / n) AS accept FROM counts CROSS JOIN m)
SELECT doc_id, lang
FROM documents JOIN rates USING (lang)
WHERE ((CAST(('0x' || substr(md5(doc_id || ':42'), 1, 15)) AS BIGINT) % 1000000) / 1000000.0)
      < accept
"""


def q_group_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 5-per-group sample (smallest md5(id:seed) per
    event_type) — the content-addressed reservoir for eval-set extraction
    (operators/ordering.py sample_per_group). Every selected row AND its
    rank are value-checked against the SQL replay."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    ev = load_table(spark, sf, "events").select("event_id", "event_type")
    return ordering.sample_per_group(
        ev, ["event_type"], k=5, id_col="event_id"
    ).select("event_type", "sample_rank", "event_id")


def _sql_group_sample() -> str:
    from sentiment_analysis_bigdata_spark.operators.ordering import sql_sample_key

    key = sql_sample_key("event_id", 42)
    return f"""
WITH ranked AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {key}, event_id) AS sample_rank
  FROM events
)
SELECT event_type, CAST(sample_rank AS BIGINT) AS sample_rank, event_id
FROM ranked WHERE sample_rank <= 5
"""


SQL_GROUP_SAMPLE = _sql_group_sample()



_MIX_TARGETS = {"en": 0.2, "zh": 0.2, "es": 0.2, "de": 0.2, "fr": 0.2}


def q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Target-ratio mixture resampling (operators/ordering.py
    ``mixture_sample``): equalize every language's share of total chars.
    The dominant lang (en, ~43% of chars) downsamples (rate < 1); minority
    langs upsample by deterministic repetition (rate > 1, copy_id epochs) —
    both paths exercised and replayed row-for-row by the SQL twin."""
    from sentiment_analysis_bigdata_spark.operators import ordering

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    mixed = ordering.mixture_sample(
        docs, _MIX_TARGETS, weight_col="n_chars", source_col="lang"
    )
    return mixed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chars").alias("w_out"),
    )


def _sql_mixture_sample() -> str:
    case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGETS.items()
    ) + " ELSE 0.0 END"
    return f"""
WITH tot AS (SELECT sum(n_chars) AS wt FROM documents),
per AS (SELECT lang, sum(n_chars) AS ws FROM documents GROUP BY 1),
rates AS (
  SELECT lang, ({case}) * wt / ws AS rate FROM per CROSS JOIN tot
),
expanded AS (
  SELECT d.doc_id, d.lang, d.n_chars, CAST(c AS BIGINT) AS copy_id, r.rate
  FROM documents d JOIN rates r USING (lang),
       unnest(range(0, CAST(ceil(r.rate) AS BIGINT))) AS u(c)
  WHERE r.rate > 0
),
kept AS (
  SELECT doc_id, lang, n_chars FROM expanded
  WHERE copy_id < floor(rate)
     OR ((CAST(('0x' || substr(md5(doc_id || ':' || copy_id || ':42'), 1, 15)) AS BIGINT)
          % 1000000) / 1000000.0) < rate - floor(rate)
)
SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS w_out
FROM kept GROUP BY 1
"""


SQL_MIXTURE_SAMPLE = _sql_mixture_sample()


def q_cms_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch frequency estimation: build a mergeable
    depth=4 × width=1024 sketch over the corpus token stream (fixed-size
    summary, corpus-size-independent), then probe it for the exact top-20
    tokens. Output pairs the estimate with the exact count so the
    overcount-only CMS guarantee (est ≥ exact) is itself value-checked;
    the md5-derived cell hashes make the whole sketch replayable
    bit-for-bit in SQL."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    docs = load_table(spark, sf, "documents")
    tokens = docs.select(F.explode(TXT.tokenize_nonempty("text")).alias("token"))
    sketch = sketches.cms_build(tokens, "token", depth=4, width=1024, seed=0)
    exact = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(20)
    )
    est = sketches.cms_estimate(sketch, exact, "token", depth=4, width=1024, seed=0)
    return exact.join(est, "token").select(
        "token",
        "exact_n",
        "est_n",
        (F.col("est_n") >= F.col("exact_n")).alias("no_undercount"),
    )


SQL_CMS_TOKEN_COUNTS = f"""
WITH toks AS (SELECT unnest({SQL_TOKS}) AS token FROM documents),
e AS (SELECT token, r FROM toks CROSS JOIN (SELECT unnest(range(4)) AS r)),
sketch AS (
  SELECT r,
         CAST(('0x' || substr(md5(token || ':' || r || ':0'), 1, 15)) AS BIGINT)
           % 1024 AS b,
         count(*) AS cnt
  FROM e GROUP BY 1, 2
),
exact AS (
  SELECT token, count(*) AS exact_n FROM toks
  GROUP BY token ORDER BY exact_n DESC, token ASC LIMIT 20
),
probes AS (
  SELECT token, r,
         CAST(('0x' || substr(md5(token || ':' || r || ':0'), 1, 15)) AS BIGINT)
           % 1024 AS b
  FROM exact CROSS JOIN (SELECT unnest(range(4)) AS r)
),
est AS (
  SELECT p.token, min(coalesce(s.cnt, 0)) AS est_n
  FROM probes p LEFT JOIN sketch s ON s.r = p.r AND s.b = p.b
  GROUP BY p.token
)
SELECT x.token, x.exact_n, est.est_n, est.est_n >= x.exact_n AS no_undercount
FROM exact x JOIN est USING (token)
"""


def q_hist_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-histogram quantile estimation: 250-bin fixed-range
    sketch of event values per event_type (sketch ≤ bins cells/key at any
    corpus size; merges by cell-sum), p50/p95 read off the cumulative
    histogram. Output pairs each estimate with the exact rank-based
    quantile and value-checks the a-priori error bound 0 ≤ est − exact ≤
    bin width (operators/sketches.py hist_sketch/hist_quantiles)."""
    from sentiment_analysis_bigdata_spark.operators import sketches
    from pyspark.sql import Window

    LO, HI, BINS = 0.0, 500.0, 250
    W = (HI - LO) / BINS
    ev = load_table(spark, sf, "events")
    sk = sketches.hist_sketch(ev, "value", LO, HI, BINS, keys=["event_type"])
    est = sketches.hist_quantiles(
        sk, [0.5, 0.95], LO, HI, BINS, keys=["event_type"]
    )
    # exact rank-based quantile (value at rank ceil(q*total)) via the
    # same support-sized cumulative shape
    by_val = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    win = Window.partitionBy("event_type").orderBy("v")
    cum = by_val.withColumn(
        "cum", F.sum("cnt").over(win.rowsBetween(Window.unboundedPreceding, 0))
    )
    totals = by_val.groupBy("event_type").agg(F.sum("cnt").alias("total"))
    qdf = spark.createDataFrame([(0.5,), (0.95,)], "q double")
    exact = (
        cum.join(totals, "event_type")
        .join(qdf)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("event_type", "q")
        .agg(F.min("v").alias("exact"))
    )
    return est.join(exact, ["event_type", "q"]).select(
        "event_type",
        "q",
        F.round("est", 6).alias("est"),
        F.round("exact", 6).alias("exact"),
        (
            (F.col("est") - F.col("exact") >= 0)
            & (F.col("est") - F.col("exact") <= W)
        ).alias("within_bound"),
    )


SQL_HIST_QUANTILES = """
WITH sk AS (
  SELECT event_type,
         CAST(least(greatest(floor(value / 2.0), 0), 249) AS INT) AS bucket,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sk
),
tot AS (SELECT event_type, sum(cnt) AS total FROM sk GROUP BY 1),
qs AS (SELECT CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q),
est AS (
  SELECT c.event_type, q.q, CAST((min(c.bucket) + 1) * 2.0 AS DOUBLE) AS est
  FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs q
  WHERE c.cum >= ceil(q.q * t.total)
  GROUP BY 1, 2
),
byval AS (
  SELECT event_type, value AS v, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
vcum AS (
  SELECT event_type, v, sum(cnt) OVER (PARTITION BY event_type ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM byval
),
exact AS (
  SELECT vc.event_type, q.q, min(vc.v) AS exact
  FROM vcum vc JOIN tot t USING (event_type) CROSS JOIN qs q
  WHERE vc.cum >= ceil(q.q * t.total)
  GROUP BY 1, 2
)
SELECT e.event_type, e.q,
       round(e.est, 6) AS est,
       round(x.exact, 6) AS exact,
       e.est - x.exact >= 0 AND e.est - x.exact <= 2.0 AS within_bound
FROM est e JOIN exact x ON x.event_type = e.event_type AND x.q = e.q
"""


_MIX_TEMP = 2.0  # temperature: w_s ∝ p_s^(1/T) (T=1 natural, T→∞ uniform)


# UniMax (Chung et al. 2023): budget B = 19/10 of corpus tokens, per-source
# epoch cap E = 2 — chosen so SOME sources hit the cap on the fixture
# (capacities vary ~±10% around B/n). All math is INTEGER (DIV), so the
# knife-edge capped/uncapped boundary cannot drift cross-engine.
UNIMAX_BUDGET_NUM = 19
UNIMAX_BUDGET_DEN = 10
UNIMAX_MAX_EPOCHS = 2


def q_unimax_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """UniMax sampling allocation (Chung et al. 2023): distribute a total
    token budget UNIFORMLY across sources, capping each source at
    ``UNIMAX_MAX_EPOCHS`` epochs of its own data and re-spreading the
    surplus over the uncapped rest — the epoch-capped alternative to
    temperature mixing (``mixture_plan``) that avoids over-epoching
    low-resource sources. Water-filling has a CLOSED FORM over the
    capacity-sorted sources (no iteration): source i is capped iff its
    capacity fits under the level computed from the budget left after
    capping everything smaller — one window chain, integer arithmetic
    end to end (budget = B·19 DIV 10, level = remaining DIV n_uncapped),
    so both engines agree exactly even at knife-edge caps.

    100 TB shape: one corpus pass for token counts, then all math on the
    sources-sized frame (window over ~10²-10³ rows). Epochs reported at
    6 dp from identical integer inputs."""
    docs = load_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(TXT.tokenize_nonempty("text"))).alias("tokens")
    )
    tot = per_src.agg(
        F.sum("tokens").alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    from pyspark.sql import Window

    cap = (F.lit(UNIMAX_MAX_EPOCHS) * F.col("tokens")).alias("capacity")
    w = Window.orderBy("capacity", "source")
    d = (
        per_src.join(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            cap,
            (
                F.col("_total") * UNIMAX_BUDGET_NUM
                - (F.col("_total") * UNIMAX_BUDGET_NUM) % UNIMAX_BUDGET_DEN
            ).alias("_bnum"),  # floor to a multiple of DEN, then exact DIV
            "_n",
        )
        .withColumn("budget", (F.col("_bnum") / UNIMAX_BUDGET_DEN).cast("bigint"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("capacity").over(w))
    )
    # capped iff capacity <= level available BEFORE this row is capped:
    # avail = B - (cum - capacity); share = avail DIV remaining rows
    avail = F.col("budget") - (F.col("cum") - F.col("capacity"))
    share = (avail - avail % (F.col("_n") - F.col("rn") + 1)) / (
        F.col("_n") - F.col("rn") + 1
    )
    d = d.withColumn("capped", F.col("capacity") <= share.cast("bigint"))
    # level for the uncapped rows: budget left after ALL capped rows,
    # split evenly (integer DIV) over the uncapped count
    agg = d.agg(
        F.sum(F.when(F.col("capped"), F.col("capacity")).otherwise(0)).alias(
            "_capped_sum"
        ),
        F.sum((~F.col("capped")).cast("bigint")).alias("_n_uncapped"),
    )
    rem = F.col("budget") - F.col("_capped_sum")
    level = (rem - rem % F.greatest(F.col("_n_uncapped"), F.lit(1))) / F.greatest(
        F.col("_n_uncapped"), F.lit(1)
    )
    return (
        d.join(F.broadcast(agg))
        .select(
            "source",
            "tokens",
            "capacity",
            "capped",
            F.when(F.col("capped"), F.col("capacity"))
            .otherwise(level.cast("bigint"))
            .alias("allocated"),
        )
        .withColumn(
            # a source whose docs are all empty has tokens=0 (capacity 0,
            # capped, allocated 0): define epochs as 0.0 rather than 0/0 —
            # ANSI Spark would error and DuckDB would emit NaN
            "epochs",
            F.when(
                F.col("tokens") > 0,
                F.round(F.col("allocated") / F.col("tokens"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("source")
    )


SQL_UNIMAX_MIXTURE = f"""
WITH per_src AS (
  SELECT source, CAST(sum(len({SQL_TOKS})) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS total, count(*) AS n FROM per_src
),
d AS (
  SELECT p.source, p.tokens,
         {UNIMAX_MAX_EPOCHS} * p.tokens AS capacity,
         (t.total * {UNIMAX_BUDGET_NUM}) // {UNIMAX_BUDGET_DEN} AS budget,
         t.n AS n,
         row_number() OVER (ORDER BY {UNIMAX_MAX_EPOCHS} * p.tokens, p.source) AS rn,
         sum({UNIMAX_MAX_EPOCHS} * p.tokens)
           OVER (ORDER BY {UNIMAX_MAX_EPOCHS} * p.tokens, p.source) AS cum
  FROM per_src p CROSS JOIN tot t
),
flagged AS (
  SELECT *,
         capacity <= (budget - (cum - capacity)) // (n - rn + 1) AS capped
  FROM d
),
agg AS (
  SELECT CAST(sum(CASE WHEN capped THEN capacity ELSE 0 END) AS BIGINT) AS capped_sum,
         CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT) AS n_uncapped
  FROM flagged
)
SELECT f.source, f.tokens, f.capacity, f.capped,
       CASE WHEN f.capped THEN f.capacity
            ELSE (f.budget - a.capped_sum) // greatest(a.n_uncapped, 1) END AS allocated,
       CASE WHEN f.tokens > 0 THEN
         round((CASE WHEN f.capped THEN f.capacity
                     ELSE (f.budget - a.capped_sum) // greatest(a.n_uncapped, 1) END)
               / CAST(f.tokens AS DOUBLE), 6)
       ELSE 0.0 END AS epochs
FROM flagged f CROSS JOIN agg a
ORDER BY 1
"""


def q_mixture_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-weighted data-recipe computation (the per-source
    sampling table of a multilingual/multi-source pretraining run, cf.
    mC4/XLM-R's p^α reweighting): per source, token counts → natural
    share p_s → temperature weight w_s ∝ p_s^(1/T) → effective epochs
    w_s·B/tokens_s at a one-total-budget B. Two tiny aggregates (source-
    cardinality frame + 1-row totals, hint-broadcast); the corpus is
    scanned once for token counts. Complements ``mixture_sample`` (which
    MATERIALIZES a resampled corpus): this publishes the recipe numbers
    a training config consumes. Rounded at 6 dp in both engines."""
    docs = load_table(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(TXT.tokenize_nonempty("text"))).alias("tokens"),
    )
    tot = per_src.agg(
        F.sum("tokens").alias("_total"),
    )
    powed = per_src.join(F.broadcast(tot)).withColumn(
        "_pw",
        F.pow(F.col("tokens") / F.col("_total"), 1.0 / _MIX_TEMP),
    )
    z = powed.agg(F.sum("_pw").alias("_z"))
    return (
        powed.join(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(F.col("tokens") / F.col("_total"), 6).alias("p_natural"),
            F.round(F.col("_pw") / F.col("_z"), 6).alias("weight"),
            F.round(
                (F.col("_pw") / F.col("_z")) * F.col("_total") / F.col("tokens"),
                6,
            ).alias("epochs"),
        )
    )


SQL_MIXTURE_PLAN = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({SQL_TOKS})) AS BIGINT) AS tokens
  FROM documents
  GROUP BY 1
),
tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM per_src),
powed AS (
  SELECT per_src.*, tot.total,
         pow(tokens / tot.total, {1.0 / _MIX_TEMP}) AS pw
  FROM per_src CROSS JOIN tot
),
z AS (SELECT sum(pw) AS z FROM powed)
SELECT source, n_docs, tokens,
       round(tokens / total, 6) AS p_natural,
       round(pw / z.z, 6) AS weight,
       round((pw / z.z) * total / tokens, 6) AS epochs
FROM powed CROSS JOIN z
"""


_BLOOM_M, _BLOOM_K = 8192, 3


def q_bloom_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination pre-filter: insert the benchmark
    slice's (doc_id < 25) distinct token 3-grams into an m=8192/k=3 Bloom
    filter (operators/sketches.py ``bloom_build`` — a ≤ m-row mergeable
    position set), probe every corpus (doc_id ≥ 25) gram, and report per
    candidate doc (≥ 2 bloom-positive grams) the bloom-hit count next to
    the EXACT matching-gram count, plus the two honesty columns: the
    no-false-negative guarantee (n_bloom ≥ n_exact always, asserted as a
    value) and the false-alarm flag (candidate with zero exact matches —
    the docs the downstream exact join pays for, priced by the (1−e^{−kn/m})^k
    FP rate, deliberately non-trivial at this m so the surface is tested).

    100 TB shape: the sketch is built from the TINY benchmark side and is
    ≤ m rows by construction; the corpus side is exploded once to distinct
    (doc, gram), probed by a pos equi-join (AQE broadcasts the sketch),
    and ONLY bloom-positive grams reach the exact-check join — the
    pre-filter bargain that makes decontamination affordable when the
    corpus is 100 TB and the benchmark is a few MB. md5-derived positions
    make the filter replayable bit-for-bit in the SQL oracle."""
    from sentiment_analysis_bigdata_spark.operators import sketches

    docs = load_table(spark, sf, "documents")
    # the exploded distinct-gram frame feeds the benchmark slice, the
    # probe, AND the per-doc counting — localCheckpoint materializes it
    # once instead of re-tokenizing the corpus per subtree (the
    # dedup_cascade stage-materialization pattern; a production run would
    # land it in parquet between stages)
    grams = (
        ensure_min_parallelism(
            docs, spark.sparkContext.defaultParallelism, "doc_id"
        )
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(TXT.ngrams(TXT.tokenize_nonempty("text"), 3))
            ).alias("gram"),
        )
        .transform(barrier_lazy)
    )
    bench = grams.filter(F.col("doc_id") < 25).select("gram").distinct()
    corpus = grams.filter(F.col("doc_id") >= 25)
    sketch = sketches.bloom_build(bench, "gram", m=_BLOOM_M, k=_BLOOM_K, seed=0)
    member = sketches.bloom_probe(
        sketch, corpus.select("gram").distinct(), "gram",
        m=_BLOOM_M, k=_BLOOM_K, seed=0,
    )
    # ONE corpus-gram pass computes both flags: bloom verdict (inner join
    # against the all-grams member frame) and exact membership (left join
    # flag against the benchmark gram set)
    flagged = (
        corpus.join(member, "gram")
        .join(bench.withColumn("__in_bench", F.lit(1)), "gram", "left")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(F.col("bloom_member").cast("long")).alias("n_bloom_grams"),
            F.sum(
                F.when(F.col("__in_bench").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_exact_grams"),
        )
        .filter(F.col("n_bloom_grams") >= 2)
        .select(
            "doc_id",
            "n_bloom_grams",
            "n_exact_grams",
            (F.col("n_bloom_grams") >= F.col("n_exact_grams")).alias(
                "no_false_negative"
            ),
            (F.col("n_exact_grams") == 0).alias("false_alarm"),
        )
    )


SQL_BLOOM_CONTAMINATION = f"""
WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
         )) AS gram
  FROM base WHERE len(toks) >= 3
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 25),
sketch AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(gram || ':' || i || ':0'), 1, 15)) AS BIGINT)
           % {_BLOOM_M} AS pos
  FROM bench CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i)
),
corpus AS (SELECT doc_id, gram FROM grams WHERE doc_id >= 25),
probes AS (
  SELECT gram, i,
         CAST(('0x' || substr(md5(gram || ':' || i || ':0'), 1, 15)) AS BIGINT)
           % {_BLOOM_M} AS pos
  FROM (SELECT DISTINCT gram FROM corpus)
       CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i)
),
member AS (
  SELECT p.gram, bool_and(s.pos IS NOT NULL) AS bloom_member
  FROM probes p LEFT JOIN sketch s USING (pos)
  GROUP BY p.gram
),
bl AS (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_bloom_grams
  FROM corpus c JOIN member m USING (gram)
  WHERE m.bloom_member
  GROUP BY c.doc_id
  HAVING count(*) >= 2
),
ex AS (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_exact_grams
  FROM corpus c JOIN bench b USING (gram)
  GROUP BY c.doc_id
)
SELECT bl.doc_id, bl.n_bloom_grams,
       coalesce(ex.n_exact_grams, 0) AS n_exact_grams,
       bl.n_bloom_grams >= coalesce(ex.n_exact_grams, 0) AS no_false_negative,
       coalesce(ex.n_exact_grams, 0) = 0 AS false_alarm
FROM bl LEFT JOIN ex USING (doc_id)
"""


_NARROW_QS = [0.5, 0.9]


def q_exact_quantiles_narrowed(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT order statistics without a global sort
    (operators/normalize.py ``exact_quantile_narrowed``): iterative
    histogram narrowing — per round ONE bins-count aggregation (the only
    driver traffic), range shrinks ~128× per round, and the tiny
    remainder finishes with a bounded TakeOrdered. This is the 100 TB
    answer to the ``percentiles`` query's documented caveat (Spark's
    exact ``percentile`` buffers whole groups in executor memory; a
    global sort shuffles the entire column). The rank-k element is a
    DATA value — no interpolation — so the oracle verifies it
    bit-for-bit by ranking."""
    from sentiment_analysis_bigdata_spark.operators import normalize as NORM

    li = load_table(spark, sf, "lineitem")
    rows = []
    for q in _NARROW_QS:
        v, n, _rounds = NORM.exact_quantile_narrowed(li, "l_extendedprice", q)
        rows.append((q, n, v))
    return spark.createDataFrame(rows, "q double, n_rows long, value double")


SQL_EXACT_QUANTILES_NARROWED = """
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
qs AS (SELECT unnest([0.5, 0.9]) AS q),
ks AS (
  SELECT q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS k, n
  FROM qs CROSS JOIN nn
),
ranked AS (
  SELECT l_extendedprice AS v,
         row_number() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem
)
SELECT ks.q, ks.n AS n_rows, r.v AS value
FROM ks JOIN ranked r ON r.rn = ks.k
"""


_BUDGET_SHARE = 0.25  # select the best ~25% of corpus tokens


def q_token_budget_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-thresholded data selection under a token budget — the
    "keep the best N tokens" step of a pretraining data recipe (quality
    classifier scores → pick the highest-quality slice that fits the
    compute budget). Deterministic bin-granular semantics: docs bucket
    into ≤ 101 quality centibins (round(quality·100)); bins are taken
    from the top until the budget (25% of corpus tokens) is exhausted;
    the output is the per-bin plan — n_docs, bin tokens, running total,
    and each bin's verdict (selected / boundary / excluded). Realizing
    the selection is then a semi-join on the selected bins; the boundary
    bin's partial take is the caller's policy knob (hash-order take, or
    spill to the next training phase).

    100 TB shape: ONE corpus aggregation to ≤ 101 rows, a ≤ 101-row
    cumulative window, and a 1-row total broadcast — the global
    quality sort this replaces would shuffle the whole corpus."""
    docs = load_table(spark, sf, "documents")
    scored = docs.select(
        F.round(TXT.quality_score("text") * 100).cast("int").alias("qbin"),
        F.size(TXT.tokenize_nonempty("text")).cast("long").alias("toks"),
    )
    bins = scored.groupBy("qbin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("bin_tokens")
    )
    from pyspark.sql import Window as W

    cum = bins.withColumn(
        "cum_tokens",
        F.sum("bin_tokens").over(
            W.orderBy(F.col("qbin").desc()).rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    total = bins.agg(F.sum("bin_tokens").alias("_total"))
    return (
        cum.join(F.broadcast(total))
        .select(
            "qbin",
            "n_docs",
            "bin_tokens",
            "cum_tokens",
            F.when(
                F.col("cum_tokens")
                <= F.col("_total") * F.lit(_BUDGET_SHARE),
                F.lit("selected"),
            )
            .when(
                (F.col("cum_tokens") - F.col("bin_tokens"))
                < F.col("_total") * F.lit(_BUDGET_SHARE),
                F.lit("boundary"),
            )
            .otherwise(F.lit("excluded"))
            .alias("verdict"),
        )
    )


def _sql_token_budget_plan() -> str:
    from sentiment_analysis_bigdata_spark.workloads.text_q import _sql_stoplist

    return f"""
WITH base AS (
  SELECT CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
           AS alpha,
         {SQL_TOKS} AS toks
  FROM documents
),
scored AS (
  SELECT CAST(round((
           0.4 * least(n / 200.0, 1.0)
           + 0.3 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
           + 0.3 * (CASE WHEN len(toks) > 0
                         THEN least(CAST(len(list_filter(toks,
                                t -> list_contains({_sql_stoplist()}, t)))
                                AS DOUBLE) / len(toks) * 3.0, 1.0)
                         ELSE 0.0 END)
         ) * 100) AS INT) AS qbin,
         CAST(len(toks) AS BIGINT) AS toks
  FROM base
),
bins AS (
  SELECT qbin, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS bin_tokens
  FROM scored GROUP BY qbin
),
cum AS (
  SELECT *, CAST(sum(bin_tokens) OVER (ORDER BY qbin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_tokens
  FROM bins
),
tot AS (SELECT CAST(sum(bin_tokens) AS BIGINT) AS total FROM bins)
SELECT qbin, n_docs, bin_tokens, cum_tokens,
       CASE WHEN cum_tokens <= total * {_BUDGET_SHARE} THEN 'selected'
            WHEN cum_tokens - bin_tokens < total * {_BUDGET_SHARE}
              THEN 'boundary'
            ELSE 'excluded' END AS verdict
FROM cum CROSS JOIN tot
"""


_GWS_K = 5


def q_group_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group weighted sampling WITHOUT replacement (Gumbel-top-k per
    key — Kool et al. 2019, the Efraimidis-Spirakis A-ES equivalent):
    per source, draw 5 docs with probability ∝ n_chars by ranking
    ln(weight) + Gumbel(0,1) inside the group. The Gumbel noise is
    CONTENT-ADDRESSED (md5(doc_id:seed)-derived uniform), so the sample
    is a pure function of the row ids — reruns, retries, and the oracle
    select identical docs; the rank key is 6dp-rounded with a doc_id tie
    break so the cut is immune to last-ULP ln() drift.

    This is the PER-GROUP face of ``dsir_sample``'s global top-k — the
    'take a weighted sample from EVERY source' step of corpus mixing.
    One narrow expression + one per-group window; no global sort."""
    docs = load_table(spark, sf, "documents")
    u = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(":gws7")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(1_000_000),
        )
        + 0.5
    ) / 1_000_000.0
    gkey = F.round(
        F.log(F.col("n_chars").cast("double")) + (-F.log(-F.log(u))), 6
    )
    from pyspark.sql import Window as W

    win = W.partitionBy("source").orderBy(
        F.col("gumbel_key").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "n_chars", gkey.alias("gumbel_key"))
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _GWS_K)
    )


SQL_GROUP_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         round(ln(CAST(n_chars AS DOUBLE))
               + (-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || ':gws7'), 1, 15)) AS BIGINT) % 1000000 + 0.5)
                    / 1000000.0))), 6) AS gumbel_key
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY gumbel_key DESC, doc_id ASC) AS rk
  FROM keyed
)
SELECT source, doc_id, n_chars, gumbel_key, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_GWS_K}
"""


_WQ_QS = (0.25, 0.5, 0.75, 0.9)


def q_weighted_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted quantiles of document length, weighted by TOKEN MASS —
    the budget-planning readout an unweighted percentile gets wrong
    (the p50 DOCUMENT is short, but the p50 TOKEN lives in a long
    document; packing/truncation policy must follow the token mass):
    for each q, the smallest length whose cumulative token weight
    reaches q of the total.

    Shape: one (length)-keyed weight rollup (support-sized — distinct
    lengths, not documents), one cumulative window over that support,
    and a broadcast 4-row quantile frame; every weight is an exact
    integer so the q·total threshold compare is identical on both
    engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    per_len = (
        docs.select(
            F.col("n_chars").alias("length"),
            F.size(TXT.tokenize_nonempty("text")).cast("long").alias("w"),
        )
        .groupBy("length")
        .agg(F.sum("w").alias("w"))
    )
    w_cum = Window.orderBy("length").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_len.select(
        "length", F.sum("w").over(w_cum).alias("cw")
    ).crossJoin(
        F.broadcast(per_len.agg(F.sum("w").cast("double").alias("tw")))
    )
    qs = spark.createDataFrame([(q,) for q in _WQ_QS], "q double")
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cw") >= F.col("q") * F.col("tw"))
        .groupBy("q")
        .agg(F.min("length").alias("weighted_quantile"))
        .orderBy("q")
    )


SQL_WEIGHTED_QUANTILES = f"""
WITH per_len AS (
  SELECT n_chars AS length, CAST(sum(len({SQL_TOKS})) AS BIGINT) AS w
  FROM documents GROUP BY 1
),
cum AS (
  SELECT length, sum(w) OVER (ORDER BY length) AS cw FROM per_len
),
tot AS (SELECT CAST(sum(w) AS DOUBLE) AS tw FROM per_len),
qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS q)
SELECT q, min(length) AS weighted_quantile
FROM cum CROSS JOIN tot CROSS JOIN qs
WHERE cw >= q * tw
GROUP BY q ORDER BY q
"""


_NEYMAN_BUDGET = 10_000


def q_neyman_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation (Neyman 1934): for
    a fixed sample budget, allocate per stratum proportionally to
    N_h·σ_h — the variance-minimizing design a proportional allocation
    (mixture_plan's shape) leaves on the table when strata differ in
    spread. Per source: size, length stddev, the optimal share, and the
    allocated count for a 10k-doc budget. One per-stratum moment agg +
    a 1-row total broadcast; the allocation math is exact given the
    shared doubles."""
    docs = load_table(spark, sf, "documents")
    strata = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.stddev_samp(F.col("n_chars").cast("double")).alias("sigma_h"),
    )
    weighted = strata.select(
        "source", "n_h", "sigma_h", (F.col("n_h") * F.col("sigma_h")).alias("w")
    )
    total = weighted.agg(F.sum("w").alias("tw"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_h",
            F.round("sigma_h", 4).alias("sigma_h"),
            F.round(F.col("w") / F.col("tw"), 6).alias("alloc_share"),
            F.floor(F.lit(_NEYMAN_BUDGET) * F.col("w") / F.col("tw"))
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("source")
    )


SQL_NEYMAN_ALLOCATION = f"""
WITH strata AS (
  SELECT source, count(*) AS n_h,
         stddev_samp(CAST(n_chars AS DOUBLE)) AS sigma_h
  FROM documents GROUP BY 1
),
weighted AS (SELECT source, n_h, sigma_h, n_h * sigma_h AS w FROM strata),
tot AS (SELECT sum(w) AS tw FROM weighted)
SELECT source, n_h, round(sigma_h, 4) AS sigma_h,
       round(w / tw, 6) AS alloc_share,
       CAST(floor({_NEYMAN_BUDGET} * w / tw) AS BIGINT) AS n_alloc
FROM weighted CROSS JOIN tot
ORDER BY source
"""


QUERIES = {
    "weighted_quantiles": (q_weighted_quantiles, SQL_WEIGHTED_QUANTILES),
    "neyman_allocation": (q_neyman_allocation, SQL_NEYMAN_ALLOCATION),
    "salted_token_counts": (q_salted_token_counts, SQL_SALTED_TOKEN_COUNTS),
    "bloom_contamination": (q_bloom_contamination, SQL_BLOOM_CONTAMINATION),
    "group_weighted_sample": (
        q_group_weighted_sample,
        SQL_GROUP_WEIGHTED_SAMPLE,
    ),
    "token_budget_plan": (q_token_budget_plan, _sql_token_budget_plan()),
    "exact_quantiles_narrowed": (
        q_exact_quantiles_narrowed,
        SQL_EXACT_QUANTILES_NARROWED,
    ),
    "mixture_plan": (q_mixture_plan, SQL_MIXTURE_PLAN),
    "unimax_mixture": (q_unimax_mixture, SQL_UNIMAX_MIXTURE),
    "cms_token_counts": (q_cms_token_counts, SQL_CMS_TOKEN_COUNTS),
    "hist_quantiles": (q_hist_quantiles, SQL_HIST_QUANTILES),
    "dataset_fingerprint": (q_dataset_fingerprint, SQL_DATASET_FINGERPRINT),
    "group_sample": (q_group_sample, SQL_GROUP_SAMPLE),
    "global_shuffle": (q_global_shuffle, SQL_GLOBAL_SHUFFLE),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "split_leakage": (q_split_leakage, SQL_SPLIT_LEAKAGE),
    "balance_sources": (q_balance_sources, SQL_BALANCE_SOURCES),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "salted_supplier_join": (q_salted_supplier_join, SQL_SALTED_SUPPLIER_JOIN),
    "salted_distinct_users": (
        q_salted_distinct_users,
        SQL_SALTED_DISTINCT_USERS,
    ),
    "stateful_ewma": (q_stateful_ewma, SQL_STATEFUL_EWMA),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
}
