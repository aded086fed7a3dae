"""Warehouse / curation queries, batch 2: SCD2 history build, runtime
min/max join filtering, per-group winsorization + robust scaling, and
HTML stripping — each with a DuckDB oracle twin.

Reference parity: none of these exist in the reference (no temporal, no
normalization, no markup surface — SURVEY §2.5); they extend the
north-star warehouse/curation inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.functions.text import HTML_PATTERNS, strip_html
from sentiment_analysis_bigdata_spark.operators import normalize, runtime_filter, scd
from sentiment_analysis_bigdata_spark.sources import load_table


# --- SCD2 history over the events change stream ----------------------------------

def q_scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 history of each user's event_type state: one row per
    (user, run-of-equal-types) with [valid_from, valid_to) and a current
    flag. One shuffle on user_id; both windows share the (ts, event_id)
    sort (operators/scd.py)."""
    ev = load_table(spark, sf, "events")
    return scd.scd2_history(
        ev, ["user_id"], ["event_type"], "ts", tiebreak_col="event_id"
    )


SQL_SCD2_USER_STATE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       lead(ts) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- runtime min/max filtered join ----------------------------------------------

def q_runtime_filtered_join(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per rich supplier (acctbal > 9000): the fact scan is
    pre-pruned to the surviving suppliers' key range before the join
    (operators/runtime_filter.py). The oracle runs the PLAIN join — the
    bound filter must be semantically invisible."""
    li = load_table(spark, sf, "lineitem")
    supp = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey", "s_name")
    )
    joined = runtime_filter.runtime_filtered_join(
        li, supp, "l_suppkey", "s_suppkey"
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            / 100.0
        ).alias("revenue"),
    )


SQL_RUNTIME_FILTERED_JOIN = """
SELECT s_suppkey, s_name,
       count(*) AS n_lines,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
         AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
WHERE s_acctbal > 9000
GROUP BY 1, 2
"""


# --- per-group winsorization -----------------------------------------------------

def q_winsorized_doc_lengths(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source document-length stats after clipping to the source's
    [p05, p95] band (operators/normalize.py — exact percentiles here;
    approx_percentile is the documented 100 TB knob, same shape)."""
    docs = load_table(spark, sf, "documents")
    wins = normalize.winsorize(
        docs, "n_chars", ["source"], lower=0.05, upper=0.95
    )
    return wins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars_clipped").cast("bigint")).alias("n_clipped"),
        F.round(F.avg("n_chars_wins"), 4).alias("avg_wins"),
    )


SQL_WINSORIZED_DOC_LENGTHS = """
WITH b AS (
  SELECT source,
         quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY 1
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_chars < lo OR n_chars > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       round(avg(least(greatest(CAST(n_chars AS DOUBLE), lo), hi)), 4) AS avg_wins
FROM documents d JOIN b USING (source)
GROUP BY 1
"""


# --- per-group robust scaling ----------------------------------------------------

def q_robust_scaled_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type robust z-score ((x − median) / IQR) of event values,
    summarized: scaled extrema and the share of |z| > 2 outliers."""
    ev = load_table(spark, sf, "events")
    scaled = normalize.robust_scale(ev, "value", ["event_type"])
    return scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value_scaled"), 4).alias("min_z"),
        F.round(F.max("value_scaled"), 4).alias("max_z"),
        F.sum(
            (F.abs(F.col("value_scaled")) > 2).cast("bigint")
        ).alias("n_outliers"),
    )


SQL_ROBUST_SCALED_EVENTS = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.5) AS med,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events GROUP BY 1
),
scaled AS (
  SELECT e.event_type,
         CASE WHEN iqr > 0 THEN (value - med) / iqr END AS z
  FROM events e JOIN b USING (event_type)
)
SELECT event_type,
       count(*) AS n,
       round(min(z), 4) AS min_z,
       round(max(z), 4) AS max_z,
       CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM scaled
GROUP BY 1
"""


# --- HTML stripping --------------------------------------------------------------

def _wrapped(text_col, doc_id_col):
    """Deterministic HTML wrapping so the strip chain is exercised on
    markup with a known round-trip."""
    return F.concat(
        F.lit('<div class="d"><!-- c -->'),
        text_col,
        F.lit("</div>"),
        F.when(
            doc_id_col % 3 == 0, F.lit("<script>var x = 1;</script>")
        ).otherwise(F.lit("")),
        F.lit("&amp; &lt;tail&gt;"),
    )


def q_html_stripped_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Strip deterministic HTML wrapping from documents; verify the
    round-trip inline (stripped must equal the whitespace-normalized
    original + decoded tail)."""
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    wrapped = _wrapped(F.col("text"), F.col("doc_id"))
    expected = F.concat(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), F.lit(" & <tail>")
    )
    return docs.select(
        "doc_id",
        strip_html(wrapped).alias("stripped"),
        (strip_html(wrapped) == expected).alias("roundtrip_ok"),
    )


def _sql_strip_chain(inner: str) -> str:
    expr = inner
    for pat, repl in HTML_PATTERNS:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


_SQL_WRAPPED = (
    "concat('<div class=\"d\"><!-- c -->', text, '</div>', "
    "CASE WHEN doc_id % 3 = 0 THEN '<script>var x = 1;</script>' ELSE '' END, "
    "'&amp; &lt;tail&gt;')"
)

SQL_HTML_STRIPPED_DOCS = f"""
SELECT doc_id,
       {_sql_strip_chain(_SQL_WRAPPED)} AS stripped,
       {_sql_strip_chain(_SQL_WRAPPED)} =
         concat(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' & <tail>')
         AS roundtrip_ok
FROM documents
WHERE text IS NOT NULL
"""


# --- token-distribution drift ----------------------------------------------------

def q_source_token_drift(spark: SparkSession, sf: str) -> DataFrame:
    """KL / Jensen-Shannon divergence between the token distributions of
    two document sources (operators/drift.py) — the corpus-monitoring
    guardrail. Each side reduces to a vocab-sized count frame; the raw
    text is scanned once per side."""
    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty
    from sentiment_analysis_bigdata_spark.operators import drift

    docs = load_table(spark, sf, "documents")

    def toks(source: str) -> DataFrame:
        return docs.filter(F.col("source") == source).select(
            F.explode(tokenize_nonempty(F.col("text"))).alias("token")
        )

    d = drift.divergence_from_counts(
        drift.category_counts(toks("src0"), "token"),
        drift.category_counts(toks("src1"), "token"),
        smoothing=0.5,
    )
    return d.select(
        "n_categories",
        F.round("kl_ab", 6).alias("kl_ab"),
        F.round("kl_ba", 6).alias("kl_ba"),
        F.round("js_divergence", 6).alias("js_divergence"),
    )


_SQL_TOKS_DRIFT = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)

SQL_SOURCE_TOKEN_DRIFT = f"""
WITH ta AS (
  SELECT t AS category, count(*) AS na
  FROM (SELECT unnest({_SQL_TOKS_DRIFT}) AS t FROM documents WHERE source = 'src0')
  GROUP BY 1
),
tb AS (
  SELECT t AS category, count(*) AS nb
  FROM (SELECT unnest({_SQL_TOKS_DRIFT}) AS t FROM documents WHERE source = 'src1')
  GROUP BY 1
),
j AS (
  SELECT coalesce(ta.category, tb.category) AS category,
         coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM ta FULL OUTER JOIN tb ON ta.category = tb.category
),
tot AS (SELECT sum(na) AS sa, sum(nb) AS sb, count(*) AS v FROM j),
pq AS (
  SELECT v,
         (na + 0.5) / (sa + 0.5 * v) AS p,
         (nb + 0.5) / (sb + 0.5 * v) AS q
  FROM j CROSS JOIN tot
)
SELECT max(v) AS n_categories,
       round(sum(p * ln(p / q)), 6) AS kl_ab,
       round(sum(q * ln(q / p)), 6) AS kl_ba,
       round(sum(p * ln(p / ((p + q) / 2))) / 2
             + sum(q * ln(q / ((p + q) / 2))) / 2, 6) AS js_divergence
FROM pq
"""



# --- HLL sketch rollup (mergeable distinct counts) -------------------------------

def q_hll_user_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-user counts via Apache DataSketches HLL
    (``hll_sketch_agg`` / ``hll_union_agg`` — Spark built-ins): per-day
    sketches union into per-event-type estimates WITHOUT re-touching the
    fact table, the re-aggregation pattern that makes COUNT DISTINCT
    feasible at 100 TB (a raw distinct re-shuffles the corpus per grain;
    sketches roll up any grain from fixed-size state).

    Correctness contract: the exact distinct count is value-checked
    against the SQL oracle; the two estimate paths (direct sketch vs
    per-day rollup union) are asserted within 5% of exact as boolean
    columns the oracle pins to TRUE — a wrong estimate or a broken union
    turns the row red, so the sketch path itself is driver-gated."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_rollup")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    tol = 0.05
    return direct.join(rolled, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est_direct") - F.col("n_exact"))
            <= F.col("n_exact") * tol
        ).alias("direct_within_tol"),
        (
            F.abs(F.col("est_rollup") - F.col("n_exact"))
            <= F.col("n_exact") * tol
        ).alias("rollup_within_tol"),
    )


SQL_HLL_USER_ROLLUP = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS direct_within_tol,
       TRUE AS rollup_within_tol
FROM events
GROUP BY 1
"""



# --- one-pass table profile (ANALYZE-style column stats) -------------------------

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


def q_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column count/ndv/min/max over orders in ONE aggregate pass
    (operators/profiling.py) — the stats feed for CBO, data-quality gates,
    and schema-drift alerts. The oracle recomputes every column's stats
    independently, so a wrong partial-agg merge or unpivot wiring turns
    the row red."""
    from sentiment_analysis_bigdata_spark.operators import profiling

    return profiling.profile_table(
        load_table(spark, sf, "orders"), _PROFILE_COLS
    )


def _sql_table_profile() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    parts = []
    for name in _PROFILE_COLS:
        col = name if name != "o_orderdate" else "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"
        if name in numeric:
            vals = (f"CAST(min({col}) AS DOUBLE) AS min_numeric, "
                    f"CAST(max({col}) AS DOUBLE) AS max_numeric, "
                    "CAST(NULL AS VARCHAR) AS min_text, CAST(NULL AS VARCHAR) AS max_text")
        else:
            vals = ("CAST(NULL AS DOUBLE) AS min_numeric, CAST(NULL AS DOUBLE) AS max_numeric, "
                    f"CAST(min({col}) AS VARCHAR) AS min_text, CAST(max({col}) AS VARCHAR) AS max_text")
        parts.append(
            f"SELECT '{name}' AS col_name, count(*) AS n_rows, "
            f"count({col}) AS n_nonnull, count(DISTINCT {col}) AS n_distinct, {vals} "
            "FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


SQL_TABLE_PROFILE = _sql_table_profile()



def q_key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew diagnostics for lineitem.l_orderkey
    (operators/profiling.py key_skew_report): the pre-join decision
    numbers (plain shuffle vs salting vs AQE skew split). Oracle
    recomputes the full distribution independently."""
    from sentiment_analysis_bigdata_spark.operators import profiling

    return profiling.key_skew_report(
        load_table(spark, sf, "lineitem"), "l_orderkey", top_k=10
    )


SQL_KEY_SKEW_REPORT = """
WITH counts AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
),
top AS (
  SELECT k, c FROM counts ORDER BY c DESC, k ASC LIMIT 10
),
tops AS (
  SELECT sum(c) AS topc,
         (SELECT k FROM top ORDER BY c DESC, k DESC LIMIT 1) AS max_key,
         max(c) AS max_key_rows
  FROM top
),
tot AS (SELECT sum(c) AS n_rows, count(*) AS n_keys FROM counts)
SELECT CAST(n_rows AS BIGINT) AS n_rows, CAST(n_keys AS BIGINT) AS n_keys,
       round(n_rows / CAST(n_keys AS DOUBLE), 6) AS mean_rows_per_key,
       max_key, CAST(max_key_rows AS BIGINT) AS max_key_rows,
       round(max_key_rows / CAST(n_rows AS DOUBLE), 6) AS max_key_share,
       round(topc / CAST(n_rows AS DOUBLE), 6) AS topk_share
FROM tot CROSS JOIN tops
"""


# --- KS drift over a continuous score distribution --------------------------------

def q_score_drift_ks(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of click vs view events (operators/drift.py) — the
    continuous-drift guardrail next to source_token_drift's categorical
    KL/JS. Values are binned to 3 dp so the cumulative window runs over a
    bounded support at any corpus size."""
    from sentiment_analysis_bigdata_spark.operators import drift

    ev = load_table(spark, sf, "events")
    out = drift.ks_two_sample(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        "value",
        round_digits=3,
    )
    return out.select(
        "n_a",
        "n_b",
        "n_support",
        F.round("ks_stat", 6).alias("ks_stat"),
        F.round("ks_scaled", 6).alias("ks_scaled"),
    )


SQL_SCORE_DRIFT_KS = """
WITH a AS (
  SELECT round(value, 3) AS x, count(*) AS na
  FROM events WHERE event_type = 'click' GROUP BY 1
),
b AS (
  SELECT round(value, 3) AS x, count(*) AS nb
  FROM events WHERE event_type = 'view' GROUP BY 1
),
j AS (
  SELECT COALESCE(a.x, b.x) AS x, COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
  FROM a FULL OUTER JOIN b ON a.x = b.x
),
t AS (SELECT CAST(sum(na) AS DOUBLE) AS ta, CAST(sum(nb) AS DOUBLE) AS tb FROM j),
c AS (
  SELECT sum(na) OVER (ORDER BY x) AS cna, sum(nb) OVER (ORDER BY x) AS cnb FROM j
)
SELECT CAST(t.ta AS BIGINT) AS n_a,
       CAST(t.tb AS BIGINT) AS n_b,
       count(*) AS n_support,
       round(max(abs(cna / t.ta - cnb / t.tb)), 6) AS ks_stat,
       round(max(abs(cna / t.ta - cnb / t.tb)) * sqrt(t.ta * t.tb / (t.ta + t.tb)), 6) AS ks_scaled
FROM c CROSS JOIN t
GROUP BY t.ta, t.tb
"""


_PSI_BINS = 10


def q_score_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index between click and view value
    distributions over reference-decile bins (operators/drift.py
    ``psi_binned``) — the scorecard-drift metric production monitoring
    actually thresholds on (0.1 / 0.25 bands), completing the drift
    family next to KL/JS (categorical) and KS (continuous sup-norm).
    Bin edges are the reference deciles rounded to 6 dp (bit-identical
    between Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    — verified bitwise on the fixture); the oracle replays edges,
    binning, smoothing, and every per-bin contribution."""
    from sentiment_analysis_bigdata_spark.operators import drift

    ev = load_table(spark, sf, "events")
    out = drift.psi_binned(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        "value",
        n_bins=_PSI_BINS,
    )
    return out.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round("contrib", 8).alias("contrib"),
    )


SQL_SCORE_DRIFT_PSI = f"""
WITH edges AS (
  SELECT [round(x, 6) FOR x IN
          quantile_cont(CAST(value AS DOUBLE),
                        [{", ".join(str(i / _PSI_BINS) for i in range(1, _PSI_BINS))}])] AS e
  FROM events WHERE event_type = 'click'
),
rb AS (
  SELECT len(list_filter(e.e, x -> CAST(v.value AS DOUBLE) > x)) AS bin,
         count(*) AS n
  FROM events v CROSS JOIN edges e WHERE v.event_type = 'click' GROUP BY 1
),
cb AS (
  SELECT len(list_filter(e.e, x -> CAST(v.value AS DOUBLE) > x)) AS bin,
         count(*) AS n
  FROM events v CROSS JOIN edges e WHERE v.event_type = 'view' GROUP BY 1
),
sk AS (SELECT unnest(range({_PSI_BINS})) AS bin),
j AS (
  SELECT CAST(sk.bin AS INTEGER) AS bin,
         COALESCE(rb.n, 0) AS n_ref, COALESCE(cb.n, 0) AS n_cur
  FROM sk LEFT JOIN rb ON rb.bin = sk.bin LEFT JOIN cb ON cb.bin = sk.bin
),
t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr, CAST(sum(n_cur) AS DOUBLE) AS tc FROM j)
SELECT j.bin,
       CAST(j.n_ref AS BIGINT) AS n_ref,
       CAST(j.n_cur AS BIGINT) AS n_cur,
       round((j.n_ref + 0.5) / (t.tr + 0.5 * {_PSI_BINS}), 6) AS p_ref,
       round((j.n_cur + 0.5) / (t.tc + 0.5 * {_PSI_BINS}), 6) AS p_cur,
       round(((j.n_ref + 0.5) / (t.tr + 0.5 * {_PSI_BINS})
              - (j.n_cur + 0.5) / (t.tc + 0.5 * {_PSI_BINS}))
             * ln(((j.n_ref + 0.5) / (t.tr + 0.5 * {_PSI_BINS}))
                  / ((j.n_cur + 0.5) / (t.tc + 0.5 * {_PSI_BINS}))), 8) AS contrib
FROM j CROSS JOIN t
"""


def q_dq_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality gate over orders: five row-local
    constraints compiled into ONE aggregation pass (not-null / unique PK /
    price range / status domain / priority shape) plus customer-FK
    referential integrity as a distinct-key anti join (operators/dq.py).
    One row per check with its violation count and pass flag."""
    from sentiment_analysis_bigdata_spark.operators import dq

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    cols = dq.column_checks(
        orders,
        [
            dq.not_null("o_orderkey"),
            dq.unique("o_orderkey"),
            dq.in_range("o_totalprice", 0, 1_000_000),
            dq.accepted_values("o_orderstatus", ["O", "F", "P"]),
            dq.matches_regex("o_orderpriority", "^[1-5]-"),
        ],
    )
    fk = dq.fk_check(orders, "o_custkey", cust, "c_custkey")
    return dq.dq_report([cols, fk]).orderBy("check")


SQL_DQ_ORDERS = """
WITH rows_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
cols AS (
  SELECT 'not_null:o_orderkey' AS "check", rows_total.n AS metric,
         (SELECT CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) FROM orders) AS violations
  FROM rows_total
  UNION ALL
  SELECT 'unique:o_orderkey', rows_total.n,
         (SELECT CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders)
  FROM rows_total
  UNION ALL
  SELECT 'range:o_totalprice', rows_total.n,
         (SELECT CAST(count(*) FILTER (
            WHERE NOT coalesce(o_totalprice BETWEEN 0 AND 1000000, FALSE)) AS BIGINT) FROM orders)
  FROM rows_total
  UNION ALL
  SELECT 'accepted:o_orderstatus', rows_total.n,
         (SELECT CAST(count(*) FILTER (
            WHERE NOT coalesce(o_orderstatus IN ('O', 'F', 'P'), FALSE)) AS BIGINT) FROM orders)
  FROM rows_total
  UNION ALL
  SELECT 'regex:o_orderpriority', rows_total.n,
         (SELECT CAST(count(*) FILTER (
            WHERE NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE)) AS BIGINT) FROM orders)
  FROM rows_total
),
fk AS (
  SELECT 'fk:o_custkey' AS "check",
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
          WHERE o_custkey IS NOT NULL) AS metric,
         (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL
            EXCEPT
            SELECT DISTINCT c_custkey FROM customer
         )) AS violations
)
SELECT "check", metric, violations, violations = 0 AS passed
FROM (SELECT * FROM cols UNION ALL SELECT * FROM fk)
ORDER BY "check"
"""


def q_incremental_order_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Incrementally-maintained monthly order rollup: the history is split
    into three disjoint eras (pre-1997 base state, 1997 delta, 1998+
    delta), each reduced to keyed MERGEABLE partials in its own pass, then
    folded with `merge_states` — union + one combine agg over
    key-cardinality rows, never a history rescan (operators/incremental.py).
    The oracle is the DIRECT aggregate over all of orders: merged
    incremental state must be indistinguishable from a full recompute."""
    from sentiment_analysis_bigdata_spark.operators import incremental

    orders = load_table(spark, sf, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    ).withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    specs = [
        ("n_orders", "*", "count"),
        ("sum_cents", "cents", "sum"),
        ("min_price", "o_totalprice", "min"),
        ("max_price", "o_totalprice", "max"),
    ]
    eras = [
        orders.filter(F.col("o_orderdate") < "1997-01-01"),
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ),
        orders.filter(F.col("o_orderdate") >= "1998-01-01"),
    ]
    parts = [incremental.partial_agg(e, ["month"], specs) for e in eras]
    state = incremental.merge_states(["month"], specs, *parts)
    return incremental.finalize(
        state, {"avg_price": ("sum_cents", "n_orders")}
    ).select(
        "month",
        "n_orders",
        "sum_cents",
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
        F.round(F.col("avg_price") / 100.0, 4).alias("avg_price"),
    )


SQL_INCREMENTAL_ORDER_ROLLUP = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) / 100.0, 4)
         AS avg_price
FROM orders
GROUP BY 1
"""


def q_table_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed snapshot diff over two deterministic synthetic snapshots of
    orders (old drops keys ≡0 mod 7; new drops ≡0 mod 5 and bumps
    totalprice on ≡0 mod 11): per-key added/removed/changed rows, one
    full-outer join, unchanged majority dropped
    (operators/incremental.py table_diff)."""
    from sentiment_analysis_bigdata_spark.operators import incremental

    orders = load_table(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    return incremental.table_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


SQL_TABLE_DIFF = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 5 <> 0
),
j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         CAST(o.o_totalprice IS DISTINCT FROM n.o_totalprice AS INT)
           + CAST(o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS INT)
           AS n_diff
  FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            ELSE 'changed' END AS change,
       CASE WHEN in_old AND in_new THEN n_diff ELSE 0 END AS n_changed_cols
FROM j
WHERE NOT in_old OR NOT in_new OR n_diff > 0
"""


_COMPACT_TARGET = 64 * 1024  # bytes per output file


def q_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction planning (the Delta/Iceberg OPTIMIZE
    bin-packing step, planned declaratively): build a per-(day,
    event_type) file inventory from the events table (bytes = payload
    length + fixed row overhead), then assign files to output targets by
    ORDERED bin packing — each file's start offset is the running byte
    sum within its day (deterministic event_type order) and its target
    file is ``floor(start / target)``. Output: per (day, target_file)
    the file count and byte total.

    Scale shape: the inventory is one corpus aggregation; the packing is
    one per-day window over the (partitions × types)-sized inventory —
    never touches raw rows again. The contiguous-range policy is what
    table formats actually do (rewrite adjacent small files together so
    clustering survives the rewrite)."""
    events = load_table(spark, sf, "events")
    # Integer-exact cross-engine contract (r4's only red driver row was a
    # hash mismatch here): the day bucket is an EPOCH-DAY INTEGER — Spark
    # `CAST(ts AS BIGINT)` is the epoch second of the instant, independent
    # of session timezone, matching DuckDB `epoch_ms(ts) // 1000` on the
    # same (UTC-written) parquet — and the bin index uses integer division
    # (`DIV`), never floor(double). Every aggregate is BIGINT on both
    # engines; no timestamp formatting, no float arithmetic anywhere.
    inv = events.groupBy(
        F.expr("CAST(ts AS BIGINT) DIV 86400").alias("day_num"),
        "event_type",
    ).agg(
        (F.sum(F.length("props")) + F.count(F.lit(1)) * F.lit(32))
        .cast("long")
        .alias("bytes")
    )
    w = (
        Window.partitionBy("day_num")
        .orderBy("event_type")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plan = inv.withColumn(
        "start", F.coalesce(F.sum("bytes").over(w), F.lit(0)).cast("long")
    ).withColumn("target_file", F.expr(f"start DIV {_COMPACT_TARGET}L"))
    return plan.groupBy("day_num", "target_file").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
    )


SQL_COMPACTION_PLAN = f"""
WITH inv AS (
  SELECT CAST(epoch_ms(ts) // 1000 AS BIGINT) // 86400 AS day_num, event_type,
         CAST(sum(length(props)) + count(*) * 32 AS BIGINT) AS bytes
  FROM events
  GROUP BY 1, 2
),
plan AS (
  SELECT day_num, event_type, bytes,
         CAST(coalesce(sum(bytes) OVER (PARTITION BY day_num ORDER BY event_type
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start
  FROM inv
)
SELECT day_num,
       CAST(start // {_COMPACT_TARGET} AS BIGINT) AS target_file,
       count(*) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM plan
GROUP BY 1, 2
"""


_KANON_K = 5


def q_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the governance
    gate a curation pipeline runs before releasing user-adjacent tables
    (Sweeney 2002: any (nation, segment, balance-band) combination seen
    fewer than k times re-identifies its members). Equivalence classes
    are one hash aggregation over the QI columns; the balance band is
    INTEGER-exact on both engines (cents via round(×100) then integer
    DIV — no floor(double), the compaction_plan lesson). Output is one
    row per class with its size and the ``risky`` verdict (< k), plus
    each class's share of total rows (rounded ratio of two BIGINTs) —
    class-cardinality-sized regardless of table size, so the audit holds
    at 100 TB with one shuffle."""
    cust = load_table(spark, sf, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            # +100000 shifts the (≥ −99999) cent values positive BEFORE the
            # integer divide: Spark DIV truncates toward zero while DuckDB
            # // floors, and they only agree on non-negative operands
            F.expr(
                "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) DIV 100000"
            ).alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    total = classes.agg(F.sum("class_size").alias("_total"))
    return classes.join(F.broadcast(total)).select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "class_size",
        (F.col("class_size") < _KANON_K).alias("risky"),
        F.round(F.col("class_size") / F.col("_total"), 6).alias("share"),
    )


SQL_K_ANONYMITY = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS bal_band,
         CAST(count(*) AS BIGINT) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS total FROM classes)
SELECT c_nationkey, c_mktsegment, bal_band, class_size,
       class_size < {_KANON_K} AS risky,
       round(CAST(class_size AS DOUBLE) / total, 6) AS share
FROM classes CROSS JOIN tot
"""


def q_benford_dq(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law conformance check on order totals — the data-quality
    screen that flags fabricated, defaulted, or unit-mangled monetary
    columns (first significant digits of organic amounts follow
    P(d) = log10(1 + 1/d); a flat or spiked digit histogram is a red
    flag): per digit 1-9 the observed count, observed vs expected share,
    and the chi-square contribution (observed − expected)²/expected.

    The digit is extracted integer-exactly on both engines — price →
    integer cents via round(x·100) → first character of the integer's
    decimal rendering — never through log10/float-power, whose last-ULP
    behavior at exact powers of ten differs across engines. One
    groupBy(digit) over the scan; 9-row output."""
    orders = load_table(spark, sf, "orders")
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("n_total"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("observed_share"),
            F.round(expected, 6).alias("expected_share"),
            F.round(
                F.pow(F.col("n") - expected * F.col("n_total"), 2)
                / (expected * F.col("n_total")),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


SQL_BENFORD_DQ = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
),
counts AS (SELECT digit, count(*) AS n FROM digits GROUP BY 1),
total AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total FROM counts)
SELECT digit, n,
       round(n / n_total, 6) AS observed_share,
       round(log10(1.0 + 1.0 / digit), 6) AS expected_share,
       round(pow(n - log10(1.0 + 1.0 / digit) * n_total, 2)
             / (log10(1.0 + 1.0 / digit) * n_total), 4) AS chi2_term
FROM counts CROSS JOIN total
ORDER BY digit
"""


_LDIV_L = 3


def q_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the governance
    check k-anonymity misses: a quasi-identifier class can be large yet
    still leak if everyone in it shares the same sensitive value. Over
    the (nation, market-segment) QI classes, count members and DISTINCT
    sensitive values (order priority of the members' orders) and flag
    classes with fewer than l = 3 distinct values — those would reveal a
    member's priority by association alone.

    One join from the QI table to the fact table on the customer key,
    then one aggregation producing class-cardinality-sized output; both
    counts are exact distincts over a low-cardinality attribute, so the
    audit is one shuffle regardless of fact volume."""
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_members"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_members",
            "n_orders",
            "n_sensitive",
            (F.col("n_sensitive") < _LDIV_L).alias("risky"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


SQL_L_DIVERSITY = f"""
SELECT c_nationkey, c_mktsegment,
       count(DISTINCT c_custkey) AS n_members,
       count(*) AS n_orders,
       count(DISTINCT o_orderpriority) AS n_sensitive,
       count(DISTINCT o_orderpriority) < {_LDIV_L} AS risky
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


_FD_CANDIDATES = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


def q_fd_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate functional-dependency discovery (the TANE-style
    profiling question a schema reviewer asks: does X determine Y?):
    for each candidate X→Y, the share of X-groups with more than one
    distinct Y (the g3-style violation rate) and whether the FD holds
    exactly. Per candidate ONE (X)-keyed count-distinct aggregate and a
    keyless rollup — determinant-cardinality work, the profiling shape
    that scales to any fact volume."""
    parts = []
    for table, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf, table)
        grp = t.groupBy(det).agg(F.countDistinct(dep).alias("n_dep"))
        stats = grp.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n_dep") > 1).cast("long")).alias("n_violating"),
        )
        parts.append(
            stats.select(
                F.lit(f"{table}.{det}").alias("determinant"),
                F.lit(f"{table}.{dep}").alias("dependent"),
                "n_groups",
                "n_violating",
                F.round(
                    F.col("n_violating") / F.col("n_groups").cast("double"), 6
                ).alias("violation_rate"),
                (F.col("n_violating") == 0).alias("fd_holds"),
            )
        )
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionByName(frame)
    return out.orderBy("determinant", "dependent")


def _sql_fd() -> str:
    blocks = []
    for table, det, dep in _FD_CANDIDATES:
        blocks.append(
            f"""
  SELECT '{table}.{det}' AS determinant, '{table}.{dep}' AS dependent,
         count(*) AS n_groups,
         CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         round(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS violation_rate,
         sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
  FROM (SELECT {det}, count(DISTINCT {dep}) AS n_dep FROM {table} GROUP BY 1)"""
        )
    return (
        "SELECT * FROM ("
        + "\n  UNION ALL".join(blocks)
        + "\n) ORDER BY determinant, dependent"
    )


SQL_FD_DISCOVERY = _sql_fd()


def q_delete_cascade_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-erasure cascade planning (the GDPR/CCPA delete-request
    shape): given a deterministic request set (every 97th customer),
    report per table how many rows a cascading delete would purge —
    customers directly, their orders via the FK, their orders' line
    items transitively — with each table's total and purge share. The
    cascade is two semi joins down the FK chain; output is tables-sized.
    A real deletion job would swap the counts for anti-join rewrites of
    the same frames; the PLAN is what compliance reviews."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    req = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    hit_orders = orders.join(
        req, orders.o_custkey == req.c_custkey, "left_semi"
    ).select("o_orderkey")
    hit_li = li.join(hit_orders, li.l_orderkey == hit_orders.o_orderkey, "left_semi")
    def _row(table, total_df, purge_df):
        t = total_df.agg(F.count(F.lit(1)).alias("n_rows"))
        p = purge_df.agg(F.count(F.lit(1)).alias("n_to_purge"))
        return t.crossJoin(F.broadcast(p)).select(
            F.lit(table).alias("table_name"),
            "n_rows",
            "n_to_purge",
            F.round(F.col("n_to_purge") / F.col("n_rows").cast("double"), 6).alias(
                "purge_share"
            ),
        )
    out = (
        _row("customer", cust, req)
        .unionByName(_row("orders", orders, hit_orders))
        .unionByName(_row("lineitem", li, hit_li))
    )
    return out.orderBy("table_name")


SQL_DELETE_CASCADE_PLAN = """
WITH req AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
ho AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM req)),
hl AS (SELECT 1 AS x FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM ho)),
e AS (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS n_rows,
         (SELECT count(*) FROM req) AS n_to_purge
  UNION ALL
  SELECT 'orders', (SELECT count(*) FROM orders), (SELECT count(*) FROM ho)
  UNION ALL
  SELECT 'lineitem', (SELECT count(*) FROM lineitem), (SELECT count(*) FROM hl)
)
SELECT table_name, n_rows, n_to_purge,
       round(n_to_purge / CAST(n_rows AS DOUBLE), 6) AS purge_share
FROM e ORDER BY table_name
"""


def q_referential_integrity(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across the star schema's FK edges —
    the DQ gate that catches broken ingests and partial loads BEFORE a
    join silently drops rows: for each child→parent edge, the child row
    count and the number of orphans (child keys with no parent), each
    edge ONE left-anti join against the parent's distinct keys. Edge
    list is fixed; output is edges-sized regardless of table volume."""
    edges = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for child, fk, parent, pk in edges:
        c = load_table(spark, sf, child).select(F.col(fk).alias("fk"))
        p = load_table(spark, sf, parent).select(F.col(pk).alias("fk")).distinct()
        stats = c.agg(F.count(F.lit(1)).alias("n_child_rows")).crossJoin(
            F.broadcast(
                c.join(p, "fk", "left_anti").agg(
                    F.count(F.lit(1)).alias("n_orphans")
                )
            )
        )
        parts.append(
            stats.select(
                F.lit(f"{child}.{fk}").alias("fk_edge"),
                F.lit(f"{parent}.{pk}").alias("references"),
                "n_child_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionByName(frame)
    return out.orderBy("fk_edge", "references")


SQL_REFERENTIAL_INTEGRITY = """
WITH e AS (
  SELECT 'orders.o_custkey' AS fk_edge, 'customer.c_custkey' AS references_,
         (SELECT count(*) FROM orders) AS n_child_rows,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_orderkey', 'orders.o_orderkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_partkey', 'part.p_partkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'customer.c_nationkey', 'nation.n_nationkey',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
  UNION ALL
  SELECT 'supplier.s_nationkey', 'nation.n_nationkey',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
)
SELECT fk_edge, references_ AS references, n_child_rows, n_orphans,
       n_orphans = 0 AS intact
FROM e ORDER BY fk_edge, references_
"""


_WH_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_WH_SQL_TS_FMT = "%Y-%m-%d %H:%M:%S"


def q_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """CDC merge — apply an insert/update/delete change log to produce
    final table state (operators/scd.py ``cdc_apply``: per-key max-seq
    survivor + delete drop, one shuffle, no base-table self-join). The
    change log is synthesized deterministically from ``orders`` — every
    order inserts at seq 1, every 7th key updates (status X, price
    +10%) at seq 2, every 13th key deletes at seq 3 — so the oracle
    replays log construction AND application, and the full final state
    is value-checked row by row. Prices ride as INTEGER CENTS end to
    end (the compaction_plan lesson: Spark's round() half-ups the
    shortest-decimal rendering while DuckDB rounds the binary double,
    so a float price column diverges at the cent boundary; integer
    cents + integer DIV cannot)."""
    orders = load_table(spark, sf, "orders")
    ins = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("price_cents"),
    )
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.lit("X").alias("status"),
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
            " + CAST(round(o_totalprice * 100) AS BIGINT) DIV 10"
        ).alias("price_cents"),
    )
    dele = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("bigint").alias("price_cents"),
    )
    cdc = ins.unionByName(upd).unionByName(dele)
    return scd.cdc_apply(cdc, ["k"], "seq").select("k", "seq", "status", "price_cents")


SQL_CDC_APPLY = """
WITH cdc AS (
  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op, o_orderstatus AS status,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, 2, 'U', 'X',
         CAST(round(o_totalprice * 100) AS BIGINT)
           + CAST(round(o_totalprice * 100) AS BIGINT) // 10
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'D', NULL, CAST(NULL AS BIGINT)
  FROM orders WHERE o_orderkey % 13 = 0
),
latest AS (
  SELECT k, seq, op, status, price_cents
  FROM (SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM cdc)
  WHERE rn = 1
)
SELECT k, CAST(seq AS INTEGER) AS seq, status, price_cents
FROM latest WHERE op <> 'D'
"""


def q_scd2_pit_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 history
    (operators/scd.py ``asof_state``): for each purchasing user, the
    behavioral state ONE SECOND BEFORE their first purchase — "what was
    this user doing right before converting", the PIT-correctness shape
    (an equi join on the key + an interval filter against the
    [valid_from, valid_to) spans) that a feature-store backfill must get
    right to avoid label leakage. Users whose first purchase opens
    their history get state 'none'."""
    ev = load_table(spark, sf, "events")
    hist = scd.scd2_history(
        ev, ["user_id"], ["event_type"], "ts", tiebreak_col="event_id"
    )
    probes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
        .select(
            "user_id",
            (F.col("pts") - F.expr("INTERVAL 1 SECOND")).alias("probe_ts"),
        )
    )
    out = scd.asof_state(hist, probes, ["user_id"], "probe_ts")
    return out.select(
        F.col("p.user_id").alias("user_id"),
        F.date_format("probe_ts", _WH_TS_FMT).alias("probe_ts"),
        F.coalesce(F.col("h.event_type"), F.lit("none")).alias("state"),
        F.coalesce(
            F.date_format(F.col("h.valid_from"), _WH_TS_FMT), F.lit("none")
        ).alias("state_since"),
    )


SQL_SCD2_PIT_LOOKUP = f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
),
hist AS (
  SELECT user_id, event_type,
         ts AS valid_from,
         lead(ts) OVER w2 AS valid_to
  FROM starts
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
probes AS (
  SELECT user_id, min(ts) - INTERVAL 1 SECOND AS probe_ts
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT p.user_id,
       strftime(p.probe_ts, '{_WH_SQL_TS_FMT}') AS probe_ts,
       coalesce(h.event_type, 'none') AS state,
       coalesce(strftime(h.valid_from, '{_WH_SQL_TS_FMT}'), 'none') AS state_since
FROM probes p LEFT JOIN hist h
  ON p.user_id = h.user_id
 AND h.valid_from <= p.probe_ts
 AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
"""


QUERIES = {
    "benford_dq": (q_benford_dq, SQL_BENFORD_DQ),
    "l_diversity": (q_l_diversity, SQL_L_DIVERSITY),
    "cdc_apply": (q_cdc_apply, SQL_CDC_APPLY),
    "scd2_pit_lookup": (q_scd2_pit_lookup, SQL_SCD2_PIT_LOOKUP),
    "referential_integrity": (q_referential_integrity, SQL_REFERENTIAL_INTEGRITY),
    "delete_cascade_plan": (q_delete_cascade_plan, SQL_DELETE_CASCADE_PLAN),
    "fd_discovery": (q_fd_discovery, SQL_FD_DISCOVERY),
    "dq_orders": (q_dq_orders, SQL_DQ_ORDERS),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "compaction_plan": (q_compaction_plan, SQL_COMPACTION_PLAN),
    "table_diff": (q_table_diff, SQL_TABLE_DIFF),
    "incremental_order_rollup": (
        q_incremental_order_rollup,
        SQL_INCREMENTAL_ORDER_ROLLUP,
    ),
    "scd2_user_state": (q_scd2_user_state, SQL_SCD2_USER_STATE),
    "score_drift_ks": (q_score_drift_ks, SQL_SCORE_DRIFT_KS),
    "score_drift_psi": (q_score_drift_psi, SQL_SCORE_DRIFT_PSI),
    "source_token_drift": (q_source_token_drift, SQL_SOURCE_TOKEN_DRIFT),
    "runtime_filtered_join": (q_runtime_filtered_join, SQL_RUNTIME_FILTERED_JOIN),
    "winsorized_doc_lengths": (
        q_winsorized_doc_lengths,
        SQL_WINSORIZED_DOC_LENGTHS,
    ),
    "robust_scaled_events": (q_robust_scaled_events, SQL_ROBUST_SCALED_EVENTS),
    "html_stripped_docs": (q_html_stripped_docs, SQL_HTML_STRIPPED_DOCS),
    "hll_user_rollup": (q_hll_user_rollup, SQL_HLL_USER_ROLLUP),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "key_skew_report": (q_key_skew_report, SQL_KEY_SKEW_REPORT),
}
