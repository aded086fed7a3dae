"""Temporal / streaming-shaped queries over ``events``: event-time windows
(tumbling, sliding, session), as-of join, streaming dedup — each as a batch
plan with a DuckDB oracle, plus true Structured Streaming executions
(rows-only checks) proving the same function bodies run incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sentiment_analysis_bigdata_spark.operators.asof import asof_join
from sentiment_analysis_bigdata_spark.sources import load_table
from sentiment_analysis_bigdata_spark.streaming import jobs as SJ

TS_FMT = "yyyy-MM-dd HH:mm:ss"
SQL_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events")


# --- tumbling windows -----------------------------------------------------------

def q_tumbling_events(spark: SparkSession, sf: str) -> DataFrame:
    out = SJ.tumbling_counts(_events(spark, sf), "1 hour")
    return out.select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


SQL_TUMBLING_EVENTS = f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{SQL_TS_FMT}') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- sliding windows --------------------------------------------------------------

def q_sliding_events(spark: SparkSession, sf: str) -> DataFrame:
    out = SJ.sliding_counts(_events(spark, sf), "1 hour", "30 minutes")
    return out.select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "n_events",
        F.round("avg_value", 6).alias("avg_value"),
    )


# every event belongs to exactly width/slide = 2 sliding windows whose starts
# are the two most recent 30-minute grid points
SQL_SLIDING_EVENTS = f"""
WITH expanded AS (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start,
         value
  FROM events
)
SELECT strftime(window_start, '{SQL_TS_FMT}') AS window_start,
       count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM expanded
GROUP BY 1
"""


# --- session windows ----------------------------------------------------------------

def q_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    out = SJ.sessionize_batch(_events(spark, sf), gap_minutes=30)
    return out.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        F.date_format("session_start", TS_FMT).alias("session_start"),
        F.date_format("session_end", TS_FMT).alias("session_end"),
        "n_events",
    )


SQL_SESSION_WINDOWS = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       strftime(min(ts), '{SQL_TS_FMT}') AS session_start,
       strftime(max(ts), '{SQL_TS_FMT}') AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


# --- as-of join -------------------------------------------------------------------------

def q_asof_purchase_signup(spark: SparkSession, sf: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior signup."""
    ev = _events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    out = asof_join(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["signup_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("signup_event_id_matched"), F.lit(-1)).cast("bigint").alias(
            "signup_event_id"
        ),
        F.coalesce(F.date_format("ts_matched", TS_FMT), F.lit("none")).alias("signup_ts"),
    )


SQL_ASOF_PURCHASE_SIGNUP = f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts, event_id AS signup_event_id FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       CAST(coalesce(s.signup_event_id, -1) AS BIGINT) AS signup_event_id,
       coalesce(strftime(s.ts, '{SQL_TS_FMT}'), 'none') AS signup_ts
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# --- Markov transition matrix ----------------------------------------------------

def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order event-type transition matrix over per-user sequences
    ((ts, event_id)-ordered — deterministic under timestamp ties): counts
    and row-normalized probabilities (operators/timeseries.py
    transition_matrix). One user-keyed shuffle; the aggregate is
    state²-bounded."""
    from sentiment_analysis_bigdata_spark.operators.timeseries import (
        transition_matrix,
    )

    ev = _events(spark, sf)
    return transition_matrix(ev)


SQL_EVENT_TRANSITIONS = """
WITH steps AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_state
  FROM events
),
counts AS (
  SELECT from_state, to_state, count(*) AS n
  FROM steps WHERE to_state IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT from_state, sum(n) AS tot FROM counts GROUP BY 1)
SELECT c.from_state, c.to_state, c.n, round(c.n / t.tot, 6) AS p
FROM counts c JOIN totals t USING (from_state)
"""


# --- retention cohorts ---------------------------------------------------------------------

def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-signup week; each
    later week's retention = distinct active users / cohort size. All
    aggregation happens on (user, week)-distinct frames — cohort and
    activity tables are user-cardinality, never raw events, so the join is
    dwarfed by the two event scans feeding it."""
    ev = _events(spark, sf)
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    joined = activity.join(cohort, "user_id").withColumn(
        "week_offset",
        (F.datediff("act_week", "cohort_week") / 7).cast("int"),
    ).filter(F.col("week_offset") >= 0)
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return counts.join(sizes, "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


SQL_RETENTION_COHORTS = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
),
joined AS (
  SELECT a.user_id, c.cohort_week,
         CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS INT) AS week_offset
  FROM activity a JOIN cohort c ON c.user_id = a.user_id
  WHERE a.act_week >= c.cohort_week
),
counts AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
  FROM joined GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size FROM cohort GROUP BY 1
)
SELECT strftime(counts.cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset, n_active,
       round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
FROM counts JOIN sizes ON sizes.cohort_week = counts.cohort_week
"""


# --- windowed z-score anomaly detection ----------------------------------------------------

def q_rate_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type hourly event rates scored against the trailing 24-hour
    window (mean/stddev of the previous 24 buckets, current excluded).
    Aggregate-over-aggregate: the hourly rollup is tiny, so the ordered
    window runs over bucket counts, never raw events — at 100 TB the
    window input is hours×types rows regardless of event volume.
    Buckets without a full trailing day (n_trailing < 12) emit no score."""
    from pyspark.sql.window import Window

    hourly = (
        _events(spark, sf)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-24, -1)
    scored = hourly.select(
        F.date_format("bucket", TS_FMT).alias("bucket"),
        "event_type",
        "n",
        F.avg("n").over(w).alias("_mean"),
        F.stddev_samp(F.col("n").cast("double")).over(w).alias("_std"),
        F.count(F.lit(1)).over(w).alias("_cnt"),
    )
    return scored.filter((F.col("_cnt") >= 12) & (F.col("_std") > 1e-9)).select(
        "bucket",
        "event_type",
        "n",
        F.round((F.col("n") - F.col("_mean")) / F.col("_std"), 4).alias("zscore"),
    )


SQL_RATE_ANOMALIES = f"""
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         count(*) AS n
  FROM events
  GROUP BY 1, 2
),
scored AS (
  SELECT strftime(bucket, '{SQL_TS_FMT}') AS bucket, event_type, n,
         avg(n) OVER w AS mean_n,
         stddev_samp(CAST(n AS DOUBLE)) OVER w AS std_n,
         count(*) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT bucket, event_type, n,
       round((n - mean_n) / std_n, 4) AS zscore
FROM scored
WHERE cnt >= 12 AND std_n > 0.000000001
"""


# --- funnel conversion (staged event sequencing) -------------------------------------------

def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """signup → click → purchase funnel per user; each stage counts only
    strictly after the previous one."""
    from sentiment_analysis_bigdata_spark.operators.funnel import funnel_stages

    out = funnel_stages(_events(spark, sf), ["signup", "click", "purchase"])
    return out.select(
        "user_id",
        *[
            F.coalesce(F.date_format(f"{s}_ts", TS_FMT), F.lit("none")).alias(
                f"{s}_ts"
            )
            for s in ("signup", "click", "purchase")
        ],
        "stages_completed",
    )


SQL_FUNNEL_CONVERSION = f"""
WITH s1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS signup_ts
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > signup_ts THEN ts END)
              OVER (PARTITION BY user_id) AS click_ts
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > click_ts THEN ts END)
              OVER (PARTITION BY user_id) AS purchase_ts
  FROM s2
)
SELECT user_id,
       coalesce(strftime(min(signup_ts), '{SQL_TS_FMT}'), 'none') AS signup_ts,
       coalesce(strftime(min(click_ts), '{SQL_TS_FMT}'), 'none') AS click_ts,
       coalesce(strftime(min(purchase_ts), '{SQL_TS_FMT}'), 'none') AS purchase_ts,
       CAST(min(signup_ts) IS NOT NULL AS INT)
         + CAST(min(click_ts) IS NOT NULL AS INT)
         + CAST(min(purchase_ts) IS NOT NULL AS INT) AS stages_completed
FROM s3
GROUP BY user_id
"""


# --- streaming dedup (batch twin) ----------------------------------------------------------

def q_event_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on event_id — batch twin of dropDuplicatesWithinWatermark.

    The testdata has unique event_ids, so this degenerates to identity —
    we synthesize duplicates by unioning a shifted copy to prove semantics.
    """
    ev = _events(spark, sf).select("event_id", "event_type")
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicates(["event_id"])
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


SQL_EVENT_DEDUP = """
SELECT event_type, count(*) AS n FROM (
  SELECT DISTINCT event_id, event_type FROM (
    SELECT event_id, event_type FROM events
    UNION ALL
    SELECT event_id, event_type FROM events
  )
)
GROUP BY event_type
"""


# --- true Structured Streaming executions (rows-only) ----------------------------------------

def q_hourly_to_daily_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous-aggregate pattern: re-aggregate hourly partials to daily.

    The daily numbers are computed FROM the hourly aggregate, not the raw
    events — count/sum/min/max are mergeable, so a 100 TB deployment keeps
    the small hourly rollup hot and derives coarser resolutions from it
    without rescanning raw data. (avg is derived as sum/count at the end —
    avg itself is not mergeable.)"""
    # values aggregated as integer micro-units so the hourly→daily re-merge
    # is exact and order-independent (double sums flip the last decimal
    # across partitionings/engines)
    micros = F.round(F.col("value") * 1_000_000).cast("bigint")
    hourly = (
        _events(spark, sf)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(micros).alias("sum_u"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("hour")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sum_u") / 1_000_000.0, 4).alias("sum_value"),
            F.round(F.min("min_v"), 6).alias("min_value"),
            F.round(F.max("max_v"), 6).alias("max_value"),
            F.round(F.sum("sum_u") / 1_000_000.0 / F.sum("n"), 6).alias("avg_value"),
        )
    )


SQL_HOURLY_TO_DAILY_ROLLUP = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
         count(*) AS n,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_u,
         min(value) AS min_v, max(value) AS max_v
  FROM events
  GROUP BY 1, 2
)
SELECT strftime(time_bucket(INTERVAL '1 day', hour), '%Y-%m-%d') AS day,
       event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(CAST(sum(sum_u) AS DOUBLE) / 1000000.0, 4) AS sum_value,
       round(min(min_v), 6) AS min_value,
       round(max(max_v), 6) AS max_value,
       round(CAST(sum(sum_u) AS DOUBLE) / 1000000.0 / sum(n), 6) AS avg_value
FROM hourly
GROUP BY 1, 2
"""


def q_resample_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly grid + forward fill per user (users < 50 to bound the grid)."""
    from sentiment_analysis_bigdata_spark.operators.timeseries import resample_ffill

    ev = _events(spark, sf).filter(F.col("user_id") < 50)
    out = resample_ffill(ev, step="1 hour")
    return out.select(
        "user_id",
        F.date_format("bucket", TS_FMT).alias("bucket"),
        F.round("value", 6).alias("value"),
        "observed",
    )


SQL_RESAMPLE_FFILL = f"""
WITH hourly AS (
  SELECT user_id AS key, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         arg_max(value, ts) AS obs_v
  FROM events WHERE user_id < 50
  GROUP BY 1, 2
),
bounds AS (SELECT key, min(bucket) AS mn, max(bucket) AS mx FROM hourly GROUP BY key),
grid AS (
  SELECT key, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
  FROM bounds
),
joined AS (
  SELECT g.key, g.bucket, h.obs_v
  FROM grid g LEFT JOIN hourly h ON h.key = g.key AND h.bucket = g.bucket
)
SELECT key AS user_id,
       strftime(bucket, '{SQL_TS_FMT}') AS bucket,
       round(last_value(obs_v IGNORE NULLS) OVER (
         PARTITION BY key ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
       obs_v IS NOT NULL AS observed
FROM joined
"""


def q_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user TWAP over the event stream (each value holds until the
    next observation)."""
    from sentiment_analysis_bigdata_spark.operators.timeseries import time_weighted_avg

    out = time_weighted_avg(_events(spark, sf))
    return out.select(
        "user_id", F.round("twap", 6).alias("twap"), "n_events"
    )


# dt replayed in microseconds (epoch_us ≡ Spark unix_micros); double
# weighted-sum order differences across engines are ~1e-12 relative —
# far inside the round-6 guard
SQL_TIME_WEIGHTED_AVG = """
WITH wv AS (
  SELECT user_id, value AS v,
         (lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
          - epoch_us(ts)) / 1000000.0 AS dt,
         first_value(value) OVER (PARTITION BY user_id ORDER BY ts) AS first_v
  FROM events
)
SELECT user_id,
       round(CASE WHEN sum(dt) > 0 THEN sum(v * dt) / sum(dt)
                  ELSE any_value(first_v) END, 6) AS twap,
       count(*) AS n_events
FROM wv
GROUP BY user_id
"""


def q_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Click→purchase attribution: batch form of the stream-stream interval
    join (purchases matched to same-user clicks in the preceding hour)."""
    out = SJ.interval_join_clicks_purchases(_events(spark, sf), within="1 hour")
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
        F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
        F.round("value", 4).alias("value"),
    )


SQL_INTERVAL_JOIN = f"""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       strftime(c.ts, '{SQL_TS_FMT}') AS click_ts,
       strftime(p.ts, '{SQL_TS_FMT}') AS purchase_ts,
       round(p.value, 4) AS value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def q_interval_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Attribution WITH misses: batch form of the left-outer interval join
    — every purchase, null click columns when nothing attributes it."""
    out = SJ.interval_join_left_outer(_events(spark, sf), within="1 hour")
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
        F.round("value", 4).alias("value"),
        "click_id",
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
    )


SQL_INTERVAL_JOIN_OUTER = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '{SQL_TS_FMT}') AS purchase_ts,
       round(p.value, 4) AS value,
       c.event_id AS click_id,
       strftime(c.ts, '{SQL_TS_FMT}') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def q_streaming_interval_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    """The left-outer interval join as a true incremental run. Unmatched
    purchases inside the stream-end watermark horizon are STILL IN STATE
    when a bounded run finishes (correct outer-join semantics — see
    streaming/jobs.py interval_join_left_outer). The effective join
    watermark is the MIN of the per-column watermarks (each from its own
    side's max event time), so both this query and its oracle bound the
    read to purchase_ts ≤ least(max click_ts, max purchase_ts) − 4 hours
    (watermark 2 h + within 1 h + 1 h slack); inside that horizon the
    incremental run must reproduce the batch left join exactly, nulls
    included."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    joined = SJ.interval_join_left_outer(stream, within="1 hour")
    SJ.run_stream_to_memory(
        joined, "stream_interval_outer", timeout_s=120, output_mode="append"
    )
    ev = _events(spark, sf)
    cutoff = (
        ev.agg(
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            ).alias("m")
        )
        .select(F.col("m") - F.expr("INTERVAL 4 hours"))
        .first()[0]
    )
    return (
        spark.table("stream_interval_outer")
        .filter(F.col("purchase_ts") <= F.lit(cutoff))
        .select(
            "purchase_id",
            "user_id",
            F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
            F.round("value", 4).alias("value"),
            "click_id",
            F.date_format("click_ts", TS_FMT).alias("click_ts"),
        )
    )


SQL_STREAMING_INTERVAL_JOIN_OUTER = f"""
WITH cutoff AS (
  SELECT least(max(CASE WHEN event_type = 'click' THEN ts END),
               max(CASE WHEN event_type = 'purchase' THEN ts END))
         - INTERVAL 4 HOUR AS m
  FROM events
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '{SQL_TS_FMT}') AS purchase_ts,
       round(p.value, 4) AS value,
       c.event_id AS click_id,
       strftime(c.ts, '{SQL_TS_FMT}') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE p.ts <= (SELECT m FROM cutoff)
"""


def q_streaming_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME interval-join body as a true incremental stream-stream join
    (append mode — inner matches emit on arrival; watermarks bound state).
    Values are checked by the batch twin above."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    joined = SJ.interval_join_clicks_purchases(stream, within="1 hour")
    SJ.run_stream_to_memory(
        joined, "stream_interval_join", timeout_s=120, output_mode="append"
    )
    return spark.table("stream_interval_join").select(
        "click_id",
        "purchase_id",
        "user_id",
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
        F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
        F.round("value", 4).alias("value"),
    )


def q_streaming_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Runs the SAME tumbling_counts body as a real incremental stream
    (file source, availableNow trigger, memory sink) — proves the plan is
    streaming-executable; values are checked by the batch twin above."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    agg = SJ.tumbling_counts(SJ.with_watermark(stream, "1 hour"))
    SJ.run_stream_to_memory(agg, "stream_tumbling", timeout_s=120)
    return spark.table("stream_tumbling").select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def q_streaming_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Runs the SAME sliding_counts body as a real incremental stream
    (file source, availableNow trigger, memory sink; watermark-bounded
    state) — the streaming twin of ``sliding_events``, sharing its
    expand-to-grid batch oracle. Each event lands in width/slide = 2
    windows; state is output-bounded (audited in the streaming state
    table)."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    agg = SJ.sliding_counts(
        SJ.with_watermark(stream, "1 hour"), "1 hour", "30 minutes"
    )
    SJ.run_stream_to_memory(agg, "stream_sliding", timeout_s=120)
    return spark.table("stream_sliding").select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "n_events",
        F.round("avg_value", 6).alias("avg_value"),
    )


def q_streaming_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Native streaming session_window execution."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    agg = SJ.session_counts(SJ.with_watermark(stream, "1 hour"), gap="30 minutes")
    SJ.run_stream_to_memory(agg, "stream_sessions", timeout_s=120)
    return spark.table("stream_sessions").select(
        "user_id",
        F.date_format("session_start", TS_FMT).alias("session_start"),
        "n_events",
    )


def q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """True incremental ``dropDuplicatesWithinWatermark`` (append mode,
    state keyed on event_id, watermark-bounded): deduped rows land in the
    memory sink and are aggregated batch-side. The testdata's event_ids are
    unique, so dedup must be an exact identity — the oracle is the plain
    per-type count, and any duplicate emission or dropped row breaks it."""
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    deduped = SJ.dedup_within_watermark(stream, "1 hour").select(
        "event_id", "event_type"
    )
    SJ.run_stream_to_memory(
        deduped, "stream_dedup", timeout_s=120, output_mode="append"
    )
    return (
        spark.table("stream_dedup")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_streaming_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed-upsert streaming sink (foreachBatch MERGE-equivalent): the
    event stream upserts into a versioned parquet table keeping each
    user's LATEST event (ts desc, event_id desc — total order), across
    multiple micro-batches with an atomic _LATEST repoint per batch
    (streaming/jobs.py run_stream_upsert_to_parquet). The oracle is the
    batch argmax: any lost update, stale version read, or duplicate key
    breaks the per-user match."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="upsert_table_")
    ckpt = tempfile.mkdtemp(prefix="upsert_ckpt_")
    try:
        stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
        SJ.run_stream_upsert_to_parquet(
            stream.select("user_id", "event_id", "ts", "event_type"),
            out,
            ckpt,
            key_cols=["user_id"],
            order_cols=["ts", "event_id"],
            timeout_s=120,
        )
        latest = SJ.read_upsert_table(spark, out).select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "event_type",
        )
        # materialize before the temp dirs vanish
        rows = latest.collect()
        return spark.createDataFrame(rows, latest.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_forecast_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-origin forecast backtest: per month, 'forecast' revenue as
    the trailing 3-month moving average and score it against the actual
    (absolute percentage error) — the standard out-of-sample evaluation
    loop for any time-series model, run declaratively. Agg-over-agg
    shape: the window runs over the month-cardinality rollup (≈ tens of
    rows), never raw orders; the single-partition window is bounded by
    the calendar, not the data (same pattern as rate_anomalies).
    Cross-engine: monthly revenues are integer-cent money sums, the
    forecast averages the ROUNDED monthly values, and ape rounds at 6."""
    from pyspark.sql import Window

    orders = load_table(spark, sf, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.round(
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0),
            2,
        ).alias("revenue")
    )
    w = Window.orderBy("month").rowsBetween(-3, -1)
    cnt = F.count("revenue").over(w)
    fc = F.avg("revenue").over(w)
    return (
        monthly.withColumn("_n", cnt)
        .withColumn("forecast", F.round(fc, 6))
        .where(F.col("_n") == 3)
        .select(
            "month",
            "revenue",
            "forecast",
            F.round(F.abs(F.col("revenue") - F.col("forecast")) / F.col("revenue"), 6).alias("ape"),
        )
    )


SQL_FORECAST_BACKTEST = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
  FROM orders
  GROUP BY 1
),
fc AS (
  SELECT month, revenue,
         count(revenue) OVER w AS n,
         round(avg(revenue) OVER w, 6) AS forecast
  FROM monthly
  WINDOW w AS (ORDER BY month ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
)
SELECT month, revenue, forecast,
       round(abs(revenue - forecast) / revenue, 6) AS ape
FROM fc WHERE n = 3
"""


def q_streaming_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-state top-k streaming sink: the event stream folds into a
    20-row leaderboard (largest ``value``, event_id tie-break) across
    micro-batches via the monoid merge topk(topk(A) ∪ B) = topk(A ∪ B)
    (streaming/jobs.py run_stream_topk_to_parquet — k-row state no
    matter the stream length). The oracle is the batch global top-k:
    any dropped batch, stale version read, or wrong cut breaks it."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="topk_table_")
    ckpt = tempfile.mkdtemp(prefix="topk_ckpt_")
    try:
        stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
        SJ.run_stream_topk_to_parquet(
            stream.select("event_id", "user_id", "ts", "event_type", "value"),
            out,
            ckpt,
            order_cols=["value"],
            tiebreak_col="event_id",
            k=20,
            timeout_s=120,
        )
        top = SJ.read_upsert_table(spark, out).select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "event_type",
            F.round("value", 4).alias("value"),
        )
        rows = top.collect()  # materialize before the temp dirs vanish
        return spark.createDataFrame(rows, top.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_STREAMING_TOPK = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type,
       round(value, 4) AS value
FROM events
ORDER BY value DESC, event_id DESC
LIMIT 20
"""


SQL_STREAMING_UPSERT = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type
FROM ranked WHERE rn = 1
"""


def q_streaming_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static join: the event stream enriched per micro-batch with
    a static user-tier dimension (derived batch-side from the same events
    table — activity class by total event count), then aggregated per
    tier. Stateless join + complete-mode aggregation; the oracle is the
    equivalent one-shot batch join."""
    from sentiment_analysis_bigdata_spark.sources import load_table

    dim = (
        load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 70, "heavy")
            .when(F.col("n") >= 60, "mid")
            .otherwise("light")
            .alias("tier"),
        )
    )
    stream = SJ.read_events_stream(spark, f"{sf}/events.parquet")
    agg = (
        SJ.enrich_with_dim(stream, dim, "user_id")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("__cents"),
        )
    )
    SJ.run_stream_to_memory(agg, "stream_static_join", timeout_s=120)
    return spark.table("stream_static_join").select(
        "tier", "n_events", (F.col("__cents") / 100.0).alias("sum_value")
    )


SQL_STREAMING_STATIC_JOIN = """
WITH dim AS (
  SELECT user_id,
         CASE WHEN count(*) >= 70 THEN 'heavy'
              WHEN count(*) >= 60 THEN 'mid'
              ELSE 'light' END AS tier
  FROM events GROUP BY 1
)
SELECT tier, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events JOIN dim USING (user_id)
GROUP BY 1
"""


SQL_STREAMING_DEDUP = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


# The true-streaming runs are value-checkable against the SAME relational
# oracles as their batch twins: complete-mode aggregation emits every window
# (watermark only bounds state) and append-mode inner joins emit each match
# on arrival, so with an availableNow bounded source the incremental result
# set is identical to the one-shot batch result (tests/test_streaming.py
# asserts this equivalence directly).
SQL_STREAMING_TUMBLING = SQL_TUMBLING_EVENTS

SQL_STREAMING_SESSIONS = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, strftime(min(ts), '{SQL_TS_FMT}') AS session_start,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


_PURGE_T1, _PURGE_T2 = "2024-01-20", "2024-01-22"


def q_purged_time_split(spark: SparkSession, sf: str) -> DataFrame:
    """Purged temporal train/test split with an embargo gap (the
    financial-ML / forecasting split hygiene rule — de Prado 2018):
    train strictly before T1, test at or after T2, and the [T1, T2)
    embargo DROPPED so that label windows or session tails spanning the
    boundary can't leak future information into training. The report
    gives per-slice event/user counts, the share of all events, and the
    entity-overlap signal (train users who also appear in test — a time
    split intentionally allows them, but any downstream per-user target
    must know the overlap is there).

    100 TB shape: three partition-prunable range predicates over ONE
    scan each, user counts as distinct aggs, overlap as one semi join
    against the test-user frame — no window, no shuffle beyond the
    count-distinct."""
    events = load_table(spark, sf, "events")
    slices = [
        ("train", events.filter(F.col("ts") < _PURGE_T1)),
        (
            "embargo_dropped",
            events.filter(
                (F.col("ts") >= _PURGE_T1) & (F.col("ts") < _PURGE_T2)
            ),
        ),
        ("test", events.filter(F.col("ts") >= _PURGE_T2)),
    ]
    test_users = slices[2][1].select("user_id").distinct()
    total = events.count()
    parts = []
    for name, df in slices:
        stats = df.agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        ).withColumn("split", F.lit(name))
        overlap = (
            df.select("user_id")
            .distinct()
            .join(test_users, "user_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_users_in_test"))
        )
        parts.append(stats.crossJoin(F.broadcast(overlap)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "split",
        "n_events",
        "n_users",
        "n_users_in_test",
        F.round(F.col("n_events") / F.lit(float(total)), 6).alias("share"),
    )


SQL_PURGED_TIME_SPLIT = f"""
WITH tagged AS (
  SELECT user_id,
         CASE WHEN ts < TIMESTAMP '{_PURGE_T1}' THEN 'train'
              WHEN ts < TIMESTAMP '{_PURGE_T2}' THEN 'embargo_dropped'
              ELSE 'test' END AS split
  FROM events
),
test_users AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'test'),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tagged)
SELECT t.split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT t.user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT CASE WHEN tu.user_id IS NOT NULL
                                THEN t.user_id END) AS BIGINT)
         AS n_users_in_test,
       round(count(*) / tot.total, 6) AS share
FROM tagged t
LEFT JOIN test_users tu ON tu.user_id = t.user_id
CROSS JOIN tot
GROUP BY t.split, tot.total
"""


_SCMS_DEPTH, _SCMS_WIDTH = 4, 1024


def q_streaming_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental count-min-sketch maintenance over a REAL multi-batch
    stream (streaming/jobs.py ``run_stream_cms_to_parquet``): events are
    staged as 6 parquet files and consumed one file per micro-batch, so
    the running sketch is cell-summed 6 times through the versioned
    commit path; the final sketch is then probed for the exact top-20
    users. Because CMS merge is exact (cell sums commute), the streamed
    sketch must be bit-identical to a single batch-built sketch — the
    oracle replays the BATCH construction in SQL, so any double-counted
    replay, lost batch, or stale version read breaks the value match.
    Fixed-size state regardless of stream length: the pattern that
    replaces an unbounded streaming groupBy(key).count() at 100 TB."""
    import shutil
    import tempfile

    from sentiment_analysis_bigdata_spark.operators import sketches

    src = tempfile.mkdtemp(prefix="cms_src_")
    out = tempfile.mkdtemp(prefix="cms_table_")
    ckpt = tempfile.mkdtemp(prefix="cms_ckpt_")
    try:
        events = load_table(spark, sf, "events")
        events.select(
            F.col("user_id").cast("string").alias("key")
        ).repartition(6).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        SJ.run_stream_cms_to_parquet(
            stream, out, ckpt, "key",
            depth=_SCMS_DEPTH, width=_SCMS_WIDTH, seed=0, timeout_s=120,
        )
        sketch = SJ.read_upsert_table(spark, out)
        exact = (
            events.groupBy(F.col("user_id").cast("string").alias("key"))
            .agg(F.count(F.lit(1)).alias("exact_n"))
            .orderBy(F.col("exact_n").desc(), F.col("key").asc())
            .limit(20)
        )
        est = sketches.cms_estimate(
            sketch, exact, "key",
            depth=_SCMS_DEPTH, width=_SCMS_WIDTH, seed=0,
        )
        res = exact.join(est, "key").select(
            "key",
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("no_undercount"),
        )
        rows = res.collect()  # materialize before the temp dirs vanish
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_STREAMING_CMS = f"""
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
e AS (SELECT key, r FROM keys CROSS JOIN (SELECT unnest(range({_SCMS_DEPTH})) AS r)),
sketch AS (
  SELECT r,
         CAST(('0x' || substr(md5(key || ':' || r || ':0'), 1, 15)) AS BIGINT)
           % {_SCMS_WIDTH} AS b,
         count(*) AS cnt
  FROM e GROUP BY 1, 2
),
exact AS (
  SELECT key, CAST(count(*) AS BIGINT) AS exact_n FROM keys
  GROUP BY key ORDER BY exact_n DESC, key ASC LIMIT 20
),
probes AS (
  SELECT key, r,
         CAST(('0x' || substr(md5(key || ':' || r || ':0'), 1, 15)) AS BIGINT)
           % {_SCMS_WIDTH} AS b
  FROM exact CROSS JOIN (SELECT unnest(range({_SCMS_DEPTH})) AS r)
),
est AS (
  SELECT p.key, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_n
  FROM probes p LEFT JOIN sketch s ON s.r = p.r AND s.b = p.b
  GROUP BY p.key
)
SELECT x.key, x.exact_n, est.est_n, est.est_n >= x.exact_n AS no_undercount
FROM exact x JOIN est USING (key)
"""


_SBLOOM_M, _SBLOOM_K = 4096, 3


def q_streaming_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental Bloom-filter maintenance over a multi-batch stream
    (streaming/jobs.py ``run_stream_bloom_to_parquet``): user ids drain
    through 6 micro-batches into a running position set (union is
    IDEMPOTENT — the replay-safety contrast to streaming_cms's guarded
    counter fold), then the final filter is probed with the 20 smallest
    known user ids (must ALL be members — no false negatives) and 20
    'ghost:N' keys that were never inserted (the deterministic
    false-positive pattern at m=4096/k=3 — both engines derive identical
    md5 positions, so even the FPs value-match)."""
    import shutil
    import tempfile

    from sentiment_analysis_bigdata_spark.operators import sketches

    src = tempfile.mkdtemp(prefix="bloom_src_")
    out = tempfile.mkdtemp(prefix="bloom_table_")
    ckpt = tempfile.mkdtemp(prefix="bloom_ckpt_")
    try:
        events = load_table(spark, sf, "events")
        events.select(
            F.col("user_id").cast("string").alias("key")
        ).repartition(6).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        SJ.run_stream_bloom_to_parquet(
            stream, out, ckpt, "key",
            m=_SBLOOM_M, k=_SBLOOM_K, seed=0, timeout_s=120,
        )
        sketch = SJ.read_upsert_table(spark, out)
        known = (
            events.select(F.col("user_id").cast("string").alias("key"))
            .distinct()
            .orderBy(F.col("key").cast("long"))
            .limit(20)
        )
        ghosts = spark.range(20).select(
            F.concat(F.lit("ghost:"), F.col("id").cast("string")).alias("key")
        )
        probes = known.unionByName(ghosts)
        member = sketches.bloom_probe(
            sketch, probes, "key", m=_SBLOOM_M, k=_SBLOOM_K, seed=0
        )
        res = member.withColumn(
            "inserted", ~F.col("key").startswith("ghost:")
        )
        rows = res.collect()  # materialize before the temp dirs vanish
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_STREAMING_BLOOM = f"""
WITH keys AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events),
sketch AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(key || ':' || i || ':0'), 1, 15)) AS BIGINT)
           % {_SBLOOM_M} AS pos
  FROM keys CROSS JOIN (SELECT unnest(range({_SBLOOM_K})) AS i)
),
known AS (
  SELECT key FROM keys ORDER BY CAST(key AS BIGINT) LIMIT 20
),
probes AS (
  SELECT key FROM known
  UNION ALL
  SELECT 'ghost:' || CAST(i AS VARCHAR) FROM (SELECT unnest(range(20)) AS i)
),
ppos AS (
  SELECT key,
         CAST(('0x' || substr(md5(key || ':' || i || ':0'), 1, 15)) AS BIGINT)
           % {_SBLOOM_M} AS pos
  FROM probes CROSS JOIN (SELECT unnest(range({_SBLOOM_K})) AS i)
)
SELECT p.key, bool_and(s.pos IS NOT NULL) AS bloom_member,
       NOT starts_with(p.key, 'ghost:') AS inserted
FROM ppos p LEFT JOIN sketch s USING (pos)
GROUP BY p.key
"""


def q_cusum_changepoints(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sided CUSUM level-shift detection (Page 1954) on per-type
    hourly event rates: alarm hours where the one-sided cumulative
    deviation S+ (upward) or S- (downward) exceeds 4σ with slack
    k = 0.5σ — the standing drift/changepoint monitor a pipeline runs
    over ingest volumes.

    The recurrence S+_t = max(0, S+_{t-1} + (x_t - μ - kσ)) is not a
    window expression, but its closed form IS: S+_t = C_t - min(0,
    min_{i≤t} C_i) with C the running sum of the slack-adjusted series
    (and symmetrically S-_t = max(0, max C') - C'). So the whole
    detector is two ordered windows over the HOURLY rollup — at 100 TB
    the window input stays hours×types rows regardless of event volume,
    the same aggregate-over-aggregate shape as rate_anomalies. The 4σ/
    round-6 guard on the alarm compare keeps the flag boundary immune
    to last-ULP cross-engine float drift."""
    from pyspark.sql.window import Window

    hourly = (
        _events(spark, sf)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy("event_type")
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stats = hourly.select(
        "bucket",
        "event_type",
        "n",
        F.avg(F.col("n").cast("double")).over(w_all).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).over(w_all).alias("sigma"),
    )
    cums = stats.select(
        "bucket",
        "event_type",
        "n",
        "sigma",
        F.sum(F.col("n") - F.col("mu") - 0.5 * F.col("sigma")).over(w_ord).alias("cum_hi"),
        F.sum(F.col("n") - F.col("mu") + 0.5 * F.col("sigma")).over(w_ord).alias("cum_lo"),
    )
    s = cums.select(
        "bucket",
        "event_type",
        "n",
        "sigma",
        (F.col("cum_hi") - F.least(F.lit(0.0), F.min("cum_hi").over(w_ord))).alias("s_hi"),
        (F.greatest(F.lit(0.0), F.max("cum_lo").over(w_ord)) - F.col("cum_lo")).alias("s_lo"),
    )
    up = F.round("s_hi", 6) > F.round(4 * F.col("sigma"), 6)
    down = F.round("s_lo", 6) > F.round(4 * F.col("sigma"), 6)
    return (
        s.filter(up | down)
        .select(
            F.date_format("bucket", TS_FMT).alias("bucket"),
            "event_type",
            "n",
            F.when(up, F.lit("up")).otherwise(F.lit("down")).alias("direction"),
            F.round(F.when(up, F.col("s_hi")).otherwise(F.col("s_lo")), 4).alias("cusum"),
        )
        .orderBy("event_type", "bucket")
    )


SQL_CUSUM_CHANGEPOINTS = f"""
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT bucket, event_type, n,
         avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS mu,
         stddev_samp(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS sigma
  FROM hourly
),
cums AS (
  SELECT bucket, event_type, n, sigma,
         sum(n - mu - 0.5 * sigma) OVER w AS cum_hi,
         sum(n - mu + 0.5 * sigma) OVER w AS cum_lo
  FROM stats
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT bucket, event_type, n, sigma,
         cum_hi - least(0, min(cum_hi) OVER w) AS s_hi,
         greatest(0, max(cum_lo) OVER w) - cum_lo AS s_lo
  FROM cums
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT strftime(bucket, '{SQL_TS_FMT}') AS bucket, event_type, n,
       CASE WHEN round(s_hi, 6) > round(4 * sigma, 6) THEN 'up' ELSE 'down' END AS direction,
       round(CASE WHEN round(s_hi, 6) > round(4 * sigma, 6) THEN s_hi ELSE s_lo END, 4) AS cusum
FROM s
WHERE round(s_hi, 6) > round(4 * sigma, 6) OR round(s_lo, 6) > round(4 * sigma, 6)
ORDER BY event_type, bucket
"""


def q_seasonal_dow_index(spark: SparkSession, sf: str) -> DataFrame:
    """Classical multiplicative seasonal decomposition of daily order
    revenue at weekly period: trend = centered 7-day moving average
    (full windows only), detrended ratio = value / trend, seasonal
    index = per-day-of-week mean ratio — the seasonality profile a
    forecast or anomaly job factors out first. Day-of-week is derived
    from the epoch-day integer (datediff from 1970-01-01, a Thursday),
    not locale/format-sensitive dayname(), so both engines bucket
    identically. All windows run over the DAILY rollup — at 100 TB the
    series is days-long regardless of order volume."""
    from pyspark.sql.window import Window

    daily = (
        load_table(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "revenue",
        F.avg("revenue").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("_w_n"),
    ).filter(F.col("_w_n") == 7)
    return (
        trended.groupBy(
            F.pmod(F.datediff(F.col("day"), F.lit("1970-01-01")), F.lit(7)).alias("dow")
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.col("revenue") / F.col("trend")), 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


SQL_SEASONAL_DOW_INDEX = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS revenue
  FROM orders GROUP BY 1
),
trended AS (
  SELECT day, revenue,
         avg(revenue) OVER w AS trend,
         count(*) OVER w AS w_n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS INTEGER) AS dow,
       count(*) AS n_days,
       round(avg(revenue / trend), 6) AS seasonal_index
FROM trended
WHERE w_n = 7
GROUP BY 1 ORDER BY 1
"""


def q_streaming_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental distinct-user counting over a REAL multi-batch stream
    (streaming/jobs.py ``run_stream_hll_to_parquet``): events are staged
    as 6 parquet files consumed one per micro-batch, each batch's HLL
    sketch register-maxed into the persisted per-event-type state; the
    drained state is then estimated and compared to the exact distinct
    count. The oracle pins the exact counts (value-checked) and the
    ±5% estimate bound as a TRUE boolean — a lost batch, double union,
    or stale version read turns the row red. Per-key fixed-size state
    regardless of stream length: the incremental complement of the
    batch ``hll_user_rollup`` lane."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="hll_src_")
    out = tempfile.mkdtemp(prefix="hll_table_")
    ckpt = tempfile.mkdtemp(prefix="hll_ckpt_")
    try:
        events = load_table(spark, sf, "events")
        events.select(
            "event_type", F.col("user_id").cast("string").alias("uid")
        ).repartition(6).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("event_type string, uid string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        SJ.run_stream_hll_to_parquet(
            stream, out, ckpt, "event_type", "uid", timeout_s=120
        )
        sketches = SJ.read_upsert_table(spark, out).select(
            "event_type", F.hll_sketch_estimate("sk").alias("est")
        )
        exact = events.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_exact")
        )
        res = exact.join(sketches, "event_type").select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
            ).alias("est_within_5pct"),
        ).orderBy("event_type")
        rows = res.collect()  # materialize before the temp dirs vanish
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_STREAMING_HLL = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS est_within_5pct
FROM events GROUP BY 1 ORDER BY 1
"""


def q_lasttouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent prior (or same-instant) non-purchase event —
    the standard marketing/product question "which behavior immediately
    precedes conversion", reported per channel with conversion counts
    and shares. Touches are first deduplicated to one per (user, ts)
    with an integer arg-max tiebreak (event_id), so the as-of match is
    deterministic under timestamp collisions; purchases with no prior
    touch credit 'none'. The as-of join is the union+window operator
    (one shuffle on user_id, never a range-join explosion); the rollup
    is channel-cardinality-sized. The oracle uses DuckDB's NATIVE ASOF
    join over the same deduped touches — two independent as-of
    implementations must agree on every credit."""
    ev = _events(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("channel"))
    )
    out = asof_join(
        purchases,
        touches,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["channel"],
    )
    counts = out.groupBy(
        F.coalesce(F.col("channel_matched"), F.lit("none")).alias("channel")
    ).agg(F.count(F.lit(1)).alias("conversions"))
    total = counts.agg(F.sum("conversions").cast("double").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "channel",
            "conversions",
            F.round(F.col("conversions") / F.col("_total"), 6).alias("share"),
        )
        .orderBy("channel")
    )


SQL_LASTTOUCH_ATTRIBUTION = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS channel
  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2
),
att AS (
  SELECT coalesce(t.channel, 'none') AS channel
  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts >= t.ts
),
c AS (SELECT channel, count(*) AS conversions FROM att GROUP BY 1)
SELECT channel, conversions,
       round(conversions / (SELECT CAST(sum(conversions) AS DOUBLE) FROM c), 6) AS share
FROM c ORDER BY channel
"""


def q_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-conversion distribution: per user the gap from first
    signup to the first purchase STRICTLY AFTER it, summarized as
    converter counts, conversion rate, and exact p50/p90 latency — the
    activation-funnel health number product teams watch. Two per-user
    min aggregates (one conditional), INTEGER epoch-millisecond deltas
    (unix_timestamp/epoch() disagree on sub-second fractions across
    engines; millisecond integers cannot), and
    an exact percentile over the converter frame (approx_percentile is
    the documented 100 TB knob, same shape as winsorize)."""
    ev = _events(spark, sf)
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("signup_ts")
        )
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.filter(F.col("signup_ts").isNotNull()), "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            (
                (F.min(F.unix_millis("ts")) - F.first(F.unix_millis("signup_ts")))
                / 1000.0
            ).alias("gap_s")
        )
    )
    n_signups = per_user.filter(F.col("signup_ts").isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("n_signups")
    )
    return (
        conv.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr("percentile(gap_s, 0.5)").alias("p50_s"),
            F.expr("percentile(gap_s, 0.9)").alias("p90_s"),
        )
        .crossJoin(F.broadcast(n_signups))
        .select(
            F.col("n_signups").cast("bigint").alias("n_signups"),
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_signups"), 6).alias("conversion_rate"),
            F.round("p50_s", 4).alias("p50_s"),
            F.round("p90_s", 4).alias("p90_s"),
        )
    )


SQL_TIME_TO_CONVERT = """
WITH su AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
  SELECT e.user_id,
         (min(epoch_ms(e.ts)) - any_value(epoch_ms(su.signup_ts))) / 1000.0 AS gap_s
  FROM events e JOIN su USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > su.signup_ts
  GROUP BY 1
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_signups FROM su)
SELECT CAST(n_signups AS BIGINT) AS n_signups,
       count(*) AS n_converted,
       round(count(*) / n_signups, 6) AS conversion_rate,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 4) AS p90_s
FROM conv CROSS JOIN n
GROUP BY n_signups
"""


def q_asof_click_fulfillment(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward',
    operators/asof.py ``asof_join_forward``): each click matched to the
    user's NEXT purchase at-or-after it — the "what happens next" face
    of the backward as-of already certified by asof_purchase_signup
    (next purchase after a click, next error after a deploy). Purchases
    are deduped to one per (user, ts) by min event_id first, so the
    equal-timestamp match is deterministic on both engines; the oracle
    replays the dedup and takes the arg-min-by-timestamp subsequent
    purchase per click. Same union+window shape — one user_id shuffle,
    never a range-join explosion."""
    from sentiment_analysis_bigdata_spark.operators.asof import asof_join_forward

    ev = _events(spark, sf)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_event_id"))
    )
    out = asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["purchase_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce("purchase_event_id_matched", F.lit(-1)).cast("bigint").alias(
            "next_purchase_event_id"
        ),
        F.coalesce(
            F.round(
                (F.unix_millis("ts_matched") - F.unix_millis("ts")) / 1000.0, 3
            ),
            F.lit(-1.0),
        ).alias("wait_s"),
    )


SQL_ASOF_CLICK_FULFILLMENT = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts, min(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
matched AS (
  SELECT c.event_id, c.user_id,
         arg_min(p.purchase_event_id, p.ts) AS next_purchase_event_id,
         (min(epoch_ms(p.ts)) - any_value(epoch_ms(c.ts))) / 1000.0 AS wait_s
  FROM c JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id,
       CAST(coalesce(m.next_purchase_event_id, -1) AS BIGINT) AS next_purchase_event_id,
       coalesce(round(m.wait_s, 3), -1.0) AS wait_s
FROM c LEFT JOIN matched m USING (event_id, user_id)
"""


def q_mutual_information(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    dependence screen that tells a feature/monitoring team whether a
    categorical pair carries signal at all (MI = 0 ⇔ independent;
    correlation only sees linear-ordinal structure): I(X;Y) =
    Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) plus both marginal entropies and the
    normalized coefficient I/min(H(X),H(Y)).

    One (x, y)-keyed count agg (bounded by |types|×24 cells), marginals
    as two rollups of that grid, every probability an exact integer
    ratio — both engines evaluate identical doubles. Hour-of-day comes
    from the epoch-hour integer mod 24 (UTC-stable, no locale
    surface)."""
    ev = _events(spark, sf)
    cells = (
        ev.select(
            F.col("event_type").alias("x"),
            F.floor(F.unix_millis("ts") / 3600000).cast("bigint").alias("_h"),
        )
        .select("x", F.pmod(F.col("_h"), F.lit(24)).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    total = cells.agg(F.sum("nxy").cast("double").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    joined = (
        cells.join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(total))
    )
    mi = F.sum(
        (F.col("nxy") / F.col("n"))
        * F.log(F.col("nxy") * F.col("n") / (F.col("nx") * F.col("ny")))
    )
    # marginal entropies from the grid: sum over distinct x of
    # -(nx/n)·ln(nx/n), computed via the per-cell share of its marginal
    hx = -F.sum((F.col("nxy") / F.col("n")) * F.log(F.col("nx") / F.col("n")))
    hy = -F.sum((F.col("nxy") / F.col("n")) * F.log(F.col("ny") / F.col("n")))
    return joined.agg(
        F.round(mi, 6).alias("mi_nats"),
        F.round(hx, 6).alias("h_type"),
        F.round(hy, 6).alias("h_hour"),
        F.round(mi / F.least(hx, hy), 6).alias("normalized_mi"),
    )


SQL_MUTUAL_INFORMATION = """
WITH cells AS (
  SELECT event_type AS x,
         CAST(floor(epoch_ms(ts) / 3600000) % 24 AS BIGINT) AS y,
         count(*) AS nxy
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM cells),
mx AS (SELECT x, sum(nxy) AS nx FROM cells GROUP BY 1),
my AS (SELECT y, sum(nxy) AS ny FROM cells GROUP BY 1)
SELECT round(sum((nxy / n) * ln(nxy * n / (nx * ny))), 6) AS mi_nats,
       round(-sum((nxy / n) * ln(nx / n)), 6) AS h_type,
       round(-sum((nxy / n) * ln(ny / n)), 6) AS h_hour,
       round(sum((nxy / n) * ln(nxy * n / (nx * ny)))
             / least(-sum((nxy / n) * ln(nx / n)),
                      -sum((nxy / n) * ln(ny / n))), 6) AS normalized_mi
FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
"""


def q_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (Kaplan & Meier
    1958) — the churn readout that handles censoring correctly, which a
    naive "average lifetime" cannot: lifetime = days from a user's first
    to last event; users still active in the final 7 days of the
    observation window are right-censored (their true lifetime is only
    known to EXCEED the observed one). Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over
    distinct event (death) days.

    Shape: one per-user min/max agg, one day-grained death/censor
    rollup, one cumulative window over DISTINCT LIFETIME DAYS (support-
    sized), with the product computed as exp(Σ ln) so both engines fold
    identical per-day factors; reported at day 1/7/30/60/90 horizons."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("t_max"))
    per_user = span.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("last_ts"), F.col("first_ts")).alias("lifetime_d"),
        (
            F.unix_millis("t_max") - F.unix_millis("last_ts")
            <= F.lit(7 * 86400 * 1000)
        ).alias("censored"),
    )
    days = per_user.groupBy("lifetime_d").agg(
        F.sum((~F.col("censored")).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("ended"),
    )
    w = Window.orderBy("lifetime_d").rowsBetween(Window.unboundedPreceding, 0)
    total = days.agg(F.sum("ended").cast("long").alias("n_total"))
    km = (
        days.crossJoin(F.broadcast(total))
        .withColumn(
            "at_risk",
            F.col("n_total") - F.coalesce(
                F.sum("ended").over(
                    Window.orderBy("lifetime_d").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "ln_factor",
            F.when(
                (F.col("d") > 0) & (F.col("at_risk") > F.col("d")),
                F.log(1.0 - F.col("d") / F.col("at_risk").cast("double")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("ln_s", F.sum("ln_factor").over(w))
        .select("lifetime_d", F.exp("ln_s").alias("s"))
    )
    pts = spark.createDataFrame([(1,), (7,), (30,), (60,), (90,)], "horizon_d int")
    return (
        km.crossJoin(F.broadcast(pts))
        .filter(F.col("lifetime_d") <= F.col("horizon_d"))
        .groupBy("horizon_d")
        .agg(F.round(F.min("s"), 6).alias("survival"))
        .orderBy("horizon_d")
    )


SQL_KAPLAN_MEIER = """
WITH span AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts FROM events GROUP BY 1
),
h AS (SELECT max(ts) AS t_max FROM events),
per_user AS (
  SELECT date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE)) AS lifetime_d,
         epoch_ms(t_max) - epoch_ms(last_ts) <= 7 * 86400 * 1000 AS censored
  FROM span CROSS JOIN h
),
days AS (
  SELECT lifetime_d,
         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS d,
         count(*) AS ended
  FROM per_user GROUP BY 1
),
tot AS (SELECT CAST(sum(ended) AS BIGINT) AS n_total FROM days),
km AS (
  SELECT lifetime_d,
         exp(sum(ln_factor) OVER (ORDER BY lifetime_d
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM (
    SELECT lifetime_d,
           CASE WHEN d > 0 AND at_risk > d
                THEN ln(1.0 - d / CAST(at_risk AS DOUBLE)) ELSE 0.0 END AS ln_factor
    FROM (
      SELECT lifetime_d, d,
             n_total - coalesce(sum(ended) OVER (ORDER BY lifetime_d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM days CROSS JOIN tot
    ) r
  ) f
),
pts AS (SELECT CAST(unnest([1, 7, 30, 60, 90]) AS INTEGER) AS horizon_d)
SELECT horizon_d, round(min(s), 6) AS survival
FROM km CROSS JOIN pts
WHERE lifetime_d <= horizon_d
GROUP BY 1 ORDER BY 1
"""


def q_activity_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST streak of consecutive
    active days — the canonical warehouse pattern (engagement streaks,
    uptime runs, sensor dropouts) solved with the row_number difference
    trick: within a user, epoch_day − row_number(ordered by day) is
    CONSTANT exactly along a run of consecutive days, so grouping by
    that difference labels islands without any self-join or loop. Two
    windows + two aggregates over the per-user DISTINCT DAY rollup
    (days-sized, not events-sized); reports the top-20 streaks with a
    (streak desc, user asc) deterministic cut."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.withColumn("grp", F.col("d") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("streak_days"))
        .groupBy("user_id")
        .agg(
            F.max("streak_days").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_islands"),
        )
    )
    return islands.orderBy(
        F.col("longest_streak").desc(), F.col("user_id").asc()
    ).limit(20)


SQL_ACTIVITY_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
grp AS (
  SELECT user_id,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days
),
islands AS (
  SELECT user_id, g, count(*) AS streak_days FROM grp GROUP BY 1, 2
)
SELECT user_id, CAST(max(streak_days) AS BIGINT) AS longest_streak,
       count(*) AS n_islands
FROM islands GROUP BY 1
ORDER BY longest_streak DESC, user_id ASC
LIMIT 20
"""


def q_top_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 three-step behavior paths — the second-order sequence
    mining the first-order transition matrix can't see (A→B→C can be
    common even when neither A→B nor B→C tops the pairwise counts):
    consecutive event-type triples per user via two lead() windows over
    the (ts, event_id)-ordered stream, one state³-bounded count, a
    deterministic (n desc, path asc) top-10 cut, and each path's share
    of all triples. One user-keyed shuffle; both lead()s share the same
    sort."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = (
        ev.select(
            F.col("event_type").alias("s1"),
            F.lead("event_type", 1).over(w).alias("s2"),
            F.lead("event_type", 2).over(w).alias("s3"),
        )
        .filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = triples.agg(F.sum("n").cast("double").alias("_t"))
    return (
        triples.crossJoin(F.broadcast(total))
        .select(
            F.concat_ws(" > ", "s1", "s2", "s3").alias("path"),
            "n",
            F.round(F.col("n") / F.col("_t"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


SQL_TOP_EVENT_PATHS = """
WITH seq AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
triples AS (
  SELECT s1, s2, s3, count(*) AS n FROM seq WHERE s3 IS NOT NULL GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM triples)
SELECT s1 || ' > ' || s2 || ' > ' || s3 AS path, n,
       round(n / t, 6) AS share
FROM triples CROSS JOIN tot
ORDER BY n DESC, path ASC
LIMIT 10
"""


def q_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — the product-health ratio
    comparing two grains of the same activity (average daily actives ÷
    monthly actives; 1.0 = every monthly user shows up every day). Month
    keys are integer (year, month) extractions; DAU is a two-level
    rollup (per-day distinct → per-month average), MAU one
    month-grained distinct — all bounded by users × days."""
    ev = _events(spark, sf)
    keyed = ev.select(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    dau = (
        keyed.groupBy("y", "m", "day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .groupBy("y", "m")
        .agg(F.avg("dau").alias("avg_dau"), F.count(F.lit(1)).alias("n_days"))
    )
    mau = keyed.groupBy("y", "m").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, ["y", "m"])
        .select(
            "y",
            "m",
            "n_days",
            F.round("avg_dau", 4).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("y", "m")
    )


SQL_DAU_MAU = """
WITH keyed AS (
  SELECT CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
         CAST(ts AS DATE) AS day, user_id
  FROM events
),
dau AS (
  SELECT y, m, avg(dau) AS avg_dau, count(*) AS n_days
  FROM (SELECT y, m, day, count(DISTINCT user_id) AS dau FROM keyed GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
mau AS (SELECT y, m, count(DISTINCT user_id) AS mau FROM keyed GROUP BY 1, 2)
SELECT y, m, n_days, round(avg_dau, 4) AS avg_dau, mau,
       round(avg_dau / mau, 6) AS stickiness
FROM dau JOIN mau USING (y, m)
ORDER BY y, m
"""


_DECAY_HALFLIFE_D = 7.0


def q_decayed_engagement(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially time-decayed engagement scoring (the recsys/
    popularity freshness primitive): each user's events weighted by
    2^(−age/half-life) as of the corpus horizon, so yesterday's activity
    outweighs last month's — then the top-20 users by decayed score with
    their raw counts for contrast. ONE aggregation pass (the decay
    weight is a narrow per-row expression off the integer epoch-ms age);
    the horizon is a 1-row broadcast; top-k is TakeOrdered. Ages are
    integer milliseconds, and the weight math is the identical double
    expression on both engines."""
    ev = _events(spark, sf)
    horizon = ev.agg(F.max("ts").alias("t_max"))
    weighted = ev.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "value",
        F.pow(
            2.0,
            -(F.unix_millis("t_max") - F.unix_millis("ts"))
            / F.lit(_DECAY_HALFLIFE_D * 86400000.0),
        ).alias("w"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("w"), 6).alias("decayed_score"),
            F.round(F.sum(F.col("w") * F.col("value")), 4).alias("decayed_value"),
        )
        .orderBy(F.col("decayed_score").desc(), F.col("user_id").asc())
        .limit(20)
    )


SQL_DECAYED_ENGAGEMENT = f"""
WITH h AS (SELECT max(ts) AS t_max FROM events),
weighted AS (
  SELECT user_id, value,
         pow(2.0, -(epoch_ms(t_max) - epoch_ms(ts))
                  / {_DECAY_HALFLIFE_D * 86400000.0}) AS w
  FROM events CROSS JOIN h
)
SELECT user_id, count(*) AS n_events,
       round(sum(w), 6) AS decayed_score,
       round(sum(w * value), 4) AS decayed_value
FROM weighted GROUP BY 1
ORDER BY decayed_score DESC, user_id ASC
LIMIT 20
"""


_MARKOV_ITERS = 12


def q_markov_stationary(spark: SparkSession, sf: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain — where
    the event mix settles if current transition behavior persists, the
    long-run load/forecast complement to the one-step
    ``event_transitions`` matrix. Power iteration π ← πP from uniform,
    12 fixed rounds with L1 renormalization.

    Scale shape is the PCA recipe: the corpus collapses to the
    state²-bounded transition matrix (operators/timeseries.py — one key
    shuffle), the iteration is fixed-order driver math on ≤ |states|²
    cells, and the oracle replays the identical recursion as unrolled
    CTEs over the same 6dp-rounded transition probabilities."""
    from sentiment_analysis_bigdata_spark.operators.timeseries import (
        transition_matrix,
    )

    tm = transition_matrix(_events(spark, sf))
    cells = sorted(
        (r["from_state"], r["to_state"], float(r["p"])) for r in tm.collect()
    )
    states = sorted({f for f, _, _ in cells} | {t for _, t, _ in cells})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = [[0.0] * k for _ in range(k)]
    for f, t, p in cells:
        P[idx[f]][idx[t]] = p
    pi = [1.0 / k] * k
    for _ in range(_MARKOV_ITERS):
        new = [sum(pi[i] * P[i][j] for i in range(k)) for j in range(k)]
        s = sum(new)
        pi = [x / s for x in new]
    rows = [(st, round(pi[idx[st]], 6)) for st in states]
    return spark.createDataFrame(rows, "state string, stationary_p double").orderBy(
        "state"
    )


def _sql_markov_stationary() -> str:
    ctes = [
        """steps AS (
  SELECT from_state, to_state FROM (
    SELECT event_type AS from_state,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_state
    FROM events
  ) WHERE to_state IS NOT NULL
)""",
        "counts AS (SELECT from_state, to_state, count(*) AS n FROM steps GROUP BY 1, 2)",
        "tots AS (SELECT from_state, sum(n) AS tot FROM counts GROUP BY 1)",
        """trans AS (
  SELECT c.from_state, c.to_state,
         round(c.n / CAST(t.tot AS DOUBLE), 6) AS p
  FROM counts c JOIN tots t USING (from_state)
)""",
        """states AS (
  SELECT from_state AS state FROM counts
  UNION SELECT to_state FROM counts
)""",
        """pi0 AS (
  SELECT state, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM states) AS pi
  FROM states
)""",
    ]
    for i in range(1, _MARKOV_ITERS + 1):
        # MATERIALIZED is load-bearing (the PCA-oracle lesson): pi_k
        # references raw_k twice and raw_k references pi_{k-1}; plain
        # CTE inlining makes the plan (and the underlying parquet scan)
        # duplicate exponentially in the iteration depth.
        ctes.append(
            f"""raw{i} AS MATERIALIZED (
  SELECT t.to_state AS state, sum(p.pi * t.p) AS pi
  FROM trans t JOIN pi{i - 1} p ON p.state = t.from_state
  GROUP BY 1
)"""
        )
        ctes.append(
            f"pi{i} AS MATERIALIZED (SELECT state, pi / (SELECT sum(pi) FROM raw{i}) AS pi FROM raw{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT state, round(pi, 6) AS stationary_p
FROM pi{_MARKOV_ITERS} ORDER BY state
"""
    )


_WF_WINDOW_MS = 7 * 86400 * 1000


def q_window_funnel_7d(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed funnel (the ClickHouse ``windowFunnel`` shape): the
    deepest signup → click → purchase step each user completes with
    EVERY step inside 7 days of the signup — the bounded-window variant
    that separates "eventually converted" from "converted while the
    campaign was live". Stage timestamps are strictly-ordered
    conditional mins (three key-grained aggregates); the window check
    is an integer epoch-millisecond compare, exact on both engines.
    Output is one row per depth (0-3) with user counts and shares."""
    ev = _events(spark, sf)
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    ck = (
        ev.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(ck, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    users = ev.select("user_id").distinct()
    staged = (
        users.join(su, "user_id", "left")
        .join(ck, "user_id", "left")
        .join(pu, "user_id", "left")
    )
    in_window = lambda c: (  # noqa: E731 — tiny local predicate
        F.unix_millis(F.col(c)) - F.unix_millis(F.col("signup_ts"))
    ) <= F.lit(_WF_WINDOW_MS)
    step = (
        F.when(F.col("purchase_ts").isNotNull() & in_window("purchase_ts"), 3)
        .when(F.col("click_ts").isNotNull() & in_window("click_ts"), 2)
        .when(F.col("signup_ts").isNotNull(), 1)
        .otherwise(0)
    )
    counts = staged.groupBy(step.alias("step")).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    total = counts.agg(F.sum("n_users").cast("double").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "step",
            "n_users",
            F.round(F.col("n_users") / F.col("_t"), 6).alias("share"),
        )
        .orderBy("step")
    )


SQL_WINDOW_FUNNEL_7D = f"""
WITH su AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
ck AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN su USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > su.signup_ts
  GROUP BY 1
),
pu AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN ck USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > ck.click_ts
  GROUP BY 1
),
staged AS (
  SELECT u.user_id, su.signup_ts, ck.click_ts, pu.purchase_ts
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN su USING (user_id)
  LEFT JOIN ck USING (user_id)
  LEFT JOIN pu USING (user_id)
),
stepped AS (
  SELECT CASE
    WHEN purchase_ts IS NOT NULL
         AND epoch_ms(purchase_ts) - epoch_ms(signup_ts) <= {_WF_WINDOW_MS} THEN 3
    WHEN click_ts IS NOT NULL
         AND epoch_ms(click_ts) - epoch_ms(signup_ts) <= {_WF_WINDOW_MS} THEN 2
    WHEN signup_ts IS NOT NULL THEN 1
    ELSE 0 END AS step
  FROM staged
),
c AS (SELECT step, count(*) AS n_users FROM stepped GROUP BY 1)
SELECT step, n_users,
       round(n_users / (SELECT CAST(sum(n_users) AS DOUBLE) FROM c), 6) AS share
FROM c ORDER BY step
"""


QUERIES = {
    "streaming_cms": (q_streaming_cms, SQL_STREAMING_CMS),
    "streaming_hll": (q_streaming_hll, SQL_STREAMING_HLL),
    "lasttouch_attribution": (q_lasttouch_attribution, SQL_LASTTOUCH_ATTRIBUTION),
    "time_to_convert": (q_time_to_convert, SQL_TIME_TO_CONVERT),
    "window_funnel_7d": (q_window_funnel_7d, SQL_WINDOW_FUNNEL_7D),
    "asof_click_fulfillment": (q_asof_click_fulfillment, SQL_ASOF_CLICK_FULFILLMENT),
    "mutual_information": (q_mutual_information, SQL_MUTUAL_INFORMATION),
    "markov_stationary": (q_markov_stationary, _sql_markov_stationary()),
    "kaplan_meier": (q_kaplan_meier, SQL_KAPLAN_MEIER),
    "decayed_engagement": (q_decayed_engagement, SQL_DECAYED_ENGAGEMENT),
    "activity_islands": (q_activity_islands, SQL_ACTIVITY_ISLANDS),
    "dau_mau": (q_dau_mau, SQL_DAU_MAU),
    "top_event_paths": (q_top_event_paths, SQL_TOP_EVENT_PATHS),
    "cusum_changepoints": (q_cusum_changepoints, SQL_CUSUM_CHANGEPOINTS),
    "seasonal_dow_index": (q_seasonal_dow_index, SQL_SEASONAL_DOW_INDEX),
    "streaming_bloom": (q_streaming_bloom, SQL_STREAMING_BLOOM),
    "purged_time_split": (q_purged_time_split, SQL_PURGED_TIME_SPLIT),
    "tumbling_events": (q_tumbling_events, SQL_TUMBLING_EVENTS),
    "sliding_events": (q_sliding_events, SQL_SLIDING_EVENTS),
    "streaming_sliding": (q_streaming_sliding, SQL_SLIDING_EVENTS),
    "session_windows": (q_session_windows, SQL_SESSION_WINDOWS),
    "asof_purchase_signup": (q_asof_purchase_signup, SQL_ASOF_PURCHASE_SIGNUP),
    "event_dedup": (q_event_dedup, SQL_EVENT_DEDUP),
    "hourly_to_daily_rollup": (q_hourly_to_daily_rollup, SQL_HOURLY_TO_DAILY_ROLLUP),
    "resample_ffill": (q_resample_ffill, SQL_RESAMPLE_FFILL),
    "time_weighted_avg": (q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "rate_anomalies": (q_rate_anomalies, SQL_RATE_ANOMALIES),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "interval_join_outer": (q_interval_join_outer, SQL_INTERVAL_JOIN_OUTER),
    "streaming_interval_join": (q_streaming_interval_join, SQL_INTERVAL_JOIN),
    "streaming_interval_join_outer": (
        q_streaming_interval_join_outer,
        SQL_STREAMING_INTERVAL_JOIN_OUTER,
    ),
    "streaming_tumbling": (q_streaming_tumbling, SQL_STREAMING_TUMBLING),
    "streaming_sessions": (q_streaming_sessions, SQL_STREAMING_SESSIONS),
    "streaming_dedup": (q_streaming_dedup, SQL_STREAMING_DEDUP),
    "streaming_static_join": (q_streaming_static_join, SQL_STREAMING_STATIC_JOIN),
    "streaming_upsert": (q_streaming_upsert, SQL_STREAMING_UPSERT),
    "streaming_topk": (q_streaming_topk, SQL_STREAMING_TOPK),
    "forecast_backtest": (q_forecast_backtest, SQL_FORECAST_BACKTEST),
}
