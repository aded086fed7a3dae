"""ANALYZE-style table profiling: per-column stats in ONE corpus pass.

Absent from the reference (it never inspects data shape before modeling);
standard warehouse surface: the stats that drive CBO decisions, data-quality
gates, and schema-drift alerts (null explosions, ndv collapse, range creep).

Scale shape: a single ``agg`` computes every column's count / distinct /
min / max simultaneously — one shuffle of constant-width partial states,
never one job per column. Exact ``count_distinct`` partials are
bounded by ndv, which is the right default for dimension-like columns; for
high-cardinality keys at 100 TB, the mergeable-sketch path
(``hll_sketch_agg``, see workloads/warehouse_q.q_hll_user_rollup) replaces
the exact ndv with fixed-size state — same single-pass shape.

The wide 1-row aggregate unpivots to one row per column via ``stack``
(a generator projection, no shuffle). Numeric min/max surface as doubles,
string min/max as text, timestamps as formatted UTC strings — typed so a
SQL oracle reproduces values exactly (no engine-specific float printing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile: (col_name, n_rows, n_nonnull, n_distinct,
    min_numeric, max_numeric, min_text, max_text).

    Numeric columns fill the ``*_numeric`` stats (as double) and leave the
    text stats null; strings do the reverse; date/timestamp columns profile
    as formatted UTC text. ``n_rows`` repeats the table count on every row
    so each output row is self-contained.
    """
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    if not fields:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            c = F.date_format(c, _TS_FMT)
        aggs += [
            F.count(c).alias(f"{f.name}__nn"),
            F.count_distinct(c).alias(f"{f.name}__ndv"),
            F.min(c).alias(f"{f.name}__mn"),
            F.max(c).alias(f"{f.name}__mx"),
        ]
    row = df.agg(*aggs)

    def _stats(f) -> str:
        numeric = isinstance(f.dataType, T.NumericType)
        mn, mx = f"`{f.name}__mn`", f"`{f.name}__mx`"
        if numeric:
            val = f"CAST({mn} AS DOUBLE), CAST({mx} AS DOUBLE), CAST(NULL AS STRING), CAST(NULL AS STRING)"
        else:
            val = f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST({mn} AS STRING), CAST({mx} AS STRING)"
        return f"'{f.name}', __n, `{f.name}__nn`, `{f.name}__ndv`, {val}"

    stack = (
        f"stack({len(fields)}, "
        + ", ".join(_stats(f) for f in fields)
        + ") AS (col_name, n_rows, n_nonnull, n_distinct,"
        + " min_numeric, max_numeric, min_text, max_text)"
    )
    return row.selectExpr(stack)


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Key-distribution diagnostics for a prospective shuffle/join key —
    the numbers that decide between a plain shuffle join, salting, and
    AQE skew splitting: row count, distinct keys, mean rows/key, the
    heaviest key's share, and the top-``top_k`` keys' combined share.

    One groupBy(key) pass (map-side partials) feeding a bounded top-k
    (TakeOrderedAndProject) and a keyless 1-row summary — nothing
    driver-side, nothing proportional to ndv on the driver.

    Returns 1 row: (n_rows, n_keys, mean_rows_per_key, max_key,
    max_key_rows, max_key_share, topk_share).
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    top = counts.orderBy(F.col("c").desc(), F.col("k").asc()).limit(top_k)
    top_sum = top.agg(
        F.sum("c").alias("topc"),
        F.max(F.struct("c", "k")).alias("m"),
    )
    totals = counts.agg(
        F.sum("c").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return totals.crossJoin(F.broadcast(top_sum)).select(
        "n_rows",
        "n_keys",
        F.round(F.col("n_rows") / F.col("n_keys"), 6).alias("mean_rows_per_key"),
        F.col("m").getField("k").alias("max_key"),
        F.col("m").getField("c").alias("max_key_rows"),
        F.round(F.col("m").getField("c") / F.col("n_rows"), 6).alias("max_key_share"),
        F.round(F.col("topc") / F.col("n_rows"), 6).alias("topk_share"),
    )


def zipf_fit(
    docs: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Zipf's-law fit over the top-``top_n`` corpus terms: OLS of ln(freq)
    on ln(rank) → (n_terms, slope, intercept, r2). Natural language sits
    near slope −1; flat slopes flag boilerplate/templated corpora. One
    vocab-sized aggregate + a support-sized rank window (deterministic
    (freq desc, token asc) tie-break) + constant-state regr_* aggregates.
    """
    from pyspark.sql import Window

    from sentiment_analysis_bigdata_spark.functions.text import tokenize_nonempty

    freqs = (
        docs.select(F.explode(tokenize_nonempty(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    top = freqs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    pts = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
    )
