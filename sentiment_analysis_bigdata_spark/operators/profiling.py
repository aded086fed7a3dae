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
