"""Modern Spark 4 SQL surface: recursive CTEs and the VARIANT
semi-structured type — each with a DuckDB oracle.

- ``recursive_month_series``: WITH RECURSIVE calendar generation +
  gap-filling left join (the canonical recursion use). The IDENTICAL SQL
  string runs on both engines (the ``lateral_top_orders`` precedent), so
  the oracle checks Spark's recursive-CTE execution itself.
- ``variant_json_props``: JSON ingested as VARIANT (``parse_json`` →
  ``variant_get``) — the shredded-binary semi-structured path that
  replaces string re-parsing per access at scale. Oracle via DuckDB's
  native JSON extraction.

Reference parity: none (the reference has no SQL surface at all);
north-star query-capability extensions.

Scale notes: recursion depth here is the calendar length (80 rows —
driver-bounded, never data-bounded); the fact side joins against the tiny
generated series, which AQE broadcasts. VARIANT extraction is a narrow
projection over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_bigdata_spark.sources import load_table

SQL_RECURSIVE_MONTH_SERIES = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01'
)
SELECT m AS month,
       count(o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS DOUBLE)
         / 100.0 AS revenue
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY 1
"""


def q_recursive_month_series(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive calendar series left-joined to orders: every month in the
    fixed range appears, zero-filled when no orders exist — gaps are
    visible instead of silently absent (the flaw of grouping by observed
    months only)."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_RECURSIVE_MONTH_SERIES)


def q_variant_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """events.props ingested as VARIANT once, fields accessed with
    variant_get — per-bucket stats over the extracted value."""
    load_table(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH v AS (
          SELECT parse_json(props) AS pv, value FROM events
        )
        SELECT variant_get(pv, '$.k', 'int') % 7 AS k_mod,
               count(*) AS n,
               round(avg(value), 6) AS avg_value
        FROM v
        GROUP BY 1
        """
    )


SQL_VARIANT_JSON_PROPS = """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 7 AS k_mod,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1
"""


QUERIES = {
    "recursive_month_series": (
        q_recursive_month_series,
        SQL_RECURSIVE_MONTH_SERIES,
    ),
    "variant_json_props": (q_variant_json_props, SQL_VARIANT_JSON_PROPS),
}
