"""Clustering workload: deterministic Lloyd's k-means over the embeddings
table, with the full recursion (seed → assign → re-estimate → assign →
re-estimate → final assign) replayed by the DuckDB oracle as unrolled
CTEs. Every intermediate centroid is rounded to 9 decimals in BOTH
engines before it feeds the next round, so cross-engine float drift in
the mean (partial-agg association order, ~1e-15) cannot flip an
assignment — the final sizes and inertias match exactly at round(6).

Reference parity: the reference has no clustering (SURVEY §2.6 stops at
three classifiers); this is north-star surface for corpus organization
(topic balancing, per-cluster sampling) in a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sentiment_analysis_bigdata_spark.operators.clustering import kmeans_summary
from sentiment_analysis_bigdata_spark.sources import load_table

K = 4
ITERATIONS = 2
ROUND_DIGITS = 9


def q_kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster the corpus embeddings (k=4, 2 Lloyd rounds from the
    4 smallest vec_ids) and report per-cluster size + inertia."""
    emb = load_table(spark, sf, "embeddings")
    return kmeans_summary(emb, "embedding", "vec_id", k=K, iterations=ITERATIONS)


def _sql_dist(vec: str, ctr: str) -> str:
    """Sequential squared-L2, same left-to-right IEEE sum as the Spark
    side's F.aggregate-over-zip_with."""
    d = f"(CAST({vec}[CAST(i AS INT)] AS DOUBLE) - {ctr}[CAST(i AS INT)])"
    return (
        f"list_sum(list_transform(range(1, len({vec}) + 1), i -> {d} * {d}))"
    )


def _sql_assign(name: str, centers: str) -> str:
    """One assign round: argmin cluster per vector, ties → lowest cid."""
    return f"""{name} AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM (
      SELECT e.vec_id, c.cid, {_sql_dist("e.embedding", "c.c")} AS d
      FROM embeddings e CROSS JOIN {centers} c))
  WHERE rn = 1
)"""


def _sql_reestimate(mname: str, cname: str, assign: str, prev: str) -> str:
    """Per-(cluster, dim) rounded mean, reassembled to a centroid list;
    an empty cluster keeps its previous centroid (same rule as the
    operator)."""
    return f"""{mname} AS (
  SELECT a.cid, CAST(t.i - 1 AS INT) AS dim,
         round(avg(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)), {ROUND_DIGITS}) AS m
  FROM {assign} a
  JOIN embeddings e USING (vec_id),
       unnest(range(1, len(e.embedding) + 1)) AS t(i)
  GROUP BY 1, 2
),
{cname} AS (
  SELECT p.cid,
         CASE WHEN count(m.m) > 0 THEN list(m.m ORDER BY m.dim)
              ELSE any_value(p.c) END AS c
  FROM {prev} p LEFT JOIN {mname} m ON m.cid = p.cid
  GROUP BY p.cid
)"""


SQL_KMEANS_CLUSTERS = f"""
WITH seeds AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {K}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM seeds
),
{_sql_assign("a1", "c0")},
{_sql_reestimate("m1", "c1", "a1", "c0")},
{_sql_assign("a2", "c1")},
{_sql_reestimate("m2", "c2", "a2", "c1")},
{_sql_assign("a3", "c2")}
SELECT cid AS cluster_id,
       count(*) AS n_points,
       round(sum(d), 6) AS inertia
FROM a3
GROUP BY 1
"""


QUERIES = {
    "kmeans_clusters": (q_kmeans_clusters, SQL_KMEANS_CLUSTERS),
}
