"""Link-analysis operators: weighted PageRank over an edge list — the
standard importance ranking for crawl prioritization and source scoring in
a training-data pipeline (rank domains by who links to them, crawl the
high-rank tail first).

Spark-first iterative design, like ``dedup.connected_components``:

- Edges normalize once (per-source out-weight) and are reused every
  iteration; ranks are a small (nodes, rank) frame.
- Each iteration is one join + one aggregation, both hash-partitioned on
  the SAME key (dst of the join = key of the agg), so AQE reuses the
  exchange; no sort anywhere.
- Fixed iteration count (caller-set) keeps the lineage bounded; for long
  runs ``localCheckpoint`` every few rounds would cap plan growth (see
  connected_components for the pattern) — at the typical 10-20 PageRank
  iterations the plan stays manageable without it.
- Dangling nodes (no out-edges) keep the base rank ``1 - damping``; the
  classic per-node formulation ``r = (1-d) + d·Σ contrib`` (Page et al.,
  1999) rather than the probability-normalized variant, so ranks don't
  need a global normalization step each round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | Column | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank: returns (node, rank) for every node appearing as
    a source or destination. ``weight_col=None`` treats every edge as
    weight 1; parallel edges accumulate.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = (
        F.lit(1.0)
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
    )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.alias("_w")
    )
    # collapse parallel edges once; normalize by the source's total out-weight
    agg_e = e.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w"))
    out_w = agg_e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    norm = agg_e.join(out_w, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_share")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    base = F.lit(1.0 - damping)
    for _ in range(iterations):
        contrib = norm.join(
            ranks, norm._src == ranks.node
        ).select("_dst", (F.col("rank") * F.col("_share")).alias("_c"))
        incoming = contrib.groupBy(F.col("_dst").alias("node")).agg(
            F.sum("_c").alias("_in")
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (base + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks
