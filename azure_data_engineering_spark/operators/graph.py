"""Iterative graph algorithms over edge DataFrames.

Beside connected components (operators/clustering.py), the second
classic iterative fixed-point: PageRank (Page et al. 1999; Brin &
Page, WWW 1998) — in data-curation pipelines the standard importance
prior over a crawl/link/co-occurrence graph (e.g. weighting crawl
documents by page centrality before sampling).

Spark-first iteration discipline (same as connected_components):
- each round is ONE join (ranks onto edges, shuffle on src) and ONE
  aggregate (contributions by dst, shuffle on dst) — no driver-side
  state; every scalar (node count, dangling mass) rides along as a
  1-row broadcast frame, never a collect();
- localCheckpoint(eager) after every round truncates the lineage so
  the plan does not grow exponentially with iterations (the classic
  iterative-Spark failure mode);
- a FIXED iteration count keeps the result a deterministic algebraic
  function of the input — replayable in plain SQL by unrolling the
  rounds, which is how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    Returns (node, rank). Dangling nodes (no out-edges) redistribute
    their mass uniformly, so total rank stays 1 every round. The node
    universe is sources ∪ destinations.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.join(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        with_deg = ranks.join(deg, ranks.node == deg.src, "left").select(
            "node", "rank", "out_deg"
        )
        # mass of dangling nodes, spread uniformly next round
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        contribs = (
            e.join(with_deg.filter(F.col("out_deg").isNotNull()), e.src == F.col("node"))
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .join(F.broadcast(n_frame))
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dangling_mass") / F.col("n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
