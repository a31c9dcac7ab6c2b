"""Grid-accelerated DBSCAN (Ester et al., KDD 1996) as a composition
of relational plans.

DBSCAN's semantics decompose exactly onto the engine's existing
primitives, so no new iteration machinery is needed:

1. neighbor pairs — the spatial-join grid trick (operators/spatial):
   bucket points into cells of side eps, replicate ONE side into its
   3x3 cell neighborhood, equi-join on the cell key, refine with the
   exact squared distance. Catalyst runs a hash join; never a
   CartesianProduct, and pair volume is bounded by cell occupancy.
2. core points — one degree aggregate: |neighbors within eps| + 1
   (self counts, per the original paper) >= min_pts.
3. clusters — connected components over CORE-CORE neighbor edges
   (operators/clustering.connected_components: iterative min-label
   propagation, localCheckpoint-truncated). Cluster id = min core
   point id, deterministic.
4. border points — non-core points with >= 1 core neighbor join the
   MINIMUM neighboring core cluster id (the paper leaves border
   assignment order-dependent; min is the deterministic choice).
   Everything else is noise.

Scale note: with fixed eps and growing data DENSITY the core graph
densifies toward one giant component — the caller owns eps/min_pts
calibration (or bounds the panel with a deterministic hash sample,
the conformal-calibration discipline) exactly as with any DBSCAN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import connected_components


def grid_dbscan(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
    max_iter: int = 25,
) -> DataFrame:
    """Label every point: (id, role, cluster_id) with role in
    {'core','border','noise'} and cluster_id = min core-point id of
    the cluster (-1 for noise). Distances are planar euclidean; the
    squared-distance refine uses one fixed expression shape so an
    independent SQL replay computes bit-identical booleans."""
    eps = float(eps)
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.floor(F.col(x_col).cast("double") / eps).alias("cx"),
        F.floor(F.col(y_col).cast("double") / eps).alias("cy"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probe = (
        pts.withColumn("ox", off)
        .withColumn("oy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("pid").alias("id_a"),
            F.col("px").alias("xa"),
            F.col("py").alias("ya"),
            (F.col("cx") + F.col("ox")).alias("jx"),
            (F.col("cy") + F.col("oy")).alias("jy"),
        )
    )
    build = pts.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbr = (
        probe.join(build, ["jx", "jy"])
        .filter((F.col("id_a") != F.col("id_b")) & (d2 <= F.lit(eps * eps)))
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    deg = nbr.groupBy(F.col("id_a").alias("pid")).agg(
        F.count(F.lit(1)).alias("n_nbr")
    )
    core = (
        pts.join(deg, "pid", "left")
        .filter(F.coalesce(F.col("n_nbr"), F.lit(0)) + 1 >= min_pts)
        .select("pid")
        .localCheckpoint()
    )
    core_edges = (
        nbr.join(core.select(F.col("pid").alias("id_a")), "id_a")
        .join(core.select(F.col("pid").alias("id_b")), "id_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(core_edges, nodes=core, max_iter=max_iter)
    core_lab = comp.select(
        F.col("node").alias("pid"),
        F.col("component").alias("cluster_id"),
        F.lit("core").alias("role"),
    )
    border = (
        nbr.join(core.select(F.col("pid").alias("id_b")), "id_b")
        .join(core.select(F.col("pid").alias("id_a")), "id_a", "left_anti")
        .join(
            core_lab.select(
                F.col("pid").alias("id_b"), F.col("cluster_id")
            ),
            "id_b",
        )
        .groupBy(F.col("id_a").alias("pid"))
        .agg(F.min("cluster_id").alias("cluster_id"))
        .withColumn("role", F.lit("border"))
    )
    labeled = core_lab.select("pid", "cluster_id", "role").union(
        border.select("pid", "cluster_id", "role")
    )
    return (
        pts.select("pid")
        .join(labeled, "pid", "left")
        .select(
            "pid",
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
            F.coalesce(F.col("cluster_id"), F.lit(-1)).alias("cluster_id"),
        )
    )
