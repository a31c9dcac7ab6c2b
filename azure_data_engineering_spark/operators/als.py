"""Rank-1 alternating least squares in the plan (Koren, Bell &
Volinsky 2009; Zhou et al. 2008) — matrix factorization where the
data lives, as pure relational algebra.

Rank 1 keeps each alternating solve CLOSED-FORM per entity:

    u_i = Σ_j r_ij·v_j / (λ + Σ_j v_j²)      (over items i rated)
    v_j = Σ_i r_ij·u_i / (λ + Σ_i u_i²)      (over users who rated j)

so one ALS round is exactly two (join + groupBy) passes over the
ratings frame — the shape Spark executes well at any scale: ratings
shuffle once per side on the entity key, the small factor side is a
broadcast. No gradient schedule, no driver-side state.

Cross-engine determinism (the kmeans/logistic_gd treaty): ratings are
exact decimals, factors are rounded to 6 dp after every solve and
carried as decimal(18,6), so every Σ r·v / Σ v² numerator and
denominator is an EXACT decimal sum — summation-order-free — and both
engines walk identical trajectories; the only doubles are the final
divisions. Residuals are squared then rounded to 6 dp before the
exact-decimal RMSE sum.

Rank-1 is the demonstration shape; higher rank makes each per-entity
solve a k×k normal-equation system — the same moment-collection plan
as ridge_closed_form per entity, left as the documented extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def als_rank1(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rounds: int = 2,
    lam: float = 0.1,
    out_decimals: int = 6,
) -> DataFrame:
    """Run `rounds` alternating (users, then items) solves from
    v ≡ 1.0. Returns the ITEM frame: (item, n_users, v, rmse) where
    rmse is the global root-mean-square reconstruction error of the
    final factors (same value on every row — a dashboard frame).

    `rating_col` must already be an exact decimal type."""
    r = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).alias("r"),
    )
    v = r.select("i").distinct().withColumn(
        "v", F.lit(1.0).cast("decimal(18,6)")
    )
    u = None
    for _ in range(rounds):
        u = (
            r.join(F.broadcast(v), "i")
            .groupBy("u")
            .agg(
                F.round(
                    F.sum(F.col("r") * F.col("v")).cast("double")
                    / (
                        F.lit(float(lam))
                        + F.sum(F.col("v") * F.col("v")).cast("double")
                    ),
                    out_decimals,
                )
                .cast("decimal(18,6)")
                .alias("uf")
            )
        )
        v = (
            r.join(u, "u")
            .groupBy("i")
            .agg(
                F.round(
                    F.sum(F.col("r") * F.col("uf")).cast("double")
                    / (
                        F.lit(float(lam))
                        + F.sum(F.col("uf") * F.col("uf")).cast("double")
                    ),
                    out_decimals,
                )
                .cast("decimal(18,6)")
                .alias("v")
            )
        )
    resid = (
        r.join(u, "u")
        .join(F.broadcast(v), "i")
        .select(
            F.round(
                (
                    F.col("r").cast("double")
                    - F.col("uf").cast("double") * F.col("v").cast("double")
                )
                * (
                    F.col("r").cast("double")
                    - F.col("uf").cast("double") * F.col("v").cast("double")
                ),
                out_decimals,
            )
            .cast("decimal(28,6)")
            .alias("sq")
        )
    )
    rmse = resid.agg(
        F.round(
            F.sqrt(F.sum("sq").cast("double") / F.count(F.lit(1))),
            out_decimals,
        ).alias("rmse")
    )
    items = (
        r.groupBy("i")
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
        .join(v, "i")
    )
    return items.crossJoin(F.broadcast(rmse)).select(
        "i",
        "n_users",
        F.col("v").cast("double").alias("v"),
        "rmse",
    )
