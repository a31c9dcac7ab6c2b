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

Rank-1 is the demonstration shape; `als_rank_k` below is the general
extension: each per-entity solve becomes a k×k ridge normal-equation
system whose MOMENTS (the k(k+1)/2 Gram sums and k right-hand sides)
are collected as exact-decimal columns in ONE map-side-combinable
groupBy per side — the ridge_closed_form Gram-partials discipline,
per entity. The solve itself touches only the entity-count-sized
moment frame: closed-form determinant arithmetic for k=2 (every
operation SQL-replayable, so the oracle twin stays exact), an
Arrow-batched ``np.linalg.solve`` over the stacked (n,k,k) systems
for k>2 (A = Gram + λI is positive definite, so the solve cannot
fail). Factor state per entity is k decimals — nothing driver-side,
nothing corpus-proportional outside the two rating shuffles per
round.
"""

from __future__ import annotations

from typing import Iterator

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
    # same consumer count as als_rank_k: r feeds every half-round plus
    # the residual/item passes; checkpoint once. Factor frames are
    # checkpointed per half-round so lineage does not re-derive
    # earlier rounds.
    r = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).alias("r"),
    ).localCheckpoint(eager=True)
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
            # lazy (r12): materializes inside the next consumer job
            .localCheckpoint(eager=False)
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
            # lazy (r12): materializes inside the next consumer job
            .localCheckpoint(eager=False)
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

def _solve_cols(prefix: str, k: int, lam: float, out_decimals: int) -> list:
    """Closed-form k=2 ridge solve as column expressions over the
    moment columns s_a_b / b_a (all cast to double first). The
    arithmetic SHAPE is fixed — det and numerators written exactly as
    the oracle SQL writes them — so both engines execute the same
    IEEE operation sequence."""
    assert k == 2
    s00 = F.col("s_0_0").cast("double")
    s01 = F.col("s_0_1").cast("double")
    s11 = F.col("s_1_1").cast("double")
    b0 = F.col("b_0").cast("double")
    b1 = F.col("b_1").cast("double")
    a00 = F.lit(float(lam)) + s00
    a11 = F.lit(float(lam)) + s11
    det = a00 * a11 - s01 * s01
    return [
        F.round((b0 * a11 - b1 * s01) / det, out_decimals)
        .cast("decimal(18,6)")
        .alias(f"{prefix}0"),
        F.round((b1 * a00 - b0 * s01) / det, out_decimals)
        .cast("decimal(18,6)")
        .alias(f"{prefix}1"),
    ]


def als_rank_k(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 2,
    rounds: int = 2,
    lam: float = 0.1,
    out_decimals: int = 6,
    init_salt: str = "alsinit",
) -> DataFrame:
    """Rank-k ALS (Zhou et al. 2008 "Large-scale Parallel Collaborative
    Filtering"): factor the (user, item, rating) matrix as U·Vᵀ with
    k latent components via `rounds` alternating per-entity ridge
    solves.

    Item factors initialize from the deterministic md5 unit draw
    (0.5 + hash_unit(item#component)/1 ∈ [0.5, 1.5)) — a PUBLIC,
    engine-replayable symmetry break; identical components would
    collapse rank-k to rank-1 forever. Each solve collects the
    k(k+1)/2 Gram sums Σ f_a·f_b and k right-hand sides Σ r·f_a as
    EXACT decimal aggregates (factors are decimal(18,6), products
    decimal(37,12) — order-free), then solves (Gram + λI)x = b per
    entity on the entity-count-sized moment frame: closed-form
    determinant arithmetic for k=2 (oracle-exact), Arrow-batched
    ``np.linalg.solve`` on the stacked (n,k,k) systems for k>2, with
    half-away rounding matching the engines'. Factors re-round to
    6 dp decimals after every solve, so both engines walk identical
    trajectories for k=2.

    Returns the ITEM frame: (item, n_users, v0..v{k-1}, rmse) where
    rmse is the global reconstruction error of the final factors
    (same on every row — a dashboard frame). `rating_col` must
    already be an exact decimal type."""
    if k < 2:
        raise ValueError("use als_rank1 for k=1")
    if rounds < 1:
        raise ValueError("als_rank_k needs rounds >= 1")
    from .sampling import hash_unit

    # materialize the ratings frame ONCE: it is re-joined every
    # half-round plus the residual and item-count passes (6 consumers
    # for rounds=2) and is often itself an upstream aggregation —
    # without the checkpoint that whole subtree re-executes per use
    r = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).alias("r"),
    ).localCheckpoint(eager=True)

    def init_col(f: int):
        return (
            F.round(
                F.lit(0.5)
                + hash_unit(
                    F.concat(F.col("i").cast("string"), F.lit(f"#{f}")),
                    init_salt,
                ),
                out_decimals,
            )
            .cast("decimal(18,6)")
            .alias(f"f{f}")
        )

    v = r.select("i").distinct().select("i", *[init_col(f) for f in range(k)])

    def moments(joined: DataFrame, key: str) -> DataFrame:
        aggs = []
        for a in range(k):
            for b in range(a, k):
                aggs.append(
                    F.sum(F.col(f"f{a}") * F.col(f"f{b}")).alias(f"s_{a}_{b}")
                )
            aggs.append(F.sum(F.col("r") * F.col(f"f{a}")).alias(f"b_{a}"))
        return joined.groupBy(key).agg(*aggs)

    def solve(mom: DataFrame, key: str) -> DataFrame:
        if k == 2:
            return mom.select(key, *_solve_cols("f", k, lam, out_decimals))
        # k > 2: Arrow-batched stacked solve on the moment frame
        # (entity-count-sized — never the ratings frame).
        import numpy as np
        import pandas as pd

        key_type = mom.schema[key].dataType.simpleString()
        out_schema = ", ".join(
            [f"{key} {key_type}"] + [f"f{f} double" for f in range(k)]
        )
        kk, dec, lam_f = k, out_decimals, float(lam)

        def batch_solve(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                n = len(pdf)
                if n == 0:
                    continue
                A = np.zeros((n, kk, kk))
                for a in range(kk):
                    for b in range(a, kk):
                        s = pdf[f"s_{a}_{b}"].astype(float).to_numpy()
                        A[:, a, b] = s
                        A[:, b, a] = s
                    A[:, a, a] += lam_f
                B = np.stack(
                    [pdf[f"b_{a}"].astype(float).to_numpy() for a in range(kk)],
                    axis=1,
                )
                X = np.linalg.solve(A, B)
                # half-AWAY rounding to match Spark/DuckDB round()
                # (numpy rounds half-even)
                p = 10.0**dec
                X = np.sign(X) * np.floor(np.abs(X) * p + 0.5) / p
                out = {key: pdf[key]}
                for f in range(kk):
                    out[f"f{f}"] = X[:, f]
                yield pd.DataFrame(out)

        solved = mom.mapInPandas(batch_solve, out_schema)
        return solved.select(
            key,
            *[F.col(f"f{f}").cast("decimal(18,6)").alias(f"f{f}") for f in range(k)],
        )

    # Broadcast the item-factor frame only under a VERIFIED size cap
    # (same discipline as graph.link_prediction): the item vocabulary
    # is fixed across rounds, so one count up front decides every
    # round. A realistic catalog (millions of items × k decimal
    # factors) must go through the shuffle join, not executor memory.
    n_items = v.count()
    broadcast_items = n_items <= 1_000_000

    def item_side(frame: DataFrame) -> DataFrame:
        return F.broadcast(frame) if broadcast_items else frame

    u = None
    # checkpoint each half-round's factor frame: u/v are entity-sized,
    # and without truncation round N's plan re-derives every previous
    # round's joins+solves (lineage doubles per half-round)
    for _ in range(rounds):
        u = solve(moments(r.join(item_side(v), "i"), "u"), "u").localCheckpoint(
            eager=True
        )
        # lazy (r12): materializes inside the next consumer job
        v = solve(moments(r.join(u, "u"), "i"), "i").localCheckpoint(eager=False)

    pred = None
    for f in range(k):
        term = F.col(f"uf{f}").cast("double") * F.col(f"vf{f}").cast("double")
        pred = term if pred is None else pred + term
    uf = u.select("u", *[F.col(f"f{f}").alias(f"uf{f}") for f in range(k)])
    vf = v.select("i", *[F.col(f"f{f}").alias(f"vf{f}") for f in range(k)])
    resid = (
        r.join(uf, "u")
        .join(item_side(vf), "i")
        .select(
            F.round(
                (F.col("r").cast("double") - pred)
                * (F.col("r").cast("double") - pred),
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
        *[F.col(f"f{f}").cast("double").alias(f"v{f}") for f in range(k)],
        "rmse",
    )
