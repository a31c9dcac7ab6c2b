"""In-plan classical ML: PCA, ridge regression, logistic GD, decision
stumps, calibration — all trained INSIDE Catalyst, no driver-side fit.

The reference pipeline (ref adffunction/__init__.py:57-117) stops at
"load and validate"; a training-data engine also needs the classical
statistics that gate corpora (dominant components for diversity
sampling, linear probes for quality, calibration for the classifier
that decides what 100 TB keeps). Everything here follows the engine's
iterative-operator discipline (operators/kmeans.py, graph.py):

- model state lives in TINY row sets (a 64x64 Gram frame, a 1-row
  weight frame), updated per round with broadcast joins and
  localCheckpoint lineage truncation — the corpus never leaves
  executors and is touched once per pass;
- FIXED iteration counts + per-round rounding pin the whole run to a
  deterministic algebraic function of the input, so a SQL oracle can
  replay the exact rounds as chained MATERIALIZED CTEs;
- heavy reductions use map-side partial aggregation; the only Python
  is the Arrow-batched Gram partials in pca_power (one 64x64 matrix
  emitted per Arrow batch — output size is independent of row count,
  the canonical 100 TB reduction shape).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_partials(vec_col: str, dim: int):
    """mapInPandas kernel: per Arrow batch, emit the dim x dim upper
    triangle of X^T X plus per-dim sums and the row count — a
    fixed-size partial state per batch (the 100 TB shape: a 1 B-row
    partition still emits ~dim^2/2 rows)."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if x.size == 0:
                continue
            g = x.T @ x
            s = x.sum(axis=0)
            i, j = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([i, np.arange(dim), [-1]]),
                    "j": np.concatenate([j, np.full(dim, -1), [-1]]),
                    "s": np.concatenate([g[i, j], s, [float(len(pdf))]]),
                }
            )

    return fn


def pca_power(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    iterations: int = 8,
    cov_decimals: int = 6,
    vec_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """First principal component by power iteration, end to end in
    one plan; returns (id, pc1) scores plus the Rayleigh-quotient
    variance estimate on every row.

    Stage 1 — covariance: Arrow-batched Gram partials (see
    _gram_partials) are summed into a dim x dim frame; C = (S -
    m m^T / n) / n is assembled from raw moments and rounded to
    cov_decimals so both engines power-iterate IDENTICAL doubles
    (accumulation-order drift dies here, before it can compound).
    Stage 2 — power iteration: v_{t+1} = round(C v_t / |C v_t|,
    vec_decimals), `iterations` fixed rounds; each round is a
    dim^2-row broadcast join + a scalar-norm crossJoin on frames of
    at most dim^2 rows, localCheckpoint-ed. Deterministic init
    v_0 = 1/sqrt(dim).
    Stage 3 — projection: one broadcast join of the dim-row
    component against the pos-exploded corpus; pc1 = (x - mu) . v.

    The oracle replays stages 1-3 as MATERIALIZED CTEs (covariance
    from the same raw moments, the same rounded rounds), so this is
    hash-exact cross-engine, not a recall-gated approximation.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    moments = (
        base.mapInPandas(_gram_partials("v", dim), schema="i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .localCheckpoint(eager=True)
    )
    n = moments.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    mean = (
        moments.filter((F.col("i") >= 0) & (F.col("j") == -1))
        .crossJoin(F.broadcast(n))
        .select(F.col("i").alias("pos"), (F.col("s") / F.col("n")).alias("mu"))
    )
    # mirror the upper triangle so C is a full dim x dim row set
    upper = moments.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    sym = upper.union(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s"
        )
    )
    mu_i = mean.select(F.col("pos").alias("i"), F.col("mu").alias("mu_i"))
    mu_j = mean.select(F.col("pos").alias("j"), F.col("mu").alias("mu_j"))
    cov = (
        sym.join(F.broadcast(mu_i), "i")
        .join(F.broadcast(mu_j), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            F.round(
                (F.col("s") - F.col("mu_i") * F.col("mu_j") * F.col("n")) / F.col("n"),
                cov_decimals,
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    v = cov.select(F.col("j").alias("pos")).distinct().select(
        "pos", (F.lit(1.0) / F.sqrt(F.lit(float(dim)))).alias("vv")
    )
    for _ in range(iterations):
        w = (
            cov.join(F.broadcast(v.withColumnRenamed("pos", "j")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vv")).alias("w"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                F.col("i").alias("pos"),
                F.round(F.col("w") / F.col("nrm"), vec_decimals).alias("vv"),
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    lam = (
        cov.join(F.broadcast(v.select(F.col("pos").alias("i"), F.col("vv").alias("vi"))), "i")
        .join(F.broadcast(v.select(F.col("pos").alias("j"), F.col("vv").alias("vj"))), "j")
        .agg(F.round(F.sum(F.col("c") * F.col("vi") * F.col("vj")), out_decimals).alias("variance_pc1"))
    )
    ex = base.select("id", F.posexplode("v").alias("pos", "x"))
    proj = (
        ex.join(F.broadcast(mean), "pos")
        .join(F.broadcast(v), "pos")
        .groupBy("id")
        .agg(F.round(F.sum((F.col("x") - F.col("mu")) * F.col("vv")), out_decimals).alias("pc1"))
    )
    return proj.crossJoin(F.broadcast(lam))


def ridge_closed_form(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    scale1: int = 1,
    scale2: int = 1,
    scale_y: int = 1,
    lam: float = 1.0,
    out_decimals: int = 6,
) -> DataFrame:
    """Two-feature ridge regression solved in closed form inside the
    plan: ONE aggregation over the fact table collects the 3x3
    normal-equation moments, then Cramer's rule on the 1-row moment
    frame yields (w0, w1, w2) — no iterations, no driver math, no
    second pass. R^2 comes from the same moment row.

    Exactness contract: inputs are fixed-point reals stored as
    float64 (TPC-H money/quantity columns); each is converted to
    integer units via round(x * scale) and the moments are summed as
    DECIMAL(38,0) — EXACT integers, so both engines cast the SAME
    doubles into the Cramer arithmetic and the coefficients match to
    the last bit before the final display rounding. This is the same
    exact-decimal discipline as the engine's money aggregates
    (q_decimal_agg), applied to second-order moments.

    At 100 TB the plan is a single map-side-combined aggregate to a
    1-row frame: the cheapest possible distributed shape.
    """
    d = df.select(
        F.round(F.col(x1) * scale1, 0).cast("decimal(38,0)").alias("a"),
        F.round(F.col(x2) * scale2, 0).cast("decimal(38,0)").alias("b"),
        F.round(F.col(y) * scale_y, 0).cast("decimal(38,0)").alias("t"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("a").cast("double") / scale1).alias("s1"),
        (F.sum("b").cast("double") / scale2).alias("s2"),
        (F.sum(F.col("a") * F.col("a")).cast("double") / (scale1 * scale1)).alias("s11"),
        (F.sum(F.col("a") * F.col("b")).cast("double") / (scale1 * scale2)).alias("s12"),
        (F.sum(F.col("b") * F.col("b")).cast("double") / (scale2 * scale2)).alias("s22"),
        (F.sum(F.col("t")).cast("double") / scale_y).alias("sy"),
        (F.sum(F.col("a") * F.col("t")).cast("double") / (scale1 * scale_y)).alias("s1y"),
        (F.sum(F.col("b") * F.col("t")).cast("double") / (scale2 * scale_y)).alias("s2y"),
        (F.sum(F.col("t") * F.col("t")).cast("double") / (scale_y * scale_y)).alias("syy"),
    )
    # normal equations (A + lam*diag(0,1,1)) w = r, A = [[n,s1,s2],
    # [s1,s11+lam,s12],[s2,s12,s22+lam]] — intercept not penalized
    a11, a12, a13 = F.col("n"), F.col("s1"), F.col("s2")
    a22 = F.col("s11") + lam
    a23 = F.col("s12")
    a33 = F.col("s22") + lam
    r1, r2, r3 = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    w0 = (
        r1 * (a22 * a33 - a23 * a23)
        - a12 * (r2 * a33 - a23 * r3)
        + a13 * (r2 * a23 - a22 * r3)
    ) / det
    w1 = (
        a11 * (r2 * a33 - r3 * a23)
        - r1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * r3 - r2 * a13)
    ) / det
    w2 = (
        a11 * (a22 * r3 - a23 * r2)
        - a12 * (a12 * r3 - r2 * a13)
        + r1 * (a12 * a23 - a22 * a13)
    ) / det
    sse = (
        F.col("syy")
        + w0 * w0 * F.col("n")
        + w1 * w1 * F.col("s11")
        + w2 * w2 * F.col("s22")
        - 2 * w0 * F.col("sy")
        - 2 * w1 * F.col("s1y")
        - 2 * w2 * F.col("s2y")
        + 2 * w0 * w1 * F.col("s1")
        + 2 * w0 * w2 * F.col("s2")
        + 2 * w1 * w2 * F.col("s12")
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(w0, out_decimals).alias("w0"),
        F.round(w1, out_decimals).alias("w1"),
        F.round(w2, out_decimals).alias("w2"),
        F.round(F.lit(1.0) - sse / sst, out_decimals).alias("r2"),
    )


def logistic_gd(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    iterations: int = 6,
    lr: float = 1.0,
    grad_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Full-batch logistic regression by fixed-round gradient descent,
    entirely in-plan: the weight vector is a 1-ROW frame, each round
    broadcasts it over the corpus, aggregates the mean gradient
    map-side, rounds it to grad_decimals (pinning the trajectory to
    identical doubles in every engine — the kmeans/pagerank rounding
    discipline applied to SGD), and crossJoins the update. One corpus
    pass per round, lineage truncated per round; at 100 TB each round
    is a single scan + 3-number reduce.

    Returns 1 row: (w0, w1, w2, accuracy, log_loss) at the final
    weights (one extra scoring pass).
    """
    # materialize the projected corpus ONCE: every GD round (and the
    # final scoring pass) re-reads this frame, and without the
    # checkpoint each round re-runs the upstream scan + projection
    # (guide: cache what is reused; the 3-column frame is the cheap
    # proxy, never the raw table)
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("t"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    for _ in range(iterations):
        z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = (
            base.crossJoin(F.broadcast(w))
            .agg(
                F.round(F.avg(p - F.col("t")), grad_decimals).alias("g0"),
                F.round(F.avg((p - F.col("t")) * F.col("x1")), grad_decimals).alias("g1"),
                F.round(F.avg((p - F.col("t")) * F.col("x2")), grad_decimals).alias("g2"),
            )
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                (F.col("w0") - lr * F.col("g0")).alias("w0"),
                (F.col("w1") - lr * F.col("g1")).alias("w1"),
                (F.col("w2") - lr * F.col("g2")).alias("w2"),
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # clamp for log-loss: p can hit exactly 0/1 in double at large |z|
    pc = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    return (
        base.crossJoin(F.broadcast(w))
        .agg(
            F.round(F.first("w0"), out_decimals).alias("w0"),
            F.round(F.first("w1"), out_decimals).alias("w1"),
            F.round(F.first("w2"), out_decimals).alias("w2"),
            F.round(
                F.avg(((p >= 0.5).cast("double") == F.col("t")).cast("double")),
                out_decimals,
            ).alias("accuracy"),
            F.round(
                F.avg(
                    -(F.col("t") * F.log(pc) + (F.lit(1.0) - F.col("t")) * F.log(F.lit(1.0) - pc))
                ),
                out_decimals,
            ).alias("log_loss"),
        )
    )


def decision_stump(
    df: DataFrame,
    feature: str,
    label: str,
    feature_decimals: int = 2,
    gain_decimals: int = 9,
) -> DataFrame:
    """Best single-feature threshold split by information gain, as one
    sort-free aggregation + one window pass over the DISTINCT feature
    values: candidate thresholds collapse to the value histogram
    (bounded by cardinality, not row count — the same collapse
    bpe_train uses on words), cumulative class counts come from a
    running-sum window, and the argmax is a 1-row TakeOrdered.

    Entropies are computed from EXACT integer counts, so the only
    float work is log2 on identical operands — cross-engine safe
    after gain rounding. Returns 1 row: threshold (split is x <=
    threshold), gain_bits, left/right row and positive counts.

    The single-partition window over distinct values is bounded by
    the feature's cardinality (fixed-point-rounded via
    feature_decimals); for truly continuous features pre-bucket with
    quantile_binning first.
    """
    d = df.select(
        F.round(F.col(feature), feature_decimals).alias("x"),
        F.col(label).cast("long").alias("t"),
    )
    hist = d.groupBy("x").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("t").alias("pos")
    )
    win = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = hist.agg(
        F.sum("cnt").alias("n_all"), F.sum("pos").alias("p_all")
    )
    cum = (
        hist.select(
            "x",
            F.sum("cnt").over(win).alias("n_l"),
            F.sum("pos").over(win).alias("p_l"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_l") < F.col("n_all"))  # rightmost value: no split
    )

    def ent(p, n):
        # binary entropy in bits from exact counts; 0*log(0) -> 0
        frac = p.cast("double") / n.cast("double")
        return -(
            F.when(frac > 0, frac * F.log2(frac)).otherwise(F.lit(0.0))
            + F.when(frac < 1, (1 - frac) * F.log2(1 - frac)).otherwise(F.lit(0.0))
        )

    n_r = F.col("n_all") - F.col("n_l")
    p_r = F.col("p_all") - F.col("p_l")
    gain = ent(F.col("p_all"), F.col("n_all")) - (
        F.col("n_l") / F.col("n_all") * ent(F.col("p_l"), F.col("n_l"))
        + n_r / F.col("n_all") * ent(p_r, n_r)
    )
    scored = cum.select(
        F.col("x").alias("threshold"),
        F.round(gain, gain_decimals).alias("gain_bits"),
        F.col("n_l").cast("long").alias("n_left"),
        F.col("p_l").cast("long").alias("pos_left"),
        n_r.cast("long").alias("n_right"),
        p_r.cast("long").alias("pos_right"),
    )
    return scored.orderBy(F.col("gain_bits").desc(), F.col("threshold").asc()).limit(1)


def calibration_bins(
    df: DataFrame,
    score: str,
    label: str,
    bins: int = 10,
    out_decimals: int = 6,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier: fixed-width
    probability bins, per-bin (n, mean predicted, observed rate,
    |gap|) — the calibration evidence a corpus-gating classifier
    needs before its threshold is trusted at 100 TB. One group-by
    over the scored frame; bin ids from exact arithmetic
    (floor(p * bins) clamped to bins-1).
    """
    d = df.select(F.col(score).cast("double").alias("p"), F.col(label).cast("double").alias("t"))
    b = F.least(F.floor(F.col("p") * bins).cast("int"), F.lit(bins - 1))
    return (
        d.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("p"), out_decimals).alias("mean_predicted"),
            F.round(F.avg("t"), out_decimals).alias("observed_rate"),
            F.round(F.abs(F.avg("p") - F.avg("t")), out_decimals).alias("abs_gap"),
        )
    )


def _cramer_weights(n, s1, s2, s11, s12, s22, sy, s1y, s2y, lam: float):
    """Cramer's-rule solution of the 2-feature ridge normal equations
    (A + lam*diag(0,1,1)) w = r over column expressions — the shared
    arithmetic of ridge_closed_form and ridge_cv. Expression STRUCTURE
    is part of the cross-engine contract: the SQL oracles mirror this
    exact parenthesization so both engines execute the same IEEE op
    sequence on the same exact-decimal-derived doubles."""
    a22 = s11 + lam
    a23 = s12
    a33 = s22 + lam
    det = (
        n * (a22 * a33 - a23 * a23)
        - s1 * (s1 * a33 - a23 * s2)
        + s2 * (s1 * a23 - a22 * s2)
    )
    w0 = (
        sy * (a22 * a33 - a23 * a23)
        - s1 * (s1y * a33 - a23 * s2y)
        + s2 * (s1y * a23 - a22 * s2y)
    ) / det
    w1 = (
        n * (s1y * a33 - s2y * a23)
        - sy * (s1 * a33 - a23 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    ) / det
    w2 = (
        n * (a22 * s2y - a23 * s1y)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * a23 - a22 * s2)
    ) / det
    return det, w0, w1, w2


def _sse_from_moments(n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy, w0, w1, w2):
    """Residual sum of squares expanded in moment space:
    sse = sum (y - w0 - w1 x1 - w2 x2)^2 — evaluated WITHOUT touching
    the rows again. This is what lets k-fold CV run in ONE corpus
    scan: any row subset's fit quality is a pure function of its
    10-number moment row."""
    return (
        syy
        + w0 * w0 * n + w1 * w1 * s11 + w2 * w2 * s22
        - 2 * w0 * sy - 2 * w1 * s1y - 2 * w2 * s2y
        + 2 * w0 * w1 * s1 + 2 * w0 * w2 * s2 + 2 * w1 * w2 * s12
    )


def ridge_cv(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    fold_col: str,
    scale1: int = 1,
    scale2: int = 1,
    scale_y: int = 1,
    lam: float = 1.0,
    out_decimals: int = 6,
) -> DataFrame:
    """k-fold cross-validated ridge regression in ONE corpus scan via
    moment subtraction: per-fold normal-equation moments are collected
    as EXACT decimal integers in a single groupBy(fold), the total is
    their (exact) sum, and each fold's TRAINING moments are simply
    total - fold — so k models train and evaluate with zero extra
    passes. Holdout RMSE comes from the same moment algebra
    (_sse_from_moments on the held-out fold's row), never a second
    scan. At 100 TB: one map-side-combined aggregate to k rows, then
    arithmetic on a broadcast-sized frame — the cheapest possible
    distributed CV.

    Exactness: integer-unit moments subtract exactly, so both engines
    cast the SAME integers into the SAME Cramer/sse expression trees;
    results are bit-identical before display rounding. Returns one
    row per fold: (fold, n_train, n_test, w0, w1, w2, rmse)."""
    d = df.select(
        F.col(fold_col).cast("int").alias("fold"),
        F.round(F.col(x1) * scale1, 0).cast("decimal(38,0)").alias("a"),
        F.round(F.col(x2) * scale2, 0).cast("decimal(38,0)").alias("b"),
        F.round(F.col(y) * scale_y, 0).cast("decimal(38,0)").alias("t"),
    )
    per = d.groupBy("fold").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"),
        F.sum("a").alias("ra"), F.sum("b").alias("rb"), F.sum("t").alias("rt"),
        F.sum(F.col("a") * F.col("a")).alias("raa"),
        F.sum(F.col("a") * F.col("b")).alias("rab"),
        F.sum(F.col("b") * F.col("b")).alias("rbb"),
        F.sum(F.col("a") * F.col("t")).alias("rat"),
        F.sum(F.col("b") * F.col("t")).alias("rbt"),
        F.sum(F.col("t") * F.col("t")).alias("rtt"),
    ).localCheckpoint(eager=True)
    # ^ per is consumed twice (the grand-total agg AND the per-fold
    # join) — without the checkpoint the corpus-wide decimal-moment
    # pass, the whole cost of this operator, executes twice
    tot = per.agg(
        *[F.sum(c).alias("T" + c) for c in
          ("cnt", "ra", "rb", "rt", "raa", "rab", "rbb", "rat", "rbt", "rtt")]
    )
    j = per.crossJoin(F.broadcast(tot))

    def dbl(expr, scale):
        return expr.cast("double") / scale

    # training moments: exact integer total-minus-fold, THEN to double
    n = dbl(F.col("Tcnt") - F.col("cnt"), 1)
    s1 = dbl(F.col("Tra") - F.col("ra"), scale1)
    s2 = dbl(F.col("Trb") - F.col("rb"), scale2)
    sy = dbl(F.col("Trt") - F.col("rt"), scale_y)
    s11 = dbl(F.col("Traa") - F.col("raa"), scale1 * scale1)
    s12 = dbl(F.col("Trab") - F.col("rab"), scale1 * scale2)
    s22 = dbl(F.col("Trbb") - F.col("rbb"), scale2 * scale2)
    s1y = dbl(F.col("Trat") - F.col("rat"), scale1 * scale_y)
    s2y = dbl(F.col("Trbt") - F.col("rbt"), scale2 * scale_y)
    _, w0, w1, w2 = _cramer_weights(n, s1, s2, s11, s12, s22, sy, s1y, s2y, lam)
    # holdout moments: the fold's own row
    hn = dbl(F.col("cnt"), 1)
    h1 = dbl(F.col("ra"), scale1)
    h2 = dbl(F.col("rb"), scale2)
    hy = dbl(F.col("rt"), scale_y)
    h11 = dbl(F.col("raa"), scale1 * scale1)
    h12 = dbl(F.col("rab"), scale1 * scale2)
    h22 = dbl(F.col("rbb"), scale2 * scale2)
    h1y = dbl(F.col("rat"), scale1 * scale_y)
    h2y = dbl(F.col("rbt"), scale2 * scale_y)
    hyy = dbl(F.col("rtt"), scale_y * scale_y)
    sse = _sse_from_moments(hn, h1, h2, h11, h12, h22, hy, h1y, h2y, hyy, w0, w1, w2)
    return j.select(
        "fold",
        (F.col("Tcnt") - F.col("cnt")).cast("long").alias("n_train"),
        F.col("cnt").cast("long").alias("n_test"),
        F.round(w0, out_decimals).alias("w0"),
        F.round(w1, out_decimals).alias("w1"),
        F.round(w2, out_decimals).alias("w2"),
        F.round(F.sqrt(sse / hn), out_decimals).alias("rmse"),
    )


def conformal_interval(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    id_col: str,
    calib_size: int = 2000,
    alpha: float = 0.1,
    scale1: int = 1,
    scale2: int = 1,
    scale_y: int = 1,
    lam: float = 1.0,
    out_decimals: int = 6,
) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al. 2005; Lei et
    al. JASA 2018) for the in-plan ridge model: hold out a FIXED-SIZE
    calibration panel, train on the rest, and return the residual
    quantile q_hat such that [pred - q_hat, pred + q_hat] covers new
    points with probability >= 1 - alpha under exchangeability — the
    distribution-free uncertainty a corpus-gating regressor needs
    before its predictions drive filtering.

    Scale discipline: the calibration panel is the `calib_size`
    smallest md5(id) draws (the q_retrieval_metrics fixed-panel rule)
    — a distributed TakeOrdered, NOT a corpus fraction, so the
    single-partition residual rank below is bounded by a constant
    regardless of corpus size; the train split is a broadcast
    anti-join against the panel ids. Training is the one-scan exact-
    moment ridge (ridge_closed_form), so weights are pinned 6-dp
    doubles and calibration residuals are bit-identical cross-engine;
    the conformal rank k = ceil((n_calib + 1)(1 - alpha)) selects
    q_hat deterministically by (residual, id).

    Returns ONE row: (n_train, n_calib, k, q_hat, coverage_train) —
    coverage_train is the empirical fraction of TRAINING rows inside
    +-q_hat, a sanity metric that should sit near 1 - alpha."""
    from azure_data_engineering_spark.operators.sampling import hash_unit

    u = hash_unit(F.col(id_col), "conformal")
    calib_ids = (
        df.select(F.col(id_col).alias("__cid"), u.alias("__u"))
        .orderBy("__u", "__cid")
        .limit(calib_size)
        .select("__cid")
    )
    calib = df.join(
        F.broadcast(calib_ids), df[id_col] == F.col("__cid"), "inner"
    ).drop("__cid")
    train = df.join(
        F.broadcast(calib_ids), df[id_col] == F.col("__cid"), "left_anti"
    )
    w = (
        ridge_closed_form(
            train, x1, x2, y,
            scale1=scale1, scale2=scale2, scale_y=scale_y, lam=lam,
        )
        .select(
            F.col("n").alias("n_train"), "w0", "w1", "w2"
        )
        # fail loudly when the panel swallowed the whole corpus: an
        # empty training split yields NULL moments, which would
        # otherwise propagate into a silent all-NULL output row
        .withColumn(
            "__ok",
            F.assert_true(
                F.col("n_train") > 0,
                F.lit(
                    "conformal_interval: training split is empty — "
                    "calib_size >= corpus size; shrink the panel"
                ),
            ),
        )
        .filter(F.col("__ok").isNull())
        .drop("__ok")
        .localCheckpoint(eager=True)
    )
    pred = F.col("w0") + F.col("w1") * F.col(x1) + F.col("w2") * F.col(x2)
    res = (
        calib.crossJoin(F.broadcast(w))
        .select(
            F.col(id_col).alias("rid"),
            F.abs(F.col(y) - pred).alias("r"),
            "n_train", "w0", "w1", "w2",
        )
    )
    nc = res.agg(F.count(F.lit(1)).alias("n_calib"))
    ranked = res.crossJoin(F.broadcast(nc)).withColumn(
        "rn", F.row_number().over(Window.orderBy("r", "rid"))
    )
    kth = ranked.filter(
        F.col("rn")
        == F.least(
            F.ceil((F.col("n_calib") + 1) * (1.0 - alpha)).cast("int"),
            F.col("n_calib").cast("int"),
        )
    ).select(
        "n_train", "w0", "w1", "w2", "n_calib",
        F.col("rn").cast("long").alias("k"),
        F.col("r").alias("q_hat"),
    )
    cov = (
        train.crossJoin(F.broadcast(kth))
        .agg(
            F.first("n_train").alias("n_train"),
            F.first("n_calib").cast("long").alias("n_calib"),
            F.first("k").alias("k"),
            F.round(F.first("q_hat"), out_decimals).alias("q_hat"),
            F.round(
                F.avg(
                    (F.abs(F.col(y) - pred) <= F.col("q_hat")).cast("double")
                ),
                out_decimals,
            ).alias("coverage_train"),
        )
    )
    return cov


def gbm_stumps(
    df: DataFrame,
    x: str,
    y: str,
    rounds: int = 3,
    lr: float = 0.5,
    y_scale: int = 100,
    gain_decimals: int = 4,
) -> DataFrame:
    """Gradient-boosted regression stumps (Friedman 2001), trained
    entirely in-plan with EXACT integer residuals: the target is
    converted to integer units (y_scale), the base prediction and
    every leaf value are rounded to integer units, so residuals stay
    exact integers through all rounds — per-round split scoring sums
    are therefore exact, and the argmax is deterministic in any
    engine without a rounding treaty on accumulated floats (the
    ridge/decision_stump exactness discipline extended to an
    iterative learner).

    Per round: candidate thresholds collapse to the feature-value
    histogram (bounded by CARDINALITY, not rows — pre-bucket truly
    continuous features first), cumulative residual sums give the
    variance-reduction gain S_l^2/n_l + S_r^2/n_r - S^2/n from exact
    integers, a 1-row argmax (gain desc, threshold asc) picks the
    stump, and the corpus residual updates through a broadcast join
    of that 1-row frame. Only the 1-row stump frames are
    checkpointed — the corpus is re-derived lazily, so each round
    costs exactly one histogram aggregation of the corpus.

    Returns one row per round: (round, threshold, add_left,
    add_right, n_left, n_right, sse_pre, gain_frac) — add_* are the
    lr-scaled leaf increments in integer units; sse_pre is the exact
    squared-residual total entering the round and gain_frac the
    fraction of it the split removes, so the row sequence IS the
    training curve."""
    # materialized once: every round's histogram re-reads this frame
    # (with r lazily chained residual updates on top); without the
    # checkpoint each round also re-runs the upstream scan/projection
    base = df.select(
        F.round(F.col(x), 0).cast("long").alias("xv"),
        F.round(F.col(y) * y_scale, 0).cast("decimal(38,0)").alias("t"),
    ).localCheckpoint(eager=True)
    f0 = (
        base.agg(
            F.round(F.sum("t").cast("double") / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("f0")
        )
        .localCheckpoint(eager=True)
    )
    cur = base.crossJoin(F.broadcast(f0)).select(
        "xv", (F.col("t").cast("long") - F.col("f0")).alias("e")
    )
    out = None
    spark = df.sparkSession
    for r in range(1, rounds + 1):
        # ss as exact decimal: sum of e^2 exceeds long range on a
        # billion-row corpus; s (signed residual sum) stays in long
        hist = cur.groupBy("xv").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("e").alias("s"),
            F.sum((F.col("e") * F.col("e")).cast("decimal(38,0)")).alias("ss"),
        )
        win = Window.orderBy("xv").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tot = hist.agg(
            F.sum("cnt").alias("n_all"), F.sum("s").alias("s_all"),
            F.sum("ss").alias("ss_all"),
        )
        cum = (
            hist.select(
                "xv",
                F.sum("cnt").over(win).alias("n_l"),
                F.sum("s").over(win).alias("s_l"),
            )
            .crossJoin(F.broadcast(tot))
            .filter(F.col("n_l") < F.col("n_all"))
        )
        n_r_ = F.col("n_all") - F.col("n_l")
        s_r_ = F.col("s_all") - F.col("s_l")
        # square in DOUBLE: s^2 overflows long for partial sums past
        # ~3e9 units; exact-int inputs cast to identical doubles first.
        # The argmax ranks the RAW gain — it is a pure function of
        # exact integers, so it is bit-identical in any engine; a
        # rounded gain would NOT be (round() algorithms diverge in the
        # last ulp at 1e13+ magnitudes). The reported gain_frac is
        # gain/sse_pre — O(1), where rounding is stable.
        s_ld = F.col("s_l").cast("double")
        s_rd = s_r_.cast("double")
        s_ad = F.col("s_all").cast("double")
        gain = (
            s_ld * s_ld / F.col("n_l")
            + s_rd * s_rd / n_r_
            - s_ad * s_ad / F.col("n_all")
        )
        stump = (
            cum.select(
                F.lit(r).alias("round"),
                F.col("xv").alias("threshold"),
                F.round(
                    F.lit(lr) * (F.col("s_l").cast("double") / F.col("n_l")), 0
                ).cast("long").alias("add_left"),
                F.round(
                    F.lit(lr) * (s_r_.cast("double") / n_r_), 0
                ).cast("long").alias("add_right"),
                F.col("n_l").cast("long").alias("n_left"),
                n_r_.cast("long").alias("n_right"),
                F.col("ss_all").cast("double").alias("sse_pre"),
                gain.alias("__g"),
                # residuals can be EXACTLY zero once the model fits
                # (integer leaves make that reachable): 0/0-guard
                F.when(
                    F.col("ss_all").cast("double") != 0.0,
                    F.round(
                        gain / F.col("ss_all").cast("double"), gain_decimals
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("gain_frac"),
            )
            .orderBy(F.col("__g").desc(), F.col("threshold").asc())
            .limit(1)
            .drop("__g")
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
        out = stump if out is None else out.unionByName(stump)
        upd = stump.select(
            F.col("threshold").alias("__t"),
            F.col("add_left").alias("__al"),
            F.col("add_right").alias("__ar"),
        )
        cur = cur.crossJoin(F.broadcast(upd)).select(
            "xv",
            (
                F.col("e")
                - F.when(F.col("xv") <= F.col("__t"), F.col("__al")).otherwise(
                    F.col("__ar")
                )
            ).alias("e"),
        )
    return out


def confusion_f1(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-class confusion-matrix scores: per-class precision /
    recall / F1 plus micro- and macro-averaged rows (class = '__micro'
    / '__macro') — the standard classifier report, computed as pure
    aggregation so it runs on a full corpus instead of a sampled
    sklearn frame.

    Scale shape: ONE groupBy collapses the corpus to the confusion
    matrix (|classes|² rows); per-class marginals, micro (global TP /
    total), and macro (unweighted mean of per-class F1, zero-filled
    for classes never predicted or never true) all re-aggregate from
    that tiny frame. Ratios are exact-integer-derived doubles rounded
    once; the macro mean averages 9 dp decimals so it is summation-
    order-free."""
    cm = df.groupBy(
        F.col(truth_col).alias("t"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    classes = (
        cm.select(F.col("t").alias("cls"))
        .union(cm.select(F.col("p").alias("cls")))
        .distinct()
    )
    tp = cm.filter(F.col("t") == F.col("p")).select(
        F.col("t").alias("cls"), F.col("c").alias("tp")
    )
    truth_n = cm.groupBy(F.col("t").alias("cls")).agg(F.sum("c").alias("n_true"))
    pred_n = cm.groupBy(F.col("p").alias("cls")).agg(F.sum("c").alias("n_pred"))
    per = (
        classes.join(tp, "cls", "left")
        .join(truth_n, "cls", "left")
        .join(pred_n, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true"))
    f1 = F.when(
        F.coalesce(prec, F.lit(0.0)) + F.coalesce(rec, F.lit(0.0)) > 0,
        2.0 * prec * rec / (prec + rec),
    ).otherwise(F.lit(0.0))
    scored = per.select(
        F.col("cls").cast("string").alias("class"),
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, round_digits).alias("precision"),
        F.round(rec, round_digits).alias("recall"),
        F.round(f1, round_digits).alias("f1"),
    )
    # micro: pooled counts (== accuracy in single-label classification);
    # macro: unweighted mean of per-class F1 over the union of classes
    micro = per.agg(
        F.lit("__micro").alias("class"),
        F.sum("n_true").cast("long").alias("n_true"),
        F.sum("n_pred").cast("long").alias("n_pred"),
        F.sum("tp").cast("long").alias("tp"),
        F.round(F.sum("tp") / F.sum("n_pred"), round_digits).alias("precision"),
        F.round(F.sum("tp") / F.sum("n_true"), round_digits).alias("recall"),
        F.round(F.sum("tp") / F.sum("n_true"), round_digits).alias("f1"),
    )
    macro = per.select(
        F.round(
            F.when(
                F.coalesce(prec, F.lit(0.0)) + F.coalesce(rec, F.lit(0.0)) > 0,
                2.0 * prec * rec / (prec + rec),
            ).otherwise(F.lit(0.0)),
            9,
        )
        .cast("decimal(20,9)")
        .alias("f1d")
    ).agg(
        F.lit("__macro").alias("class"),
        F.lit(None).cast("long").alias("n_true"),
        F.lit(None).cast("long").alias("n_pred"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("double").alias("precision"),
        F.lit(None).cast("double").alias("recall"),
        F.round(
            F.sum("f1d").cast("double") / F.count(F.lit(1)), round_digits
        ).alias("f1"),
    )
    return scored.unionByName(micro).unionByName(macro)


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement (Cohen 1960): observed
    agreement p_o corrected for the agreement p_e two independent
    raters with these marginals would reach by chance —
    κ = (p_o - p_e) / (1 - p_e). THE sanity metric when two labeling
    pipelines (or a model and a human pass) disagree less than it
    seems: raw agreement flatters whenever one class dominates.

    One groupBy to the |classes|² agreement matrix; marginals and both
    probabilities re-aggregate from it. p_o and p_e are ratios of
    exact integer sums (p_e's numerator is Σ_c n_a(c)·n_b(c), exact in
    DECIMAL(38,0)), divided once in double. Returns one row:
    (n, p_o, p_e, kappa)."""
    cm = df.groupBy(
        F.col(rater_a_col).alias("a"), F.col(rater_b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    ma = cm.groupBy(F.col("a").alias("cls")).agg(F.sum("c").alias("na"))
    mb = cm.groupBy(F.col("b").alias("cls")).agg(F.sum("c").alias("nb"))
    tot = cm.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("agree"),
    )
    chance = (
        ma.join(mb, "cls")
        .agg(
            F.sum((F.col("na") * F.col("nb")).cast("decimal(38,0)")).alias(
                "chance_num"
            )
        )
    )
    n = F.col("n").cast("double")
    p_o = F.col("agree").cast("double") / n
    p_e = F.col("chance_num").cast("double") / (n * n)
    return (
        tot.crossJoin(F.broadcast(chance))
        .select(
            "n",
            F.round(p_o, round_digits).alias("p_o"),
            F.round(p_e, round_digits).alias("p_e"),
            F.round((p_o - p_e) / (1.0 - p_e), round_digits).alias("kappa"),
        )
    )


def softmax_gd(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    k_classes: int,
    iterations: int = 6,
    lr: float = 1.0,
    grad_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Full-batch MULTICLASS (softmax / multinomial logistic)
    regression by fixed-round gradient descent, entirely in-plan —
    the K-class generalization of logistic_gd under the exact same
    discipline: the 3K-weight vector is a 1-ROW broadcast frame, each
    round is one corpus scan + a 3K-number reduce with every mean
    gradient rounded to grad_decimals (pinning the trajectory to
    identical doubles in any engine), lineage truncated per round.
    Softmax is computed max-subtracted (the standard overflow guard —
    also a pure algebraic expression the oracle replays verbatim).

    Returns 1 row: the 3K weights w{k}_{b,1,2} (rounded), accuracy
    under the deterministic argmax (ties → smallest class), and
    multiclass log-loss at the final weights."""
    ks = list(range(k_classes))
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("long").alias("t"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w_cols = [f"w{k}_{j}" for k in ks for j in (0, 1, 2)]
    w = spark.createDataFrame(
        [tuple(0.0 for _ in w_cols)], ", ".join(f"{c} double" for c in w_cols)
    )

    def z_of(k):
        return (
            F.col(f"w{k}_0")
            + F.col(f"w{k}_1") * F.col("x1")
            + F.col(f"w{k}_2") * F.col("x2")
        )

    def probs():
        zs = [z_of(k) for k in ks]
        zmax = F.greatest(*zs) if len(zs) > 1 else zs[0]
        exps = [F.exp(z - zmax) for z in zs]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        return [e / denom for e in exps]

    for _ in range(iterations):
        ps = probs()
        aggs = []
        for k in ks:
            ind = (F.col("t") == k).cast("double")
            aggs.append(F.round(F.avg(ps[k] - ind), grad_decimals).alias(f"g{k}_0"))
            aggs.append(
                F.round(F.avg((ps[k] - ind) * F.col("x1")), grad_decimals).alias(f"g{k}_1")
            )
            aggs.append(
                F.round(F.avg((ps[k] - ind) * F.col("x2")), grad_decimals).alias(f"g{k}_2")
            )
        g = base.crossJoin(F.broadcast(w)).agg(*aggs)
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                *[
                    (F.col(c) - lr * F.col("g" + c[1:])).alias(c)
                    for c in w_cols
                ]
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    ps = probs()
    # deterministic argmax on the z's: ties resolve to the smallest k
    zs = [z_of(k) for k in ks]
    pred = F.lit(k_classes - 1)
    for k in range(k_classes - 2, -1, -1):
        cond = zs[k] >= zs[k + 1]
        for j in range(k + 2, k_classes):
            cond = cond & (zs[k] >= zs[j])
        pred = F.when(cond, F.lit(k)).otherwise(pred)
    p_true = ps[0] * (F.col("t") == 0).cast("double")
    for k in ks[1:]:
        p_true = p_true + ps[k] * (F.col("t") == k).cast("double")
    pc = F.least(F.greatest(p_true, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    return (
        base.crossJoin(F.broadcast(w))
        .agg(
            *[F.round(F.first(c), out_decimals).alias(c) for c in w_cols],
            F.round(
                F.avg((pred == F.col("t")).cast("double")), out_decimals
            ).alias("accuracy"),
            F.round(F.avg(-F.log(pc)), out_decimals).alias("log_loss"),
        )
    )


def brier_decomposition(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over a binned
    forecast — calibration_bins says WHERE the forecast is off; this
    says HOW MUCH of the total loss that miscalibration costs:

        BS_binned = RELIABILITY − RESOLUTION + UNCERTAINTY
        REL = Σ n_k(f̄_k − ō_k)²/n     (calibration cost — want 0)
        RES = Σ n_k(ō_k − ō)²/n       (discrimination — want big)
        UNC = ō(1 − ō)                (irreducible base-rate noise)

    with f̄_k/ō_k the bin's mean forecast / observed rate and ō the
    global rate. The raw (unbinned) Brier mean((f−y)²) is emitted
    alongside; the identity holds exactly for the binned forecast,
    and raw_brier − bs_binned is the within-bin forecast variance.

    Scale shape: ONE corpus groupBy to per-bin exact DECIMAL moments
    (n, Σf, Σy, Σf², Σfy) + a bins-row reduce; every per-bin summand
    is rounded to a 9 dp DECIMAL before the k-row sum (the module's
    standing order-independence discipline). Bin ids from identical
    double arithmetic in both engines. Returns one row: (n, bins,
    base_rate, reliability, resolution, uncertainty, bs_binned,
    raw_brier)."""
    f = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = F.least(F.floor(f * bins).cast("int"), F.lit(bins - 1))
    dec = "decimal(28,9)"
    per = scored.select(b.alias("b"), f.alias("f"), y.alias("y")).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum(F.round(F.col("f"), 9).cast(dec)).alias("sf"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.round(F.col("f") * F.col("f"), 9).cast(dec)).alias("sff"),
        F.sum(F.round(F.col("f") * F.col("y"), 9).cast(dec)).alias("sfy"),
    )
    fbar = F.round(F.col("sf").cast("double") / F.col("nk").cast("double"), 9)
    obar_k = F.round(F.col("sy").cast("double") / F.col("nk").cast("double"), 9)
    stats = per.select(
        "nk",
        "sy",
        "sff",
        "sfy",
        "sf",
        F.round(F.col("nk") * (fbar - obar_k) * (fbar - obar_k), 9)
        .cast("decimal(38,9)")
        .alias("rel_k"),
        obar_k.alias("ok"),
    )
    tot = stats.agg(
        F.sum("nk").cast("long").alias("n"),
        F.sum(F.col("sy").cast("decimal(38,9)")).alias("sy_all"),
        F.sum("rel_k").alias("rel_num"),
        F.sum(F.col("sff").cast("decimal(38,9)")).alias("sff_all"),
        F.sum(F.col("sfy").cast("decimal(38,9)")).alias("sfy_all"),
        # Σ n_k·ō_k² as 9dp-decimal summands for RES
        F.sum(
            F.round(F.col("nk").cast("double") * F.col("ok") * F.col("ok"), 9).cast(
                "decimal(38,9)"
            )
        ).alias("sok2"),
    )
    n = F.col("n").cast("double")
    obar = F.col("sy_all").cast("double") / n
    rel = F.col("rel_num").cast("double") / n
    res = F.col("sok2").cast("double") / n - obar * obar
    unc = obar * (1.0 - obar)
    # raw Brier from exact moments: mean(f² − 2fy + y²); y² = y for 0/1
    raw = (
        F.col("sff_all").cast("double")
        - 2.0 * F.col("sfy_all").cast("double")
        + F.col("sy_all").cast("double")
    ) / n
    return tot.select(
        "n",
        F.lit(bins).alias("bins"),
        F.round(obar, round_digits).alias("base_rate"),
        F.round(rel, round_digits).alias("reliability"),
        F.round(res, round_digits).alias("resolution"),
        F.round(unc, round_digits).alias("uncertainty"),
        F.round(rel - res + unc, round_digits).alias("bs_binned"),
        F.round(raw, round_digits).alias("raw_brier"),
    )


def ucb1_allocation(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """UCB1 bandit allocation snapshot (Auer et al. 2002): per arm,
    the optimism-in-face-of-uncertainty index

        ucb = x̄_arm + √(2·ln N / n_arm)

    and a deterministic `chosen` flag on the argmax — the adaptive-
    experimentation companion to ab_sample_size: fixed-horizon tests
    size the experiment up front, a bandit reallocates as rewards
    arrive, and this emits exactly the quantity a scheduler would
    act on next. Pure two-level aggregation (per-arm exact DECIMAL
    moments + bins-row reduce); the argmax tiebreak is (rounded ucb
    DESC, arm ASC) so both engines choose identically. Returns one
    row per arm: (arm, n, mean_reward, ucb, chosen)."""
    from pyspark.sql import Window

    dec = "decimal(28,6)"
    per = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(reward_col).cast(dec)).alias("s"),
    )
    tot = per.agg(F.sum("n").cast("long").alias("n_all"))
    mean = F.round(F.col("s").cast("double") / F.col("n").cast("double"), 9)
    scored = per.join(F.broadcast(tot)).select(
        "arm",
        "n",
        mean.alias("m"),
        F.round(
            mean
            + F.sqrt(2.0 * F.log(F.col("n_all").cast("double")) / F.col("n").cast("double")),
            9,
        ).alias("u"),
    )
    w = Window.orderBy(F.col("u").desc(), F.col("arm").asc())
    return scored.select(
        "arm",
        "n",
        F.round(F.col("m"), round_digits).alias("mean_reward"),
        F.round(F.col("u"), round_digits).alias("ucb"),
        (F.row_number().over(w) == 1).alias("chosen"),
    ).orderBy("arm")


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Threshold-sweep average precision — the PR-AUC companion to
    roc_auc (which is blind to class imbalance; AP is the metric that
    moves when the positive class is rare, the usual shape of quality-
    classifier and retrieval gates):

        AP = Σ_t (R_t − R_{t−1}) · P_t

    over distinct score thresholds t descending, with P_t / R_t the
    precision / recall of "predict positive at score ≥ t". This is
    the tie-robust threshold definition (scikit-learn's
    average_precision_score): a tie block enters the sweep as ONE
    threshold, so no arbitrary within-tie order is invented — the
    roc_auc discipline.

    Scale shape: ONE score-keyed groupBy (map-side combinable) + a
    prefix-sum window over the distinct-score frame only — the corpus
    is never row-sorted. Per-threshold contributions (ratios of exact
    longs) are rounded to 9 dp before the sum so accumulation order
    cannot move the double. Returns one row (n, n_pos, ap)."""
    lab = F.col(label_col).cast("int")
    per_s = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(lab.cast("long")).alias("pos"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(Window.unboundedPreceding, 0)
    cum = per_s.withColumn("cum_pos", F.sum("pos").over(w)).withColumn(
        "cum_all", F.sum("ct").over(w)
    )
    tot = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lab.cast("long")).alias("n_pos"),
    )
    contrib = cum.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.col("pos").cast("double")
            / F.col("n_pos").cast("double")
            * (F.col("cum_pos").cast("double") / F.col("cum_all").cast("double")),
            9,
        ).cast("decimal(38,9)").alias("c"),
        "n",
        "n_pos",
    )
    return contrib.groupBy("n", "n_pos").agg(
        F.round(F.sum("c").cast("double"), round_digits).alias("ap")
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    lo: float,
    width: float,
    n_bins: int,
    round_digits: int = 6,
) -> DataFrame:
    """Isotonic calibration via pool-adjacent-violators, computed as
    the PAV minimax identity (Robertson-Wright-Dykstra 1988):

        iso(b) = max_{i≤b} min_{j≥b} weighted-avg(rate, bins i..j)

    — the monotone fit platt-free calibration pipelines apply when the
    raw per-bin positive rate is non-monotone in the score. The
    iterative pooling loop is NOT distributed-friendly; the minimax
    form is pure joins over the BIN frame, which is what makes this
    operator scale-safe: the corpus collapses to ≤``n_bins`` rows in
    ONE map-side-combinable groupBy, and the O(B³) minimax runs on
    broadcast-sized frames (B ≤ 64 enforced).

    Binning is caller-pinned (``lo``/``width``/``n_bins`` constants,
    index = clamp(floor(round((score−lo)/width, 9)))) so no data-
    dependent quantile/ntile tie convention exists to diverge
    cross-engine. Interval averages are ratios of exact integer
    (cum-label, cum-count) prefix sums, rounded to 9 dp. Returns one
    row per NON-EMPTY bin: (bin, n, rate, iso_rate) with iso_rate
    non-decreasing in bin."""
    if n_bins > 64:
        raise ValueError(f"isotonic_calibration caps n_bins at 64, got {n_bins}")
    idx = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.floor(F.round((F.col(score_col) - lo) / width, 9)).cast("long"),
        ),
    )
    lab = F.col(label_col).cast("long")
    bins = (
        df.select(idx.alias("bin"), lab.alias("y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("w"), F.sum("y").cast("long").alias("s"))
    )
    wp = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bins.withColumn("pos", F.row_number().over(Window.orderBy("bin")))
        .withColumn("cw", F.sum("w").over(wp))
        .withColumn("cs", F.sum("s").over(wp))
    )
    a = cum.select(
        F.col("pos").alias("i"),
        (F.col("cw") - F.col("w")).alias("cw0"),
        (F.col("cs") - F.col("s")).alias("cs0"),
    )
    b = cum.select(F.col("pos").alias("j"), F.col("cw").alias("cwj"), F.col("cs").alias("csj"))
    pa = (
        F.broadcast(a)
        .join(F.broadcast(b), F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            F.round(
                (F.col("csj") - F.col("cs0")).cast("double")
                / (F.col("cwj") - F.col("cw0")).cast("double"),
                9,
            ).alias("avg"),
        )
    )
    pos_frame = cum.select(F.col("pos").alias("p"))
    # step 1: m1(p, j) = max over i ≤ p of avg(i..j), for j ≥ p
    m1 = (
        F.broadcast(pa)
        .join(
            F.broadcast(pos_frame),
            (F.col("i") <= F.col("p")) & (F.col("j") >= F.col("p")),
        )
        .groupBy("p", "j")
        .agg(F.max("avg").alias("m"))
    )
    # step 2: iso(p) = min over j ≥ p of m1(p, j)
    iso = m1.groupBy("p").agg(F.min("m").alias("iso"))
    return (
        cum.join(F.broadcast(iso), cum["pos"] == iso["p"])
        .select(
            "bin",
            F.col("w").alias("n"),
            F.round(F.col("s").cast("double") / F.col("w").cast("double"), round_digits).alias(
                "rate"
            ),
            F.round(F.col("iso"), round_digits).alias("iso_rate"),
        )
        .orderBy("bin")
    )


def quantile_regression_gd(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    tau: float = 0.5,
    iterations: int = 8,
    lr: float = 1.0,
    grad_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Linear τ-quantile regression (Koenker & Bassett 1978) by
    fixed-round subgradient descent on the pinball loss — the ROBUST
    regression companion to ridge/logistic_gd: the τ=0.5 fit is
    median regression (immune to the outliers that drag least
    squares), other τ give conditional-quantile lines (p90 latency vs
    load, tail-price vs quantity).

        L_τ(r) = r·(τ − 1{r<0}),  r = y − (w0 + w1·x1 + w2·x2)
        ∂L/∂w  = −x·(τ − 1{r<0})     (subgradient; r = 0 takes the
                                      r ≥ 0 branch — documented, both
                                      engines evaluate r < 0 strictly)

    Same trajectory-pinning discipline as logistic_gd: the weight
    vector is a 1-row broadcast frame, each round is one corpus scan
    + 3-number map-side-combinable reduce with the mean gradient
    rounded to ``grad_decimals``, lineage truncated per round. Returns
    1 row: (w0, w1, w2, pinball_loss, coverage) at the final weights —
    coverage = fraction of residuals below the line, ≈ τ at the
    optimum (the property tests assert)."""
    # materialize the projected corpus ONCE: every GD round (and the
    # final scoring pass) re-reads this frame, and without the
    # checkpoint each round re-runs the upstream scan + projection
    # (guide: cache what is reused; the 3-column frame is the cheap
    # proxy, never the raw table)
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("t"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    tau = float(tau)
    for _ in range(iterations):
        r = F.col("t") - (F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2"))
        ind = (r < 0).cast("double")
        g = base.crossJoin(F.broadcast(w)).agg(
            F.round(F.avg(ind - tau), grad_decimals).alias("g0"),
            F.round(F.avg((ind - tau) * F.col("x1")), grad_decimals).alias("g1"),
            F.round(F.avg((ind - tau) * F.col("x2")), grad_decimals).alias("g2"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                (F.col("w0") - lr * F.col("g0")).alias("w0"),
                (F.col("w1") - lr * F.col("g1")).alias("w1"),
                (F.col("w2") - lr * F.col("g2")).alias("w2"),
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    r = F.col("t") - (F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2"))
    ind = (r < 0).cast("double")
    return base.crossJoin(F.broadcast(w)).agg(
        F.round(F.first("w0"), out_decimals).alias("w0"),
        F.round(F.first("w1"), out_decimals).alias("w1"),
        F.round(F.first("w2"), out_decimals).alias("w2"),
        F.round(F.avg(r * (tau - ind)), out_decimals).alias("pinball_loss"),
        F.round(F.avg(ind), out_decimals).alias("coverage"),
    )


def poisson_gd(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    iterations: int = 8,
    lr: float = 0.5,
    grad_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Log-link Poisson regression by fixed-round gradient descent —
    the COUNT-data regression (events/day, items/order) where a
    linear fit predicts negative counts and logistic predicts
    nothing: λ = exp(w·x), NLL = Σ λ − y·(w·x), gradient
    avg((λ − y)·x). Pair with stats.overdispersion_check: if the
    dispersion index ≫ 1, the rates are right but the implied
    intervals are not.

    Same trajectory-pinning discipline as logistic_gd /
    quantile_regression_gd (1-row broadcast weights, 9 dp-rounded
    mean gradient, one corpus scan per round); z clamps to ±30
    before exp so a divergent intermediate iterate cannot overflow
    (documented — the oracle clamps identically). Returns 1 row:
    (w0, w1, w2, mean_nll, pred_mean) at the final weights."""
    # materialize the projected corpus ONCE: every GD round (and the
    # final scoring pass) re-reads this frame, and without the
    # checkpoint each round re-runs the upstream scan + projection
    # (guide: cache what is reused; the 3-column frame is the cheap
    # proxy, never the raw table)
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("t"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")

    def _lam():
        z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        zc = F.least(F.greatest(z, F.lit(-30.0)), F.lit(30.0))
        return F.exp(zc), zc

    for _ in range(iterations):
        lam, _zc = _lam()
        g = base.crossJoin(F.broadcast(w)).agg(
            F.round(F.avg(lam - F.col("t")), grad_decimals).alias("g0"),
            F.round(F.avg((lam - F.col("t")) * F.col("x1")), grad_decimals).alias("g1"),
            F.round(F.avg((lam - F.col("t")) * F.col("x2")), grad_decimals).alias("g2"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                (F.col("w0") - lr * F.col("g0")).alias("w0"),
                (F.col("w1") - lr * F.col("g1")).alias("w1"),
                (F.col("w2") - lr * F.col("g2")).alias("w2"),
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    lam, zc = _lam()
    return base.crossJoin(F.broadcast(w)).agg(
        F.round(F.first("w0"), out_decimals).alias("w0"),
        F.round(F.first("w1"), out_decimals).alias("w1"),
        F.round(F.first("w2"), out_decimals).alias("w2"),
        F.round(F.avg(lam - F.col("t") * zc), out_decimals).alias("mean_nll"),
        F.round(F.avg(lam), out_decimals).alias("pred_mean"),
    )


def fairness_audit(
    df: DataFrame,
    group_col: str,
    pred_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Group-fairness audit of a binary classifier (Hardt et al. 2016
    for equalized odds; the EEOC 80 % rule for disparate impact) —
    the release gate a quality/moderation classifier needs before it
    filters a corpus that feeds everything downstream: aggregate
    accuracy hides that a model can be simultaneously accurate and
    systematically wrong about one group.

    Per group, from exact integer confusion cells: selection rate
    P(ŷ=1), TPR (equal opportunity), FPR. Each row also carries the
    cross-group summary (computed once on the k-row group frame, then
    broadcast back): demographic-parity gap = max−min selection rate,
    equalized-odds gap = max pairwise max(|ΔTPR|, |ΔFPR|), and the
    disparate-impact ratio min/max selection rate (< 0.8 fails the
    80 % rule). Rates NULL-guard empty denominators. Returns one row
    per group: (group, n, sel_rate, tpr, fpr, dp_gap, eo_gap,
    di_ratio)."""
    p = F.col(pred_col).cast("int")
    y = F.col(label_col).cast("int")
    cells = df.groupBy(F.col(group_col).cast("string").alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(p.cast("long")).alias("n_sel"),
        F.sum((p * y).cast("long")).alias("tp"),
        F.sum((p * (1 - y)).cast("long")).alias("fp"),
        F.sum(y.cast("long")).alias("n_pos"),
        F.sum((1 - y).cast("long")).alias("n_neg"),
    )
    sel = F.round(F.col("n_sel").cast("double") / F.col("n").cast("double"), 9)
    tpr = F.round(
        F.when(F.col("n_pos") > 0, F.col("tp").cast("double") / F.col("n_pos")), 9
    )
    fpr = F.round(
        F.when(F.col("n_neg") > 0, F.col("fp").cast("double") / F.col("n_neg")), 9
    )
    rates = cells.select("group", "n", sel.alias("sel"), tpr.alias("tpr"), fpr.alias("fpr"))
    summary = rates.agg(
        F.round(F.max("sel") - F.min("sel"), round_digits).alias("dp_gap"),
        F.round(
            F.greatest(
                F.max("tpr") - F.min("tpr"), F.max("fpr") - F.min("fpr")
            ),
            round_digits,
        ).alias("eo_gap"),
        F.round(
            F.when(F.max("sel") > 0, F.min("sel") / F.max("sel")), round_digits
        ).alias("di_ratio"),
    )
    return (
        rates.crossJoin(F.broadcast(summary))
        .select(
            "group",
            "n",
            F.round(F.col("sel"), round_digits).alias("sel_rate"),
            F.round(F.col("tpr"), round_digits).alias("tpr"),
            F.round(F.col("fpr"), round_digits).alias("fpr"),
            "dp_gap",
            "eo_gap",
            "di_ratio",
        )
        .orderBy("group")
    )


def bradley_terry(
    pairs: DataFrame,
    item_a: str = "a",
    item_b: str = "b",
    wins_a_col: str = "wins_a",
    n_col: str = "n",
    iterations: int = 15,
    round_digits: int = 6,
) -> DataFrame:
    """Bradley-Terry pairwise-strength model (Bradley & Terry 1952)
    fit by Zermelo's minorize-maximize fixed point — the model behind
    every pairwise-preference leaderboard (LLM arena ratings, ranked
    A/B panels): from "i beat j w times in n meetings" recover a
    strength π per item with P(i beats j) = π_i/(π_i+π_j).

        π_i ← W_i / Σ_{j≠i} n_ij/(π_i+π_j),   renormalized to Σπ = k

    Fixed ``iterations`` rounds with π rounded to 9 dp per round (the
    trajectory-pinning discipline); every W_i is an exact integer sum.
    ``pairs`` holds one row per unordered pair (a < b, wins_a of n);
    every item must record ≥ 1 win (a zero-win item drives its π to 0
    and the fixed point is degenerate — raised, not NaN'd). Scale
    shape: k items ⇒ k²-row directed frame; each round is two
    broadcast joins + one groupBy over THAT frame — corpus-scale work
    happens upstream building the win counts. Returns per item:
    (item, wins, games, pi, p_vs_avg)."""
    directed = (
        pairs.select(
            F.col(item_a).cast("string").alias("i"),
            F.col(item_b).cast("string").alias("j"),
            F.col(wins_a_col).cast("long").alias("w"),
            F.col(n_col).cast("long").alias("n"),
        )
        .unionByName(
            pairs.select(
                F.col(item_b).cast("string").alias("i"),
                F.col(item_a).cast("string").alias("j"),
                (F.col(n_col) - F.col(wins_a_col)).cast("long").alias("w"),
                F.col(n_col).cast("long").alias("n"),
            )
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    # every frame below is k- or k²-row; coalesce(1) + broadcast keep
    # the 15 rounds scheduling-bound-cheap instead of paying 32-task
    # shuffles per round (the first draft spent ~60 s here on 5 items)
    per_item = (
        directed.groupBy("i")
        .agg(
            F.sum("w").cast("long").alias("wins"),
            F.sum("n").cast("long").alias("games"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    zero = per_item.filter(F.col("wins") == 0).count()
    if zero:
        raise ValueError(f"bradley_terry: {zero} item(s) with zero wins")
    k = per_item.count()
    pi = per_item.select("i", F.lit(1.0).alias("pi")).localCheckpoint(eager=True)
    for _ in range(iterations):
        pj = pi.select(F.col("i").alias("j"), F.col("pi").alias("pi_j"))
        denom = (
            directed.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(
                        F.col("n").cast("double") / (F.col("pi") + F.col("pi_j")), 9
                    ).cast("decimal(38,9)")
                ).alias("d")
            )
        )
        raw = per_item.join(F.broadcast(denom), "i").select(
            "i",
            (F.col("wins").cast("double") / F.col("d").cast("double")).alias("praw"),
        )
        tot = raw.agg(
            F.sum(F.round(F.col("praw"), 9).cast("decimal(38,9)")).alias("t")
        )
        pi = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "i",
                F.round(
                    F.col("praw") * float(k) / F.col("t").cast("double"), 9
                ).alias("pi"),
            )
            .coalesce(1)
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    return (
        per_item.join(F.broadcast(pi), "i")
        .select(
            F.col("i").alias("item"),
            "wins",
            "games",
            F.round("pi", round_digits).alias("pi"),
            F.round(F.col("pi") / (F.col("pi") + 1.0), round_digits).alias("p_vs_avg"),
        )
        .orderBy("item")
    )


def svm_gd(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    iterations: int = 8,
    lr: float = 0.5,
    reg: float = 0.01,
    grad_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Linear SVM by full-batch subgradient descent on the L2-
    regularized hinge loss — the max-margin counterpart of
    logistic_gd (same fixed-round in-plan trajectory discipline:
    1-row weight frame broadcast per round, mean subgradient rounded
    to grad_decimals, localCheckpoint truncating lineage).

        g_w = λw − mean(y_i·x_i · 1[y_i·(w·x_i) < 1])
        (bias unregularized, the standard convention)

    `y` must be ±1. Returns 1 row: (w0, w1, w2, accuracy, hinge_loss,
    margin_violations) at the final weights."""
    # materialize the projected corpus ONCE: every GD round (and the
    # final scoring pass) re-reads this frame, and without the
    # checkpoint each round re-runs the upstream scan + projection
    # (guide: cache what is reused; the 3-column frame is the cheap
    # proxy, never the raw table)
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("t"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    for _ in range(iterations):
        m = F.col("t") * (
            F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        )
        viol = (m < 1.0).cast("double")
        g = base.crossJoin(F.broadcast(w)).agg(
            F.round(F.avg(-viol * F.col("t")), grad_decimals).alias("g0"),
            F.round(
                F.first("w1") * F.lit(float(reg))
                - F.avg(viol * F.col("t") * F.col("x1")),
                grad_decimals,
            ).alias("g1"),
            F.round(
                F.first("w2") * F.lit(float(reg))
                - F.avg(viol * F.col("t") * F.col("x2")),
                grad_decimals,
            ).alias("g2"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                F.round(F.col("w0") - lr * F.col("g0"), grad_decimals).alias("w0"),
                F.round(F.col("w1") - lr * F.col("g1"), grad_decimals).alias("w1"),
                F.round(F.col("w2") - lr * F.col("g2"), grad_decimals).alias("w2"),
            )
            # lazy (r12): materializes inside the next consumer job
            # (broadcast build / final union) instead of its own
            .localCheckpoint(eager=False)
        )
    m = F.col("t") * (
        F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
    )
    pred = F.when(
        F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2") >= 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    return base.crossJoin(F.broadcast(w)).agg(
        F.round(F.first("w0"), out_decimals).alias("w0"),
        F.round(F.first("w1"), out_decimals).alias("w1"),
        F.round(F.first("w2"), out_decimals).alias("w2"),
        F.round(F.avg((pred == F.col("t")).cast("double")), out_decimals).alias(
            "accuracy"
        ),
        F.round(
            F.avg(F.greatest(F.lit(0.0), 1.0 - m)), out_decimals
        ).alias("hinge_loss"),
        F.sum((m < 1.0).cast("long")).alias("margin_violations"),
    )


def gmm_em_1d(
    df: DataFrame,
    value_col: str,
    rounds: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Two-component 1-D Gaussian mixture by fixed-round EM
    (Dempster-Laird-Rubin 1977), entirely in-plan — the soft
    clustering member of the module's GD family (kmeans is the hard
    limit of exactly this at equal variances): the bimodality screen
    that tells a metric pipeline "this distribution is two populations
    pretending to be one" and hands it the split.

    Trajectory (the logistic_gd discipline): deterministic init (μ =
    exact p25/p75, shared σ² = sample variance, w = 0.5); each round
    is ONE corpus pass computing per-row responsibilities from the
    broadcast 1-row parameter frame — exponent arguments and
    responsibilities rounded to 9 dp so both engines feed libm
    identical doubles — followed by 6 dp-quantized weighted-moment
    sums carried as exact decimals. Parameter updates round to 9 dp,
    pinning the trajectory; components stay ordered μ1 ≤ μ2 by the
    p25/p75 init and monotone EM. Returns one row:
    (n, w1, mu1, sigma1, w2, mu2, sigma2, avg_loglik)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    # NULLs out before n: the moment sums skip them, so an unfiltered
    # count would bias every weight/variance update (histogram_2d
    # contract, shared with the stats.py moment operators).
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.round(F.col(value_col).cast("double"), 6).alias("x"))
        .localCheckpoint(eager=True)
    )
    dsum0 = "decimal(38,6)"
    init = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(x, 0.25)"), 9).alias("mu1"),
        F.round(F.expr("percentile(x, 0.75)"), 9).alias("mu2"),
        F.sum(F.col("x").cast(dsum0)).alias("sx"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dsum0)).alias("sxx"),
    ).withColumn(
        "v0",
        F.round(
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / F.col("n").cast("double")
            )
            / (F.col("n") - 1).cast("double"),
            9,
        ),
    )
    params = init.select(
        "n",
        F.lit(0.5).alias("w1"),
        "mu1",
        F.col("v0").alias("v1"),
        "mu2",
        F.col("v0").alias("v2"),
    ).localCheckpoint(eager=True)
    dsum = "decimal(38,6)"
    two_pi = 6.283185307179586
    for _ in range(rounds):
        x = F.col("x")
        e1 = F.round(-(x - F.col("mu1")) * (x - F.col("mu1")) / (2.0 * F.col("v1")), 9)
        e2 = F.round(-(x - F.col("mu2")) * (x - F.col("mu2")) / (2.0 * F.col("v2")), 9)
        a1 = F.col("w1") * F.exp(e1) / F.sqrt(two_pi * F.col("v1"))
        a2 = (1.0 - F.col("w1")) * F.exp(e2) / F.sqrt(two_pi * F.col("v2"))
        r1 = F.round(a1 / (a1 + a2), 9)
        scored = base.crossJoin(F.broadcast(params)).select(
            "n", "x", r1.alias("r1"),
            F.round(F.log(a1 + a2), 9).alias("ll"),
        )
        mom = scored.groupBy("n").agg(
            F.sum(F.round(F.col("r1"), 6).cast(dsum)).alias("s_r1"),
            F.sum(F.round(F.col("r1") * F.col("x"), 6).cast(dsum)).alias("s_r1x"),
            F.sum(
                F.round(F.col("r1") * F.col("x") * F.col("x"), 6).cast(dsum)
            ).alias("s_r1xx"),
            F.sum(F.round((1.0 - F.col("r1")) * F.col("x"), 6).cast(dsum)).alias(
                "s_r2x"
            ),
            F.sum(
                F.round((1.0 - F.col("r1")) * F.col("x") * F.col("x"), 6).cast(
                    dsum
                )
            ).alias("s_r2xx"),
            F.sum(F.col("ll").cast("decimal(28,9)")).alias("s_ll"),
        )
        n1 = F.col("s_r1").cast("double")
        n2 = F.col("n").cast("double") - n1
        mu1 = F.round(F.col("s_r1x").cast("double") / n1, 9)
        mu2 = F.round(F.col("s_r2x").cast("double") / n2, 9)
        v1 = F.round(
            F.greatest(
                F.col("s_r1xx").cast("double") / n1 - mu1 * mu1, F.lit(1e-6)
            ),
            9,
        )
        v2 = F.round(
            F.greatest(
                F.col("s_r2xx").cast("double") / n2 - mu2 * mu2, F.lit(1e-6)
            ),
            9,
        )
        params = mom.select(
            "n",
            F.round(n1 / F.col("n").cast("double"), 9).alias("w1"),
            mu1.alias("mu1"),
            v1.alias("v1"),
            mu2.alias("mu2"),
            v2.alias("v2"),
            F.round(
                F.col("s_ll").cast("double") / F.col("n").cast("double"), 9
            ).alias("avg_ll"),
        # lazy (r12): materializes inside the next consumer job
        # (broadcast build / final union) instead of its own
        ).localCheckpoint(eager=False)
    return params.select(
        "n",
        F.round(F.col("w1"), round_digits).alias("w1"),
        F.round(F.col("mu1"), round_digits).alias("mu1"),
        F.round(F.sqrt(F.col("v1")), round_digits).alias("sigma1"),
        F.round(1.0 - F.col("w1"), round_digits).alias("w2"),
        F.round(F.col("mu2"), round_digits).alias("mu2"),
        F.round(F.sqrt(F.col("v2")), round_digits).alias("sigma2"),
        F.round(F.col("avg_ll"), round_digits).alias("avg_loglik"),
    )
