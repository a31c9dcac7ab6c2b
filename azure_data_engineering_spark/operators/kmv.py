"""KMV (k-minimum-values) distinct sketches with SET-OPERATION
estimates — the capability the built-in HLL sketch cannot provide.

`hll_sketch_agg` (SURVEY §2B row 64) answers per-group distinct counts
and UNIONS, but HLL cannot estimate an INTERSECTION (the
inclusion-exclusion workaround explodes error when the overlap is
small). The KMV/theta sketch (Beyer et al. SIGMOD 2007; the
Apache DataSketches theta family) keeps the k smallest hash values of
the distinct set: the k-th smallest normalized hash θ estimates
distinct count as (k−1)/θ, two sketches combine by keeping the k
smallest of their union, and the fraction of the combined k that
appears in BOTH input sketches is an unbiased Jaccard estimate —
giving union, intersection, and Jaccard in one pass each.

Scale shape: per group, ONE distinct-projection shuffle, then a
per-group top-k window over hash order (bounded k rows survive per
group — the sketch frame is KB-sized regardless of corpus size) —
mergeable by construction, exactly how a 1000-executor rollup would
maintain per-partition sketches. Determinism: the hash is the repo's
standing md5 draw (first 12 hex chars → 48-bit integer), so Spark and
any engine with md5 reproduce the identical sketch, estimates and
all — the DuckDB oracle replays it bit-for-bit (no seeded-RNG
recall gate needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 48
HASH_SPACE = float(2**HASH_BITS)  # 12 hex chars of md5


def _h48(col) -> "F.Column":
    """Deterministic 48-bit hash of a value: first 12 hex chars of
    md5 — exact in a long and in a double (< 2^53), portable to any
    engine with md5 (sampling.py's unit-draw convention, widened from
    8 to 12 hex so multi-million-distinct sketches don't collide)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Build the per-group KMV sketch: the k smallest distinct 48-bit
    hashes of `value_col` within each group, plus the group's exact
    sketch-input cardinality cap marker. Returns one row per retained
    hash: (g, h, rk) with rk the 1-based rank — the mergeable sketch
    frame downstream estimators consume (bounded at k rows/group)."""
    hashed = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .distinct()
        .select("g", _h48(F.col("v")).alias("h"))
        # md5 collisions across distinct values are shared by both
        # engines (same hash function) — dedup them so ranks are stable
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    return hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a kmv_sketch frame:
    (k−1)/θ with θ the k-th smallest normalized hash — or the EXACT
    retained count when the group never filled its sketch (fewer than
    k distinct values: the sketch IS the distinct set). Returns
    (g, n_retained, theta, distinct_est)."""
    per = sketch.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.max("h").cast("long").alias("h_k"),
    )
    theta = F.col("h_k").cast("double") / F.lit(HASH_SPACE)
    est = F.when(
        F.col("n_retained") < k, F.col("n_retained").cast("double")
    ).otherwise((k - 1) / theta)
    return per.select(
        "g",
        "n_retained",
        F.round(theta, 12).alias("theta"),
        F.round(est, 6).alias("distinct_est"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-operation estimates between every pair of groups
    from their KMV sketches: for groups (a, b), combine the two
    sketches, keep the k smallest hashes of the union, and estimate

        union_est     = (k−1)/θ_k(combined)   (exact if under-filled)
        jaccard_est   = |{h in combined top-k present in BOTH}| / k'
        intersect_est = jaccard_est × union_est

    (k' = retained combined size). One sketch per group is built once;
    the pair enumeration runs over the KB-sized sketch frame, never
    corpus rows. Returns one row per unordered group pair (g_a < g_b):
    (g_a, g_b, est_a, est_b, union_est, jaccard_est, intersect_est)."""
    sk = kmv_sketch(df, group_col, value_col, k).cache()
    est = kmv_estimate(sk, k)
    # combined sketch per unordered pair: union the two hash sets,
    # rank, keep k smallest; membership flags ride along
    pairs = (
        sk.select(F.col("g").alias("g_a"))
        .distinct()
        .join(sk.select(F.col("g").alias("g_b")).distinct())
        .filter(F.col("g_a") < F.col("g_b"))
    )
    ha = sk.select(F.col("g").alias("g_a"), F.col("h").alias("h"))
    hb = sk.select(F.col("g").alias("g_b"), F.col("h").alias("h"))
    u = (
        pairs.join(ha, "g_a")
        .select("g_a", "g_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(hb, "g_b").select(
                "g_a", "g_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("g_a", "g_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("h")
    topk = u.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    per = topk.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).cast("long").alias("kc"),
        F.max("h").cast("long").alias("h_k"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_both"),
    )
    theta = F.col("h_k").cast("double") / F.lit(HASH_SPACE)
    union_est = F.when(F.col("kc") < k, F.col("kc").cast("double")).otherwise(
        (k - 1) / theta
    )
    jac = F.col("n_both").cast("double") / F.col("kc").cast("double")
    ea = est.select(F.col("g").alias("g_a"), F.col("distinct_est").alias("est_a"))
    eb = est.select(F.col("g").alias("g_b"), F.col("distinct_est").alias("est_b"))
    return (
        per.join(F.broadcast(ea), "g_a")
        .join(F.broadcast(eb), "g_b")
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            F.round(union_est, 6).alias("union_est"),
            F.round(jac, 6).alias("jaccard_est"),
            F.round(jac * union_est, 6).alias("intersect_est"),
        )
    )
