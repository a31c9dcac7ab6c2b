"""Privacy audits as aggregation plans.

k-anonymity (Sweeney 2002): a release is k-anonymous when every
combination of quasi-identifier values is shared by at least k rows —
the audit a data-engineering team runs BEFORE shipping a 100 TB
extract, because re-identification risk lives in the small groups.
l-diversity (Machanavajjhala et al., ICDE 2006) extends it: a
k-anonymous group still leaks if everyone in it shares the same
sensitive value, so the audit also reports the minimum number of
DISTINCT sensitive values per group.

Both are ONE groupBy over the quasi-identifier tuple followed by a
1-row summary aggregate — map-side combinable, no joins, the cheapest
possible shape at any scale. The reference pipeline
(ref adffunction/__init__.py:57-117) ships extracts with no such
audit; this is the guardrail it was missing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    out_decimals: int = 6,
) -> DataFrame:
    """Audit a frame's re-identification risk under the given
    quasi-identifier columns. Returns ONE row:

    - n_rows, n_groups: corpus size and distinct QI combinations
    - k_min: the smallest group (the release is k_min-anonymous)
    - n_singletons: groups of size 1 (directly re-identifiable rows)
    - rows_below_k / pct_below_k: rows in groups smaller than k — the
      population that must be suppressed or generalized before release
    - min_l_diversity: the minimum count of distinct sensitive values
      across groups (1 means some group's sensitive attribute is
      fully disclosed even if k-anonymous)

    NULL quasi-identifier values form their own group (Spark and SQL
    GROUP BY both treat NULLs as equal), which is the conservative
    choice: missingness patterns are themselves identifying."""
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("g_n"),
        F.countDistinct(F.col(sensitive_col)).alias("g_l"),
    )
    return groups.agg(
        F.sum("g_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("g_n").cast("long").alias("k_min"),
        F.sum((F.col("g_n") == 1).cast("long")).cast("long").alias("n_singletons"),
        F.sum(F.when(F.col("g_n") < k, F.col("g_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
        F.round(
            F.sum(F.when(F.col("g_n") < k, F.col("g_n")).otherwise(F.lit(0)))
            / F.sum("g_n"),
            out_decimals,
        ).alias("pct_below_k"),
        F.min("g_l").cast("long").alias("min_l_diversity"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str | None = None,
    out_decimals: int = 6,
) -> DataFrame:
    """ε-differentially-private histogram release (Dwork et al., TCC
    2006): per-group counts plus Laplace(1/ε) noise — the mechanism a
    data platform applies before publishing group counts derived from
    user data. Counting queries have L1 sensitivity 1 (one user moves
    one group's count by 1), so noise scale b = 1/ε gives ε-DP.

    The noise draw is the engine's deterministic md5 unit draw
    (sampling.hash_unit) pushed through the Laplace inverse CDF
    ``-b · sign(u−½) · ln(1 − 2|u−½|)`` — a pure function of the group
    key and the caller's ``seed``. THE SEED IS THE WHOLE GUARANTEE:
    the draw is deterministic, so anyone who learns the seed can
    recompute the noise and subtract it exactly. ``seed`` is therefore
    REQUIRED (no default — a shared default would be a published
    seed), must be generated secret per release, and must never be
    stored or shipped alongside the output; publish the seed and the
    release degrades to a reproducible simulation of the mechanism
    (exactly what this repo's oracle-twinned test query does,
    deliberately). Group keys are encoded injectively — per-column
    null flag + md5, concatenated — so distinct column tuples can
    never share a noise draw (a '|' join would collide ('a|b','c')
    with ('a','b|c') and correlate their cells). |u−½| is clamped at
    ½−1e-12 so the u→0 tail cannot produce an infinite draw. Plan:
    ONE map-side-combinable groupBy, noise applied on the group frame
    (vocabulary-sized, not row-sized), no joins.

    Returns one row per group: true_n (audit column — drop it for a
    real release), noise, released (noisy count floored at 0; DP
    post-processing keeps the guarantee).
    """
    if seed is None:
        raise ValueError(
            "dp_noisy_counts requires an explicit per-release secret seed: "
            "the Laplace draw is a deterministic function of (group key, "
            "seed), so the ε-DP guarantee holds only against parties who "
            "cannot learn the seed. Generate it fresh per release and do "
            "not store or publish it with the output."
        )
    b = 1.0 / float(epsilon)
    key = F.concat(
        *[
            F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
            )
            for c in group_cols
        ]
    )
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    from .sampling import hash_unit

    t = hash_unit(key, seed) - F.lit(0.5)
    a = F.least(F.abs(t), F.lit(0.5 - 1e-12))
    noise = F.round(
        F.lit(-b) * F.signum(t) * F.log(F.lit(1.0) - F.lit(2.0) * a),
        out_decimals,
    )
    return g.select(
        *group_cols,
        "true_n",
        noise.alias("noise"),
        F.round(
            F.greatest(F.lit(0.0), F.col("true_n") + noise), out_decimals
        ).alias("released"),
    ).withColumn("epsilon", F.lit(float(epsilon)))


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
    round_digits: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) for
    an ORDERED sensitive attribute: a QI group leaks when its sensitive
    distribution sits far from the global one even if it is diverse —
    the attack k-anonymity and l-diversity both miss. Distance is the
    ordered-EMD the paper prescribes:

        EMD(P, Q) = (1/(m-1)) · Σ_i |Σ_{j<=i} (p_j - q_j)|

    over the m ordered sensitive values.

    Scale shape: one groupBy to the (QI, sensitive) histogram, one to
    the global sensitive histogram, then the group frame is completed
    to all m values per group (a groups × m expansion — audit-sized,
    not corpus-sized) and the cumulative window runs over m rows per
    group. Exactness: each p_i - q_i is a 12 dp-rounded DECIMAL before
    the prefix sum, so the EMD is summation-order-free. Returns one
    row per QI group: (quasi cols…, n, emd, t_ok)."""
    qi = [F.col(c) for c in quasi_cols]
    cell = df.groupBy(*qi, F.col(sensitive_col).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gsize = cell.groupBy(*quasi_cols).agg(F.sum("c").cast("long").alias("n"))
    glob = cell.groupBy("s").agg(F.sum("c").cast("long").alias("gc"))
    n_total = df.count()
    # complete each group's histogram over the full ordered value set
    completed = (
        gsize.crossJoin(F.broadcast(glob))
        .join(cell, [*quasi_cols, "s"], "left")
        .select(
            *quasi_cols,
            "n",
            "s",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "gc",
        )
    )
    diff = F.round(
        F.col("c").cast("double") / F.col("n").cast("double")
        - F.col("gc").cast("double") / F.lit(float(n_total)),
        12,
    ).cast("decimal(20,12)")
    w = Window.partitionBy(*quasi_cols).orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    m = glob.count()
    cum = completed.withColumn("r", F.sum(diff).over(w))
    emd = (
        cum.groupBy(*quasi_cols, "n")
        .agg(
            (F.sum(F.abs(F.col("r"))).cast("double") / F.lit(float(m - 1))).alias(
                "emd_raw"
            )
        )
        .select(
            *quasi_cols,
            "n",
            F.round("emd_raw", round_digits).alias("emd"),
        )
    )
    return emd.withColumn("t_ok", (F.col("emd") <= F.lit(t)).cast("int"))


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
    out_decimals: int = 6,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    disclosure check k_anonymity_audit only summarizes: a class can be
    k-anonymous yet reveal everyone's sensitive value when all k rows
    share it (the homogeneity attack). Per quasi-identifier class this
    computes BOTH diversity notions and reduces to one release-gate
    row:

    - distinct l:  count of distinct sensitive values in the class
    - entropy l:   exp(−Σ_j p_j ln p_j) over the class's sensitive
      distribution — the effective number of values an adversary must
      still distinguish (entropy-l ≤ distinct-l, with equality only
      at the uniform distribution; the stricter, skew-aware notion)

    Returns one row: n_rows, n_classes, min_distinct_l,
    classes_below_l / rows_below_l / pct_below_l (distinct-l < ``l``
    — the population needing suppression or generalization), and
    min_entropy_l.

    Scale shape: ONE (QI…, sensitive) groupBy → ONE QI-class groupBy
    → one reduce; each −p·ln p summand is a ratio of exact longs
    rounded to 9 dp before the class sum, so the entropy double is
    accumulation-order-independent. NULL QI values form their own
    class (conservative, as in k_anonymity_audit); NULL sensitive
    values count as one distinguishable value."""
    qi = [F.col(c) for c in quasi_cols]
    cells = df.groupBy(*qi, F.col(sensitive_col).alias("sv")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcls = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    cells = cells.withColumn("g_n", F.sum("c").over(wcls))
    p = F.col("c").cast("double") / F.col("g_n").cast("double")
    classes = cells.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.first("g_n").alias("g_n"),
        F.count(F.lit(1)).cast("long").alias("g_l"),
        F.sum(F.round(-p * F.log(p), 9).cast("decimal(38,9)")).alias("h"),
    )
    ent_l = F.round(F.exp(F.col("h").cast("double")), 9)
    return classes.agg(
        F.sum("g_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("g_l").cast("long").alias("min_distinct_l"),
        F.sum((F.col("g_l") < l).cast("long")).cast("long").alias("classes_below_l"),
        F.sum(F.when(F.col("g_l") < l, F.col("g_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_l"),
        F.round(
            F.sum(F.when(F.col("g_l") < l, F.col("g_n")).otherwise(F.lit(0)))
            / F.sum("g_n"),
            out_decimals,
        ).alias("pct_below_l"),
        F.round(F.min(ent_l), out_decimals).alias("min_entropy_l"),
    )


def randomized_response_estimate(
    df: DataFrame,
    id_col: str,
    flag_col: str,
    q: float = 0.75,
    salt: str = "rr",
    out_decimals: int = 6,
) -> DataFrame:
    """Warner's randomized response (1965) — LOCAL differential
    privacy's original mechanism, still the design behind RAPPOR-style
    telemetry: each unit answers truthfully with probability ``q``,
    otherwise flips a fair coin, so no individual report reveals the
    sensitive bit, yet the population rate deconvolves exactly:

        E[obs] = q·p + (1−q)/2   ⇒   p̂ = (obs − (1−q)/2) / q
        SE(p̂)  = √(obs(1−obs)/n) / q
        ε      = ln( (q + (1−q)/2) / ((1−q)/2) )     (per-report LDP)

    Both coins are the engine's deterministic md5 unit draws keyed by
    (id, salt) — REPRODUCIBLE SIMULATION semantics, exactly like
    dp_noisy_counts: publish the salt and the mechanism degrades to a
    replay, which is precisely what lets the oracle gate it. The TRUE
    rate rides along as the self-audit. ONE corpus aggregate. Returns
    one row: (n, epsilon, obs_rate, estimated_p, true_p, se)."""
    from .sampling import hash_unit

    honest = hash_unit(F.col(id_col), salt + "1") < q
    coin = hash_unit(F.col(id_col), salt + "2") < 0.5
    truth = F.col(flag_col).cast("boolean")
    report = F.when(honest, truth).otherwise(coin).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(report).cast("long").alias("yes"),
        F.sum(truth.cast("long")).cast("long").alias("true_yes"),
    )
    obs = F.col("yes").cast("double") / F.col("n").cast("double")
    import math as _math

    eps = _math.log((q + (1.0 - q) / 2.0) / ((1.0 - q) / 2.0))
    return agg.select(
        "n",
        F.lit(round(eps, out_decimals)).alias("epsilon"),
        F.round(obs, out_decimals).alias("obs_rate"),
        F.round((obs - (1.0 - q) / 2.0) / q, out_decimals).alias("estimated_p"),
        F.round(
            F.col("true_yes").cast("double") / F.col("n").cast("double"), out_decimals
        ).alias("true_p"),
        F.round(
            F.sqrt(obs * (1.0 - obs) / F.col("n").cast("double")) / q, out_decimals
        ).alias("se"),
    )
