"""Statistical screens over numeric / categorical columns.

Robust outlier flagging and categorical-association scoring — the two
workhorses of automated data-quality monitoring (anomalous metric
values; drifted / entangled categorical fields) and of feature triage
in curation pipelines.

Both operators are pure aggregation pipelines: a grouped
percentile/count pass, a broadcast join of the (tiny) per-group
statistics back onto the rows, and codegen arithmetic — no Python,
no window over the fat table, one shuffle per aggregation. At 100 TB
the per-group stat frames are KB-sized regardless of row count, so
the join back is always a broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Flag rows whose value is a robust outlier within its group,
    by modified z-score (Iglewicz & Hoaglin 1993):

        M_i = 0.6745 * (x_i - median) / MAD,  outlier iff |M_i| > 3.5

    where MAD = median(|x - median|). Median/MAD resist the very
    outliers being hunted (mean/stddev get dragged by them — a single
    10^9 spike inflates sigma until nothing else looks anomalous).

    Two exact-percentile aggregations per group (Spark computes exact
    median via a single-pass sort-based percentile within each hash
    aggregate), then a broadcast join of the per-group (median, mad)
    frame. A zero MAD (>=50% of the group identical) yields NULL
    scores and FALSE flags rather than dividing by zero.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("grp_median")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("grp_median"))
    )
    mad = dev.groupBy(group_col, "grp_median").agg(
        F.expr("percentile(_absdev, 0.5)").alias("grp_mad")
    )
    scored = df.join(F.broadcast(mad), group_col).withColumn(
        "mod_z",
        F.when(
            F.col("grp_mad") > 0,
            0.6745 * (F.col(value_col) - F.col("grp_median")) / F.col("grp_mad"),
        ),
    )
    return scored.withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("mod_z")) > threshold, F.lit(False))
    )


def chi_squared(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns, plus Cramer's V effect size.

    Returns a 1-row frame (chi2, dof, cramers_v, n). The contingency
    table is one groupBy over (a, b); marginals are re-aggregated from
    it (never from the raw rows), so the full pass over the data
    happens exactly once and everything downstream operates on
    |domain_a| x |domain_b| rows — broadcast-sized for any sane
    categorical pair.
    """
    cont = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    row_m = cont.groupBy("a").agg(F.sum("obs").alias("row_n"))
    col_m = cont.groupBy("b").agg(F.sum("obs").alias("col_n"))
    tot = cont.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("a").cast("double").alias("ka"),
        F.countDistinct("b").cast("double").alias("kb"),
    )
    # expected counts from marginals; cells absent from the observed
    # table contribute E (since (O-E)^2/E = E when O=0) — realized by
    # the full marginal cross of present categories
    cells = (
        row_m.crossJoin(col_m)
        .join(cont, ["a", "b"], "left")
        .join(F.broadcast(tot))
        .withColumn("exp", F.col("row_n") * F.col("col_n") / F.col("n"))
        .withColumn(
            "cell",
            F.pow(F.coalesce(F.col("obs"), F.lit(0.0)) - F.col("exp"), 2)
            / F.col("exp"),
        )
    )
    return cells.groupBy("n", "ka", "kb").agg(F.sum("cell").alias("chi2")).select(
        F.col("chi2"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        F.sqrt(
            F.col("chi2") / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1))
        ).alias("cramers_v"),
        F.col("n").cast("long").alias("n"),
    )


def token_distribution_drift(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group token-distribution drift against the whole corpus:
    KL(P_group || P_corpus) and Jensen-Shannon divergence — the
    standard monitors for 'did this source/shard/day drift from the
    mix' in corpus curation (JS is symmetric, bounded by ln 2, and
    finite even for disjoint vocabularies).

    Scale shape: ONE tokenize+count pass to (group, term) counts;
    every marginal (per-group totals, global term counts, corpus
    total) re-aggregates from that pair table, so the raw text is
    read exactly once. Per-group work is |terms present in the
    group|: the JS contribution of corpus terms ABSENT from the group
    folds into the closed form 0.5*ln(2)*(1 - sum_present q) — no
    group x vocabulary cross join anywhere.

    KL(group||corpus) is always finite because the corpus
    distribution dominates every group (q > 0 wherever p > 0).
    """
    from ..functions.text import normalize_text

    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
    pairs = (
        df.select(F.col(group_col).alias("grp"), toks)
        .filter(F.col("term") != "")
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("c_gt"))
    )
    grp_tot = pairs.groupBy("grp").agg(F.sum("c_gt").alias("c_g"))
    term_tot = pairs.groupBy("term").agg(F.sum("c_gt").alias("c_t"))
    corpus_tot = grp_tot.agg(F.sum("c_g").alias("c_all"))
    p = F.col("c_gt") / F.col("c_g")
    q = F.col("c_t") / F.col("c_all")
    per_term = (
        pairs.join(F.broadcast(grp_tot), "grp")
        .join(term_tot, "term")
        .join(F.broadcast(corpus_tot))
        .select(
            "grp",
            F.col("c_g"),
            (p * F.log(p / q)).alias("kl_term"),
            (
                p * F.log((2.0 * p) / (p + q)) + q * F.log((2.0 * q) / (p + q))
            ).alias("js_present"),
            q.alias("q_term"),
        )
    )
    ln2 = 0.6931471805599453
    return per_term.groupBy("grp").agg(
        F.max("c_g").cast("long").alias("n_tokens"),
        F.sum("kl_term").alias("kl"),
        (
            0.5 * F.sum("js_present")
            + 0.5 * ln2 * (1.0 - F.sum("q_term"))
        ).alias("js"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier,
    JASA 1958) over right-censored durations: at each distinct event
    time t_i with d_i events out of n_i subjects still at risk,

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    Censored subjects (event=0) leave the risk set at their duration
    without contributing an event — the estimator the churn/retention
    and reliability dashboards of a 100 TB event store need, because
    most subjects are still alive (censored) at observation time and
    naive "fraction churned by day t" is biased by them.

    Scale shape: ONE aggregation collapses the subject table to its
    distinct-duration histogram (d_i = events, c_i = departures of
    any kind per duration); every downstream step — the at-risk
    prefix sum n_i = N - cum(c) + c_i and the cumulative log-product
    — is a window over that histogram, whose cardinality is the
    number of DISTINCT durations (days/weeks), not subjects. The
    single-partition window is deliberate and safe: it runs over a
    KB-sized frame regardless of corpus size. The product is computed
    as exp(sum ln(1 - d/n)) with an exact-zero guard (d_i = n_i
    drives survival to 0; ln would NULL out) so the result is a pure
    algebraic function the oracle replays with the same windows.

    Returns one row per distinct duration with an event or departure:
    (duration, n_risk, n_events, n_censored, survival)."""
    from pyspark.sql import Window

    per_t = df.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.count(F.lit(1)).alias("n_leaving"),
    )
    n_total = df.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    km = (
        per_t.join(F.broadcast(n_total))
        .withColumn(
            "n_risk", F.col("__n") - F.sum("n_leaving").over(w) + F.col("n_leaving")
        )
        .withColumn(
            "__ln_factor",
            F.when(
                F.col("n_events") < F.col("n_risk"),
                F.log(1.0 - F.col("n_events") / F.col("n_risk")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("__dead", F.max((F.col("n_events") == F.col("n_risk")).cast("int")).over(w))
        .withColumn(
            "survival",
            F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("__ln_factor").over(w)), round_digits)
            ),
        )
    )
    return km.select(
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("n_leaving") - F.col("n_events")).cast("long").alias("n_censored"),
        "survival",
    )


def benford_digit_test(
    df: DataFrame,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law
    (Benford 1938; Nigrini's fraud-screening usage): P(d) =
    log10(1 + 1/d). The classic cheap screen for fabricated or
    truncated numeric columns in ingested financial/metric data —
    natural multi-magnitude data follows it, hand-entered or
    clipped data does not.

    The first significant digit is extracted lexically (first char in
    [1-9] of the decimal string) rather than via log10/pow, which at
    double precision misassigns exact powers of ten (log10(1000) can
    evaluate just below 3). One aggregation to 9 rows; chi-squared
    cell terms computed on the 9-row frame. Non-positive and NULL
    values are excluded (Benford applies to positive magnitudes).

    Returns 9 rows: (digit, n_obs, obs_p, exp_p, chi_cell)."""
    digit = F.substring(
        F.regexp_replace(F.abs(F.col(value_col)).cast("string"), "[^1-9]", ""), 1, 1
    ).cast("int")
    obs = (
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("__n"))
    digits = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_p = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        digits.join(obs, "digit", "left")
        .join(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            F.round(F.coalesce(F.col("n_obs"), F.lit(0)) / F.col("__n"), round_digits).alias("obs_p"),
            F.round(exp_p, round_digits).alias("exp_p"),
            F.round(
                F.pow(F.coalesce(F.col("n_obs"), F.lit(0)) - exp_p * F.col("__n"), 2)
                / (exp_p * F.col("__n")),
                round_digits,
            ).alias("chi_cell"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Single change-point detection on an ordered metric series via
    the cumulative-sum statistic (Page, Biometrika 1954; Taylor's
    change-point analysis formulation): C_t = sum_{i<=t} (x_i - mean),
    and the estimated change point is the argmax of |C_t| — where the
    series' level shifts, the centered prefix sum peaks.

    Intended use at 100 TB: the input is an already-aggregated series
    (e.g. a metric per day/hour from one groupBy over the raw events),
    so the window here runs over hundreds-to-thousands of rows — the
    single-partition global-order window is over the SERIES, never the
    raw table. The argmax is a deterministic TakeOrdered(1) with
    |C_t| pre-rounded before comparison so float ties resolve the
    same way in every engine, breaking ties on the earliest point.

    Returns one row: (cp_key, max_abs_cusum, n_points, z_stat) where
    z_stat = max|C| / (stddev_pop * sqrt(n)) — a scale-free strength
    score (> ~1.36 is the 95% Kolmogorov-style threshold)."""
    from pyspark.sql import Window

    stats = df.agg(
        F.avg(F.col(value_col).cast("double")).alias("__mean"),
        F.stddev_pop(F.col(value_col).cast("double")).alias("__sd"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    cus = (
        df.join(F.broadcast(stats))
        .withColumn(
            "__c", F.sum(F.col(value_col).cast("double") - F.col("__mean")).over(w)
        )
        .withColumn("__abs_c", F.round(F.abs("__c"), round_digits))
    )
    return (
        cus.orderBy(F.col("__abs_c").desc(), F.col(order_col).asc())
        .limit(1)
        .select(
            F.col(order_col).alias("cp_key"),
            F.col("__abs_c").alias("max_abs_cusum"),
            F.col("__n").cast("long").alias("n_points"),
            F.round(F.col("__abs_c") / (F.col("__sd") * F.sqrt("__n")), round_digits).alias(
                "z_stat"
            ),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Exact ROC AUC of a numeric score against a binary label via
    the Mann-Whitney rank-sum identity (AUC = U / (n_pos * n_neg),
    Hanley & McNeil 1982), with midranks for tied scores — the
    evaluation primitive for quality-classifier / reranker triage
    over a full corpus, where sklearn-on-the-driver cannot run.

    Scale shape: ONE aggregation collapses the corpus to its distinct
    score histogram (count + positives per score); midranks are a
    prefix sum over that histogram, so the global-order window runs
    over |distinct scores| rows, not corpus rows. When scores are
    near-unique reals, pass a quantized score column (e.g.
    round(score, 3)) — the estimator degrades gracefully to binned
    AUC, which is what every large-scale eval does anyway.

    Returns one row: (n_pos, n_neg, auc)."""
    from pyspark.sql import Window

    hist = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("double").alias("__c"),
        F.sum(F.col(label_col).cast("double")).alias("__p"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = hist.withColumn(
        "__midrank", F.sum("__c").over(w) - F.col("__c") + (F.col("__c") + 1.0) / 2.0
    )
    return ranked.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).cast("long").alias("n_neg"),
        F.round(
            (F.sum(F.col("__p") * F.col("__midrank")) - F.sum("__p") * (F.sum("__p") + 1.0) / 2.0)
            / (F.sum("__p") * (F.sum("__c") - F.sum("__p"))),
            round_digits,
        ).alias("auc"),
    )


# Cumulative Poisson(1) probabilities P(X <= k) for k = 0..7: a row's
# bootstrap weight in resample b is the count of thresholds at or
# below its deterministic md5 unit draw (inverse-CDF lookup, capped
# at 8 — P(X > 8) < 1.2e-6, negligible against B*n draws).
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_resamples: int = 64,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    salt: str = "boot",
    round_digits: int = 4,
) -> DataFrame:
    """Bootstrap confidence interval for the mean of `value_col`, via
    the POISSON bootstrap (Chamandy, Muralidharan, Najmi & Naidu,
    "Estimating Uncertainty for Massive Data Streams", Google TR 2012;
    also Kleiner et al.'s scalable-bootstrap line of work): classical
    resampling draws n rows WITH replacement per replicate — impossible
    to coordinate across a 100 TB table — but each row's multiplicity
    in a replicate is asymptotically independent Poisson(1), so every
    row can draw its own weight locally. One map-side pass computes all
    B replicates (explode over the replicate index), one aggregation
    reduces to B weighted means, and the percentile CI is an agg over
    B rows. No global resample, no second scan, no driver state.

    Weights come from an inverse-CDF lookup on the engine's portable
    md5 unit draw (same primitive as sampling.hash_unit), so replicas
    are deterministic across runs, partitionings, AND engines — the
    oracle replays them exactly. Returns one row:
    (n_resamples, point_mean, ci_lo, ci_hi)."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f"|{salt}|"),
                        F.col("__b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = None
    for c in _POISSON1_CDF:
        term = (u >= F.lit(c)).cast("int")
        w = term if w is None else (w + term)
    reps = (
        df.select(
            F.col(id_col),
            F.col(value_col).cast("double").alias("__x"),
            F.explode(F.sequence(F.lit(0), F.lit(int(n_resamples) - 1))).alias(
                "__b"
            ),
        )
        .withColumn("__w", w)
        .groupBy("__b")
        .agg(
            F.round(
                F.sum(F.col("__w") * F.col("__x")) / F.sum("__w"), round_digits
            ).alias("__mean_b")
        )
    )
    point = df.agg(
        F.round(F.avg(F.col(value_col).cast("double")), round_digits).alias(
            "point_mean"
        )
    )
    ci = reps.agg(
        F.count(F.lit(1)).alias("n_resamples"),
        F.round(F.expr(f"percentile(__mean_b, {lo_q})"), round_digits).alias(
            "ci_lo"
        ),
        F.round(F.expr(f"percentile(__mean_b, {hi_q})"), round_digits).alias(
            "ci_hi"
        ),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_resamples", "point_mean", "ci_lo", "ci_hi"
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorization: clip values to their group's [lo, hi] exact
    percentiles — the standard heavy-tail taming before means/
    regressions (a trimmed-mean relative that keeps row count).

    One exact-percentile aggregation per group (single pass, same
    machinery as mad_outliers) broadcast back onto the rows; the clip
    itself is codegen `least(greatest(...))`. Adds columns p_lo,
    p_hi, <value>_wins, is_clipped without dropping any row, so the
    operator composes into feature pipelines. At 100 TB the per-group
    percentile frame is KB-sized and the join back is always a
    broadcast."""
    pct = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("p_hi"),
    )
    v = F.col(value_col)
    return (
        df.join(F.broadcast(pct), group_col)
        .withColumn(f"{value_col}_wins", F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")))
        .withColumn("is_clipped", (v < F.col("p_lo")) | (v > F.col("p_hi")))
    )


def population_stability_index(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    bin_width: float,
    n_bins: int,
    out_decimals: int = 9,
) -> DataFrame:
    """Population Stability Index (the credit-scorecard drift metric;
    Siddiqi 2006): PSI = sum_i (p_i - q_i) * ln(p_i / q_i) over fixed-
    width value bins, between a baseline and a current window.
    PSI < 0.1 reads "stable", 0.1-0.25 "investigate", > 0.25 "shifted"
    — the monitoring gate run per-shard/per-day beside the KL/JS
    token drift (token_distribution_drift) for numeric score columns.

    Bins are FIXED (floor(value / bin_width), clamped on BOTH ends to
    [0, n_bins-1] — without the lower clamp, negative values would
    fall out of the bin join and silently vanish from the counts AND
    the totals, skewing PSI with no error), so
    the two sides aggregate independently — one groupBy each, then a
    tiny n_bins-row join; nothing is corpus-proportional. Counts get
    +1 Laplace smoothing so empty bins stay finite AND the statistic
    remains a pure function of exact integers — both engines feed ln
    identical rationals. Returns ONE row: (n_baseline, n_current,
    psi, n_shifted_bins) where n_shifted_bins counts bins
    contributing more than 0.01 each."""
    def binned(df: DataFrame, name: str) -> DataFrame:
        b = F.greatest(
            F.lit(0),
            F.least(
                F.floor(F.col(value_col) / bin_width).cast("int"),
                F.lit(n_bins - 1),
            ),
        )
        return df.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias(name))

    spark = baseline.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(binned(baseline, "c_base"), "bin", "left")
        .join(binned(current, "c_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("c_base"), F.lit(0)).alias("c_base"),
            F.coalesce(F.col("c_cur"), F.lit(0)).alias("c_cur"),
        )
    )
    tot = joined.agg(
        F.sum("c_base").alias("n_base"), F.sum("c_cur").alias("n_cur")
    )
    t = joined.crossJoin(F.broadcast(tot))
    p = (F.col("c_base") + 1).cast("double") / (F.col("n_base") + n_bins)
    q = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + n_bins)
    term = (p - q) * F.log(p / q)
    return t.agg(
        F.first("n_base").cast("long").alias("n_baseline"),
        F.first("n_cur").cast("long").alias("n_current"),
        F.round(F.sum(term), out_decimals).alias("psi"),
        F.sum((F.round(term, out_decimals) > 0.01).cast("long"))
        .cast("long")
        .alias("n_shifted_bins"),
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    value_decimals: int = 2,
    out_decimals: int = 9,
    alpha_c: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: D = max over v of
    |ECDF_a(v) - ECDF_b(v)|, with the alpha=0.05 rejection bound
    c * sqrt((n_a + n_b) / (n_a * n_b)) (c = 1.358). The
    distribution-equality test run before pooling two corpora or
    trusting a holdout split.

    Scale shape: values round to value_decimals, so the ECDF window
    runs over the DISTINCT value grid — bounded by the value range x
    precision (the decision_stump histogram collapse), never by row
    count; cumulative counts are exact integers, so D is an exact
    rational identical in any engine. Returns ONE row: (n_a, n_b,
    d_stat, d_crit, reject_95)."""
    from pyspark.sql import Window

    av = a.select(F.round(F.col(value_col), value_decimals).alias("v"))
    bv = b.select(F.round(F.col(value_col), value_decimals).alias("v"))
    ca = av.groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
    cb = bv.groupBy("v").agg(F.count(F.lit(1)).alias("cb"))
    grid = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        F.sum("ca").over(win).alias("cum_a"),
        F.sum("cb").over(win).alias("cum_b"),
    )
    tot = grid.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    d = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("cum_a").cast("double") / F.col("n_a")
                - F.col("cum_b").cast("double") / F.col("n_b")
            ).alias("diff"),
            "n_a",
            "n_b",
        )
    )
    crit = F.lit(alpha_c) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double") / (F.col("n_a") * F.col("n_b"))
    )
    return d.groupBy("n_a", "n_b").agg(
        F.round(F.max("diff"), out_decimals).alias("d_stat")
    ).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "d_stat",
        F.round(crit, out_decimals).alias("d_crit"),
        (F.col("d_stat") > F.round(crit, out_decimals)).alias("reject_95"),
    )


def hbos_scores(
    df: DataFrame,
    id_col: str,
    feature_cols: Sequence[str],
    n_bins: int = 10,
    top_n: int = 20,
    out_decimals: int = 6,
) -> DataFrame:
    """HBOS — Histogram-Based Outlier Score (Goldstein & Dengel 2012):
    per feature, an equal-width histogram over [min, max]; a row's
    score is Σ_features -ln(bin_density), so rows in thin bins across
    many features rank highest. The standard cheap unsupervised
    anomaly screen when an isolation forest is overkill.

    Plan: one min/max agg (1-row broadcast), one stack-explode to
    (id, feature, bin), one (feature, bin) histogram agg joined back
    BROADCAST (histogram is features×bins rows), one per-id sum, then
    TakeOrdered(top_n) on the ROUNDED score with the id tiebreak.
    Densities are exact integer ratios, so -ln sees identical
    rationals on every engine. Returns (id, score) for the top_n most
    anomalous rows.

    NULL policy (explicit): rows with a NULL in ANY feature are
    EXCLUDED before binning. Without this, NULL flows through floor()
    as NULL and least/greatest skip NULLs, silently clamping the row
    to the top bin — scoring a missing value as if it were extreme."""
    df = df.filter(
        F.lit(True)
        if not feature_cols
        else reduce(
            lambda a, b: a & b, [F.col(c).isNotNull() for c in feature_cols]
        )
    )
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in feature_cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in feature_cols],
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    wide = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).crossJoin(F.broadcast(ranges))
    def bin_expr(c: str):
        # degenerate (constant) features collapse to bin 0
        width = (F.col(f"mx_{c}") - F.col(f"mn_{c}")) / n_bins
        raw = F.when(width == 0, F.lit(0)).otherwise(
            F.floor((F.col(c) - F.col(f"mn_{c}")) / width)
        )
        return F.greatest(
            F.lit(0), F.least(raw.cast("int"), F.lit(n_bins - 1))
        )
    melted = wide.select(
        "id",
        "n_rows",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in feature_cols]),
                F.array(*[bin_expr(c) for c in feature_cols]),
            )
        ).alias("feature", "bin"),
    )
    hist = melted.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # The histogram is features×bins rows — KB-sized at any scale — so
    # instead of broadcast-JOINING it back onto the melted corpus
    # (which shuffles a |features|·n-row frame through the per-id agg),
    # precompute each (feature, bin)'s FINAL 9 dp term on the tiny
    # hist frame and look it up per corpus ROW in codegen: no explode
    # on the scoring path, no join, and — the measured hot spot — no
    # per-row ln/round/decimal allocation (1.8M of each at sf0.1;
    # rowscore pass 3.6 s with per-row decimals vs <1 s with longs).
    # Terms are carried as UNSCALED 1e-9 longs: the per-row sum is
    # exact integer addition, so per-row partials + the per-id sum
    # equal the old flat decimal per-id sum term-for-term, and
    # long_sum/1e9 in double is the same correctly-rounded value as
    # decimal(sum).cast(double) (sums stay far below 2^53).
    n_terms = hist.crossJoin(F.broadcast(ranges.select("n_rows"))).select(
        "feature",
        "bin",
        (
            F.round(-F.log(F.col("cnt") / F.col("n_rows")), 9).cast(
                "decimal(20,9)"
            )
            * 1_000_000_000
        )
        .cast("long")
        .alias("term"),
    )
    per_feature = n_terms.groupBy("feature").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bin"), F.col("term")))
        ).alias("m")
    )
    hrow = per_feature.agg(
        *[
            F.first(
                F.when(F.col("feature") == c, F.col("m")), ignorenulls=True
            ).alias(f"__m_{i}")
            for i, c in enumerate(feature_cols)
        ]
    )
    # every probed (feature, bin) exists by construction (the
    # histogram was built from the same bin_expr over the same rows),
    # so element_at never returns NULL here
    row_scores = wide.crossJoin(F.broadcast(hrow)).select(
        "id",
        reduce(
            lambda a, b: a + b,
            [
                F.element_at(F.col(f"__m_{i}"), bin_expr(c))
                for i, c in enumerate(feature_cols)
            ],
        ).alias("row_score"),
    )
    scored = row_scores.groupBy("id").agg(
        F.round(
            F.sum("row_score").cast("double") / 1_000_000_000.0, out_decimals
        ).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(top_n)


def eb_shrunk_rates(
    df: DataFrame,
    group_col: str,
    success_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Empirical-Bayes beta-binomial rate shrinkage (Robbins 1956;
    the "sort by shrunken rating" estimator): per-group success rates
    are shrunk toward the pooled mean with strength fitted from the
    BETWEEN-group rate spread by method of moments —

        K = m(1-m)/v - 1   (clamped at 0; v from the observed rates)
        shrunk = (x + m·K) / (n + K)

    so small-sample groups pull hard toward m and large samples keep
    their own rate. The guardrail every CTR / defect-rate leaderboard
    needs before ranking groups with 3 trials against groups with
    30 000.

    Determinism: per-group rates are rounded to 9 dp decimals before
    the moment sums, so m and v are ratios of EXACT decimal sums
    (order-free) and both engines compute identical K. ONE groupBy +
    a 1-row broadcast moment frame. Returns (group, trials,
    successes, raw_rate, shrunk_rate)."""
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("trials"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias("successes"),
    )
    # decimal(18,9): p*p stays at precision 37 — still EXACT in
    # Spark's 38-digit decimals (a wider p would trigger the
    # precision-loss scale adjustment and truncate the product)
    p = F.round(F.col("successes") / F.col("trials"), 9).cast("decimal(18,9)")
    gp = g.select("grp", "trials", "successes", p.alias("p"))
    mom = gp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("p").cast("decimal(38,9)").alias("sp"),
        F.sum(F.col("p") * F.col("p")).cast("decimal(38,18)").alias("spp"),
    )
    m = F.col("sp").cast("double") / F.col("n_groups")
    v = (
        F.col("spp").cast("double") / F.col("n_groups")
        - m * m
    )
    k_raw = F.when(v > 0, m * (F.lit(1.0) - m) / v - F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    kcol = F.greatest(F.lit(0.0), k_raw)
    return (
        gp.crossJoin(F.broadcast(mom))
        .select(
            F.col("grp").alias("group"),
            "trials",
            "successes",
            F.round(F.col("successes") / F.col("trials"), out_decimals).alias(
                "raw_rate"
            ),
            F.round(
                (F.col("successes") + m * kcol) / (F.col("trials") + kcol),
                out_decimals,
            ).alias("shrunk_rate"),
        )
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation with average ranks for ties
    (Spearman 1904; the tie-corrected form is Pearson over midranks).
    The monotonic-association screen that survives outliers and
    nonlinearity — what you reach for before trusting Pearson on
    heavy-tailed business metrics.

    Scale shape (same discipline as roc_auc's midranks): ranks come
    from the DISTINCT-VALUE histogram, not row windows — one groupBy
    to (group, value, count), a prefix sum over each group's value
    vocabulary, then two vocabulary-sized joins back to the rows and
    one moment aggregation. No window ever spans corpus rows.

    Exactness: the average rank of a tie run is (rows_before +
    (run+1)/2), a half-integer — so DOUBLED ranks (2*rows_before +
    run + 1) are exact BIGINTs. All five moment sums aggregate those
    integers as DECIMAL(38,0); the final Pearson formula is evaluated
    once in double from exact inputs, so both engines compute the
    identical expression tree. Returns (group, n, spearman_rho)."""
    from pyspark.sql import Window

    r = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def doubled_ranks(col: str) -> DataFrame:
        hist = r.groupBy("g", F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        w = Window.partitionBy("g").orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return hist.select(
            "g",
            F.col("v").alias(col),
            (
                F.lit(2) * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
            ).alias(f"dr_{col}"),
        )

    ranked = r.join(doubled_ranks("x"), ["g", "x"]).join(
        doubled_ranks("y"), ["g", "y"]
    )
    dec = "decimal(38,0)"
    mom = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("dr_x").cast(dec)).alias("sx"),
        F.sum(F.col("dr_y").cast(dec)).alias("sy"),
        F.sum((F.col("dr_x") * F.col("dr_x")).cast(dec)).alias("sxx"),
        F.sum((F.col("dr_y") * F.col("dr_y")).cast(dec)).alias("syy"),
        F.sum((F.col("dr_x") * F.col("dr_y")).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(
        (n * F.col("sxx").cast("double") - sx * sx)
        * (n * F.col("syy").cast("double") - sy * sy)
    )
    return mom.select(
        F.col("g").alias("group"),
        "n",
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(None)), round_digits
        ).alias("spearman_rho"),
    )


def pearson_matrix(
    df: DataFrame,
    feature_cols: Sequence[str],
    scale: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over p feature columns in
    ONE scan and ONE reduce — the screen a feature pipeline runs
    before model fitting (collinear features, leakage suspects).

    Scale shape: no melt, no self-join — all p sums, p sums-of-squares
    and p(p-1)/2 cross sums are computed as a single global aggregate
    (map-side partial combine does the heavy lifting), so work is one
    pass over the corpus and the result frame is p²-sized. At p
    features that is p(p+3)/2 aggregate slots — fine for the tens of
    engineered features this engine's mlplan family handles.

    Exactness: values are cast to DECIMAL(18,scale) first, so products
    (DECIMAL(38,2·scale)) and their sums are exact and
    accumulation-order-free; each correlation is one double expression
    from exact inputs. Returns (feature_x, feature_y, n, corr) for
    x < y lexicographic pairs."""
    p = list(feature_cols)
    dec = f"decimal(18,{scale})"
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in p:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(F.sum((F.col(c).cast(dec) * F.col(c).cast(dec))).alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(p) for b in p[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum((F.col(a).cast(dec) * F.col(b).cast(dec))).alias(f"sp_{a}_{b}"))
    mom = df.agg(*aggs)

    n = F.col("n").cast("double")

    def corr(a: str, b: str):
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        num = n * F.col(f"sp_{a}_{b}").cast("double") - sa * sb
        den = F.sqrt(
            (n * F.col(f"ss_{a}").cast("double") - sa * sa)
            * (n * F.col(f"ss_{b}").cast("double") - sb * sb)
        )
        return F.when(den > 0, F.round(num / den, round_digits))

    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("feature_x"),
                    F.lit(b).alias("feature_y"),
                    corr(a, b).alias("corr"),
                )
                for a, b in pairs
            ]
        )
    ).alias("kv")
    return mom.select("n", kv).select(
        F.col("kv.feature_x").alias("feature_x"),
        F.col("kv.feature_y").alias("feature_y"),
        "n",
        F.col("kv.corr").alias("corr"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic (Fisher): does the group factor
    explain variance in the metric? SSB = Σ n_g(x̄_g - x̄)²,
    SSW = Σ_g Σ (x - x̄_g)², F = (SSB/(k-1)) / (SSW/(n-k)).

    Scale shape: one corpus-scale groupBy to per-group exact decimal
    moments (n, Σx, Σx²), then a k-row reduce — the textbook
    two-level aggregation; no row ever crosses the shuffle twice.
    Exactness: the r6 large-magnitude lesson applies — raw SS values
    are ~1e14 doubles whose decimal→double conversion can differ by
    ulps across engines, so only O(1) NORMALIZED statistics are
    emitted: F and eta² = SSB/SST (both ratios of same-source doubles,
    relative drift ~1e-12, safe at 6 dp). Returns one row (k_groups,
    n, eta_sq, f_stat)."""
    dec = f"decimal(18,{scale})"
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col(value_col).cast(dec)).alias("sg"),
        F.sum(F.col(value_col).cast(dec) * F.col(value_col).cast(dec)).alias("ssg"),
    )
    # each group's Σ²/n summand is rounded to a 6 dp DECIMAL before the
    # k-row sum: double sums are accumulation-order-dependent across
    # engines, exact decimals are not (the module's standing discipline)
    sq_over_n = F.round(
        (F.col("sg").cast("double") * F.col("sg").cast("double"))
        / F.col("ng").cast("double"),
        6,
    ).cast("decimal(38,6)")
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("sg").cast("decimal(38,12)")).alias("s"),
        F.sum(F.col("ssg").cast("decimal(38,12)")).alias("ss"),
        F.sum(sq_over_n).alias("sum_sq_over_n_d"),
    )
    sum_sq_over_n = F.col("sum_sq_over_n_d").cast("double")
    grand_sq = F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
    ssb = sum_sq_over_n - grand_sq
    ssw = F.col("ss").cast("double") - sum_sq_over_n
    fstat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return tot.select(
        F.col("k").alias("k_groups"),
        "n",
        F.round(ssb / (ssb + ssw), round_digits).alias("eta_sq"),
        F.round(fstat, round_digits).alias("f_stat"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kendall tau-b rank correlation with tie correction (Kendall
    1945): over all n(n-1)/2 observation pairs, tau_b =
    (C - D) / sqrt((n0 - n1)(n0 - n2)) with n0 = n(n-1)/2, n1/n2 the
    tied-pair counts in x/y.

    Scale discipline: `df` must already be an AGGREGATE frame (a
    daily/weekly series, a per-group summary — this module's standing
    rule for O(n²)-pair statistics, same as theil_sen_mann_kendall);
    the pair join is then bounded by construction. Concordant /
    discordant / tie counts are exact integers, tau is one double
    expression. Returns one row (n, concordant, discordant, tau_b)."""
    s = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .withColumn("i", F.row_number().over(Window.orderBy("x", "y")))
    )
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(b, F.col("a.i") < F.col("b.i"))
    sgn = (
        (F.col("a.x") < F.col("b.x")).cast("int") - (F.col("a.x") > F.col("b.x")).cast("int")
    ) * (
        (F.col("a.y") < F.col("b.y")).cast("int") - (F.col("a.y") > F.col("b.y")).cast("int")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum((sgn == 1).cast("long")).alias("c"),
        F.sum((sgn == -1).cast("long")).alias("d"),
        F.sum((F.col("a.x") == F.col("b.x")).cast("long")).alias("tx"),
        F.sum((F.col("a.y") == F.col("b.y")).cast("long")).alias("ty"),
    )
    den = F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    n = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return agg.join(F.broadcast(n)).select(
        "n",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.round(
            F.when(den > 0, (F.col("c") - F.col("d")).cast("double") / den),
            round_digits,
        ).alias("tau_b"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972, Aalen
    1978) over right-censored durations: H(t) = Σ_{t_i <= t} d_i/n_i,
    with the Fleming-Harrington survival S̃(t) = exp(-H(t)) — the
    estimator that behaves better than Kaplan-Meier in small risk
    sets, and whose hazard increments are directly plottable.

    Scale shape: identical to kaplan_meier's — ONE aggregation to the
    distinct-duration histogram, then windows over that KB-sized frame
    only. Each hazard increment d/n is rounded to a 12 dp DECIMAL
    before the cumulative window sum (windowed double sums are
    accumulation-order-dependent across engines; exact decimals are
    not). Returns (duration, n_risk, n_events, cum_hazard,
    survival_fh) per distinct leaving-duration."""
    per_t = df.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.count(F.lit(1)).alias("n_leaving"),
    )
    n_total = df.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    inc = F.round(
        F.col("n_events").cast("double") / F.col("n_risk").cast("double"), 12
    ).cast("decimal(20,12)")
    na = (
        per_t.join(F.broadcast(n_total))
        .withColumn(
            "n_risk", F.col("__n") - F.sum("n_leaving").over(w) + F.col("n_leaving")
        )
        .withColumn("cum_hazard_d", F.sum(inc).over(w))
    )
    return na.select(
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("cum_hazard_d").cast("double"), round_digits).alias("cum_hazard"),
        F.round(F.exp(-F.col("cum_hazard_d").cast("double")), round_digits).alias(
            "survival_fh"
        ),
    )


def cuped_adjust(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    scale: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """CUPED variance reduction for experiments (Deng, Xu, Kohavi &
    Walker, WSDM 2013): adjust each unit's post-period metric by its
    pre-period covariate, ŷ = y - θ(x - x̄) with θ = cov(x,y)/var(x)
    pooled across variants — the industry-standard way to shrink A/B
    confidence intervals ~(1-ρ²)× without touching the point estimate
    of the treatment effect.

    Scale shape: one global exact-decimal moment aggregate fits θ; one
    per-variant aggregate produces adjusted means and variances — two
    scans, both with map-side combine, result frame variant-sized.
    Exactness: θ and x̄ are rounded to 9 dp and the per-unit adjusted
    value to 9 dp before the variant aggregation, so both engines
    aggregate identical doubles. Returns per variant: (variant, n,
    mean_post, mean_adjusted, var_post, var_adjusted, theta,
    var_reduction)."""
    dec = f"decimal(18,{scale})"
    u = df.select(
        F.col(variant_col).alias("variant"),
        F.col(pre_col).cast(dec).alias("x"),
        F.col(post_col).cast(dec).alias("y"),
    )
    mom = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    varx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    params = mom.select(
        F.round(cov / varx, 9).alias("theta"),
        F.round(F.col("sx").cast("double") / n, 9).alias("xbar"),
        F.round(
            F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary)).otherwise(0.0),
            9,
        ).alias("rho2"),
    )
    adj = u.join(F.broadcast(params)).withColumn(
        "y_adj",
        F.round(
            F.col("y").cast("double")
            - F.col("theta") * (F.col("x").cast("double") - F.col("xbar")),
            9,
        ),
    )
    per_v = adj.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        # (18,9) factors: their product is DECIMAL(37,18), inside
        # Spark's p38 cap — (28,9)² would trip the silent
        # scale-truncation path
        F.sum(F.col("y_adj").cast("decimal(18,9)")).alias("sa"),
        F.sum(
            (F.col("y_adj").cast("decimal(18,9)") * F.col("y_adj").cast("decimal(18,9)"))
        ).alias("saa"),
        F.max("theta").alias("theta"),
        F.max("rho2").alias("rho2"),
    )
    nv = F.col("n").cast("double")
    var_post = (nv * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")) / (nv * (nv - 1))
    var_adj = (nv * F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa").cast("double")) / (nv * (nv - 1))
    return per_v.select(
        "variant",
        "n",
        F.round(F.col("sy").cast("double") / nv, round_digits).alias("mean_post"),
        F.round(F.col("sa").cast("double") / nv, round_digits).alias("mean_adjusted"),
        F.round(var_post, round_digits).alias("var_post"),
        F.round(var_adj, round_digits).alias("var_adjusted"),
        F.round("theta", round_digits).alias("theta"),
        F.round(1.0 - F.col("rho2"), round_digits).alias("var_ratio_expected"),
    )


def bh_fdr(
    df: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate adjustment (JRSS-B
    1995) over a frame of per-hypothesis p-values: rank ascending,
    q_i = min_{j >= i} p_j · m / j, reject where q <= alpha — the
    correction every metrics platform needs once it tests hundreds of
    segments at once (per-test α=0.05 would flag 5% of null segments).

    Scale discipline: the input is a HYPOTHESIS frame (one row per
    test — segments, features), never corpus rows; the two windows run
    over that frame. Ties order deterministically by (p, key). Returns
    (key, p_value, bh_rank, bh_q, reject)."""
    m = df.count()
    w_rank = Window.orderBy(F.col("p").asc(), F.col("k").asc())
    w_tail = Window.orderBy(F.col("rnk").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        df.select(F.col(key_col).alias("k"), F.col(p_col).alias("p"))
        .withColumn("rnk", F.row_number().over(w_rank))
        .withColumn(
            "raw_q",
            F.least(
                F.lit(1.0),
                F.round(F.col("p") * F.lit(float(m)) / F.col("rnk"), 9),
            ),
        )
        .withColumn("bh_q", F.min("raw_q").over(w_tail))
    )
    return ranked.select(
        F.col("k").alias("key"),
        F.round("p", round_digits).alias("p_value"),
        F.col("rnk").cast("long").alias("bh_rank"),
        F.round("bh_q", round_digits).alias("bh_q"),
        (F.col("bh_q") <= F.lit(alpha)).cast("int").alias("reject"),
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966; Peto & Peto 1972): are two
    survival curves the same? At each distinct event time t with d_t
    total events, n_t at risk and n1_t at risk in group 1,

        O-E  = Σ_t (d1_t − d_t·n1_t/n_t)
        V    = Σ_t d_t·(n1_t/n_t)·(1 − n1_t/n_t)·(n_t − d_t)/(n_t − 1)
        χ²   = (O-E)² / V,   p = erfc(√(χ²/2))  (A&S 7.1.26 polynomial)

    — the hypothesis-test companion to kaplan_meier/nelson_aalen: the
    curves SAY the cohorts differ, the log-rank says whether that
    difference is noise.

    Scale shape: the kaplan_meier discipline — one aggregation to the
    per-(group, duration) histogram, risk sets from prefix-sum windows
    over that KB-sized frame; each O-E and V summand is rounded to a
    12 dp DECIMAL before its sum. Exactly two groups required (the
    classic form). Returns one row: (group1, group2, n1, n2,
    observed1, expected1, chi2, p_value)."""
    import math as _math

    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"log-rank needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    per_t = df.groupBy(
        F.col(duration_col).alias("duration"),
        F.col(group_col).alias("g"),
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # complete per-duration rows per group (0 events / 0 leaving)
    wide = per_t.groupBy("duration").agg(
        F.sum(F.when(F.col("g") == g1, F.col("d")).otherwise(0)).alias("d1"),
        F.sum("d").alias("dt"),
        F.sum(F.when(F.col("g") == g1, F.col("c")).otherwise(0)).alias("c1"),
        F.sum("c").alias("ct"),
    )
    tot = df.groupBy().agg(
        F.sum((F.col(group_col) == g1).cast("long")).alias("n1_tot"),
        F.count(F.lit(1)).cast("long").alias("n_tot"),
    )
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        wide.join(F.broadcast(tot))
        .withColumn("n1", F.col("n1_tot") - F.sum("c1").over(w) + F.col("c1"))
        .withColumn("nt", F.col("n_tot") - F.sum("ct").over(w) + F.col("ct"))
        .filter(F.col("dt") > 0)
    )
    frac1 = F.col("n1").cast("double") / F.col("nt").cast("double")
    oe = F.round(
        F.col("d1").cast("double") - F.col("dt").cast("double") * frac1, 12
    ).cast("decimal(24,12)")
    v = F.round(
        F.when(
            F.col("nt") > 1,
            F.col("dt").cast("double")
            * frac1
            * (1.0 - frac1)
            * (F.col("nt") - F.col("dt")).cast("double")
            / (F.col("nt") - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
        12,
    ).cast("decimal(24,12)")
    agg = risk.agg(
        F.sum("d1").cast("long").alias("observed1"),
        F.round(
            F.sum(F.round(F.col("dt").cast("double") * frac1, 12).cast("decimal(24,12)"))
            .cast("double"),
            round_digits,
        ).alias("expected1"),
        F.sum(oe).alias("oe_d"),
        F.sum(v).alias("v_d"),
    )
    chi2 = F.when(
        F.col("v_d") > 0,
        F.pow(F.col("oe_d").cast("double"), 2) / F.col("v_d").cast("double"),
    ).otherwise(F.lit(0.0))
    z = F.round(F.sqrt(chi2 / 2.0), 9)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return agg.join(F.broadcast(tot)).select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        F.col("n1_tot").alias("n1"),
        (F.col("n_tot") - F.col("n1_tot")).alias("n2"),
        "observed1",
        "expected1",
        F.round(chi2, round_digits).alias("chi2"),
        F.round(poly * F.exp(-(z * z)), round_digits).alias("p_value"),
    )


def _erfc_two_sided(z_abs):
    """Two-sided normal p-value erfc(|z|/√2) via the Abramowitz &
    Stegun 7.1.26 polynomial — the module's standing portable-p
    discipline (chi_squared, bh_fdr, logrank_test): the argument is
    rounded to 9 dp BEFORE the polynomial so Spark and the DuckDB
    oracle evaluate bit-identical inputs, and the polynomial itself is
    plain double arithmetic both engines share."""
    z = F.round(z_abs / F.lit(1.4142135623730951), 9)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * F.exp(-(z * z))


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (Welch 1947) — the
    default A/B mean-metric test (Student's equal-variance form is
    unsafe when variants differ in spread, which treatment effects
    routinely cause):

        t  = (x̄1 − x̄2) / √(s1²/n1 + s2²/n2)
        ν  = (s1²/n1 + s2²/n2)² / ((s1²/n1)²/(n1−1) + (s2²/n2)²/(n2−1))

    p is two-sided via the NORMAL approximation erfc(|t|/√2) — at
    experimentation scale ν is in the thousands, where t_ν and the
    normal differ below the 6 dp emitted here; the Welch-Satterthwaite
    ν is emitted alongside so a consumer with a small sample can see
    when the approximation is unsafe (ν < 30, say) and look the exact
    tail up themselves.

    Scale shape: ONE corpus-scale groupBy to per-group exact DECIMAL
    moments (n, Σx, Σx²) — map-side combinable — then a 2-row reduce;
    sample variances come from the exact moments so no engine-order
    drift enters before the final rounded doubles. Exactly two groups
    required. Returns one row (group1, group2, n1, n2, mean1, mean2,
    t_stat, welch_df, p_value)."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"welch_t_test needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    dec = "decimal(28,6)"
    g = df.groupBy((F.col(group_col) == g1).alias("is1")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast(dec)).alias("s"),
        F.sum(F.col(value_col).cast(dec) * F.col(value_col).cast(dec)).alias("ss"),
    )
    # sample variance from exact moments: (Σx² − (Σx)²/n) / (n−1),
    # rounded to 9 dp so both engines carry the identical double onward
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.round(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double"),
        9,
    )
    per = g.select("is1", "n", F.round(mean, 9).alias("m"), var.alias("v"))
    wide = per.groupBy().agg(
        F.max(F.when(F.col("is1"), F.col("n"))).alias("n1"),
        F.max(F.when(~F.col("is1"), F.col("n"))).alias("n2"),
        F.max(F.when(F.col("is1"), F.col("m"))).alias("m1"),
        F.max(F.when(~F.col("is1"), F.col("m"))).alias("m2"),
        F.max(F.when(F.col("is1"), F.col("v"))).alias("v1"),
        F.max(F.when(~F.col("is1"), F.col("v"))).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1").cast("double")
    se2 = F.col("v2") / F.col("n2").cast("double")
    se_sum = se1 + se2
    tstat = (F.col("m1") - F.col("m2")) / F.sqrt(se_sum)
    nu = (se_sum * se_sum) / (
        se1 * se1 / (F.col("n1") - 1).cast("double")
        + se2 * se2 / (F.col("n2") - 1).cast("double")
    )
    return wide.select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        "n2",
        F.round(F.col("m1"), round_digits).alias("mean1"),
        F.round(F.col("m2"), round_digits).alias("mean2"),
        F.round(tstat, round_digits).alias("t_stat"),
        F.round(nu, round_digits).alias("welch_df"),
        F.round(_erfc_two_sided(F.abs(tstat)), round_digits).alias("p_value"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) with the
    tie-corrected normal approximation — the non-parametric A/B test
    for skewed metrics (revenue, latency) where Welch's mean test is
    dominated by the tail:

        U1 = R1 − n1(n1+1)/2            (R1 = midrank sum, group 1)
        μ  = n1·n2/2
        σ² = n1·n2/12 · ((n+1) − Σ(t³−t)/(n(n−1)))   (t = tie sizes)
        z  = (U1 − μ)/σ,   p = erfc(|z|/√2) two-sided

    No continuity correction (scipy's `use_continuity=False` form) —
    documented so the oracle and any consumer replicate the same
    convention. The AUC identity U1/(n1·n2) is emitted as `auc` (this
    is exactly operators/stats.roc_auc's statistic — the test is its
    hypothesis-test companion).

    Scale shape: midranks via ONE value-keyed aggregation (count per
    distinct value per group) + prefix-sum windows over that
    distinct-value frame — the roc_auc discipline; no per-row window,
    tie sizes fall out of the same frame for free. Exactly two groups.
    Returns one row (group1, group2, n1, n2, u1, auc, z_stat,
    p_value)."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"mann_whitney_u needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    per_v = df.groupBy(F.col(value_col).alias("val")).agg(
        F.sum((F.col(group_col) == g1).cast("long")).alias("c1"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    # midrank of a tie block ending at cumulative count C with size t is
    # (C−t+1 + C)/2; DOUBLED it is the exact integer 2C−t+1, so the rank
    # sum accumulates as an exact long and halves only once at the end —
    # no decimal division semantics to match cross-engine
    ranked = per_v.withColumn("cum", F.sum("ct").over(w)).withColumn(
        "m2x", (2 * F.col("cum") - F.col("ct") + 1).cast("long")
    )
    agg = ranked.agg(
        F.sum(F.col("c1") * F.col("m2x")).cast("long").alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("ct").cast("long").alias("n"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")).cast("long").alias("tie3"),
    )
    n1 = F.col("n1").cast("double")
    n2 = (F.col("n") - F.col("n1")).cast("double")
    n = F.col("n").cast("double")
    u1 = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2.0
    mu = n1 * n2 / 2.0
    sig2 = n1 * n2 / 12.0 * ((n + 1.0) - F.col("tie3").cast("double") / (n * (n - 1.0)))
    z = (u1 - mu) / F.sqrt(sig2)
    return agg.select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round(u1 / (n1 * n2), round_digits).alias("auc"),
        F.round(z, round_digits).alias("z_stat"),
        F.round(_erfc_two_sided(F.abs(z)), round_digits).alias("p_value"),
    )


def did_estimate(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger 1994 design)
    over a 2×2 (treated × post) panel:

        DiD = (x̄_T,post − x̄_T,pre) − (x̄_C,post − x̄_C,pre)
        SE  = √(Σ_cells s²_cell / n_cell)      (unpooled, Welch-style)
        z   = DiD/SE,  p = erfc(|z|/√2) two-sided

    — the workhorse quasi-experimental estimate when randomization
    isn't available (feature launched to one region: what changed vs
    the control region, net of the common time trend). The parallel-
    trends assumption is the caller's to defend; the pre-period means
    for both arms are emitted so a consumer can eyeball it.

    Scale shape: ONE corpus-scale 4-cell groupBy to exact DECIMAL
    moments, then a 4-row reduce. Cell means/variances are rounded to
    9 dp doubles off the exact moments (cross-engine determinism).
    Both flag columns must be 0/1-coercible. Returns one row
    (n, mean_c_pre, mean_c_post, mean_t_pre, mean_t_post, did, se,
    z_stat, p_value)."""
    dec = "decimal(28,6)"
    cells = df.groupBy(
        F.col(treated_col).cast("int").alias("tr"),
        F.col(post_col).cast("int").alias("po"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast(dec)).alias("s"),
        F.sum(F.col(value_col).cast(dec) * F.col(value_col).cast(dec)).alias("ss"),
    )
    mean = F.round(F.col("s").cast("double") / F.col("n").cast("double"), 9)
    var_over_n = F.round(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double")
        / F.col("n").cast("double"),
        12,
    )
    per = cells.select("tr", "po", "n", mean.alias("m"), var_over_n.alias("vn"))

    def _cell(tr, po, col):
        return F.max(F.when((F.col("tr") == tr) & (F.col("po") == po), F.col(col)))

    wide = per.groupBy().agg(
        F.sum("n").cast("long").alias("n"),
        _cell(0, 0, "m").alias("m_c_pre"),
        _cell(0, 1, "m").alias("m_c_post"),
        _cell(1, 0, "m").alias("m_t_pre"),
        _cell(1, 1, "m").alias("m_t_post"),
        (
            _cell(0, 0, "vn") + _cell(0, 1, "vn") + _cell(1, 0, "vn") + _cell(1, 1, "vn")
        ).alias("vsum"),
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (F.col("m_c_post") - F.col("m_c_pre"))
    se = F.sqrt(F.col("vsum"))
    z = did / se
    return wide.select(
        "n",
        F.col("m_c_pre").alias("mean_c_pre"),
        F.col("m_c_post").alias("mean_c_post"),
        F.col("m_t_pre").alias("mean_t_pre"),
        F.col("m_t_post").alias("mean_t_post"),
        F.round(did, round_digits).alias("did"),
        F.round(se, round_digits).alias("se"),
        F.round(z, round_digits).alias("z_stat"),
        F.round(_erfc_two_sided(F.abs(z)), round_digits).alias("p_value"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    quantiles_bp: Sequence[int] = (2500, 5000, 7500, 9000, 9900),
    scale: int = 6,
) -> DataFrame:
    """Weighted quantiles (lower / left-continuous convention): the
    q-quantile is the smallest value whose cumulative weight reaches
    q·W — the survey-statistics primitive (unweighted percentiles lie
    when rows carry importance weights: corpus mixing weights, survey
    design weights, traffic multipliers).

    Quantiles are requested in BASIS POINTS (integers) so the
    threshold compare `10000·cumw ≥ q_bp·W` is a product of exact
    DECIMALs — no float boundary can flip a row in/out of a quantile
    across engines. Scale shape: corpus collapses to the
    distinct-value weight histogram (one shuffle, map-side
    combinable), a prefix-sum window over that bounded frame, then a
    per-quantile min — never a global sort of corpus rows. Returns
    one row per requested quantile: (q_bp, value)."""
    dec = f"decimal(28,{scale})"
    h = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.col(weight_col).cast(dec)).alias("w")
    )
    tot = h.agg(F.sum(F.col("w").cast(f"decimal(38,{scale})")).alias("wtot"))
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.withColumn(
        "cumw", F.sum(F.col("w").cast(f"decimal(38,{scale})")).over(win)
    ).join(F.broadcast(tot))
    qs = F.explode(F.array(*[F.lit(int(q)) for q in quantiles_bp])).alias("q_bp")
    hits = cum.select("v", "cumw", "wtot").select("v", "cumw", "wtot", qs)
    return (
        hits.filter(
            F.col("cumw") * F.lit(10000).cast("decimal(5,0)")
            >= F.col("wtot") * F.col("q_bp").cast("decimal(5,0)")
        )
        .groupBy("q_bp")
        .agg(F.min("v").alias("value"))
        .orderBy("q_bp")
    )


# Acklam's rational approximation to the standard normal inverse CDF
# (Peter Acklam 2003, |rel err| < 1.15e-9 — the published portable
# algorithm; pure double arithmetic both engines evaluate identically).
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
             1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
             6.680131188771972e+01, -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
             -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
             3.754408661907416e+00)
_ACKLAM_PLOW = 0.02425


def norm_ppf(p):
    """Standard-normal inverse CDF Φ⁻¹(p) as a Column expression
    (Acklam's rational approximation) — the portable quantile-z
    primitive: the erfc polynomial gives both engines identical
    p-values; this gives them identical CRITICAL VALUES (power
    analysis, sample sizing, z-thresholds from data-driven alphas).
    Branches split at p = 0.02425 on the (rounded) input, so branch
    selection is identical cross-engine."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    pl = F.lit(_ACKLAM_PLOW)

    def _tail(q):
        # q = sqrt(-2 ln p_tail); Horner in q
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        return num / den

    def _central(p_):
        q = p_ - 0.5
        r = q * q
        num = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
        den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
        return num / den

    return (
        # the tail rational form is negative-valued as published: the
        # lower tail takes it directly, the upper tail negates it
        F.when(p < pl, _tail(F.sqrt(-2.0 * F.log(p))))
        .when(p > 1.0 - pl, -_tail(F.sqrt(-2.0 * F.log(1.0 - p))))
        .otherwise(_central(p))
    )


def ab_sample_size(
    grid: DataFrame,
    baseline_col: str,
    mde_col: str,
    alpha: float = 0.05,
    power: float = 0.8,
    round_digits: int = 6,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-proportion A/B sample-size calculator — the pre-flight
    every experimentation platform ships: per (baseline rate p0,
    minimum detectable effect δ) row,

        n/arm = ceil( (z_{1−α/2}·√(2p̄q̄) + z_{power}·√(p0·q0+p1·q1))²
                      / δ² )          (p1 = p0+δ, p̄ = (p0+p1)/2)

    — the standard unpooled-alternative form (Fleiss). z critical
    values come from the in-plan Acklam Φ⁻¹ (norm_ppf), evaluated on
    9 dp-rounded probabilities so both engines take identical
    branches and produce identical doubles; the ceil then lands on
    the same integer. Runs as a pure scan over the (tiny) grid frame.
    Returns (p0, mde, z_alpha, z_power, n_per_arm)."""
    p0 = F.col(baseline_col).cast("double")
    mde = F.col(mde_col).cast("double")
    p1 = p0 + mde
    za = norm_ppf(F.round(F.lit(1.0 - alpha / 2.0), 9))
    zp = norm_ppf(F.round(F.lit(power), 9))
    pbar = (p0 + p1) / 2.0
    term = za * F.sqrt(2.0 * pbar * (1.0 - pbar)) + zp * F.sqrt(
        p0 * (1.0 - p0) + p1 * (1.0 - p1)
    )
    n = F.ceil(F.round(term * term / (mde * mde), 9)).cast("long")
    return grid.select(
        *[F.col(c) for c in keep_cols],
        F.round(p0, round_digits).alias("p0"),
        F.round(mde, round_digits).alias("mde"),
        F.round(za, round_digits).alias("z_alpha"),
        F.round(zp, round_digits).alias("z_power"),
        n.alias("n_per_arm"),
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    exposed_col: str,
    outcome_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2×2 association test
    (Mantel & Haenszel 1959) — Simpson's-paradox-proof A/B analysis:
    pooling strata with different base rates can reverse an effect
    (the classic confounder trap); CMH tests the common odds ratio
    ACROSS strata instead. Per stratum h with cells (a,b,c,d), n:

        χ²  = (Σ_h (a_h − E_h))² / Σ_h V_h      (no continuity corr.)
        E_h = (a+b)(a+c)/n
        V_h = (a+b)(c+d)(a+c)(b+d) / (n²(n−1))
        OR_MH = Σ(a·d/n) / Σ(b·c/n)

    p = erfc(√(χ²/2)) via the shared A&S polynomial. Scale shape:
    ONE corpus groupBy to per-stratum exact integer cells, every E/V/
    OR summand rounded to a 9 dp DECIMAL before the strata-row sum
    (the module's order-independence discipline). Both flag columns
    0/1-coercible. Returns one row (k_strata, n, or_mh, chi2,
    p_value)."""
    ex = F.col(exposed_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    cells = df.groupBy(F.col(stratum_col).alias("h")).agg(
        F.sum((ex * oc).cast("long")).alias("a"),
        F.sum((ex * (1 - oc)).cast("long")).alias("b"),
        F.sum(((1 - ex) * oc).cast("long")).alias("c"),
        F.sum(((1 - ex) * (1 - oc)).cast("long")).alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    n = F.col("n").cast("double")
    e_h = (F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c")).cast(
        "double"
    ) / n
    v_h = F.when(
        F.col("n") > 1,
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
        / (n * n * (n - 1.0)),
    ).otherwise(F.lit(0.0))
    dec = "decimal(38,9)"
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.round(F.col("a").cast("double") - e_h, 9).cast(dec)).alias("num"),
        F.sum(F.round(v_h, 9).cast(dec)).alias("vsum"),
        F.sum(
            F.round(F.col("a").cast("double") * F.col("d").cast("double") / n, 9).cast(dec)
        ).alias("ad"),
        F.sum(
            F.round(F.col("b").cast("double") * F.col("c").cast("double") / n, 9).cast(dec)
        ).alias("bc"),
    )
    chi2 = F.when(
        F.col("vsum").cast("double") > 0,
        F.pow(F.col("num").cast("double"), 2) / F.col("vsum").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "k_strata",
        F.col("n_total").alias("n"),
        F.round(
            F.when(
                F.col("bc").cast("double") > 0,
                F.col("ad").cast("double") / F.col("bc").cast("double"),
            ),
            round_digits,
        ).alias("or_mh"),
        F.round(chi2, round_digits).alias("chi2"),
        F.round(_erfc_two_sided(F.sqrt(chi2)), round_digits).alias("p_value"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H rank test (Kruskal & Wallis 1952) — the
    k-group generalization of mann_whitney_u and the non-parametric
    companion to anova_oneway: does ANY of k groups shift the metric's
    distribution, with no normality assumption?

        H  = 12/(N(N+1)) · Σ_h R_h²/n_h − 3(N+1)
        C  = 1 − Σ(t³−t)/(N³−N)          (tie correction, t = tie sizes)
        H' = H / C

    p via the Wilson-Hilferty cube-root normal approximation of the
    χ²(k−1) upper tail — ((H'/ν)^⅓ − (1−2/9ν)) / √(2/9ν) pushed
    through the shared A&S erfc polynomial (one-sided; the z<0 branch
    reflects). The approximation (not an exact χ² CDF) is the
    documented convention the oracle replicates.

    Scale shape: mann_whitney_u's midrank discipline generalized —
    midranks from ONE value-keyed count frame (doubled midrank
    2C−t+1 stays an exact long), per-group rank sums from ONE
    (group, value)-keyed frame joined to it, so no per-row window
    ever sorts the corpus; tie sizes fall out of the value frame for
    free. Returns one row (k_groups, n, h_stat, h_corrected,
    p_value)."""
    per_v = df.groupBy(F.col(value_col).alias("val")).agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.withColumn("cum", F.sum("ct").over(w)).withColumn(
        "m2x", (2 * F.col("cum") - F.col("ct") + 1).cast("long")
    )
    gv = df.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("val")).agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    per_g = (
        gv.join(ranked.select("val", "m2x"), "val")
        .groupBy("g")
        .agg(
            F.sum(F.col("cg") * F.col("m2x")).cast("long").alias("r2x"),
            F.sum("cg").cast("long").alias("nh"),
        )
    )
    # Σ R_h²/n_h with R_h = r2x/2 → Σ r2x²/(4 n_h); the summand is a
    # ratio of exact longs, rounded to 9 dp before the k-row sum
    ties = ranked.agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tie3")
    )
    agg = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("nh").cast("long").alias("n"),
        F.sum(
            F.round(
                F.col("r2x").cast("double") * F.col("r2x").cast("double")
                / (4.0 * F.col("nh").cast("double")),
                9,
            ).cast("decimal(38,9)")
        ).alias("rsq"),
    ).crossJoin(ties)
    n = F.col("n").cast("double")
    h = 12.0 / (n * (n + 1.0)) * F.col("rsq").cast("double") - 3.0 * (n + 1.0)
    # degenerate guard: a single distinct value makes tie3 = n^3 - n,
    # so corr = 0 and H/corr would be 0/0 = NaN — NULL instead (the
    # module convention, cf. fleiss_kappa's p_e = 1 guard)
    corr = 1.0 - F.col("tie3").cast("double") / (n * n * n - n)
    hc = F.when(corr > 0, F.round(h / corr, 9))
    nu = (F.col("k_groups") - 1).cast("double")
    zwh = F.round(
        (F.cbrt(F.greatest(hc, F.lit(0.0)) / nu) - (1.0 - 2.0 / (9.0 * nu)))
        / F.sqrt(2.0 / (9.0 * nu)),
        9,
    )
    p_up = F.when(zwh >= 0, _erfc_two_sided(zwh) / 2.0).otherwise(
        1.0 - _erfc_two_sided(-zwh) / 2.0
    )
    return agg.select(
        "k_groups",
        "n",
        F.round(h, round_digits).alias("h_stat"),
        F.round(hc, round_digits).alias("h_corrected"),
        # greatest() skips NULLs, so NULL hc must gate p explicitly
        F.round(F.when(hc.isNotNull(), p_up), round_digits).alias("p_value"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
    n_raters: int,
    round_digits: int = 6,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    a FIXED number of raters per item, the multi-rater generalization
    of cohens_kappa and the standard QA gate for label-farm /
    LLM-judge annotation pipelines: raw percent-agree overstates
    quality whenever the category marginals are skewed.

        P_i  = (Σ_j n_ij² − n) / (n(n−1))     per-item agreement
        P̄    = mean_i P_i
        p_j  = Σ_i n_ij / (N·n)               category marginals
        P̄_e  = Σ_j p_j²
        κ    = (P̄ − P̄_e) / (1 − P̄_e)

    Items whose rating count ≠ ``n_raters`` are EXCLUDED (Fleiss'
    statistic is undefined for ragged panels; the caller pre-trims,
    e.g. first-n by a deterministic order). Every sum is an exact
    integer until the final divisions, so the doubles are identical
    cross-engine. Scale shape: ONE (item, category) groupBy + one
    item-partition window for the panel filter + two k-row reduces.
    Returns one row (n_items, n_raters, k_categories, p_bar, p_e,
    kappa)."""
    cells = df.groupBy(
        F.col(item_col).alias("item"), F.col(category_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("nij"))
    wi = Window.partitionBy("item")
    cells = cells.withColumn("tot", F.sum("nij").over(wi)).filter(
        F.col("tot") == n_raters
    )
    per_item = cells.groupBy("item").agg(
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq")
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq").cast("long").alias("sqsum"),
    )
    cats = cells.groupBy("cat").agg(F.sum("nij").cast("long").alias("cj"))
    catagg = cats.agg(
        F.count(F.lit(1)).cast("long").alias("k_categories"),
        F.sum(F.col("cj") * F.col("cj")).cast("long").alias("cj2"),
    )
    out = items.crossJoin(catagg)
    nn = F.col("n_items").cast("double")
    n = float(n_raters)
    p_bar = (F.col("sqsum").cast("double") - nn * n) / (nn * n * (n - 1.0))
    p_e = F.col("cj2").cast("double") / (nn * n * nn * n)
    return out.select(
        "n_items",
        F.lit(n_raters).cast("long").alias("n_raters"),
        "k_categories",
        F.round(p_bar, round_digits).alias("p_bar"),
        F.round(p_e, round_digits).alias("p_e"),
        # p_e = 1 (a single category across the whole panel) makes κ
        # 0/0-undefined — emit NULL rather than divide by zero
        F.when(
            p_e < 1.0, F.round((p_bar - p_e) / (1.0 - p_e), round_digits)
        ).alias("kappa"),
    )


def stratified_ate(
    df: DataFrame,
    treated_col: str,
    outcome_col: str,
    class_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Exact-matching stratified treatment-effect estimate
    (subclassification, Cochran 1968) — the continuous-outcome
    companion to cmh_test: when treatment assignment correlates with a
    confounding class, the pooled mean difference is Simpson-biased;
    stratify on the class, difference means WITHIN each stratum, and
    reweight:

        ATE = Σ_c (n_c / N_used) · (ȳ₁c − ȳ₀c)    (population weights)
        ATT = Σ_c (n₁c / N₁,used) · (ȳ₁c − ȳ₀c)   (treated weights)

    Classes lacking either arm carry no counterfactual and are DROPPED
    (reported as dropped rows — the estimator's overlap assumption
    made visible). Outcomes are quantized to 6 dp decimals per row
    before summing (the module's exact-moment discipline) so the
    per-class means are identical cross-engine; each weighted-diff
    summand rounds to 9 dp before the class sum. ONE corpus groupBy +
    one class-frame reduce. Returns one row: (n_total, n_classes,
    n_classes_used, n_dropped_rows, ate, att)."""
    t = F.col(treated_col).cast("int")
    yq = F.round(F.col(outcome_col).cast("double"), 6).cast("decimal(28,6)")
    cells = df.groupBy(F.col(class_col).alias("c")).agg(
        F.sum(t.cast("long")).alias("n1"),
        F.sum(F.when(t == 1, yq).otherwise(F.lit(None))).alias("s1"),
        F.sum((1 - t).cast("long")).alias("n0"),
        F.sum(F.when(t == 0, yq).otherwise(F.lit(None))).alias("s0"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    used = F.col("n1") > 0
    both = used & (F.col("n0") > 0)
    diff = F.round(
        F.col("s1").cast("double") / F.col("n1").cast("double")
        - F.col("s0").cast("double") / F.col("n0").cast("double"),
        9,
    )
    dec = "decimal(38,9)"
    agg = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(both.cast("long")).cast("long").alias("n_classes_used"),
        F.sum(F.when(~both, F.col("n")).otherwise(F.lit(0))).cast("long").alias(
            "n_dropped_rows"
        ),
        F.sum(F.when(both, F.col("n")).otherwise(F.lit(0))).cast("long").alias("n_used"),
        F.sum(F.when(both, F.col("n1")).otherwise(F.lit(0))).cast("long").alias("n1_used"),
        F.sum(F.when(both, F.round(diff * F.col("n").cast("double"), 9).cast(dec))).alias(
            "ate_num"
        ),
        F.sum(
            F.when(both, F.round(diff * F.col("n1").cast("double"), 9).cast(dec))
        ).alias("att_num"),
    )
    return agg.select(
        "n_total",
        "n_classes",
        "n_classes_used",
        "n_dropped_rows",
        F.round(
            F.col("ate_num").cast("double") / F.col("n_used").cast("double"), round_digits
        ).alias("ate"),
        F.round(
            F.col("att_num").cast("double") / F.col("n1_used").cast("double"),
            round_digits,
        ).alias("att"),
    )


def brown_forsythe_levene(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Brown-Forsythe test for variance homogeneity (Levene 1960 with
    Brown & Forsythe 1974's median centering — the robust variant
    recommended for skewed data): welch_t_test and anova_oneway test
    MEANS; this tests whether the groups' SPREADS differ, the
    assumption check behind pooled-variance procedures and a drift
    alarm in its own right (a variance shift with stable mean is
    invisible to the mean tests).

    W is exactly the one-way ANOVA F computed on z = |x − median_g|,
    so this delegates to anova_oneway (same exact-decimal moment
    discipline, same normalized-statistic output; like anova_oneway
    it emits the statistic without a p — no portable F CDF). The
    group median uses the LOWER-median convention (the order statistic
    at rank ⌈n_g/2⌉ from the per-group distinct-value cumulative
    frame — an exact value both engines agree on, never an
    interpolated midpoint). z is quantized to 6 dp per row before the
    moment sums. Returns one row (k_groups, n, eta_sq, w_stat)."""
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    per_v = df.groupBy(g.alias("gg"), v.alias("val")).agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    wv = (
        Window.partitionBy("gg").orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy("gg")
    cum = per_v.withColumn("cum", F.sum("ct").over(wv)).withColumn(
        "ng", F.sum("ct").over(wg)
    )
    med_rank = F.ceil(F.col("ng").cast("double") / 2.0).cast("long")
    medians = (
        cum.filter(F.col("cum") >= med_rank)
        .groupBy("gg")
        .agg(F.min("val").alias("med"))
    )
    z = (
        df.select(g.alias("gg"), v.alias("val"))
        .join(F.broadcast(medians), "gg")
        .select("gg", F.round(F.abs(F.col("val") - F.col("med")), 6).alias("z"))
    )
    return anova_oneway(z, "gg", "z", round_digits=round_digits).withColumnRenamed(
        "f_stat", "w_stat"
    )


def overdispersion_check(
    df: DataFrame,
    group_col: str,
    count_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group overdispersion diagnostic for count data — the
    pre-flight every Poisson-rate assumption needs: a Poisson column
    has variance ≈ mean (dispersion index ≈ 1); real event counts are
    almost always overdispersed, and modeling them as Poisson makes
    every downstream interval too narrow. Emits per group:

    - mean, variance (sample, n−1): from exact DECIMAL moments
    - dispersion_index = var/mean (>1 ⇒ overdispersed)
    - nb_size: the negative-binomial size (shape) by method of
      moments, mean²/(var − mean) — NULL when var ≤ mean (no
      overdispersion to absorb; Poisson or underdispersed)

    ONE map-side-combinable groupBy; every emitted statistic is a
    normalized O(1) ratio of same-source moments (the anova_oneway
    large-magnitude discipline). Returns one row per group, ordered
    by group."""
    c = F.col(count_col).cast("decimal(18,6)")
    gmoms = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.when(
        F.col("n") > 1,
        F.round(
            (F.col("ss").cast("double") - F.col("s").cast("double") * mean) / (n - 1.0),
            9,
        ),
    )
    return gmoms.select(
        "g",
        "n",
        F.round(mean, round_digits).alias("mean"),
        F.round(var, round_digits).alias("variance"),
        F.round(F.when(mean > 0, var / mean), round_digits).alias("dispersion_index"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)), round_digits
        ).alias("nb_size"),
    ).orderBy("g")


def chi_square_posthoc(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Chi-square post-hoc cell diagnostics — chi_squared says THAT a
    contingency table deviates; this says WHERE and HOW MUCH:

    - adjusted (Haberman 1973) standardized residual per cell,
      (n − e)/√(e(1 − r/n)(1 − c/n)) — each ≈ N(0,1) under
      independence, so |resid| > 2-3 localizes the association
    - Cramér's V = √(χ²/(n·(min(R,C) − 1))) — the table-size-free
      effect size (χ² grows with n even for trivial association)

    All cell math is ratios of exact integer margins; χ² summands
    round to 9 dp DECIMALs before the table sum. ONE corpus groupBy +
    two margin frames joined back on the CELL frame (R·C rows, never
    the corpus). Returns one row per observed cell: (row_val, col_val,
    n, expected, adj_residual, cramers_v) — V repeated per row by
    construction."""
    cells = df.groupBy(
        F.col(row_col).cast("string").alias("r"), F.col(col_col).cast("string").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("nij"))
    rows = cells.groupBy("r").agg(F.sum("nij").cast("long").alias("ri"))
    cols = cells.groupBy("c").agg(F.sum("nij").cast("long").alias("cj"))
    tot = cells.agg(
        F.sum("nij").cast("long").alias("n"),
        F.countDistinct("r").cast("long").alias("nr"),
        F.countDistinct("c").cast("long").alias("nc"),
    )
    full = (
        cells.join(F.broadcast(rows), "r")
        .join(F.broadcast(cols), "c")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n").cast("double")
    e = F.col("ri").cast("double") * F.col("cj").cast("double") / n
    adj = (F.col("nij").cast("double") - e) / F.sqrt(
        e * (1.0 - F.col("ri").cast("double") / n) * (1.0 - F.col("cj").cast("double") / n)
    )
    chi = full.agg(
        F.sum(
            F.round(
                (F.col("nij").cast("double") - e) * (F.col("nij").cast("double") - e) / e,
                9,
            ).cast("decimal(38,9)")
        ).alias("chi2"),
        F.first("n").alias("n_tot"),
        F.first("nr").alias("nr"),
        F.first("nc").alias("nc"),
    ).select(
        F.round(
            F.sqrt(
                F.col("chi2").cast("double")
                / (
                    F.col("n_tot").cast("double")
                    * (F.least("nr", "nc").cast("double") - 1.0)
                )
            ),
            round_digits,
        ).alias("cramers_v")
    )
    return (
        full.crossJoin(F.broadcast(chi))
        .select(
            F.col("r").alias("row_val"),
            F.col("c").alias("col_val"),
            F.col("nij").alias("n"),
            F.round(e, round_digits).alias("expected"),
            F.round(adj, round_digits).alias("adj_residual"),
            "cramers_v",
        )
        .orderBy("row_val", "col_val")
    )


def effect_size_panel(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Two-group effect-size panel — the MAGNITUDE companion to the
    p-value tests (welch_t/mann_whitney tell you the difference is
    unlikely under H0; at corpus scale EVERYTHING is significant, and
    these say whether it matters):

    - Cohen's d (pooled-SD standardized mean difference) and Hedges'
      g (d × (1 − 3/(4n − 9)), the small-sample bias correction)
    - Cliff's delta = 2·U1/(n1·n2) − 1 and CLES = U1/(n1·n2) — the
      rank/probability effect sizes, exact from mann_whitney_u's
      doubled-midrank frame (tie-aware, no corpus sort)

    Moments as exact 6 dp DECIMALs, rank sums as exact longs; group1
    is the lexicographically smaller group (documented — the signs of
    d and delta follow it). Returns one row: (group1, group2, n1, n2,
    cohens_d, hedges_g, cliffs_delta, cles)."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"effect_size_panel needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    dec = "decimal(18,6)"
    v = F.col(value_col).cast(dec)
    is1 = (F.col(group_col) == g1).cast("long")
    moms = df.agg(
        F.sum(is1).alias("n1"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col(group_col) == g1, v)).alias("s1"),
        F.sum(F.when(F.col(group_col) == g1, v * v)).alias("ss1"),
        F.sum(F.when(F.col(group_col) != g1, v)).alias("s0"),
        F.sum(F.when(F.col(group_col) != g1, v * v)).alias("ss0"),
    )
    per_v = df.groupBy(F.col(value_col).alias("val")).agg(
        F.sum(is1).alias("c1"), F.count(F.lit(1)).cast("long").alias("ct")
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.withColumn("cum", F.sum("ct").over(w)).withColumn(
        "m2x", (2 * F.col("cum") - F.col("ct") + 1).cast("long")
    )
    u = ranked.agg(F.sum(F.col("c1") * F.col("m2x")).cast("long").alias("r1x2"))
    out = moms.crossJoin(u)
    n1 = F.col("n1").cast("double")
    n2 = (F.col("n") - F.col("n1")).cast("double")
    m1 = F.col("s1").cast("double") / n1
    m0 = F.col("s0").cast("double") / n2
    var1 = (F.col("ss1").cast("double") - F.col("s1").cast("double") * m1) / (n1 - 1.0)
    var0 = (F.col("ss0").cast("double") - F.col("s0").cast("double") * m0) / (n2 - 1.0)
    sp = F.sqrt(((n1 - 1.0) * var1 + (n2 - 1.0) * var0) / (n1 + n2 - 2.0))
    d = (m1 - m0) / sp
    g_corr = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    u1 = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2.0
    cles = u1 / (n1 * n2)
    return out.select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.round(d, round_digits).alias("cohens_d"),
        F.round(d * g_corr, round_digits).alias("hedges_g"),
        F.round(2.0 * cles - 1.0, round_digits).alias("cliffs_delta"),
        F.round(cles, round_digits).alias("cles"),
    )


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    horizon: float,
    round_digits: int = 6,
) -> DataFrame:
    """Restricted mean survival time (Royston & Parmar 2013 for the
    case FOR it): the area under the Kaplan-Meier curve up to a fixed
    ``horizon`` — "expected survival days within the first H days",
    the absolute-time effect summary that stays valid when hazards
    cross (where a hazard ratio is uninterpretable) and the natural
    KPI form of a retention curve.

    Built directly on kaplan_meier's distinct-duration histogram: the
    step function integrates segment by segment, S(t_i)·(min(t_{i+1},
    H) − t_i), plus the initial [0, t_min) segment at S = 1. Every
    segment contribution is rounded to 9 dp before the sum (the
    module's order-independence discipline); all windows run over the
    KB-sized duration frame. Returns one row: (horizon, n_subjects,
    rmst)."""
    km = kaplan_meier(df, duration_col, event_col, round_digits=round_digits)
    n_subj = df.agg(F.count(F.lit(1)).cast("long").alias("n_subjects"))
    w = Window.orderBy("t")
    steps = km.select(F.col("duration").cast("double").alias("t"), "survival").filter(
        F.col("duration") < horizon
    )
    seg = steps.withColumn(
        "t_next", F.least(F.coalesce(F.lead("t", 1).over(w), F.lit(float(horizon))), F.lit(float(horizon)))
    ).select(
        F.round(F.col("survival") * (F.col("t_next") - F.col("t")), 9)
        .cast("decimal(38,9)")
        .alias("contrib")
    )
    first_t = steps.agg(
        F.round(
            F.least(F.coalesce(F.min("t"), F.lit(float(horizon))), F.lit(float(horizon))),
            9,
        )
        .cast("decimal(38,9)")
        .alias("head")
    )
    area = seg.agg(F.coalesce(F.sum("contrib"), F.lit(0).cast("decimal(38,9)")).alias("tail"))
    return (
        n_subj.crossJoin(F.broadcast(first_t))
        .crossJoin(F.broadcast(area))
        .select(
            F.lit(float(horizon)).alias("horizon"),
            "n_subjects",
            F.round(
                F.col("head").cast("double") + F.col("tail").cast("double"), round_digits
            ).alias("rmst"),
        )
    )


def pairwise_welch_bonferroni(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """All-pairs Welch z comparisons with Bonferroni control — the
    post-hoc step after anova_oneway rejects: WHICH groups differ?
    Each pair gets the Welch statistic z = (x̄_i − x̄_j)/√(s²_i/n_i +
    s²_j/n_j) (normal approximation — group sizes at corpus scale
    make the t/z distinction vacuous; documented convention), raw
    two-sided p via the shared A&S erfc polynomial, and
    p_bonferroni = min(1, p · k(k−1)/2) — the family-wise control
    that keeps k(k−1)/2 looks honest.

    ONE corpus groupBy to exact DECIMAL moments; the pair frame is
    the k-row moment frame self-joined on g_i < g_j (k², never
    corpus). Returns one row per pair: (group1, group2, n1, n2,
    mean_diff, z_stat, p_raw, p_bonferroni)."""
    dec = "decimal(18,6)"
    v = F.col(value_col).cast(dec)
    moms = df.groupBy(F.col(group_col).cast("string").alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(v).alias("sg"),
        F.sum(v * v).alias("ssg"),
    )
    k = moms.agg(F.count(F.lit(1)).cast("long").alias("k"))
    a = moms.select(
        F.col("g").alias("g1"), F.col("ng").alias("n1"),
        F.col("sg").alias("s1"), F.col("ssg").alias("ss1"),
    )
    b = moms.select(
        F.col("g").alias("g2"), F.col("ng").alias("n2"),
        F.col("sg").alias("s2"), F.col("ssg").alias("ss2"),
    )
    pairs = F.broadcast(a).join(F.broadcast(b), F.col("g1") < F.col("g2")).crossJoin(
        F.broadcast(k)
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (F.col("ss1").cast("double") - F.col("s1").cast("double") * m1) / (n1 - 1.0)
    v2 = (F.col("ss2").cast("double") - F.col("s2").cast("double") * m2) / (n2 - 1.0)
    z = F.round((m1 - m2) / F.sqrt(v1 / n1 + v2 / n2), 9)
    m_tests = (F.col("k") * (F.col("k") - 1) / 2).cast("double")
    p = _erfc_two_sided(F.abs(z))
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        F.round(m1 - m2, round_digits).alias("mean_diff"),
        F.round(z, round_digits).alias("z_stat"),
        F.round(p, round_digits).alias("p_raw"),
        F.round(F.least(F.lit(1.0), p * m_tests), round_digits).alias("p_bonferroni"),
    ).orderBy("g1", "g2")


def mcnemar_test(
    df: DataFrame,
    pred_a_col: str,
    pred_b_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """McNemar's test on paired classifier correctness (McNemar 1947;
    Dietterich 1998 names it THE test for comparing two classifiers on
    one test set): accuracy deltas ignore that both models score the
    SAME rows — what matters is the DISAGREEMENT asymmetry, the b/c
    cells of the paired table:

        b = #(A right, B wrong),  c = #(A wrong, B right)
        χ² = (|b − c| − 1)² / (b + c)      (continuity-corrected)
        p  = erfc(√(χ²/2))  via the shared A&S polynomial

    Exact integer cells from ONE corpus aggregate; χ²/p NULL-guarded
    at b + c = 0 (identical models — no evidence either way). Returns
    one row: (n, both_right, both_wrong, a_only, b_only, chi2,
    p_value)."""
    a_ok = (F.col(pred_a_col) == F.col(label_col)).cast("long")
    b_ok = (F.col(pred_b_col) == F.col(label_col)).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a_ok * b_ok).cast("long").alias("both_right"),
        F.sum((1 - a_ok) * (1 - b_ok)).cast("long").alias("both_wrong"),
        F.sum(a_ok * (1 - b_ok)).cast("long").alias("a_only"),
        F.sum((1 - a_ok) * b_ok).cast("long").alias("b_only"),
    )
    bc = (F.col("a_only") + F.col("b_only")).cast("double")
    num = F.abs(F.col("a_only").cast("double") - F.col("b_only").cast("double")) - 1.0
    chi2 = F.when(bc > 0, F.greatest(num, F.lit(0.0)) * F.greatest(num, F.lit(0.0)) / bc)
    return agg.select(
        "n",
        "both_right",
        "both_wrong",
        "a_only",
        "b_only",
        F.round(chi2, round_digits).alias("chi2"),
        F.round(
            F.when(bc > 0, _erfc_two_sided(F.sqrt(F.greatest(chi2, F.lit(0.0))))),
            round_digits,
        ).alias("p_value"),
    )


def msprt_always_valid(
    df: DataFrame,
    day_col: str,
    arm_col: str,
    value_col: str,
    tau: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Always-valid sequential A/B inference by mixture SPRT (Johari,
    Koomen, Pekelis & Walsh, KDD 2017 — the "peeking problem" fix):
    a fixed-horizon p-value is invalidated by looking every day; the
    mSPRT p-value is valid at EVERY look simultaneously, so the
    dashboard can refresh daily and stop the moment it crosses α.

    Per day t with cumulative per-arm counts/means, the normal-
    mixture likelihood ratio against θ = 0 with mixing N(0, τ²):

        Λ_t = √(ρ²/(ρ² + n_t τ²)) · exp(n_t² δ_t² τ² / (2ρ²(ρ² + n_t τ²)))
        p_t = min(1, 1/max_{k≤t} Λ_k)        (running max ⇒ p monotone ↓)

    with n_t the harmonic pair size n1n0/(n1+n0), δ_t the cumulative
    mean difference, and ρ² the POOLED corpus variance (estimated
    once from exact decimal moments — the documented plug-in
    simplification; Λ is evaluated on identical doubles cross-engine
    by rounding its log to 9 dp before exp). Scale shape: corpus →
    per-(day, arm) exact-moment frame in ONE groupBy; every cumsum/
    max runs over that day frame. Returns one row per day: (day, n1,
    n0, mean_diff, log_lambda, p_always_valid)."""
    per_day = df.groupBy(F.col(day_col).alias("day")).agg(
        F.sum(F.col(arm_col).cast("long")).alias("d_n1"),
        F.sum(
            F.when(F.col(arm_col).cast("int") == 1, F.col(value_col).cast("decimal(18,6)"))
        ).alias("d_s1"),
        F.sum((1 - F.col(arm_col).cast("int")).cast("long")).alias("d_n0"),
        F.sum(
            F.when(F.col(arm_col).cast("int") == 0, F.col(value_col).cast("decimal(18,6)"))
        ).alias("d_s0"),
    )
    dec = "decimal(38,6)"
    rho = df.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("s"),
        F.sum(
            F.col(value_col).cast("decimal(28,6)") * F.col(value_col).cast("decimal(18,6)")
        ).alias("ss"),
    ).select(
        F.round(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * (F.col("s").cast("double") / F.col("nn"))
            )
            / (F.col("nn").cast("double") - 1.0),
            9,
        ).alias("rho2")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        per_day.withColumn("n1", F.sum("d_n1").over(w))
        .withColumn("n0", F.sum("d_n0").over(w))
        .withColumn("s1", F.sum(F.col("d_s1").cast(dec)).over(w))
        .withColumn("s0", F.sum(F.col("d_s0").cast(dec)).over(w))
        .crossJoin(F.broadcast(rho))
    )
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")
    delta = F.col("s1").cast("double") / n1 - F.col("s0").cast("double") / n0
    n_eff = n1 * n0 / (n1 + n0)
    t2 = float(tau) * float(tau)
    r2 = F.col("rho2")
    log_lam = F.round(
        0.5 * F.log(r2 / (r2 + n_eff * t2))
        + n_eff * n_eff * delta * delta * t2 / (2.0 * r2 * (r2 + n_eff * t2)),
        9,
    )
    scored = cum.filter((F.col("n1") > 0) & (F.col("n0") > 0)).withColumn(
        "log_lam", log_lam
    )
    run_max = F.max("log_lam").over(w)
    return scored.select(
        "day",
        "n1",
        "n0",
        F.round(delta, round_digits).alias("mean_diff"),
        F.round(F.col("log_lam"), round_digits).alias("log_lambda"),
        F.round(
            F.least(F.lit(1.0), F.exp(-F.greatest(run_max, F.lit(0.0)))), round_digits
        ).alias("p_always_valid"),
    ).orderBy("day")


def icc_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Intraclass correlation ICC(1) — one-way random-effects
    (Shrout & Fleiss 1979's first case): what fraction of a
    continuous measurement's variance is BETWEEN subjects rather than
    within? The continuous-ratings reliability companion to
    cohens_kappa/fleiss_kappa (categorical) and the standing
    answer to "are repeated measurements of the same unit consistent
    enough to average?".

        ICC(1) = (MSB − MSW) / (MSB + (k̄ − 1)·MSW)

    with MSB/MSW the between/within mean squares from the one-way
    ANOVA decomposition and k̄ the average-group-size adjustment
    k̄ = (N − Σn_g²/N)/(G − 1) for unbalanced groups (the standard
    unbiased form). Same exact-decimal moment discipline as
    anova_oneway — and the same OUTPUT discipline: only normalized
    O(1) ratios are emitted (ICC and the MSB/MSW variance ratio);
    the raw mean squares are ~1e10 doubles whose decimal→double
    conversion can differ by an ulp across engines (the sf1 sweep
    caught exactly that on a first draft that emitted them). Returns
    one row: (n, n_groups, k_bar, ms_ratio, icc1)."""
    dec = "decimal(18,6)"
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col(value_col).cast(dec)).alias("sg"),
        F.sum(F.col(value_col).cast("decimal(28,6)") * F.col(value_col).cast(dec)).alias(
            "ssg"
        ),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("ng") * F.col("ng")).cast("long").alias("nsq"),
        F.sum(F.col("sg").cast("decimal(38,12)")).alias("s"),
        F.sum(F.col("ssg").cast("decimal(38,12)")).alias("ss"),
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg").cast("double")
                / F.col("ng").cast("double"),
                6,
            ).cast("decimal(38,6)")
        ).alias("sqn"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("sqn").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / n
    ssw = F.col("ss").cast("double") - F.col("sqn").cast("double")
    msb = ssb / (k - 1.0)
    msw = ssw / (n - k)
    kbar = (n - F.col("nsq").cast("double") / n) / (k - 1.0)
    return tot.select(
        "n",
        F.col("k").alias("n_groups"),
        F.round(kbar, round_digits).alias("k_bar"),
        F.round(F.when(msw > 0, msb / msw), round_digits).alias("ms_ratio"),
        F.round((msb - msw) / (msb + (kbar - 1.0) * msw), round_digits).alias("icc1"),
    )


def kaplan_meier_greenwood(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    z: float = 1.959964,
    round_digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier curve WITH Greenwood confidence bands (Greenwood
    1926) — the error bars the bare q_kaplan_meier curve lacks, and
    what turns a retention plot into a decision: two cohorts whose
    bands overlap are not evidence of different retention.

        V̂(S(t)) = S(t)² · Σ_{t_i ≤ t}  d_i / (n_i (n_i − d_i))
        band     = S ± z·√V̂, clipped to [0, 1]  (plain Wald form —
                   the log-log transform variant is documented out)

    The Greenwood summand d/(n(n−d)) is a ratio of exact integers
    rounded to 9 dp before its cumulative window sum — the same
    KB-sized duration frame as kaplan_meier, one extra window. A
    duration where d = n (survival hits 0) NULLs the band from there
    on (the variance formula divides by zero; bands on a dead curve
    are meaningless). Returns per duration: (duration, n_risk,
    n_events, survival, se, lo, hi)."""
    km = kaplan_meier(df, duration_col, event_col, round_digits=round_digits)
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    gsum = F.sum(
        F.when(
            F.col("n_events") < F.col("n_risk"),
            F.round(
                F.col("n_events").cast("double")
                / (
                    F.col("n_risk").cast("double")
                    * (F.col("n_risk") - F.col("n_events")).cast("double")
                ),
                9,
            ).cast("decimal(38,9)"),
        )
    ).over(w)
    dead = F.max((F.col("n_events") == F.col("n_risk")).cast("int")).over(w)
    se = F.when(
        dead == 0, F.round(F.col("survival") * F.sqrt(gsum.cast("double")), round_digits)
    )
    return km.withColumn("se", se).select(
        "duration",
        "n_risk",
        "n_events",
        "survival",
        "se",
        F.round(F.greatest(F.lit(0.0), F.col("survival") - z * F.col("se")), round_digits).alias(
            "lo"
        ),
        F.round(F.least(F.lit(1.0), F.col("survival") + z * F.col("se")), round_digits).alias(
            "hi"
        ),
    )


def kendalls_w_friedman(
    df: DataFrame,
    judge_col: str,
    item_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Kendall's coefficient of concordance W + Friedman's test
    (Kendall & Babington Smith 1939; Friedman 1937) — agreement among
    m JUDGES each ranking the same n ITEMS: the ordinal member of the
    rater-agreement family (kappa = categorical, ICC = continuous).
    "Do the years agree on which months are big?" is this statistic.

        W  = 12 Σ_i (R_i − m(n+1)/2)² / (m²(n³−n) − m·ΣT_j)
        χ² = m(n−1)·W   (Friedman), p via the Wilson-Hilferty
             cube-root χ²(n−1) approximation through the shared
             A&S erfc polynomial (the kruskal_wallis convention)

    with T_j = Σ(t³−t) the per-judge tie correction. Within-judge
    midranks use the doubled-midrank trick (2C−t+1 stays an exact
    long) over a per-(judge, value) count frame — no corpus sort;
    judges must rank every item (incomplete panels raise). Returns
    one row: (m_judges, n_items, w, chi2, p_value)."""
    per_jv = df.groupBy(
        F.col(judge_col).alias("j"), F.col(value_col).alias("val")
    ).agg(F.count(F.lit(1)).cast("long").alias("ct"))
    wj = Window.partitionBy("j").orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_jv.withColumn("cum", F.sum("ct").over(wj)).withColumn(
        "m2x", (2 * F.col("cum") - F.col("ct") + 1).cast("long")
    )
    rows = df.select(
        F.col(judge_col).alias("j"), F.col(item_col).alias("item"),
        F.col(value_col).alias("val"),
    )
    with_rank = rows.join(ranked.select("j", "val", "m2x"), ["j", "val"])
    shape = with_rank.agg(
        F.countDistinct("j").cast("long").alias("m"),
        F.countDistinct("item").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("cells"),
    ).collect()[0]
    if shape.cells != shape.m * shape.n:
        raise ValueError(
            f"kendalls_w_friedman needs a complete panel: {shape.m} judges x "
            f"{shape.n} items != {shape.cells} rows"
        )
    m, n = int(shape.m), int(shape.n)
    per_item = with_rank.groupBy("item").agg(
        F.sum("m2x").cast("long").alias("r2x")
    )
    ties = ranked.groupBy("j").agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tj")
    ).agg(F.sum("tj").cast("long").alias("tsum"))
    # Σ(R_i − mean)² with doubled ranks: Σ(r2x − m(n+1))²/4, exact ints
    mean2x = m * (n + 1)
    dev = per_item.agg(
        F.sum(
            (F.col("r2x") - F.lit(mean2x)) * (F.col("r2x") - F.lit(mean2x))
        )
        .cast("long")
        .alias("ss4x")
    )
    out = dev.crossJoin(ties)
    ssdev = F.col("ss4x").cast("double") / 4.0
    denom = (
        float(m * m) * (float(n) ** 3 - n) - m * F.col("tsum").cast("double")
    ) / 12.0
    wstat = F.round(ssdev / denom, 9)
    chi2 = F.round(F.lit(float(m * (n - 1))) * wstat, 9)
    import math as _math

    nu = float(n - 1)
    zwh = F.round(
        (F.cbrt(chi2 / nu) - (1.0 - 2.0 / (9.0 * nu)))
        / _math.sqrt(2.0 / (9.0 * nu)),
        9,
    )
    p_up = F.when(zwh >= 0, _erfc_two_sided(zwh) / 2.0).otherwise(
        1.0 - _erfc_two_sided(-zwh) / 2.0
    )
    return out.select(
        F.lit(m).cast("long").alias("m_judges"),
        F.lit(n).cast("long").alias("n_items"),
        F.round(wstat, round_digits).alias("w"),
        F.round(chi2, round_digits).alias("chi2"),
        F.round(p_up, round_digits).alias("p_value"),
    )


def gumbel_block_maxima(
    df: DataFrame,
    group_col: str,
    block_col: str,
    value_col: str,
    return_period: float = 100.0,
    round_digits: int = 6,
) -> DataFrame:
    """Gumbel extreme-value fit on block maxima by the method of
    moments (Gumbel 1958; the EV1 member of the Fisher-Tippett
    family) — tail risk the mean/variance screens structurally miss:
    capacity planning asks "what is the worst BLOCK we should expect
    in the next T blocks?", and the answer comes from the
    distribution of block MAXIMA, not of values.

        β̂ = s·√6/π,   μ̂ = x̄ − γ·β̂        (γ = 0.5772156649…)
        return level x_T = μ̂ − β̂·ln(−ln(1 − 1/T))

    Two-level aggregation: corpus → per-(group, block) max — the only
    corpus-scale shuffle — → per-group exact 6 dp-decimal moments of
    the maxima (the anova discipline; only normalized outputs).
    Blocks with any data count; the fit needs ≥ 2 blocks (else NULL).
    Returns per group: (group, n_blocks, mean_max, beta, mu,
    return_level)."""
    maxima = df.groupBy(
        F.col(group_col).alias("g"), F.col(block_col).alias("b")
    ).agg(F.max(F.col(value_col).cast("double")).alias("mx"))
    dec = "decimal(18,6)"
    moms = maxima.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.round(F.col("mx"), 6).cast(dec)).alias("s"),
        F.sum(
            F.round(F.col("mx"), 6).cast("decimal(28,6)")
            * F.round(F.col("mx"), 6).cast(dec)
        ).alias("ss"),
    )
    import math as _math

    gamma = 0.5772156649015329
    n = F.col("n_blocks").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.when(
        F.col("n_blocks") > 1,
        F.round(
            (F.col("ss").cast("double") - F.col("s").cast("double") * mean) / (n - 1.0),
            9,
        ),
    )
    beta = F.sqrt(F.greatest(var, F.lit(0.0))) * (_math.sqrt(6.0) / _math.pi)
    mu = mean - gamma * beta
    t_quantile = -_math.log(-_math.log(1.0 - 1.0 / float(return_period)))
    return moms.select(
        F.col("g").alias("group"),
        "n_blocks",
        F.round(mean, round_digits).alias("mean_max"),
        F.round(beta, round_digits).alias("beta"),
        F.round(mu, round_digits).alias("mu"),
        F.round(mu + beta * t_quantile, round_digits).alias("return_level"),
    ).orderBy("group")


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """1-D Wasserstein-1 distance (earth mover's distance) between two
    groups' value distributions — the drift metric that reports HOW
    FAR the distributions are in VALUE units, where ks_test reports
    only the largest CDF gap and psi_drift needs arbitrary bins. The
    1-D case is exact and closed-form (Vallender 1974):

        W₁ = ∫ |F₁(x) − F₂(x)| dx
           = Σ_consecutive-distinct-values |F₁ − F₂| · Δx

    Scale shape: ONE value-keyed count frame over BOTH groups (the
    mann_whitney discipline — no corpus sort), cumulative counts via
    one window, each |ΔF|·Δx segment a ratio of exact longs times an
    exact value gap, rounded to 9 dp before the sum. Exactly two
    groups. Returns one row: (group1, group2, n1, n2, w1_distance,
    ks_stat) — the KS statistic falls out of the same frame for
    free."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"wasserstein_1d needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    per_v = df.groupBy(F.col(value_col).cast("double").alias("val")).agg(
        F.sum((F.col(group_col) == g1).cast("long")).alias("c1"),
        F.sum((F.col(group_col) != g1).cast("long")).alias("c2"),
    )
    tot = df.agg(
        F.sum((F.col(group_col) == g1).cast("long")).alias("n1"),
        F.sum((F.col(group_col) != g1).cast("long")).alias("n2"),
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("val")
    cum = (
        per_v.withColumn("cum1", F.sum("c1").over(w))
        .withColumn("cum2", F.sum("c2").over(w))
        .withColumn("nxt", F.lead("val", 1).over(wl))
        .crossJoin(F.broadcast(tot))
    )
    f1 = F.col("cum1").cast("double") / F.col("n1").cast("double")
    f2 = F.col("cum2").cast("double") / F.col("n2").cast("double")
    seg = F.when(
        F.col("nxt").isNotNull(),
        F.round(F.abs(f1 - f2) * (F.col("nxt") - F.col("val")), 9).cast("decimal(38,9)"),
    )
    agg = cum.agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.sum(seg).alias("wsum"),
        F.max(F.round(F.abs(f1 - f2), 9)).alias("ks"),
    )
    return agg.select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        "n2",
        F.round(F.col("wsum").cast("double"), round_digits).alias("w1_distance"),
        F.round(F.col("ks"), round_digits).alias("ks_stat"),
    )


def yuen_trimmed_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """Yuen's trimmed-mean two-sample test (Yuen 1974) — the robust
    middle ground between welch_t (efficient, outlier-fragile) and
    mann_whitney (robust, answers a rank question): compare
    γ-trimmed MEANS with winsorized variances, so the tails can't
    drive the verdict but the estimand is still a mean.

        h = n − 2g,  g = ⌊γn⌋     (per group)
        t = (x̄_t1 − x̄_t2) / √(d₁ + d₂),
        d = (n−1)·s²_w / (h(h−1))   (winsorized variance s²_w)

    p via the normal approximation through the shared A&S erfc (the
    corpus-scale convention — df correction is vacuous at these n).
    Trimming uses EXACT rank cutoffs on the per-group distinct-value
    cumulative frame: ranks ≤ g clamp to the (g+1)-th order statistic,
    ranks > n−g clamp to the (n−g)-th — deterministic integer
    arithmetic, no quantile interpolation to diverge. Winsorized
    moments are 6 dp-decimal sums. Returns one row: (group1, group2,
    n1, n2, trimmed_mean1, trimmed_mean2, t_stat, p_value)."""
    groups = [r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()]
    if len(groups) != 2:
        raise ValueError(f"yuen_trimmed_test needs exactly 2 groups, got {groups}")
    per_v = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("val")
    ).agg(F.count(F.lit(1)).cast("long").alias("ct"))
    wg = Window.partitionBy("g").orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("g")
    cum = per_v.withColumn("cum", F.sum("ct").over(wg)).withColumn(
        "n", F.sum("ct").over(wn)
    )
    gcut = F.floor(F.lit(float(trim)) * F.col("n").cast("double")).cast("long")
    lo_rank = gcut + 1
    hi_rank = F.col("n") - gcut
    # order-statistic clamps: value at rank lo / rank hi per group
    lo_val = cum.filter(F.col("cum") >= lo_rank).groupBy("g").agg(
        F.min("val").alias("lo_v")
    )
    hi_val = cum.filter(F.col("cum") >= hi_rank).groupBy("g").agg(
        F.min("val").alias("hi_v")
    )
    start = F.col("cum") - F.col("ct") + 1
    winz = (
        cum.join(F.broadcast(lo_val), "g")
        .join(F.broadcast(hi_val), "g")
        .select(
            "g",
            "n",
            "ct",
            "cum",
            start.alias("start"),
            F.least(F.greatest(F.col("val"), F.col("lo_v")), F.col("hi_v")).alias("wv"),
            "val",
        )
    )
    # winsorized moments over ALL n rows; trimmed sum over ranks in
    # (g, n−g]: per value-block, the number of its ranks inside the
    # window is overlap([start, cum], (gcut, n−gcut])
    inside = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), hi_rank) - F.greatest(F.col("start"), lo_rank) + 1,
    )
    dec = "decimal(28,6)"
    per_g = winz.groupBy("g").agg(
        F.first("n").alias("n"),
        F.sum(F.round(F.col("wv"), 6).cast(dec) * F.col("ct")).alias("ws"),
        F.sum(
            F.round(F.col("wv"), 6).cast(dec)
            * F.round(F.col("wv"), 6).cast("decimal(18,6)")
            * F.col("ct")
        ).alias("wss"),
        F.sum(F.round(F.col("val"), 6).cast(dec) * inside).alias("ts"),
        F.sum(inside).cast("long").alias("h"),
    )
    a = per_g.filter(F.col("g") == groups[0]).select(
        F.col("n").alias("n1"), F.col("ws").alias("ws1"), F.col("wss").alias("wss1"),
        F.col("ts").alias("ts1"), F.col("h").alias("h1"),
    )
    b = per_g.filter(F.col("g") == groups[1]).select(
        F.col("n").alias("n2"), F.col("ws").alias("ws2"), F.col("wss").alias("wss2"),
        F.col("ts").alias("ts2"), F.col("h").alias("h2"),
    )
    j = a.crossJoin(b)
    def _d(nc, wsc, wssc, hc):
        n = F.col(nc).cast("double")
        h = F.col(hc).cast("double")
        wmean = F.col(wsc).cast("double") / n
        swin = (F.col(wssc).cast("double") - F.col(wsc).cast("double") * wmean) / (
            n - 1.0
        )
        return (n - 1.0) * swin / (h * (h - 1.0))

    tm1 = F.col("ts1").cast("double") / F.col("h1").cast("double")
    tm2 = F.col("ts2").cast("double") / F.col("h2").cast("double")
    t = F.round((tm1 - tm2) / F.sqrt(_d("n1", "ws1", "wss1", "h1") + _d("n2", "ws2", "wss2", "h2")), 9)
    return j.select(
        F.lit(str(groups[0])).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        "n2",
        F.round(tm1, round_digits).alias("trimmed_mean1"),
        F.round(tm2, round_digits).alias("trimmed_mean2"),
        F.round(t, round_digits).alias("t_stat"),
        F.round(_erfc_two_sided(F.abs(t)), round_digits).alias("p_value"),
    )


def theils_u(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Theil's uncertainty coefficient U(Y|X) (Theil 1970) — the
    ASYMMETRIC categorical association chi-square can't give: how
    much of Y's entropy does knowing X remove? U ∈ [0,1], and
    U(Y|X) ≠ U(X|Y) — "status predicts priority" and "priority
    predicts status" are different questions; Cramér's V answers
    neither directionally.

        U(Y|X) = (H(Y) − H(Y|X)) / H(Y) = I(X;Y)/H(Y)

    Both directions are emitted from ONE (x, y) cell frame; every
    −p·ln p summand is a ratio of exact integer counts rounded to
    9 dp before its sum (the l_diversity entropy discipline).
    Returns one row: (n, h_x, h_y, mutual_info, u_y_given_x,
    u_x_given_y)."""
    cells = df.groupBy(
        F.col(x_col).cast("string").alias("x"), F.col(y_col).cast("string").alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_total = cells.agg(F.sum("c").cast("long").alias("n"))
    dec = "decimal(38,9)"

    def _ent(frame, cnt_col, n_col="n"):
        p = F.col(cnt_col).cast("double") / F.col(n_col).cast("double")
        return F.sum(F.round(-p * F.log(p), 9).cast(dec))

    xm = cells.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    ym = cells.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    hx = xm.crossJoin(F.broadcast(n_total)).agg(_ent(None, "cx").alias("hx"))
    hy = ym.crossJoin(F.broadcast(n_total)).agg(_ent(None, "cy").alias("hy"))
    hxy = cells.crossJoin(F.broadcast(n_total)).agg(_ent(None, "c").alias("hxy"))
    out = hx.crossJoin(hy).crossJoin(hxy).crossJoin(n_total)
    hxd = F.col("hx").cast("double")
    hyd = F.col("hy").cast("double")
    mi = hxd + hyd - F.col("hxy").cast("double")
    return out.select(
        "n",
        F.round(hxd, round_digits).alias("h_x"),
        F.round(hyd, round_digits).alias("h_y"),
        F.round(mi, round_digits).alias("mutual_info"),
        F.round(F.when(hyd > 0, mi / hyd), round_digits).alias("u_y_given_x"),
        F.round(F.when(hxd > 0, mi / hxd), round_digits).alias("u_x_given_y"),
    )


def paired_permutation_test(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    n_perms: int = 500,
    salt: str = "perm",
    round_digits: int = 6,
) -> DataFrame:
    """Paired permutation (sign-flip) test on per-unit differences
    (Fisher 1935's randomization argument) — the assumption-free
    hypothesis test: under H0 the sign of each unit's difference is
    exchangeable, so the null distribution is the statistic over
    random sign patterns, no normality or variance model anywhere.

        p = (1 + #{b : |mean(s_b·d)| ≥ |mean(d)|}) / (B + 1)

    The B sign patterns are deterministic md5 draws keyed by
    (unit, salt, b) — reproducible-simulation semantics, the engine's
    standing convention — and the +1 in numerator/denominator is the
    identity permutation (guarantees p > 0, the exact-test form).
    Both sides of the ≥ compare at 9 dp-rounded values so a boundary
    ulp cannot flip the count. Scale shape: ``df`` is the PER-UNIT
    difference frame (corpus work upstream); the permutation grid is
    units × B rows — bounded by the unit frame, not the corpus — one
    groupBy over it. Returns one row: (n_units, n_perms, obs_diff,
    p_value)."""
    units = df.select(
        F.col(unit_col).cast("string").alias("u"),
        F.col(value_col).cast("double").alias("d"),
    )
    n_units = units.count()
    obs = units.agg(
        F.round(
            F.sum(F.round(F.col("d"), 9).cast("decimal(38,9)")).cast("double")
            / float(n_units),
            9,
        ).alias("obs")
    )
    spark = df.sparkSession
    perms = spark.range(int(n_perms)).select(F.col("id").alias("b"))
    from .sampling import hash_unit

    grid = units.crossJoin(perms)
    sign = F.when(
        hash_unit(F.concat(F.col("u"), F.lit("|"), F.col("b").cast("string")), salt)
        < 0.5,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    stats = grid.groupBy("b").agg(
        F.round(
            F.sum(F.round(sign * F.col("d"), 9).cast("decimal(38,9)")).cast("double")
            / float(n_units),
            9,
        ).alias("stat")
    )
    counted = stats.crossJoin(F.broadcast(obs)).agg(
        F.sum((F.abs(F.col("stat")) >= F.abs(F.col("obs"))).cast("long")).alias("ge"),
        F.first("obs").alias("obs"),
    )
    return counted.select(
        F.lit(n_units).cast("long").alias("n_units"),
        F.lit(int(n_perms)).cast("long").alias("n_perms"),
        F.round(F.col("obs"), round_digits).alias("obs_diff"),
        F.round(
            (F.col("ge").cast("double") + 1.0) / (float(n_perms) + 1.0), round_digits
        ).alias("p_value"),
    )


def iv_wald_estimate(
    df: DataFrame,
    instrument_col: str,
    treatment_col: str,
    outcome_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Instrumental-variable effect by the Wald estimator (the
    one-instrument 2SLS special case) with the first-stage strength
    check — the causal tool when treatment is self-selected and no
    stratification fixes it (did_estimate needs parallel trends,
    stratified_ate needs observed confounders; IV needs neither,
    only a valid instrument):

        β_IV = cov(z, y) / cov(z, x)
        F₁   = first-stage F = t² of x~z   (Staiger-Stock rule:
               F₁ < 10 ⇒ weak instrument, β_IV unreliable)

    Everything is a ratio of exact moments (z is 0/1, x and y are
    6 dp-quantized decimals per row before summing — the module's
    exact-moment discipline), ONE corpus aggregate. β_IV is
    NULL-guarded when cov(z,x) = 0 (irrelevant instrument). Returns
    one row: (n, beta_iv, first_stage_f, cov_zx, itt)."""
    z = F.col(instrument_col).cast("int")
    xq = F.round(F.col(treatment_col).cast("double"), 6).cast("decimal(28,6)")
    yq = F.round(F.col(outcome_col).cast("double"), 6).cast("decimal(28,6)")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(z.cast("long")).alias("nz"),
        F.sum(xq).alias("sx"),
        F.sum(yq).alias("sy"),
        F.sum(F.when(z == 1, xq)).alias("sxz"),
        F.sum(F.when(z == 1, yq)).alias("syz"),
        F.sum(xq * F.col(treatment_col).cast("decimal(18,6)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    nz = F.col("nz").cast("double")
    pz = nz / n
    # cov(z, v) = Σ_{z=1} v / n − p_z · Σv/n  (z binary)
    cov_zx = F.round(
        F.col("sxz").cast("double") / n - pz * F.col("sx").cast("double") / n, 9
    )
    cov_zy = F.round(
        F.col("syz").cast("double") / n - pz * F.col("sy").cast("double") / n, 9
    )
    var_z = pz * (1.0 - pz)
    var_x = F.col("sxx").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sx").cast("double") / n)
    # first-stage slope a = cov/var_z; F = a² var_z (n−2) / (var_x − a² var_z)
    a = cov_zx / var_z
    resid_var = var_x - a * a * var_z
    f1 = F.when(
        resid_var > 0, F.round(a * a * var_z * (n - 2.0) / resid_var, 9)
    )
    return agg.select(
        "n",
        F.round(F.when(F.abs(cov_zx) > 0, cov_zy / cov_zx), round_digits).alias(
            "beta_iv"
        ),
        F.round(f1, round_digits).alias("first_stage_f"),
        F.round(cov_zx, round_digits).alias("cov_zx"),
        F.round(cov_zy / var_z, round_digits).alias("itt"),
    )


def mediation_sobel(
    df: DataFrame,
    treatment_col: str,
    mediator_col: str,
    outcome_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Baron-Kenny mediation with the Sobel test (Baron & Kenny 1986;
    Sobel 1982) — does the treatment move the outcome THROUGH the
    mediator? Decomposes the total effect c into the indirect path
    a·b (treatment→mediator→outcome) and the direct remainder c′:

        a  = slope of m ~ t,   b = partial slope of y ~ m | t
        indirect = a·b,  c = slope of y ~ t,  c′ = c − a·b
        Sobel z  = a·b / √(b²·SE_a² + a²·SE_b²),  p via A&S erfc

    All five regressions come from ONE corpus aggregate of exact
    6 dp-quantized decimal moments (t, m, y and their products); the
    partial slope uses the standard two-regressor normal equations.
    Returns one row: (n, a, b, c_total, c_direct, indirect,
    prop_mediated, sobel_z, p_value)."""
    tq = F.round(F.col(treatment_col).cast("double"), 6).cast("decimal(28,6)")
    mq = F.round(F.col(mediator_col).cast("double"), 6).cast("decimal(28,6)")
    yq = F.round(F.col(outcome_col).cast("double"), 6).cast("decimal(28,6)")
    t6 = F.round(F.col(treatment_col).cast("double"), 6).cast("decimal(18,6)")
    m6 = F.round(F.col(mediator_col).cast("double"), 6).cast("decimal(18,6)")
    y6 = F.round(F.col(outcome_col).cast("double"), 6).cast("decimal(18,6)")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(tq).alias("st"),
        F.sum(mq).alias("sm"),
        F.sum(yq).alias("sy"),
        F.sum(tq * t6).alias("stt"),
        F.sum(mq * m6).alias("smm"),
        F.sum(yq * y6).alias("syy"),
        F.sum(tq * m6).alias("stm"),
        F.sum(tq * y6).alias("sty"),
        F.sum(mq * y6).alias("smy"),
    )
    n = F.col("n").cast("double")

    def _cov(spq, sp, sq):
        return F.round(
            F.col(spq).cast("double") / n
            - (F.col(sp).cast("double") / n) * (F.col(sq).cast("double") / n),
            9,
        )

    ctt = _cov("stt", "st", "st")
    cmm = _cov("smm", "sm", "sm")
    cyy = _cov("syy", "sy", "sy")
    ctm = _cov("stm", "st", "sm")
    cty = _cov("sty", "st", "sy")
    cmy = _cov("smy", "sm", "sy")
    a = ctm / ctt
    c = cty / ctt
    # y ~ m + t normal equations: b = (c_my·c_tt − c_ty·c_tm)/(c_mm·c_tt − c_tm²)
    det = cmm * ctt - ctm * ctm
    b = (cmy * ctt - cty * ctm) / det
    cprime = (cty * cmm - cmy * ctm) / det
    # residual variances for the SEs. The covariances above are per-n
    # (population) moments, so RSS_a = n*(cmm - a^2*ctt) and
    # sigma_a^2 = n*(cmm - a^2*ctt)/(n-2); SE_a^2 = sigma_a^2/(n*ctt).
    # The n factors cancel: SE_a^2 = (cmm - a^2*ctt)/((n-2)*ctt), and
    # likewise SE_b^2 = sigma_b^2 * ctt/(n*det) = (RSS_b/n)*ctt/((n-3)*det).
    sig_a2 = (cmm - a * a * ctt) / (n - 2.0)
    se_a2 = sig_a2 / ctt
    sig_b2 = (cyy - b * cmy - cprime * cty) / (n - 3.0)
    se_b2 = sig_b2 * ctt / det
    indirect = a * b
    sobel = F.round(indirect / F.sqrt(b * b * se_a2 + a * a * se_b2), 9)
    return agg.select(
        "n",
        F.round(a, round_digits).alias("a"),
        F.round(b, round_digits).alias("b"),
        F.round(c, round_digits).alias("c_total"),
        F.round(cprime, round_digits).alias("c_direct"),
        F.round(indirect, round_digits).alias("indirect"),
        F.round(F.when(F.abs(c) > 0, indirect / c), round_digits).alias(
            "prop_mediated"
        ),
        F.round(sobel, round_digits).alias("sobel_z"),
        F.round(_erfc_two_sided(F.abs(sobel)), round_digits).alias("p_value"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols,
    round_digits: int = 6,
) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951) — internal-consistency
    reliability of a k-item scale, the agreement family's last seat
    (κ categorical raters, ICC continuous raters, W rankings, α
    ITEMS): do the k columns measure one underlying thing?

        α = k/(k−1) · (1 − Σᵢ σ²ᵢ / σ²_total)

    with σ²_total the variance of the row-wise item SUM. All
    variances from ONE aggregate of exact 6 dp-decimal moments
    (population form, documented); the k-item sum is computed per
    row before quantization so cross-item covariance is captured
    exactly. Returns one row: (n, k_items, sum_item_var, total_var,
    alpha)."""
    k = len(item_cols)
    if k < 2:
        raise ValueError("cronbach_alpha needs at least 2 items")
    from functools import reduce as _reduce
    import operator as _op

    total = _reduce(_op.add, [F.col(c).cast("double") for c in item_cols])
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, c in enumerate(item_cols):
        q = F.round(F.col(c).cast("double"), 6).cast("decimal(28,6)")
        q6 = F.round(F.col(c).cast("double"), 6).cast("decimal(18,6)")
        aggs.append(F.sum(q).alias(f"s{i}"))
        aggs.append(F.sum(q * q6).alias(f"ss{i}"))
    tq = F.round(total, 6).cast("decimal(28,6)")
    tq6 = F.round(total, 6).cast("decimal(18,6)")
    aggs.append(F.sum(tq).alias("st"))
    aggs.append(F.sum(tq * tq6).alias("sst"))
    m = df.agg(*aggs)
    n = F.col("n").cast("double")

    def _var(s, ss):
        return F.round(
            F.col(ss).cast("double") / n
            - (F.col(s).cast("double") / n) * (F.col(s).cast("double") / n),
            9,
        )

    item_var = None
    for i in range(k):
        v = _var(f"s{i}", f"ss{i}")
        item_var = v if item_var is None else item_var + v
    tot_var = _var("st", "sst")
    return m.select(
        "n",
        F.lit(k).cast("long").alias("k_items"),
        F.round(item_var, round_digits).alias("sum_item_var"),
        F.round(tot_var, round_digits).alias("total_var"),
        F.round(
            F.when(
                tot_var > 0,
                F.lit(float(k) / (k - 1.0)) * (1.0 - item_var / tot_var),
            ),
            round_digits,
        ).alias("alpha"),
    )


def deming_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    delta: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Deming (errors-in-variables) regression — OLS assumes x is
    measured without error; when BOTH axes carry measurement noise
    (two instruments, two pipelines, two annotators scoring the same
    items) OLS attenuates the slope toward zero. Deming's maximum-
    likelihood line with error-variance ratio δ = σ²_y/σ²_x:

        b = (s_yy − δ·s_xx + √((s_yy − δ·s_xx)² + 4δ·s_xy²)) / (2 s_xy)
        a = ȳ − b·x̄

    (Deming 1943; the δ=1 case is orthogonal regression.) One
    aggregate of exact 6 dp-decimal moments (the module's mediation/
    pearson discipline); covariances rounded to 9 dp so both engines
    feed identical doubles into the closed form. Returns one row:
    (n, slope, intercept, delta, ols_slope) — the OLS slope rides
    along so the attenuation is visible."""
    xq = F.round(F.col(x_col).cast("double"), 6).cast("decimal(28,6)")
    yq = F.round(F.col(y_col).cast("double"), 6).cast("decimal(28,6)")
    x6 = F.round(F.col(x_col).cast("double"), 6).cast("decimal(18,6)")
    y6 = F.round(F.col(y_col).cast("double"), 6).cast("decimal(18,6)")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(yq).alias("sy"),
        F.sum(xq * x6).alias("sxx"),
        F.sum(yq * y6).alias("syy"),
        F.sum(xq * y6).alias("sxy"),
    )
    n = F.col("n").cast("double")

    def _cov(spq, sp, sq):
        return F.round(
            F.col(spq).cast("double") / n
            - (F.col(sp).cast("double") / n) * (F.col(sq).cast("double") / n),
            9,
        )

    cxx = _cov("sxx", "sx", "sx")
    cyy = _cov("syy", "sy", "sy")
    cxy = _cov("sxy", "sx", "sy")
    d = F.lit(float(delta))
    disc = F.sqrt((cyy - d * cxx) * (cyy - d * cxx) + 4.0 * d * cxy * cxy)
    slope = F.round(
        F.when(F.abs(cxy) > 0, (cyy - d * cxx + disc) / (2.0 * cxy)), 9
    )
    intercept = F.col("sy").cast("double") / n - slope * (
        F.col("sx").cast("double") / n
    )
    return agg.select(
        "n",
        F.round(slope, round_digits).alias("slope"),
        F.round(intercept, round_digits).alias("intercept"),
        F.round(d, round_digits).alias("delta"),
        F.round(F.when(cxx > 0, cxy / cxx), round_digits).alias("ols_slope"),
    )


def rdd_sharp(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
    round_digits: int = 6,
) -> DataFrame:
    """Sharp regression-discontinuity estimate — the causal family's
    threshold seat (q_did needs parallel trends, q_iv_wald an
    instrument; RDD needs only that treatment flips deterministically
    at a cutoff on a running score): fit y = a + b·(score − c) by OLS
    SEPARATELY within the bandwidth on each side of c, and read the
    treatment effect as the intercept jump τ = a_right − a_left
    (Imbens & Lemieux 2008, rectangular kernel). One grouped
    aggregate of exact 6 dp-decimal moments keyed by side; the
    closed-form per-side OLS replays verbatim in the oracle. Returns
    one row: (n_left, n_right, a_left, a_right, slope_left,
    slope_right, tau_rdd)."""
    c = float(cutoff)
    h = float(bandwidth)
    xr = F.col(score_col).cast("double") - F.lit(c)
    d = df.filter(
        (F.col(score_col).cast("double") >= c - h)
        & (F.col(score_col).cast("double") < c + h)
    ).select(
        F.when(F.col(score_col).cast("double") >= c, F.lit(1))
        .otherwise(F.lit(0))
        .alias("side"),
        F.round(xr, 6).cast("decimal(28,6)").alias("xq"),
        F.round(xr, 6).cast("decimal(18,6)").alias("x6"),
        F.round(F.col(outcome_col).cast("double"), 6)
        .cast("decimal(28,6)")
        .alias("yq"),
        F.round(F.col(outcome_col).cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("y6"),
    )
    per_side = d.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum(F.col("yq")).alias("sy"),
        F.sum(F.col("xq") * F.col("x6")).alias("sxx"),
        F.sum(F.col("xq") * F.col("y6")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cxx = F.round(
        F.col("sxx").cast("double") / n
        - (F.col("sx").cast("double") / n) * (F.col("sx").cast("double") / n),
        9,
    )
    cxy = F.round(
        F.col("sxy").cast("double") / n
        - (F.col("sx").cast("double") / n) * (F.col("sy").cast("double") / n),
        9,
    )
    slope = F.round(F.when(cxx > 0, cxy / cxx), 9)
    fit = per_side.select(
        "side",
        "n",
        slope.alias("b"),
        F.round(
            F.col("sy").cast("double") / n
            - slope * (F.col("sx").cast("double") / n),
            9,
        ).alias("a"),
    )
    wide = fit.groupBy().agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).cast("long").alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).cast("long").alias("n_right"),
        F.max(F.when(F.col("side") == 0, F.col("a"))).alias("a_left"),
        F.max(F.when(F.col("side") == 1, F.col("a"))).alias("a_right"),
        F.max(F.when(F.col("side") == 0, F.col("b"))).alias("slope_left"),
        F.max(F.when(F.col("side") == 1, F.col("b"))).alias("slope_right"),
    )
    return wide.select(
        "n_left",
        "n_right",
        F.round(F.col("a_left"), round_digits).alias("a_left"),
        F.round(F.col("a_right"), round_digits).alias("a_right"),
        F.round(F.col("slope_left"), round_digits).alias("slope_left"),
        F.round(F.col("slope_right"), round_digits).alias("slope_right"),
        F.round(F.col("a_right") - F.col("a_left"), round_digits).alias("tau_rdd"),
    )


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected_ratios: dict | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch check — the experimentation pipeline's
    FIRST gate (Fabijan et al., KDD 2019 practice): before reading any
    metric, verify the assignment counts match the design ratios with
    a chi-square goodness-of-fit; an SRM means the randomizer,
    logging, or bot filtering is broken and every downstream p-value
    is garbage. `expected_ratios` maps arm → design share (None =
    equal split over observed arms). Exact integer counts; chi² =
    Σ(o−e)²/e with e from the design shares; p through the module's
    Wilson-Hilferty + A&S erfc discipline (k−1 df). Returns one row:
    (n, k_arms, chi2, p_value, srm_flag) with srm_flag = p < 0.001
    (the community's standard alarm threshold)."""
    per_arm = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    if expected_ratios is not None:
        # Full-outer-join the DESIGN frame with observed counts: a
        # design arm with zero observed rows must contribute its full
        # e-sized (o-e)^2/e term, and an observed arm missing from the
        # design is a hard error (mislabeled assignment) — both cases
        # are exactly what an SRM gate exists to catch (ADVICE r10).
        total_ratio = sum(float(v) for v in expected_ratios.values())
        if abs(total_ratio - 1.0) > 1e-6:
            raise ValueError(
                f"expected_ratios must sum to 1 (got {total_ratio!r})"
            )
        design = F.broadcast(
            df.sparkSession.createDataFrame(
                [(str(k), float(v)) for k, v in expected_ratios.items()],
                "arm string, ratio double",
            )
        )
        joined = design.join(per_arm, "arm", "full_outer")
        stray = [
            r["arm"]
            for r in joined.filter(F.col("ratio").isNull())
            .select("arm")
            .collect()
        ]
        if stray:
            raise ValueError(
                "observed arm(s) not in the experiment design: "
                f"{sorted(stray)!r}"
            )
        per_arm = joined.withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    else:
        wk = Window.partitionBy()
        per_arm = per_arm.withColumn(
            "ratio", 1.0 / F.count(F.lit(1)).over(wk)
        )
    wk = Window.partitionBy()
    per_arm = per_arm.withColumn("n_tot", F.sum("o").over(wk)).withColumn(
        "e", F.round(F.col("ratio") * F.col("n_tot"), 9)
    )
    agg = per_arm.groupBy().agg(
        F.max("n_tot").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_arms"),
        F.sum(
            F.round(
                (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"),
                9,
            )
        ).alias("chi2_raw"),
    )
    chi2 = F.round(F.col("chi2_raw"), 9)
    nu = (F.col("k_arms") - 1).cast("double")
    zwh = F.round(
        (F.cbrt(chi2 / nu) - (1.0 - 2.0 / (9.0 * nu))) / F.sqrt(2.0 / (9.0 * nu)),
        9,
    )
    p_up = F.when(zwh >= 0, _erfc_two_sided(zwh) / 2.0).otherwise(
        1.0 - _erfc_two_sided(-zwh) / 2.0
    )
    return agg.select(
        "n",
        "k_arms",
        F.round(chi2, round_digits).alias("chi2"),
        F.round(p_up, round_digits).alias("p_value"),
        (p_up < 0.001).cast("int").alias("srm_flag"),
    )


def ipw_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    x1: str,
    x2: str,
    iterations: int = 6,
    lr: float = 1.0,
    clip: float = 0.01,
    round_digits: int = 6,
) -> DataFrame:
    """Inverse-propensity-weighted ATE (Horvitz-Thompson weighting
    applied to causal inference; Hajek-stabilized form) — the
    observational-confounding seat of the causal family: q_did needs
    parallel trends, q_iv_wald an instrument, q_rdd a threshold,
    stratified_ate discrete confounders; IPW handles CONTINUOUS
    confounders by modeling treatment assignment itself.

    The propensity e(x) = σ(w0 + w1·x1 + w2·x2) is fit IN-PLAN by the
    module's fixed-round full-batch GD (the mlplan.logistic_gd
    trajectory discipline: mean gradient rounded to 9 dp per round, so
    every engine walks identical weights). Propensities are clipped to
    [clip, 1−clip] (positivity), weights are Hajek-normalized per arm,
    and the effective sample sizes (Σw)²/Σw² report how much the
    weighting cost. Returns one row: (n, w0, w1, w2, ate_ipw,
    naive_diff, ess_treated, ess_control)."""
    # materialize the projected frame ONCE: every GD round and the
    # final weighting pass re-read it, and q_ipw_ate's input is itself
    # a groupBy — without the checkpoint each round would re-run that
    # upstream shuffle (6 extra shuffles for a 4-column proxy frame)
    base = df.select(
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(treat_col).cast("double").alias("t"),
        F.col(outcome_col).cast("double").alias("y"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    for _ in range(iterations):
        z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = base.crossJoin(F.broadcast(w)).agg(
            F.round(F.avg(p - F.col("t")), 9).alias("g0"),
            F.round(F.avg((p - F.col("t")) * F.col("x1")), 9).alias("g1"),
            F.round(F.avg((p - F.col("t")) * F.col("x2")), 9).alias("g2"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                (F.col("w0") - lr * F.col("g0")).alias("w0"),
                (F.col("w1") - lr * F.col("g1")).alias("w1"),
                (F.col("w2") - lr * F.col("g2")).alias("w2"),
            )
            # lazy (r12): materializes inside the next consumer job
            .localCheckpoint(eager=False)
        )
    z = F.col("w0") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
    e = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ec = F.round(
        F.least(F.greatest(e, F.lit(float(clip))), F.lit(1.0 - float(clip))), 9
    )
    wt = F.round(
        F.when(F.col("t") == 1.0, 1.0 / ec).otherwise(1.0 / (1.0 - ec)), 9
    )
    scored = base.crossJoin(F.broadcast(w)).select(
        "t", "y", "w0", "w1", "w2", wt.alias("wt")
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("w0").alias("w0"),
        F.max("w1").alias("w1"),
        F.max("w2").alias("w2"),
        F.sum(F.when(F.col("t") == 1.0, F.col("wt") * F.col("y"))).alias("swy1"),
        F.sum(F.when(F.col("t") == 1.0, F.col("wt"))).alias("sw1"),
        F.sum(F.when(F.col("t") == 1.0, F.col("wt") * F.col("wt"))).alias("sww1"),
        F.sum(F.when(F.col("t") == 0.0, F.col("wt") * F.col("y"))).alias("swy0"),
        F.sum(F.when(F.col("t") == 0.0, F.col("wt"))).alias("sw0"),
        F.sum(F.when(F.col("t") == 0.0, F.col("wt") * F.col("wt"))).alias("sww0"),
        F.avg(F.when(F.col("t") == 1.0, F.col("y"))).alias("my1"),
        F.avg(F.when(F.col("t") == 0.0, F.col("y"))).alias("my0"),
    )
    return agg.select(
        "n",
        F.round(F.col("w0"), round_digits).alias("w0"),
        F.round(F.col("w1"), round_digits).alias("w1"),
        F.round(F.col("w2"), round_digits).alias("w2"),
        F.round(
            F.col("swy1") / F.col("sw1") - F.col("swy0") / F.col("sw0"),
            round_digits,
        ).alias("ate_ipw"),
        F.round(F.col("my1") - F.col("my0"), round_digits).alias("naive_diff"),
        F.round(
            F.col("sw1") * F.col("sw1") / F.col("sww1"), round_digits
        ).alias("ess_treated"),
        F.round(
            F.col("sw0") * F.col("sw0") / F.col("sww0"), round_digits
        ).alias("ess_control"),
    )


def cox_ph_newton(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    iterations: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Cox proportional-hazards fit, single covariate, Breslow ties,
    by fixed-round NEWTON iteration entirely in-plan — the regression
    seat of the survival family (kaplan_meier describes, nelson_aalen
    accumulates, logrank_test compares two groups; Cox quantifies a
    continuous risk factor). Partial-likelihood score and information
    at β:

        U(β) = Σ_deaths [x_i − S1(t_i)/S0(t_i)]
        I(β) = Σ_deaths d_t·[S2/S0 − (S1/S0)²]
        Sk(t) = Σ_{j: T_j ≥ t} x_jᵏ·exp(β x_j)

    Each round: one exp-scoring pass collapsed to the distinct-time
    histogram (the kaplan_meier collapse — risk sets are SUFFIX
    cumulative sums over that KB-sized frame, not row-scale), one
    window, one 2-number reduce, β ← β + U/I rounded to 9 dp (the
    logistic_gd trajectory discipline). Returns one row: (n, n_events,
    beta, hazard_ratio, se_beta, z, p_value) with SE = 1/√I(β̂) from a
    final pass and p through the shared A&S erfc."""
    # materialized once: 4 Newton passes + the final pass + the count
    # agg all re-read this 3-column frame
    base = df.select(
        F.col(time_col).cast("long").alias("dur"),
        F.col(event_col).cast("int").alias("ev"),
        F.round(F.col(x_col).cast("double"), 6).alias("x"),
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    beta = spark.createDataFrame([(0.0,)], "b double")
    w_suffix = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def _pass(b_frame):
        """One scoring pass at β: per-distinct-time histogram with
        suffix risk sums; returns the (grad, hess) 1-row frame."""
        exb = F.round(F.exp(F.col("b") * F.col("x")), 9).cast("decimal(28,9)")
        x6 = F.col("x").cast("decimal(18,6)")
        u2 = F.round(F.col("x") * F.col("x"), 6).cast("decimal(18,6)")
        per_t = (
            base.crossJoin(F.broadcast(b_frame))
            .groupBy("dur")
            .agg(
                F.sum(exb).alias("c0"),
                F.sum(exb * x6).alias("c1"),
                F.sum(exb * u2).alias("c2"),
                F.sum("ev").cast("long").alias("d_t"),
                F.sum(F.when(F.col("ev") == 1, x6)).alias("sx_t"),
            )
        )
        cum = per_t.select(
            "dur",
            "d_t",
            "sx_t",
            F.round(F.sum("c0").over(w_suffix).cast("double"), 9).alias("s0"),
            F.round(F.sum("c1").over(w_suffix).cast("double"), 9).alias("s1"),
            F.round(F.sum("c2").over(w_suffix).cast("double"), 9).alias("s2"),
        ).filter(F.col("d_t") > 0)
        ratio1 = F.round(F.col("s1") / F.col("s0"), 9)
        ratio2 = F.round(F.col("s2") / F.col("s0"), 9)
        return cum.agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("sx_t").cast("double") - F.col("d_t") * ratio1, 9
                    ).cast("decimal(28,9)")
                ).cast("double"),
                9,
            ).alias("grad"),
            F.round(
                F.sum(
                    F.round(
                        F.col("d_t") * (ratio2 - ratio1 * ratio1), 9
                    ).cast("decimal(28,9)")
                ).cast("double"),
                9,
            ).alias("hess"),
        )

    for _ in range(iterations):
        gh = _pass(beta)
        beta = (
            beta.crossJoin(F.broadcast(gh))
            .select(
                F.round(
                    F.col("b")
                    + F.when(
                        F.col("hess") > 0, F.col("grad") / F.col("hess")
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("b")
            )
            # lazy (r12): materializes inside the next consumer job
            .localCheckpoint(eager=False)
        )
    final = _pass(beta)
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ev").cast("long").alias("n_events"),
    )
    out = counts.crossJoin(F.broadcast(beta)).crossJoin(F.broadcast(final))
    se = F.round(F.when(F.col("hess") > 0, 1.0 / F.sqrt(F.col("hess"))), 9)
    z = F.round(F.when(se.isNotNull(), F.col("b") / se), 9)
    return out.select(
        "n",
        "n_events",
        F.round(F.col("b"), round_digits).alias("beta"),
        F.round(F.exp(F.col("b")), round_digits).alias("hazard_ratio"),
        F.round(se, round_digits).alias("se_beta"),
        F.round(z, round_digits).alias("z"),
        F.round(
            F.when(z.isNotNull(), _erfc_two_sided(F.abs(z))), round_digits
        ).alias("p_value"),
    )


def aalen_johansen_cif(
    df: DataFrame,
    duration_col: str,
    cause_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under COMPETING
    risks (Aalen & Johansen 1978) — the estimator kaplan_meier cannot
    be: when a subject can fail from cause 1 OR cause 2 (churn vs
    upgrade, hardware vs software failure, dedup-removed vs
    quality-removed), 1−KM per cause OVERSTATES every incidence
    because it treats competing failures as censoring. The CIF for
    cause k accumulates

        CIF_k(t) = Σ_{t_i ≤ t} S(t_i^-) · d_{k,i}/n_i

    with S the ALL-CAUSE Kaplan-Meier survival just before t_i.
    `cause_col`: 0 = censored, 1..K = failure cause.

    Scale shape: the kaplan_meier collapse — one aggregation to the
    distinct-duration histogram with per-cause event counts, then
    windows over that KB-sized frame (at-risk prefix, lagged
    all-cause KM via exp-sum-ln with the exact-zero guard, cumulative
    CIF sums as 12 dp decimals). Returns one row per (duration,
    cause) with d_k > 0: (duration, cause, n_risk, d_cause, d_all,
    surv_before, cif)."""
    base = df.select(
        F.col(duration_col).cast("long").alias("dur"),
        F.col(cause_col).cast("int").alias("cause"),
    )
    hist = base.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum((F.col("cause") > 0).cast("long")).alias("d_all"),
    )
    w_ord = Window.orderBy("dur")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    n_total = base.count()
    at_risk = hist.withColumn(
        "n_risk",
        F.lit(n_total) - F.sum("c_all").over(w_cum) + F.col("c_all"),
    )
    # all-cause KM survival THROUGH each duration, then lag for S(t^-)
    ln_term = F.when(
        F.col("d_all") < F.col("n_risk"),
        F.round(
            F.log(1.0 - F.col("d_all").cast("double") / F.col("n_risk")), 12
        ),
    ).otherwise(F.lit(None))
    km = at_risk.withColumn(
        "any_zero",
        F.max((F.col("d_all") == F.col("n_risk")).cast("int")).over(w_cum),
    ).withColumn(
        "surv",
        F.when(F.col("any_zero") == 1, F.lit(0.0)).otherwise(
            F.round(
                F.exp(
                    F.sum(ln_term.cast("decimal(28,12)")).over(w_cum).cast(
                        "double"
                    )
                ),
                9,
            )
        ),
    ).withColumn(
        "surv_before", F.coalesce(F.lag("surv").over(w_ord), F.lit(1.0))
    )
    per_cause = (
        base.filter(F.col("cause") > 0)
        .groupBy("dur", "cause")
        .agg(F.count(F.lit(1)).cast("long").alias("d_cause"))
    )
    joined = per_cause.join(
        km.select("dur", "n_risk", "d_all", "surv_before"), "dur"
    )
    w_cause = (
        Window.partitionBy("cause")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inc = F.round(
        F.col("surv_before") * F.col("d_cause").cast("double") / F.col("n_risk"),
        12,
    )
    out = joined.withColumn(
        "cif",
        F.round(
            F.sum(inc.cast("decimal(28,12)")).over(w_cause).cast("double"), 9
        ),
    )
    return out.select(
        "dur",
        "cause",
        "n_risk",
        "d_cause",
        "d_all",
        F.round(F.col("surv_before"), round_digits).alias("surv_before"),
        F.round(F.col("cif"), round_digits).alias("cif"),
    ).orderBy("cause", "dur")


def _norm_cdf(z):
    """Standard-normal CDF Φ(z) through the module's A&S 7.1.26 erfc
    polynomial (_erfc_two_sided), branch split on the sign so both
    engines evaluate identical expressions."""
    return F.when(
        z >= 0, 1.0 - _erfc_two_sided(z) / 2.0
    ).otherwise(_erfc_two_sided(-z) / 2.0)


def anderson_darling_normal(
    df: DataFrame,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Anderson-Darling normality test, case 4 (mean and variance
    estimated; Anderson & Darling 1954, Stephens 1974) — the
    distribution-shape gate with the most power in the TAILS, where
    KS barely looks: metric residuals that pass KS can still fail AD
    on heavy tails, exactly the failure mode that breaks z-based
    alerting downstream.

        A² = −n − (1/n) Σᵢ (2i−1)[ln F(z₍ᵢ₎) + ln(1 − F(z₍ₙ₊₁₋ᵢ₎))]

    re-indexed so each DISTINCT VALUE carries one closed-form block
    summand: tied values occupy ranks lo..hi, and Σ(2i−1) = hi²−(lo−1)²
    and Σ(2(n−i)+1) = (2n+1)·c − (hi(hi+1) − (lo−1)·lo) are EXACT
    integer coefficients from the cumulative-count window — the
    mann_whitney value-histogram collapse, so the only window runs
    over the distinct-value frame, never the corpus. A²* = A²(1 +
    0.75/n + 2.25/n²) compares against Stephens' published 5% critical
    value 0.752. Φ via the shared erfc polynomial; F clamped to
    [1e-12, 1−1e-12] before ln so extreme z cannot produce ±inf
    (deterministic both engines). Returns one row
    (n, a2, a2_star, nonnormal_5pct)."""
    # NULL values are excluded BEFORE n is counted — an unfiltered
    # count(1) would inflate n while the moment sums skip NULLs,
    # biasing mean/variance (same contract as histogram_2d).
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.round(F.col(value_col).cast("double"), 6).alias("x")
    )
    dsum = "decimal(38,6)"
    hist = base.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    mom = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.round(F.col("x") * F.col("c"), 6).cast(dsum)).alias("s"),
        F.sum(
            F.round(F.col("x") * F.col("x") * F.col("c"), 6).cast(dsum)
        ).alias("ss"),
    )
    mean = F.round(F.col("s").cast("double") / F.col("n").cast("double"), 9)
    var = F.round(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double"),
        9,
    )
    m = mom.select("n", mean.alias("m"), var.alias("v"))
    w = Window.orderBy(F.col("x").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = hist.withColumn("hi", F.sum("c").over(w)).crossJoin(
        F.broadcast(m)
    )
    lo = F.col("hi") - F.col("c") + 1
    s1 = (F.col("hi") * F.col("hi") - (lo - 1) * (lo - 1)).cast("double")
    s2 = (
        (2 * F.col("n") + 1) * F.col("c")
        - (F.col("hi") * (F.col("hi") + 1) - (lo - 1) * lo)
    ).cast("double")
    z = F.round((F.col("x").cast("double") - F.col("m")) / F.sqrt("v"), 9)
    fz = _norm_cdf(z)
    fz_c = F.least(F.greatest(fz, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    contrib = F.round(s1 * F.log(fz_c) + s2 * F.log(1.0 - fz_c), 9)
    agg = ranked.select("n", contrib.alias("c")).groupBy("n").agg(
        F.sum(F.col("c").cast("decimal(28,9)")).alias("csum")
    )
    a2 = -F.col("n").cast("double") - F.col("csum").cast("double") / F.col(
        "n"
    ).cast("double")
    nn = F.col("n").cast("double")
    a2s = F.round(a2 * (1.0 + 0.75 / nn + 2.25 / (nn * nn)), 9)
    return agg.select(
        "n",
        F.round(a2, round_digits).alias("a2"),
        F.round(a2s, round_digits).alias("a2_star"),
        # Stephens (1974) case-4 5% critical value
        (a2s > 0.752).cast("int").alias("nonnormal_5pct"),
    )


def jarque_bera(
    df: DataFrame,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera 1980) — the
    MOMENT-based normality screen: skewness and excess kurtosis fold
    into one χ²(2) statistic, so the p-value is the exact closed form
    exp(−JB/2), no polynomial approximation at all.

        S = m₃/m₂^1.5,  K = m₄/m₂²,  JB = n/6 · (S² + (K−3)²/4)

    Scale shape: ONE map-side-combinable aggregate of exact decimal
    power sums (Σx..Σx⁴), central moments by the binomial expansion on
    the 2-row... on the single moment row, everything else scalar.
    Returns one row (n, skewness, kurtosis, jb_stat, p_value)."""
    # per-row 6 dp-quantized double powers summed as exact decimals —
    # chained DECIMAL multiplies would hit engine-specific precision
    # clamps at the 4th power; quantize-then-sum keeps both engines on
    # identical values at any aggregation order
    xd = F.round(F.col(value_col).cast("double"), 6)
    dsum = "decimal(38,6)"
    # NULLs out before n: count(1) over NULL-bearing rows would
    # inflate n while the power sums skip them (histogram_2d contract)
    mom = df.filter(F.col(value_col).isNotNull()).select(xd.alias("x")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dsum)).alias("s1"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dsum)).alias("s2"),
        F.sum(
            F.round(F.col("x") * F.col("x") * F.col("x"), 6).cast(dsum)
        ).alias("s3"),
        F.sum(
            F.round(
                F.col("x") * F.col("x") * F.col("x") * F.col("x"), 6
            ).cast(dsum)
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    # central moments from raw power sums (König-Huygens expansions)
    m2 = F.round(F.col("s2").cast("double") / n - mu * mu, 9)
    m3 = F.round(
        F.col("s3").cast("double") / n
        - 3.0 * mu * F.col("s2").cast("double") / n
        + 2.0 * mu * mu * mu,
        9,
    )
    m4 = F.round(
        F.col("s4").cast("double") / n
        - 4.0 * mu * F.col("s3").cast("double") / n
        + 6.0 * mu * mu * F.col("s2").cast("double") / n
        - 3.0 * mu * mu * mu * mu,
        9,
    )
    skew = F.round(m3 / F.pow(m2, 1.5), 9)
    kurt = F.round(m4 / (m2 * m2), 9)
    jb = F.round(
        n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 9
    )
    return mom.select(
        "n",
        F.round(skew, round_digits).alias("skewness"),
        F.round(kurt, round_digits).alias("kurtosis"),
        F.round(jb, round_digits).alias("jb_stat"),
        # χ²(2) upper tail is exactly exp(−x/2)
        F.round(F.exp(-jb / 2.0), round_digits).alias("p_value"),
    )


def durbin_watson(
    df: DataFrame,
    time_col: str,
    y_col: str,
    x_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Durbin-Watson residual-autocorrelation statistic (Durbin &
    Watson 1950) on the OLS fit y ~ a + b·x over a time-ordered frame
    — the regression-diagnostic sibling of acf_ljung_box: DW ≈ 2 means
    independent residuals, → 0 positive serial correlation (the usual
    time-series OLS sin), → 4 negative.

        DW = Σₜ (eₜ − eₜ₋₁)² / Σₜ eₜ²

    Scale shape: ONE exact-moment aggregate for the OLS coefficients,
    residuals in codegen with the 9 dp-rounded slope/intercept
    broadcast back, one lag window ordered by `time_col`, one reduce.
    Returns one row (n, slope, intercept, dw)."""
    # Rows with a NULL y, x, or t are excluded before n: the moment
    # sums would skip them anyway (biasing the fit), and a NULL t has
    # no defined position in the lag chain — Spark orders NULLs first
    # while ANSI engines default NULLS LAST, so admitting them would
    # make DW itself engine-dependent.
    base = df.filter(
        F.col(time_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(x_col).isNotNull()
    ).select(
        F.col(time_col).alias("t"),
        F.round(F.col(y_col).cast("double"), 6).alias("y"),
        F.round(F.col(x_col).cast("double"), 6).alias("x"),
    )
    dsum = "decimal(38,6)"
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dsum)).alias("sx"),
        F.sum(F.col("y").cast(dsum)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dsum)).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(dsum)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    b = F.round(F.when(cxx > 0, cxy / cxx).otherwise(F.lit(0.0)), 9)
    a = F.round(F.col("sy").cast("double") / n - b * F.col("sx").cast("double") / n, 9)
    fit = mom.select("n", b.alias("b"), a.alias("a"))
    wlag = Window.orderBy("t")
    resid = base.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        "a",
        "b",
        F.round(
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double"),
            9,
        ).alias("e"),
    )
    with_lag = resid.withColumn("e_prev", F.lag("e").over(wlag))
    agg = with_lag.groupBy("n", "a", "b").agg(
        F.sum(
            F.when(
                F.col("e_prev").isNotNull(),
                F.round(
                    (F.col("e") - F.col("e_prev"))
                    * (F.col("e") - F.col("e_prev")),
                    9,
                ).cast("decimal(28,9)"),
            )
        ).alias("num"),
        F.sum(
            F.round(F.col("e") * F.col("e"), 9).cast("decimal(28,9)")
        ).alias("den"),
    )
    return agg.select(
        "n",
        F.round(F.col("b"), round_digits).alias("slope"),
        F.round(F.col("a"), round_digits).alias("intercept"),
        F.round(
            F.when(
                F.col("den").cast("double") > 0,
                F.col("num").cast("double") / F.col("den").cast("double"),
            ),
            round_digits,
        ).alias("dw"),
    )


def tost_equivalence(
    df: DataFrame,
    group_col: str,
    value_col: str,
    delta: float,
    round_digits: int = 6,
) -> DataFrame:
    """Two-one-sided-tests equivalence (Schuirmann 1987) — the test
    that can CONFIRM "no meaningful difference", which a
    non-significant Welch t cannot (absence of evidence ≠ evidence of
    absence; the standard non-inferiority gate for a refactor/model
    swap A/B): both H₀ diff ≤ −δ and H₀ diff ≥ +δ must be rejected.

        z_lower = (d̄ + δ)/se,  z_upper = (δ − d̄)/se,
        p_tost  = max(P(Z > z_lower), P(Z > z_upper))

    Normal approximation on the Welch standard error (the module's
    welch_t_test contract — ν emitted for small-sample consumers).
    Scale shape: the welch moment aggregate + a 1-row reduce. Returns
    one row (group1, group2, n1, n2, mean_diff, se, delta, p_lower,
    p_upper, p_tost, equivalent_5pct)."""
    if delta <= 0:
        raise ValueError(f"delta must be > 0, got {delta!r}")
    groups = [
        r[0] for r in df.select(group_col).distinct().orderBy(group_col).collect()
    ]
    if len(groups) != 2:
        raise ValueError(f"tost_equivalence needs exactly 2 groups, got {groups}")
    g1 = groups[0]
    dec = "decimal(28,6)"
    # Quantize each square to 6 dp before summing (the module's
    # quantize-then-sum discipline, as in jarque_bera). Spark clamps
    # the decimal(28,6)×decimal(28,6) product to decimal(38,6) —
    # silently rounding each square to 6 dp — while an unclamped
    # oracle sum stays DECIMAL(38,12)-exact; the explicit round makes
    # the per-term quantization part of the CONTRACT so the oracle
    # can mirror it (sum(CAST(round(v*v, 6) AS DECIMAL(38,6)))).
    v6 = F.col(value_col).cast(dec)
    g = df.groupBy((F.col(group_col) == g1).alias("is1")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v6).alias("s"),
        F.sum(F.round(v6 * v6, 6).cast("decimal(38,6)")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.round(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double"),
        9,
    )
    per = g.select("is1", "n", F.round(mean, 9).alias("m"), var.alias("v"))
    wide = per.groupBy().agg(
        F.max(F.when(F.col("is1"), F.col("n"))).alias("n1"),
        F.max(F.when(~F.col("is1"), F.col("n"))).alias("n2"),
        F.max(F.when(F.col("is1"), F.col("m"))).alias("m1"),
        F.max(F.when(~F.col("is1"), F.col("m"))).alias("m2"),
        F.max(F.when(F.col("is1"), F.col("v"))).alias("v1"),
        F.max(F.when(~F.col("is1"), F.col("v"))).alias("v2"),
    )
    se = F.round(
        F.sqrt(
            F.col("v1") / F.col("n1").cast("double")
            + F.col("v2") / F.col("n2").cast("double")
        ),
        9,
    )
    d = F.round(F.col("m1") - F.col("m2"), 9)
    z_lower = F.round((d + F.lit(float(delta))) / se, 9)
    z_upper = F.round((F.lit(float(delta)) - d) / se, 9)

    def _upper_p(z):
        # P(Z > z) through the shared erfc polynomial
        return F.when(z >= 0, _erfc_two_sided(z) / 2.0).otherwise(
            1.0 - _erfc_two_sided(-z) / 2.0
        )

    p_lo = F.round(_upper_p(z_lower), 9)
    p_up = F.round(_upper_p(z_upper), 9)
    p_tost = F.greatest(p_lo, p_up)
    return wide.select(
        F.lit(str(g1)).alias("group1"),
        F.lit(str(groups[1])).alias("group2"),
        "n1",
        "n2",
        F.round(d, round_digits).alias("mean_diff"),
        F.round(se, round_digits).alias("se"),
        F.lit(float(delta)).alias("delta"),
        F.round(p_lo, round_digits).alias("p_lower"),
        F.round(p_up, round_digits).alias("p_upper"),
        F.round(p_tost, round_digits).alias("p_tost"),
        (p_tost < 0.05).cast("int").alias("equivalent_5pct"),
    )


def breusch_pagan(
    df: DataFrame,
    y_col: str,
    x_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test (Breusch & Pagan 1979,
    Koenker's studentized form) on the OLS fit y ~ a + b·x — the
    third member of the regression-diagnostic bench beside
    durbin_watson (serial correlation) and anderson_darling
    (residual shape): if residual VARIANCE grows with x, every OLS
    standard error downstream is wrong.

        LM = n · R²  of the auxiliary regression  e² ~ c + d·x,
        p  = χ²(1) upper tail = erfc(√LM / √2)   (exact for df=1)

    Scale shape: one exact-moment aggregate for the main fit, one
    residual pass with the 9 dp-rounded coefficients broadcast back,
    one exact-moment aggregate for the auxiliary fit — two corpus
    passes, no windows, no joins beyond 1-row broadcasts. Returns one
    row (n, slope, aux_r2, lm_stat, p_value, heteroscedastic_5pct)."""
    # NULL y or x rows are excluded before n is counted — the moment
    # sums skip them, so counting them would bias both fits
    # (histogram_2d contract).
    base = df.filter(
        F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        F.round(F.col(y_col).cast("double"), 6).alias("y"),
        F.round(F.col(x_col).cast("double"), 6).alias("x"),
    )
    dsum = "decimal(38,6)"
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dsum)).alias("sx"),
        F.sum(F.col("y").cast(dsum)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dsum)).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(dsum)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    b = F.round(F.when(cxx > 0, cxy / cxx).otherwise(F.lit(0.0)), 9)
    fit = mom.select(
        "n",
        b.alias("b"),
        F.round(
            F.col("sy").cast("double") / n - b * F.col("sx").cast("double") / n, 9
        ).alias("a"),
    )
    resid = base.crossJoin(F.broadcast(fit)).select(
        "n",
        "b",
        "x",
        F.round(
            (F.col("y") - F.col("a") - F.col("b") * F.col("x"))
            * (F.col("y") - F.col("a") - F.col("b") * F.col("x")),
            6,
        ).alias("e2"),
    )
    aux = resid.groupBy("n", "b").agg(
        F.sum(F.col("x").cast(dsum)).alias("sx"),
        F.sum(F.col("e2").cast(dsum)).alias("se"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dsum)).alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("e2"), 6).cast(dsum)).alias("sxe"),
        F.sum(F.round(F.col("e2") * F.col("e2"), 6).cast(dsum)).alias("see"),
    )
    axx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    axe = F.col("sxe").cast("double") - F.col("sx").cast("double") * F.col(
        "se"
    ).cast("double") / n
    aee = F.col("see").cast("double") - F.col("se").cast("double") * F.col(
        "se"
    ).cast("double") / n
    r2 = F.round(
        F.when(
            (axx > 0) & (aee > 0), (axe * axe) / (axx * aee)
        ).otherwise(F.lit(0.0)),
        9,
    )
    lm = F.round(n * r2, 9)
    p = F.round(_erfc_two_sided(F.round(F.sqrt(lm), 9)), round_digits)
    return aux.select(
        "n",
        F.round(F.col("b"), round_digits).alias("slope"),
        F.round(r2, round_digits).alias("aux_r2"),
        F.round(lm, round_digits).alias("lm_stat"),
        p.alias("p_value"),
        (p < 0.05).cast("int").alias("heteroscedastic_5pct"),
    )


def runs_test(
    df: DataFrame,
    time_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness (Wald & Wolfowitz
    1940) — the ORDER-sensitive companion of the distribution-shape
    screens (AD/JB look at WHAT values occur, Durbin-Watson at linear
    serial correlation; runs catches ANY departure from random
    ordering — clustering, oscillation, regime blocks — with no model
    at all). The series is dichotomized against its own exact median
    (values equal to the median drop, the standard treatment),
    R = number of runs of consecutive same-side values, and

        E[R] = 2·n1·n2/n + 1
        Var  = 2·n1·n2·(2·n1·n2 − n) / (n²·(n−1)),  n = n1+n2
        z    = (R − E[R]) / √Var,  p two-sided via the shared erfc

    Scale shape: the caller supplies the (already aggregate) series
    frame — one exact-percentile reduce for the median broadcast
    back, one lag window ordered by `time_col`, one reduce. NULL
    value/time rows are excluded before anything is counted (the
    module's moment-operator contract). Degenerate splits (n1 = 0 or
    n2 = 0, or n < 2) emit NULL z/p rather than a division blow-up.
    Returns one row: (n1, n2, runs, expected_runs, z_stat, p_value,
    nonrandom_5pct)."""
    base = df.filter(
        F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(time_col).alias("t"),
        F.round(F.col(value_col).cast("double"), 6).alias("x"),
    )
    med = base.agg(F.round(F.expr("percentile(x, 0.5)"), 9).alias("med"))
    signed = (
        base.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("t", (F.col("x") > F.col("med")).cast("int").alias("s"))
    )
    w = Window.orderBy("t")
    lagged = signed.withColumn("prev", F.lag("s").over(w))
    agg = lagged.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).cast("long").alias("runs"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    e = F.round(2.0 * n1 * n2 / n + 1.0, 9)
    v = F.round(
        (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0)), 9
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1)
    z = F.round((F.col("runs").cast("double") - e) / F.sqrt(v), 9)
    p = F.round(_erfc_two_sided(F.abs(z)), round_digits)
    return agg.select(
        "n1",
        "n2",
        "runs",
        F.round(F.when(ok, e), round_digits).alias("expected_runs"),
        F.round(F.when(ok & (v > 0), z), round_digits).alias("z_stat"),
        F.when(ok & (v > 0), p).alias("p_value"),
        F.when(ok & (v > 0), (p < 0.05).cast("int")).alias("nonrandom_5pct"),
    )


def fisher_exact_2x2(
    df: DataFrame,
    group_col: str,
    outcome_col: str,
    max_n: int = 10000,
    round_digits: int = 6,
) -> DataFrame:
    """Fisher's exact test for a 2×2 table (Fisher 1935) — the
    small-sample companion of chi_squared: when expected cell counts
    are small the χ² approximation lies, and the conditional
    hypergeometric p is exact at ANY n. Two-sided by the standard
    conditional method (sum the probabilities of all tables with
    pmf ≤ pmf(observed), with the usual 1e-7 relative tolerance —
    the same convention scipy documents):

        pmf(k) = C(r1,k)·C(r2,c1−k) / C(n,c1)

    Expressed RELATIONALLY: one corpus groupBy collapses rows to the
    4 cells; ln-factorials come from a running-sum window over the
    0..n integer frame (ln i rounded to 12 dp BEFORE accumulation,
    the cumulative rounded again, so both engines sum identical
    quantized values in identical order); the support k-frame
    (≤ min(r1,c1)+1 rows) computes each ln pmf in codegen and the
    two-sided mass in one reduce. Both flag columns must be
    0/1-coercible. Exact-test contract: n must stay ≤ `max_n`
    (Fisher's test is a small-sample tool; beyond that use
    chi_squared) — larger tables raise. Returns one row:
    (a, b, c, d, n, odds_ratio, p_value, significant_5pct)."""
    cells = df.groupBy(
        F.col(group_col).cast("int").alias("g"),
        F.col(outcome_col).cast("int").alias("o"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wide = cells.groupBy().agg(
        F.coalesce(
            F.max(F.when((F.col("g") == 1) & (F.col("o") == 1), F.col("cnt"))),
            F.lit(0),
        ).alias("a"),
        F.coalesce(
            F.max(F.when((F.col("g") == 1) & (F.col("o") == 0), F.col("cnt"))),
            F.lit(0),
        ).alias("b"),
        F.coalesce(
            F.max(F.when((F.col("g") == 0) & (F.col("o") == 1), F.col("cnt"))),
            F.lit(0),
        ).alias("c"),
        F.coalesce(
            F.max(F.when((F.col("g") == 0) & (F.col("o") == 0), F.col("cnt"))),
            F.lit(0),
        ).alias("d"),
    )
    marg = wide.select(
        "a", "b", "c", "d",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("c") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("c")).alias("c1"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"),
    )
    n_val = marg.select("n").collect()[0][0]  # bounded: one scalar
    if n_val > max_n:
        raise ValueError(
            f"fisher_exact_2x2 is a small-sample exact test: n={n_val} "
            f"exceeds max_n={max_n}; use chi_squared instead"
        )
    # ln k! for k = 0..n: quantize ln i to 12 dp, accumulate in index
    # order (single bounded partition), quantize the cumulative
    lnf = (
        marg.select(F.explode(F.sequence(F.lit(0), F.col("n"))).alias("i"))
        .withColumn(
            "lni",
            F.when(F.col("i") >= 2, F.round(F.log(F.col("i")), 12)).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "lf",
            F.round(
                F.sum("lni").over(
                    Window.orderBy("i").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                ),
                12,
            ),
        )
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("lf")))
            ).alias("lfs")
        )
    )
    base = marg.crossJoin(F.broadcast(lnf))

    def lf(idx):
        return F.element_at(F.col("lfs"), (idx + 1).cast("int"))["lf"]

    kmin = F.greatest(F.lit(0).cast("long"), F.col("c1") - F.col("r2"))
    kmax = F.least(F.col("r1"), F.col("c1"))
    supp = base.select(
        "a", "b", "c", "d", "n", "r1", "r2", "c1", "lfs",
        F.explode(F.sequence(kmin, kmax)).alias("k"),
    )
    denom = lf(F.col("n")) - lf(F.col("c1")) - lf(F.col("n") - F.col("c1"))

    def lnpmf(k):
        return F.round(
            lf(F.col("r1")) - lf(k) - lf(F.col("r1") - k)
            + lf(F.col("r2")) - lf(F.col("c1") - k)
            - lf(F.col("r2") - F.col("c1") + k)
            - denom,
            9,
        )

    scored = supp.select(
        "a", "b", "c", "d", "n",
        lnpmf(F.col("k")).alias("lnp"),
        lnpmf(F.col("a")).alias("lnp_obs"),
    )
    agg = scored.groupBy("a", "b", "c", "d", "n").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("lnp") <= F.col("lnp_obs") + 1e-7,
                    F.exp(F.col("lnp")),
                ).otherwise(F.lit(0.0))
            ),
            9,
        ).alias("p")
    )
    p = F.least(F.col("p"), F.lit(1.0))
    orat = F.when(
        (F.col("b") > 0) & (F.col("c") > 0),
        F.round(
            (F.col("a") * F.col("d")).cast("double")
            / (F.col("b") * F.col("c")).cast("double"),
            9,
        ),
    )
    return agg.select(
        "a", "b", "c", "d", "n",
        F.round(orat, round_digits).alias("odds_ratio"),
        F.round(p, round_digits).alias("p_value"),
        (F.round(p, round_digits) < 0.05).cast("int").alias(
            "significant_5pct"
        ),
    )
