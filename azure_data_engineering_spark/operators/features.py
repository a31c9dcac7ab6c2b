"""Feature-engineering operators for model-training pipelines.

The two standard categorical encoders that survive web-scale
cardinality, both as pure aggregation plans:

- feature hashing ("the hashing trick", Weinberger et al., ICML 2009):
  project unbounded categorical vocabularies into a FIXED bucket
  space via a hash — no vocabulary dictionary to build, broadcast, or
  keep consistent between training runs. The encoder every ad-scale
  pipeline uses, because a vocabulary over 100 TB of URLs/user-agents
  is unboundable and a dictionary join is a shuffle the hash avoids.
- target (mean) encoding with m-estimate smoothing (Micci-Barreca,
  SIGKDD Explorations 2001): replace a category with the smoothed
  mean of the target, shrinking rare categories toward the global
  prior so they don't memorize noise.

Both use the engine's portable md5 primitive / plain aggregations, so
they are deterministic across runs, partitionings, and engines — the
oracle replays them exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col_name: str, value: Column, n_buckets: int) -> Column:
    """Deterministic feature-hash bucket of one (column, value) pair:
    first 8 hex chars of md5('col=value') mod n_buckets. Namespacing
    the column name into the hash input keeps identical values in
    different columns from colliding systematically (the standard
    vowpal-style namespace trick). DuckDB twin:
    CAST('0x' || substr(md5(name || '=' || CAST(v AS VARCHAR)), 1, 8)
    AS BIGINT) % n_buckets."""
    s = F.concat(F.lit(col_name + "="), value.cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    ).cast("int")


def feature_hashing(
    df: DataFrame,
    id_col: str,
    categorical_cols: Sequence[str],
    n_buckets: int = 32,
) -> DataFrame:
    """Hashed one-hot encoding summary: every (row, column) pair
    lands in one of `n_buckets` hash buckets; the output is the
    bucket occupancy histogram (bucket, n_rows, n_distinct_values) —
    the artifact used to audit collision load before training, and
    the exact aggregation a hashed-feature trainer performs.

    One explode (width = |categorical_cols|, a constant) and one
    groupBy over an int key bounded by n_buckets — map-side combine
    collapses everything before the shuffle, so the plan is a single
    cheap pass at any corpus size. Buckets with no occupants are
    absent (count them against range(n_buckets) if a dense vector is
    needed)."""
    pairs = F.array(
        *[
            F.struct(
                hash_bucket(c, F.col(c), n_buckets).alias("bucket"),
                F.concat(F.lit(c + "="), F.col(c).cast("string")).alias("feat"),
            )
            for c in categorical_cols
        ]
    )
    ex = df.select(F.explode(pairs).alias("p")).select("p.bucket", "p.feat")
    return ex.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("feat").cast("long").alias("n_distinct_values"),
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    m: float = 20.0,
    round_digits: int = 4,
) -> DataFrame:
    """m-estimate smoothed target encoding:

        enc(c) = (sum_target(c) + m * global_mean) / (count(c) + m)

    Rare categories shrink toward the global mean (a category with
    count << m is mostly prior; count >> m is mostly its own mean) —
    the leakage-light variant every tabular pipeline uses instead of
    raw per-category means.

    ONE groupBy over the category plus a 1-row broadcast global frame;
    output is |categories| rows. Returns (category, n, raw_mean,
    encoded)."""
    # exact decimal accumulation (cast to double only after the sum):
    # float sums drift with accumulation order across engines, and the
    # smoothed encoding divides two of them
    dec = F.col(target_col).cast("decimal(18,2)")
    glob = df.agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("__gm")
    )
    per_c = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec).cast("double").alias("__s"),
    )
    return per_c.join(F.broadcast(glob)).select(
        "category",
        "n",
        F.round(F.col("__s") / F.col("n"), round_digits).alias("raw_mean"),
        F.round(
            (F.col("__s") + F.lit(m) * F.col("__gm")) / (F.col("n") + F.lit(m)),
            round_digits,
        ).alias("encoded"),
    )


def mutual_information(
    melted: DataFrame,
    feature_col: str = "feature",
    value_col: str = "value",
    label_col: str = "label",
    out_decimals: int = 9,
) -> DataFrame:
    """Mutual information I(X; Y) in bits between each candidate
    feature and a label, from ONE (feature, value, label) count
    aggregation — the model-free feature-ranking screen run before
    committing 100 TB to a training matrix (features with ~0 MI are
    dropped; suspiciously HIGH MI flags leakage).

    The input is the melted long frame (one row per original row per
    feature — stack() in the caller keeps it one scan); all marginals
    re-aggregate from the joint count table as WINDOW sums over the
    already-shuffled joint frame (partitionBy (feature,value) /
    (feature,label) / (feature)) — no marginal-join materialization,
    and the per-feature window reuses the (feature,value) exchange
    since its key is a prefix. MI terms use EXACT integer counts —
    log2((c_vl * n) / (c_v * c_l)) sees an exact integer product
    ratio, so both engines feed libm identical doubles; the sum is
    rounded to out_decimals to absorb accumulation-order drift. Also
    emits H(X) bits (the normalizer for an information-gain-ratio
    view).

    Returns one row per feature: (feature, n, mi_bits, h_bits)."""
    from pyspark.sql.window import Window

    joint = melted.groupBy(
        F.col(feature_col).alias("feature"),
        F.col(value_col).alias("value"),
        F.col(label_col).alias("label"),
    ).agg(F.count(F.lit(1)).alias("c_vl"))
    terms = joint.select(
        "feature",
        "c_vl",
        F.sum("c_vl").over(Window.partitionBy("feature", "value")).alias("c_v"),
        F.sum("c_vl").over(Window.partitionBy("feature", "label")).alias("c_l"),
        F.sum("c_vl").over(Window.partitionBy("feature")).alias("n"),
    )
    mi_term = (F.col("c_vl") / F.col("n")) * F.log2(
        (F.col("c_vl") * F.col("n")) / (F.col("c_v") * F.col("c_l"))
    )
    hx_term = (F.col("c_vl") / F.col("n")) * F.log2(F.col("c_v") / F.col("n"))
    return (
        terms.groupBy("feature")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.sum(mi_term), out_decimals).alias("mi_bits"),
            F.round(-F.sum(hx_term), out_decimals).alias("h_bits"),
        )
    )


def gain_chart(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    deciles: int = 10,
    out_decimals: int = 6,
) -> DataFrame:
    """Cumulative gain / lift chart by score decile — the campaign-
    targeting evaluation: sort by score DESCENDING, cut into
    population deciles, and report how much of the total response
    each cumulative slice captures (capture rate) and how much better
    than random each slice is (lift).

    Scale shape: rows are never globally sorted. The score collapses
    to its DISTINCT-value histogram (counts + responders per score),
    a running-sum window over that bounded grid assigns each score
    value a decile = ceil(deciles * cum_n / N) (ties share a decile —
    deterministic, no row-order dependence), and per-decile stats
    re-aggregate from the histogram. Exact integer counts feed every
    ratio. Returns one row per non-empty decile: (decile, n,
    responders, resp_rate, cum_capture, lift)."""
    from pyspark.sql import Window

    h = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("resp"),
    )
    win = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = h.agg(F.sum("cnt").alias("n_all"), F.sum("resp").alias("r_all"))
    cum = (
        h.select(
            "s", "cnt", "resp", F.sum("cnt").over(win).alias("cum_n")
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.least(
                F.ceil((F.col("cum_n") * deciles).cast("double") / F.col("n_all"))
                .cast("int"),
                F.lit(deciles),
            ),
        )
    )
    per = cum.groupBy("decile").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("resp").cast("long").alias("responders"),
        F.max("n_all").alias("n_all"),
        F.max("r_all").alias("r_all"),
    )
    win2 = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "decile",
        "n",
        "responders",
        F.round(F.col("responders") / F.col("n"), out_decimals).alias("resp_rate"),
        F.round(
            F.sum("responders").over(win2).cast("double") / F.col("r_all"),
            out_decimals,
        ).alias("cum_capture"),
        F.round(
            (F.col("responders") / F.col("n"))
            / (F.col("r_all").cast("double") / F.col("n_all")),
            out_decimals,
        ).alias("lift"),
    )


def woe_encoding(
    df: DataFrame,
    category_col: str,
    label_col: str,
    smoothing: float = 0.5,
    out_decimals: int = 6,
) -> DataFrame:
    """Weight-of-evidence encoding + information value (the credit-
    scorecard categorical transform; Siddiqi 2006):

        woe(c) = ln( ((pos_c + s) / (POS + 2s)) /
                     ((neg_c + s) / (NEG + 2s)) )
        iv(c)  = (p_pos(c) - p_neg(c)) * woe(c)

    with additive smoothing `s` on every cell so single-class
    categories stay finite. Sums of iv(c) read on the standard IV
    scale (< 0.02 useless, > 0.3 strong). The companion of
    target_encode when the label is binary and the model wants a
    monotone log-odds feature.

    ONE groupBy over the category + a 1-row broadcast totals frame;
    output is |categories| rows. `label_col` must be 0/1. All counts
    are exact integers; ln runs on fixed rationals, so both engines
    see identical operands. Returns (category, n, n_pos, n_neg, woe,
    iv)."""
    lbl = F.col(label_col).cast("long")
    per_c = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lbl).cast("long").alias("n_pos"),
        F.sum(F.lit(1) - lbl).cast("long").alias("n_neg"),
    )
    tot = per_c.agg(
        F.sum("n_pos").cast("long").alias("t_pos"),
        F.sum("n_neg").cast("long").alias("t_neg"),
    )
    s = float(smoothing)
    p_pos = (F.col("n_pos") + F.lit(s)) / (F.col("t_pos") + F.lit(2 * s))
    p_neg = (F.col("n_neg") + F.lit(s)) / (F.col("t_neg") + F.lit(2 * s))
    woe = F.log(p_pos / p_neg)
    return per_c.join(F.broadcast(tot)).select(
        "category",
        "n",
        "n_pos",
        "n_neg",
        F.round(woe, out_decimals).alias("woe"),
        F.round((p_pos - p_neg) * woe, out_decimals).alias("iv"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Quantile normalization (Bolstad et al., Bioinformatics 2003 —
    the microarray classic, equally at home aligning quality-score
    distributions across corpus sources before mixing): rank values
    within each group under a strict total order (value, id), average
    the values sharing a rank ACROSS groups, and assign every row its
    rank's cross-group mean. Afterwards every group has the identical
    value distribution — only the ordering inside each group is its
    own.

    Ranks beyond a smaller group's size simply have fewer
    contributors (mean over groups present at that rank) — the
    standard unequal-n extension. The reference frame sums exact
    decimals, divided once in double.

    Scale shape: one per-group row_number window (groups partition
    it), one rank-keyed aggregation whose output is max-group-size
    rows, one rank-keyed join back. The window spans a group's rows —
    size your groups (or pre-bucket scores) accordingly; for
    vocabulary-sized data prefer the midrank-histogram trick
    (stats.spearman_corr)."""
    from pyspark.sql import Window

    w = Window.partitionBy("group").orderBy(
        F.col("value").asc(), F.col("id").asc()
    )
    ranked = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        F.col(value_col).alias("value"),
    ).withColumn("rank", F.row_number().over(w).cast("long"))
    ref = ranked.groupBy("rank").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            round_digits,
        ).alias("normalized")
    )
    return ranked.join(ref, "rank").select(
        "id", "group", F.col("value").cast("double").alias("value"), "rank", "normalized"
    )


def qini_uplift_deciles(
    scored: DataFrame,
    score_col: str,
    treated_col: str,
    outcome_col: str,
    deciles: int = 10,
    out_decimals: int = 6,
) -> DataFrame:
    """Qini / uplift-by-decile curve (Radcliffe 2007) — the treatment-
    aware twin of gain_chart: sort by uplift score DESCENDING, cut
    into population deciles, and for each cumulative slice report the
    incremental responders the model's targeting captures over
    random:

        qini(k)   = R_T(k) − R_C(k) · N_T(k)/N_C(k)
        uplift(k) = R_T(k)/N_T(k) − R_C(k)/N_C(k)

    with R/N the cumulative responders/population per arm. gain_chart
    answers "does the score find responders"; this answers the uplift
    modeler's real question — "does it find people who respond
    BECAUSE they were treated" (a score that targets sure things
    scores high on gain and ~0 on qini).

    Scale shape: gain_chart's discipline verbatim — the corpus
    collapses to a distinct-(score)-value histogram carrying per-arm
    counts and responders, a prefix window over that bounded grid
    assigns deciles = ceil(deciles·cum_n/N) (ties share a decile, no
    row-order dependence), per-decile stats re-aggregate from the
    histogram, exact integer counts feed every ratio. Returns one row
    per non-empty decile: (decile, n, n_t, n_c, resp_t, resp_c,
    uplift, qini)."""
    from pyspark.sql import Window

    h = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(treated_col).cast("long")).alias("nt"),
        F.sum((F.col(treated_col).cast("int") * F.col(outcome_col).cast("int")).cast("long")).alias("rt"),
        F.sum(
            ((1 - F.col(treated_col).cast("int")) * F.col(outcome_col).cast("int")).cast("long")
        ).alias("rc"),
    )
    win = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = h.agg(F.sum("cnt").alias("n_all"))
    cum = (
        h.select("s", "cnt", "nt", "rt", "rc", F.sum("cnt").over(win).alias("cum_n"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.least(
                F.ceil((F.col("cum_n") * deciles).cast("double") / F.col("n_all")).cast("int"),
                F.lit(deciles),
            ),
        )
    )
    per = cum.groupBy("decile").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("nt").cast("long").alias("n_t_d"),
        F.sum("rt").cast("long").alias("r_t_d"),
        F.sum("rc").cast("long").alias("r_c_d"),
    )
    win2 = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cumd = per.select(
        "decile",
        "n",
        F.sum("n_t_d").over(win2).cast("long").alias("cn_t"),
        (F.sum("n").over(win2) - F.sum("n_t_d").over(win2)).cast("long").alias("cn_c"),
        F.sum("r_t_d").over(win2).cast("long").alias("cr_t"),
        F.sum("r_c_d").over(win2).cast("long").alias("cr_c"),
        (F.col("n_t_d")).alias("n_t"),
        (F.col("n") - F.col("n_t_d")).alias("n_c"),
        F.col("r_t_d").alias("resp_t"),
        F.col("r_c_d").alias("resp_c"),
    )
    # a cumulative slice with no control (or no treated) users yet has
    # no defined uplift — NULL, not a divide-by-zero (tiny corpora hit
    # this when the top score bucket holds a handful of one-arm users)
    both_arms = (F.col("cn_t") > 0) & (F.col("cn_c") > 0)
    rate_t = F.col("cr_t").cast("double") / F.col("cn_t").cast("double")
    rate_c = F.col("cr_c").cast("double") / F.col("cn_c").cast("double")
    qini = F.col("cr_t").cast("double") - F.col("cr_c").cast("double") * F.col(
        "cn_t"
    ).cast("double") / F.col("cn_c").cast("double")
    return cumd.select(
        "decile",
        "n",
        "n_t",
        "n_c",
        "resp_t",
        "resp_c",
        F.round(F.when(both_arms, rate_t - rate_c), out_decimals).alias("uplift"),
        F.round(F.when(both_arms, qini), out_decimals).alias("qini"),
    )
