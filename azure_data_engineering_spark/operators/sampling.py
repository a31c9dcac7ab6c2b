"""Deterministic sampling and dataset splitting — training-data
pipeline surface beyond the reference (SURVEY.md §2B "LLM-pipeline
extensions"; the reference's closest analog is its row-subset SQL,
PGHelperFunction.py:53-56).

Everything here derives from one primitive: a reproducible uniform
hash in [0, 1) computed as the first 8 hex chars of md5(id || salt).
Unlike `df.sample()` (seeded per-partition RNG — resample on every
repartition and engine-specific), this is a pure column expression:
- stable under repartitioning, retries, and AQE re-planning;
- portable — any engine with md5 reproduces the exact row set, which
  is what makes these operators oracle-checkable cross-engine;
- streaming-safe (a row's fate depends only on its key).

Scale: all operators are narrow (filter / projection) or one window
per stratum; nothing shuffles except stratified exact-k (one shuffle
on the strata keys). At 100 TB the filters push to the scan and the
hash runs in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(2**32)  # 8 hex chars of md5


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from a key column.
    DuckDB twin of the arithmetic:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || salt), 1, 8) AS BIGINT)
      / 4294967296.0"""
    s = F.concat(col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") / F.lit(HASH_SPACE)


def deterministic_sample(df: DataFrame, id_col: str | Column, fraction: float, salt: str = "") -> DataFrame:
    """Bernoulli(fraction) sample that is a pure function of the key:
    the same rows are selected on every run, engine, and partitioning.
    Change `salt` to draw an independent sample."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return df.filter(hash_unit(col, salt) < fraction)


def weighted_bernoulli(
    df: DataFrame,
    id_col: str | Column,
    weight_col: str,
    expected_k: float,
    salt: str = "",
) -> DataFrame:
    """Weight-proportional deterministic sample with ``expected_k``
    expected rows: keep a row iff
    ``hash_unit(id) < expected_k * weight / total_weight`` (capped at
    1). Heavier rows are proportionally likelier, the selected set is
    a pure function of (id, salt) — stable under repartition, retry,
    and engine — and the total-weight scalar joins in via one
    broadcast, so the operator is one agg + one scan at any scale.
    This is Poisson/Bernoulli weighted sampling (expected size, not
    exact size); for exact-k unweighted strata use
    ``stratified_sample_exact``."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    total = df.agg(F.sum(weight_col).alias("__total_w"))
    return (
        df.crossJoin(F.broadcast(total))
        .filter(
            hash_unit(col, salt)
            < F.least(F.lit(expected_k) * F.col(weight_col) / F.col("__total_w"), F.lit(1.0))
        )
        .drop("__total_w")
    )


def split_assign(
    df: DataFrame,
    id_col: str | Column,
    weights: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test/...) by
    cumulative hash thresholds — deterministic, disjoint, exhaustive.
    Weights must sum to 1 (small float tolerance)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    u = hash_unit(col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def mix_corpora(
    sources: Mapping[str, tuple[DataFrame, float]],
    id_col: str,
    salt: str = "",
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixture: keep each source's rows at its own
    rate (deterministic per-source Bernoulli; the source name salts
    the hash so draws are independent across sources), tag with the
    source name, union by name. The standard recipe for blending
    training corpora at fixed sampling rates; fully reproducible, so
    a re-run (or another engine) yields the identical mixture."""
    out = None
    for name, (df, rate) in sources.items():
        part = deterministic_sample(df, id_col, rate, salt=salt + name).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora needs at least one source")
    return out


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Frequency capping: at most `cap` rows per group (e.g. per source
    domain), chosen by deterministic hash order so the survivors are a
    uniform, reproducible draw rather than 'whichever rows came first'.

    The standard guard against a handful of mega-domains dominating a
    pretraining mixture. Same plan shape as stratified_sample_exact:
    one shuffle on the group keys, WindowGroupLimit prunes to `cap`
    rows per group during the sort, so the shuffle output — not the
    input — is what's bounded per group."""
    return stratified_sample_exact(df, group_cols, id_col, cap, salt=salt)


def shuffle_key(col: Column, salt: str = "train-order") -> Column:
    """Deterministic pseudo-random sort key for training-order
    shuffling. `df.orderBy(shuffle_key(...))` is Spark's scalable
    global sort (range-partitioned via sampling), giving a reproducible
    corpus-wide shuffle without a single-partition bottleneck."""
    return hash_unit(col, salt)


def global_sorted_index(
    df: DataFrame,
    id_col: str,
    salt: str = "train-order",
    buckets: int = 256,
    index_col: str = "train_pos",
) -> DataFrame:
    """Assign each row its 0-based position in the deterministic
    global shuffle order — without a global single-partition window.

    A naive `row_number() OVER (ORDER BY key)` collapses 100 TB into
    one task. Instead: bucket rows by the leading bits of the shuffle
    key (bucket order == key order because the key is uniform in
    [0,1)), take per-bucket row_numbers in parallel, and add each
    bucket's starting offset (exclusive running sum of bucket counts —
    a `buckets`-row aggregate, broadcast back). One shuffle on the
    bucket key; every stage is parallel."""
    key = shuffle_key(F.col(id_col), salt)
    with_key = df.withColumn("__key", key).withColumn(
        "__bucket", F.floor(F.col("__key") * buckets).cast("int")
    )
    counts = with_key.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
    offsets = counts.select(
        "__bucket",
        (
            F.sum("__cnt").over(
                Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("__offset"),
    ).fillna({"__offset": 0})
    w = Window.partitionBy("__bucket").orderBy(F.col("__key").asc(), F.col(id_col).asc())
    return (
        with_key.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "__bucket")
        .withColumn(index_col, (F.col("__offset") + F.col("__rn") - 1).cast("bigint"))
        .drop("__key", "__bucket", "__rn", "__offset")
    )


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    (deterministic, uniform within the stratum, id tiebreak). One
    shuffle on the strata keys; WindowGroupLimit keeps only k rows per
    stratum per partition during the sort."""
    w = Window.partitionBy(*strata).orderBy(
        hash_unit(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float,
    salt: str = "",
    rate_decimals: int = 12,
) -> DataFrame:
    """alpha-temperature corpus re-weighting — the standard
    multilingual/multi-source pretraining recipe (mT5, the Pile):
    re-balance sources so the sampled share of source s tends toward
    n_s^alpha / sum(n^alpha). alpha=1 keeps natural proportions;
    alpha->0 approaches uniform-per-source; alpha in (0.2, 0.7) is
    the published sweet spot for low-resource up-weighting.

    Realized as a per-source keep-rate (n_s / n_min)^(alpha-1), where
    n_min is the SMALLEST source: the smallest source keeps 100% of
    its rows (never oversampled — this operator only downsamples) and
    every larger source is thinned toward the target share. Rows are
    kept by the same deterministic md5 unit-interval draw as
    deterministic_sample, so the mixture is an exact, replayable
    function of (corpus, alpha, salt) — identical across engines,
    retries, and partitionings. Rates are rounded to rate_decimals
    before the comparison so cross-engine pow() ulp drift cannot flip
    a row at the boundary.

    Plan: one count agg over the corpus (tiny |sources|-row result),
    one 1-row min, a broadcast join of the rates back onto the corpus,
    one filter — no shuffle of the corpus itself beyond the count's
    partial agg. Returns the input rows + `keep_rate`."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        F.round(
            F.pow(F.col("__n") / F.col("__n_min"), F.lit(float(alpha) - 1.0)),
            rate_decimals,
        ).alias("keep_rate"),
    )
    out = df.join(F.broadcast(rates), source_col)
    return out.filter(
        hash_unit(F.col(id_col), salt) < F.col("keep_rate")
    )


def weighted_sample_exact_k(
    df: DataFrame,
    id_col: str | Column,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-k weighted sampling without replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row draws an exponential race key −ln(u)/w from the deterministic
    md5 unit draw; the k SMALLEST keys win. Inclusion probability is
    proportional to weight at every prefix, the chosen set is a pure
    function of (id, salt) — repartition/retry/engine-stable — and
    selection is a distributed TakeOrdered (orderBy + limit), never a
    single-partition window. The exact-k complement to
    weighted_bernoulli's expected-k: use THIS when downstream needs a
    fixed-size panel (eval sets, annotation batches).

    Rows with weight <= 0 are excluded (they cannot win a race).
    u is floored at 1e-12 so a zero draw cannot produce an infinite
    key; race keys are rounded to 9 dp with an id tiebreak so the
    boundary is engine-identical."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    u = F.greatest(hash_unit(col, salt), F.lit(1e-12))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__race", key)
        .orderBy(F.col("__race").asc(), col.asc())
        .limit(k)
        .drop("__race")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    scale: int = 6,
) -> DataFrame:
    """Neyman optimal stratified-sample allocation (Neyman 1934): for
    a fixed total budget, sample stratum h in proportion to N_h·S_h —
    variable strata earn more of the budget, (near-)constant strata
    almost none; the minimum-variance design for estimating the
    population mean, and the principled alternative to proportional
    allocation when strata differ in spread (they always do).

    Integer seats come from the largest-remainder method over the
    exact shares — floor every allocation, then hand the leftover
    seats to the largest fractional parts (tiebreak: stratum ASC) —
    so both engines land identical integers with no round-half
    convention in sight; allocations are finally capped at N_h
    (cannot sample more rows than the stratum holds). Scale shape:
    ONE corpus groupBy to per-stratum exact DECIMAL moments + a
    strata-row reduce and two windows over the strata frame. Returns
    (stratum, n_rows, stddev, alloc_exact, n_alloc)."""
    dec = f"decimal(28,{scale})"
    g = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum(F.col(value_col).cast(dec)).alias("s"),
        F.sum(F.col(value_col).cast(dec) * F.col(value_col).cast(dec)).alias("ss"),
    )
    var = F.round(
        F.when(
            F.col("nh") > 1,
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / F.col("nh").cast("double")
            )
            / (F.col("nh") - 1).cast("double"),
        ).otherwise(F.lit(0.0)),
        9,
    )
    per = g.select(
        "stratum", "nh", F.sqrt(F.greatest(var, F.lit(0.0))).alias("sh")
    ).withColumn("w", F.round(F.col("nh").cast("double") * F.col("sh"), 9))
    tot = per.agg(F.sum(F.round(F.col("w"), 9).cast("decimal(38,9)")).alias("wsum"))
    alloc = per.join(F.broadcast(tot)).withColumn(
        "exact",
        F.when(
            F.col("wsum").cast("double") > 0,
            F.round(
                F.lit(float(total_n)) * F.col("w") / F.col("wsum").cast("double"), 9
            ),
        ).otherwise(F.lit(0.0)),
    )
    base = alloc.withColumn("fl", F.floor(F.col("exact")).cast("long")).withColumn(
        "frac", F.round(F.col("exact") - F.col("fl"), 9)
    )
    leftover = base.agg(
        (F.lit(total_n) - F.sum("fl")).cast("long").alias("rem")
    )
    wr = Window.orderBy(F.col("frac").desc(), F.col("stratum").asc())
    seated = (
        base.join(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(wr))
        .withColumn(
            "n_alloc",
            F.least(
                F.col("fl") + (F.col("rk") <= F.col("rem")).cast("long"),
                F.col("nh"),
            ),
        )
    )
    return seated.select(
        "stratum",
        F.col("nh").alias("n_rows"),
        F.round("sh", scale).alias("stddev"),
        F.round("exact", scale).alias("alloc_exact"),
        "n_alloc",
    ).orderBy("stratum")


def horvitz_thompson(
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_target: int,
    salt: str = "ht",
    round_digits: int = 6,
) -> DataFrame:
    """Horvitz-Thompson total estimation from a deterministic Poisson
    πps sample (Horvitz & Thompson 1952) — the design-unbiased way to
    estimate a population total from a size-biased sample, and the
    reason πps sampling beats uniform for heavy-tailed measures: big
    units are (almost) always in, small units are up-weighted by
    1/π exactly as often as they're missed.

        π_i  = min(1, n_target · size_i / Σ size)
        ŶHT  = Σ_{sampled} y_i / π_i
        V̂    = Σ_{sampled} (1 − π_i)/π_i² · y_i²   (Poisson design)

    The draw is the engine's standing md5 unit draw (hash_unit), so
    the sample — and therefore the estimate — is a pure function of
    (keys, salt) that both engines replay. Per-row ratios round to
    6 dp DECIMALs before the sums. The TRUE total rides along (one
    exact-decimal aggregate) so the output self-audits. Totals and SE
    are emitted in MILLIONS: the exact decimal sums reach ~1e11 at
    scale, where the decimal→double conversion itself can differ by
    an ulp across engines (the anova_oneway large-magnitude lesson) —
    scaling after the cast pushes that drift far below the 6 dp
    display. Returns one row: (n_population, n_sampled, true_total_m,
    ht_estimate_m, ratio, se_m)."""
    y = F.col(size_col).cast("double")
    tot = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_population"),
        F.sum(F.col(size_col).cast("decimal(28,6)")).alias("tt"),
    )
    base = df.select(F.col(id_col).alias("id"), y.alias("y")).crossJoin(F.broadcast(tot))
    pi = F.least(
        F.lit(1.0), F.lit(float(n_target)) * F.col("y") / F.col("tt").cast("double")
    )
    sampled = base.filter(hash_unit(F.col("id"), salt) < pi)
    dec = "decimal(38,6)"
    agg = sampled.agg(
        F.first("n_population").alias("n_population"),
        F.first("tt").alias("tt"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum(F.round(F.col("y") / pi, 6).cast(dec)).alias("ht"),
        F.sum(F.round((1.0 - pi) / (pi * pi) * F.col("y") * F.col("y"), 6).cast(dec)).alias(
            "vv"
        ),
    )
    m = 1e6
    return agg.select(
        "n_population",
        "n_sampled",
        F.round(F.col("tt").cast("double") / m, round_digits).alias("true_total_m"),
        F.round(F.col("ht").cast("double") / m, round_digits).alias("ht_estimate_m"),
        F.round(F.col("ht").cast("double") / F.col("tt").cast("double"), round_digits).alias(
            "ratio"
        ),
        F.round(F.sqrt(F.col("vv").cast("double")) / m, round_digits).alias("se_m"),
    )


def ipf_raking(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    iterations: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Iterative proportional fitting / survey raking (Deming &
    Stephan 1940) — reweight a sample's (row, col) cell counts so the
    weighted marginals match known population targets: the
    post-stratification step every biased sample needs before its
    estimates mean anything (and the classic dataset-rebalancing tool
    when a corpus over-represents some source × language cell).

    Each round scales every cell by target/current for the row margin,
    then for the column margin; with strictly positive cells IPF
    converges to the unique min-KL solution. Fixed ``iterations``
    rounds with weights rounded to 9 dp per half-step (the engine's
    trajectory-pinning discipline) make the run an algebraic function
    the oracle replays. Scale shape: the corpus collapses to the cell
    frame in ONE groupBy; every round is two margin groupBys + two
    broadcast joins over THAT frame (cells × rounds work, zero corpus
    re-scans). Targets are (key, target) frames. Returns per cell:
    (row_key, col_key, n, weight, weighted_n)."""
    cells = df.groupBy(
        F.col(row_col).cast("string").alias("r"), F.col(col_col).cast("string").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rt = row_targets.select(
        F.col(row_targets.columns[0]).cast("string").alias("r"),
        F.col(row_targets.columns[1]).cast("double").alias("rt"),
    )
    ct = col_targets.select(
        F.col(col_targets.columns[0]).cast("string").alias("c"),
        F.col(col_targets.columns[1]).cast("double").alias("ct_t"),
    )
    # Targets never change across rounds — attach them to the cell
    # frame ONCE (two broadcast joins at init), and compute each
    # half-step's margin as a WINDOW sum over the same partition key
    # instead of a groupBy + broadcast-join round-trip. Per round this
    # replaces 2 margin aggregations + 4 broadcast builds + 4 joins
    # with 2 window exchanges over the cell frame; the summed terms
    # (9 dp-rounded decimals) and the scaling arithmetic are
    # unchanged, so the weight trajectory is identical. The inner
    # target joins drop unmatched cells exactly as the per-round
    # inner joins did (idempotent after round 1).
    cur = (
        cells.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .withColumn("w", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window as _W

    w_r = _W.partitionBy("r")
    w_c = _W.partitionBy("c")
    for _ in range(iterations):
        rm = F.sum(
            F.round(F.col("w") * F.col("n"), 9).cast("decimal(38,9)")
        ).over(w_r)
        cur = cur.withColumn(
            "w", F.round(F.col("w") * F.col("rt") / rm.cast("double"), 9)
        )
        cm = F.sum(
            F.round(F.col("w") * F.col("n"), 9).cast("decimal(38,9)")
        ).over(w_c)
        cur = cur.withColumn(
            "w", F.round(F.col("w") * F.col("ct_t") / cm.cast("double"), 9)
        ).localCheckpoint(eager=True)
    return cur.select(
        F.col("r").alias("row_key"),
        F.col("c").alias("col_key"),
        "n",
        F.round("w", round_digits).alias("weight"),
        F.round(F.col("w") * F.col("n"), round_digits).alias("weighted_n"),
    ).orderBy("row_key", "col_key")


def capture_recapture(
    df: DataFrame,
    id_col: str,
    p1: float = 0.3,
    p2: float = 0.3,
    salt: str = "cr",
    round_digits: int = 6,
) -> DataFrame:
    """Chapman's capture-recapture estimator (Chapman 1951, the
    bias-corrected Lincoln-Petersen) — estimate a population's TRUE
    size from two independent samples and their overlap:

        N̂ = (n₁+1)(n₂+1)/(m+1) − 1,
        V̂ = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))

    The data-engineering reading: two independent dedup/crawl passes
    each see a fraction of the true entity set; the overlap tells you
    how many entities NEITHER pass saw — an estimate of what the
    pipeline is missing without ever seeing it. Both draws are the
    standing deterministic md5 unit draws (independent salts), so the
    experiment replays exactly and the TRUE count rides along as the
    self-audit. ONE aggregate over the key frame. Returns one row:
    (n_true, n1, n2, overlap, n_hat, se, ratio)."""
    u1 = hash_unit(F.col(id_col), salt + "1") < p1
    u2 = hash_unit(F.col(id_col), salt + "2") < p2
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(u1.cast("long")).cast("long").alias("n1"),
        F.sum(u2.cast("long")).cast("long").alias("n2"),
        F.sum((u1 & u2).cast("long")).cast("long").alias("m"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m = F.col("m").cast("double")
    n_hat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var = (
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return agg.select(
        "n_true",
        "n1",
        "n2",
        F.col("m").alias("overlap"),
        F.round(n_hat, round_digits).alias("n_hat"),
        F.round(F.sqrt(var), round_digits).alias("se"),
        F.round(n_hat / F.col("n_true").cast("double"), round_digits).alias("ratio"),
    )


def unimax_allocation(
    df: DataFrame,
    source_col: str,
    token_col: str,
    budget: float,
    max_epochs: float = 4.0,
    round_digits: int = 6,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023): split a
    token budget across sources as UNIFORMLY as possible, capping
    each source at `max_epochs` passes over its data — the principled
    alternative to temperature_mix's power-law thinning (temperature
    needs a tuned α and still over-samples mid-sized sources; UniMax
    has one interpretable knob, the repeat ceiling).

    Waterfill, closed form over the SORTED source frame (no
    iteration): with sources sorted by capacity cap_s = max_epochs ·
    n_s ascending, the water level for the suffix after i capped
    sources is λ_i = (B − Σ_{j≤i} cap_j)/(K−i); the first i where
    cap_{i+1} ≥ λ_i freezes the level, and alloc_s = min(cap_s, λ).
    All from one source aggregate + prefix-sum windows — the frame is
    source-count-sized regardless of corpus size. Returns per source:
    (source, n_tokens, capacity, allocation, epochs) with epochs =
    allocation/n_tokens ≤ max_epochs; Σ allocation = min(B, Σ cap)."""
    per_s = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(token_col).cast("long")).alias("n_tokens")
    )
    capped = per_s.withColumn(
        "capacity", F.round(F.col("n_tokens") * F.lit(float(max_epochs)), 9)
    )
    w_ord = Window.orderBy("capacity", "source")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    ranked = (
        capped.withColumn("i", F.row_number().over(w_ord))
        .withColumn("k", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "cum_cap",
            F.sum(F.col("capacity").cast("decimal(28,9)")).over(w_cum).cast(
                "double"
            ),
        )
    )
    # level if every source up to AND INCLUDING i is capped (guarded:
    # undefined when i = K, the all-capped case handled by the prefix)
    lam_after = F.when(
        F.col("k") > F.col("i"),
        F.round(
            (F.lit(float(budget)) - F.col("cum_cap"))
            / (F.col("k") - F.col("i")),
            9,
        ),
    )
    # a source is capped iff its capacity <= the level computed after
    # capping the PRECEDING sources: cap_i <= lam_{i-1}, i.e. filling
    # uniformly over the remaining suffix would overflow it
    lam_before = F.round(
        (
            F.lit(float(budget))
            - (F.col("cum_cap") - F.col("capacity"))
        )
        / (F.col("k") - F.col("i") + 1),
        9,
    )
    flagged = ranked.withColumn(
        "is_capped", (F.col("capacity") <= lam_before).cast("int")
    )
    # water level = lam_after at the LAST capped index; the candidates
    # INCREASE along the capped prefix (filling a capped source frees
    # budget for the suffix), so the last is the max. 0 capped ->
    # uniform budget/k.
    level_frame = flagged.withColumn(
        "level_candidate",
        F.when(F.col("is_capped") == 1, lam_after),
    ).withColumn(
        "level",
        F.coalesce(
            F.max("level_candidate").over(w_all),
            F.lit(float(budget)) / F.col("k"),
        ),
    )
    alloc = F.round(
        F.greatest(
            F.lit(0.0), F.least(F.col("capacity"), F.col("level"))
        ),
        9,
    )
    return level_frame.select(
        "source",
        "n_tokens",
        F.round(F.col("capacity"), round_digits).alias("capacity"),
        F.round(alloc, round_digits).alias("allocation"),
        F.round(alloc / F.col("n_tokens"), round_digits).alias("epochs"),
    )
