"""Pre-flight distribution diagnostics for shuffle-heavy plans.

At 100 TB the difference between a join that finishes and one that
doesn't is usually ONE hot key: a single reducer receives |L_k|·|R_k|
work while the rest of the cluster idles. These operators produce the
evidence a pipeline author needs BEFORE committing to a shuffle — a
one-row key-skew report (top-key shares, max/mean ratio, Gini
concentration of the key histogram) and a Lorenz-curve decile frame
for value concentration (which customers carry the revenue, which
domains carry the corpus).

Plan shape discipline: every diagnostic first collapses the row-sized
input to a KEY-sized frequency frame with one map-side-combinable
groupBy; ranks and cumulative sums then run on that vocabulary-sized
frame. The only total-order window is over distinct keys — the same
"vocabulary << rows" bet the BPE trainer and novelty scorer make. All
intermediate sums are exact integers / decimals so the report is
bit-identical across engines and partitionings.

Gini from a frequency vector (Lorenz 1905; Glasser 1962 identity):
with f_1 ≤ … ≤ f_n the sorted frequencies,
G = (2·Σ i·f_i) / (n·Σ f_i) − (n+1)/n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_col: str | Column,
    top_n: int = 10,
    out_decimals: int = 6,
) -> DataFrame:
    """ONE-row skew report for a prospective join/aggregation key.

    Columns: n_rows, n_keys, max_freq, top1_share (max_freq/n_rows),
    topN_share (mass of the `top_n` hottest keys), skew_ratio
    (max/mean frequency — the straggler multiplier a uniform hash
    partitioner will see), gini (0 = perfectly uniform keys,
    →1 = all rows on one key).

    Ranks come from a single window over the KEY frame ordered
    (freq, key) — a total order, so every share is deterministic
    under ties. Σ i·f_i is summed as decimal(38,0): exact at any
    scale (HUGEINT on the SQL side)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    freqs = df.groupBy(key.alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__f")
    )
    w = Window.orderBy(F.col("__f").asc(), F.col("__k").asc())
    wd = Window.orderBy(F.col("__f").desc(), F.col("__k").desc())
    ranked = freqs.select(
        "__f",
        F.row_number().over(w).alias("__i"),
        F.row_number().over(wd).alias("__j"),
    )
    n_keys = F.count(F.lit(1)).cast("long")
    n_rows = F.sum("__f").cast("long")
    gini_num = F.sum(
        (F.col("__i").cast("decimal(38,0)") * F.col("__f").cast("decimal(38,0)"))
    ).cast("decimal(38,0)")
    return ranked.agg(
        n_rows.alias("n_rows"),
        n_keys.alias("n_keys"),
        F.max("__f").cast("long").alias("max_freq"),
        F.round(F.max("__f") / F.sum("__f"), out_decimals).alias("top1_share"),
        F.round(
            F.sum(F.when(F.col("__j") <= top_n, F.col("__f")).otherwise(F.lit(0)))
            / F.sum("__f"),
            out_decimals,
        ).alias(f"top{top_n}_share"),
        F.round(
            F.max("__f").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("__f").cast("double"),
            out_decimals,
        ).alias("skew_ratio"),
        F.round(
            F.lit(2.0) * gini_num.cast("double")
            / (n_keys.cast("double") * n_rows.cast("double"))
            - (n_keys.cast("double") + F.lit(1.0)) / n_keys.cast("double"),
            out_decimals,
        ).alias("gini"),
    )


def lorenz_deciles(
    df: DataFrame,
    id_col: str,
    value_col: Column,
    out_decimals: int = 6,
) -> DataFrame:
    """Lorenz-curve concentration frame: entities ranked ascending by
    total value, cut into 10 equal-count deciles; per decile the value
    share and cumulative share. The classic "bottom 50% of customers
    carry 4% of revenue" evidence — run on (customer, revenue),
    (domain, doc count), (token, occurrences).

    `value_col` must be an EXACT type (decimal/integer) so per-entity
    totals and decile sums are order-independent; division to shares
    happens once at the end. ntile runs on the ENTITY frame (one
    total-order window over n_entities rows — vocabulary-sized), with
    (total, id) ordering so decile boundaries are deterministic under
    ties."""
    per_entity = df.groupBy(F.col(id_col).alias("__id")).agg(
        F.sum(value_col).alias("__v")
    )
    w = Window.orderBy(F.col("__v").asc(), F.col("__id").asc())
    deciled = per_entity.select(
        "__v", F.ntile(10).over(w).alias("decile")
    )
    per_dec = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("__v").alias("__dv"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per_dec.select(
        F.col("decile").cast("long").alias("decile"),
        "n_entities",
        F.round(
            F.col("__dv").cast("double") / F.sum("__dv").over(wall).cast("double"),
            out_decimals,
        ).alias("value_share"),
        F.round(
            F.sum("__dv").over(wcum).cast("double")
            / F.sum("__dv").over(wall).cast("double"),
            out_decimals,
        ).alias("cum_share"),
    ).orderBy("decile")


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str | Column,
    right_key: str | Column,
    out_decimals: int = 6,
) -> DataFrame:
    """EXACT equi-join output cardinality WITHOUT running the join:
    |L ⋈ R| = Σ_k l_k · r_k over the two key histograms — the System-R
    estimator computed exactly, because collapsing each side to its
    key-frequency frame first makes the exact sum as cheap as any
    sketch. THE pre-flight before a 100 TB join: the histogram join is
    keys×keys (vocabulary-sized), while the join it predicts might be
    rows×rows.

    ONE row: rows/keys per side, n_common_keys, est_rows (exact
    decimal Σ l_k·r_k), max_key_rows (the hottest single key's output
    — the straggler the skew report warns about), and
    expansion_factor = est_rows / max(rows_l, rows_r) (>1 means the
    join EXPANDS — the self-join blowup case)."""
    lk = F.col(left_key) if isinstance(left_key, str) else left_key
    rk = F.col(right_key) if isinstance(right_key, str) else right_key
    lf = left.groupBy(lk.alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__lf")
    )
    rf = right.groupBy(rk.alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__rf")
    )
    l_tot = lf.agg(
        F.sum("__lf").cast("long").alias("rows_l"),
        F.count(F.lit(1)).cast("long").alias("keys_l"),
    )
    r_tot = rf.agg(
        F.sum("__rf").cast("long").alias("rows_r"),
        F.count(F.lit(1)).cast("long").alias("keys_r"),
    )
    joined = lf.join(rf, "__k").select(
        (F.col("__lf").cast("decimal(38,0)") * F.col("__rf").cast("decimal(38,0)"))
        .alias("__p")
    )
    est = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_common_keys"),
        F.coalesce(F.sum("__p"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("est_rows"),
        F.coalesce(F.max("__p"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("max_key_rows"),
    )
    return (
        est.crossJoin(F.broadcast(l_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "rows_l",
            "keys_l",
            "rows_r",
            "keys_r",
            "n_common_keys",
            F.col("est_rows").cast("long").alias("est_rows"),
            F.col("max_key_rows").cast("long").alias("max_key_rows"),
            F.round(
                F.col("est_rows").cast("double")
                / F.greatest(F.col("rows_l"), F.col("rows_r")).cast("double"),
                out_decimals,
            ).alias("expansion_factor"),
        )
    )


def join_size_ams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int = 256,
    salt: str = "ams",
    out_decimals: int = 6,
) -> DataFrame:
    """AMS / FastAGMS join-size ESTIMATE (Alon-Matias-Szegedy 1996;
    Cormode-Garofalakis 2005): |A ⋈_k B| = Σ_k f_A(k)·f_B(k) is
    estimated as Σ_b S_A[b]·S_B[b], where S[b] = Σ_rows sign(key) over
    the rows hashing to bucket b — E[estimate] is exactly the join
    size, variance shrinks with the bucket count. Unlike
    join_cardinality_estimate (which joins the two key-frequency
    frames — exact, but still a shuffle of the key vocabularies), the
    sketch needs ONE map-side-combinable pass per side and compares
    two n_buckets-row frames: at 100 TB it is the pre-flight that
    costs nothing next to the join it sizes.

    Bucket and sign come from independent md5 draws of the key, so
    both the sketch and the estimate are exact integers any engine
    reproduces bit-for-bit. Returns one row: (est_rows, exact_rows,
    rel_error) — exact_rows comes from the frequency-frame identity
    for the gate; a production pre-flight reads est_rows only."""
    def sketch(df: DataFrame, key: str) -> DataFrame:
        k = F.col(key).cast("string")
        bucket = (
            F.conv(F.substring(F.md5(F.concat(k, F.lit(salt + "b"))), 1, 8), 16, 10)
            .cast("bigint")
            % n_buckets
        )
        sign = (
            F.conv(F.substring(F.md5(F.concat(k, F.lit(salt + "s"))), 1, 8), 16, 10)
            .cast("bigint")
            % 2
        ) * 2 - 1
        return df.groupBy(bucket.alias("b")).agg(
            F.sum(sign).cast("long").alias("s")
        )
    sa = sketch(left, left_key)
    sb = sketch(right, right_key)
    est = (
        sa.join(sb.select(F.col("b"), F.col("s").alias("s2")), "b")
        .agg(
            F.coalesce(F.sum(F.col("s") * F.col("s2")), F.lit(0))
            .cast("long")
            .alias("est_rows")
        )
    )
    lf = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("f1")
    )
    rf = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("f2")
    )
    exact = lf.join(rf, "k").agg(
        F.coalesce(F.sum(F.col("f1") * F.col("f2")), F.lit(0))
        .cast("long")
        .alias("exact_rows")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_rows",
        "exact_rows",
        F.round(
            F.abs(F.col("est_rows") - F.col("exact_rows"))
            / F.greatest(F.col("exact_rows"), F.lit(1)).cast("double"),
            out_decimals,
        ).alias("rel_error"),
    )


def kneedle_point(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Knee-point detection on the rank-coverage curve (Satopää et
    al. 2011, "Kneedle", specialized to the concave-increasing
    cumulative-share curve) — the "where do diminishing returns
    start" answer behind every top-N cutoff: how many
    sources/domains/clusters carry the corpus before the tail stops
    paying?

    Groups are ranked by weight descending (ties broken by group key
    — deterministic); the curve is (rank/n, cumulative share); the
    knee is the point maximizing y_norm − x_norm (the Kneedle
    difference curve for this curve family), tie broken by the
    SMALLEST rank. Cumulative shares are ratios of exact decimal
    sums rounded to 9 dp, so the argmax is engine-stable. One corpus
    groupBy + windows over the group frame. Returns one row:
    (n_groups, knee_rank, knee_group, coverage_at_knee, max_gap)."""
    dec = "decimal(38,6)"
    g = df.groupBy(F.col(group_col).cast("string").alias("g")).agg(
        F.sum(F.round(F.col(weight_col).cast("double"), 6).cast(dec)).alias("w")
    )
    tot = g.agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).cast("long").alias("n")
    )
    wr = Window.orderBy(F.col("w").desc(), F.col("g").asc())
    wc = wr.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        g.withColumn("rk", F.row_number().over(wr))
        .withColumn("cw", F.sum("w").over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "rk",
            "n",
            F.round(
                F.col("cw").cast("double") / F.col("tw").cast("double"), 9
            ).alias("y"),
            F.round(F.col("rk").cast("double") / F.col("n").cast("double"), 9).alias(
                "x"
            ),
        )
        .withColumn("gap", F.round(F.col("y") - F.col("x"), 9))
    )
    best = ranked.orderBy(F.col("gap").desc(), F.col("rk").asc()).limit(1)
    return best.select(
        F.col("n").alias("n_groups"),
        F.col("rk").alias("knee_rank"),
        F.col("g").alias("knee_group"),
        F.round(F.col("y"), round_digits).alias("coverage_at_knee"),
        F.round(F.col("gap"), round_digits).alias("max_gap"),
    )


def herfindahl_index(
    df: DataFrame,
    market_col: str,
    firm_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market — the
    antitrust-standard companion to lorenz_deciles' Gini: HHI =
    Σ share², share = firm value / market value. Also emits the
    normalized form (HHI − 1/n)/(1 − 1/n) that is 0 for perfect
    competition at any firm count and 1 for monopoly — the cross-
    market comparable. In a data-engine context this is the corpus
    diagnostic "is one source/domain dominating this slice?" (a
    dedup or cap decision rides on it; cf. sampling.cap_per_source).

    Scale shape: one (market, firm) aggregate then one market
    aggregate — two shuffles, output market-sized. Shares are exact
    decimal-sum ratios rounded to 9 dp before squaring so both
    engines square identical doubles. Returns per market: (market,
    n_firms, total_value, hhi, hhi_normalized)."""
    per_firm = df.groupBy(
        F.col(market_col).alias("market"), F.col(firm_col).alias("firm")
    ).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("v")
    )
    wm = Window.partitionBy("market")
    shared = per_firm.withColumn("tot", F.sum("v").over(wm)).withColumn(
        "share", F.round(F.col("v").cast("double") / F.col("tot").cast("double"), 9)
    )
    agg = shared.groupBy("market").agg(
        F.count(F.lit(1)).cast("long").alias("n_firms"),
        F.max(F.col("tot").cast("double")).alias("total_value"),
        F.sum(F.round(F.col("share") * F.col("share"), 12)).alias("hhi_raw"),
    )
    n = F.col("n_firms").cast("double")
    hhi = F.round(F.col("hhi_raw"), 9)
    return agg.select(
        "market",
        "n_firms",
        F.round(F.col("total_value"), round_digits).alias("total_value"),
        F.round(hhi, round_digits).alias("hhi"),
        F.round(
            F.when(F.col("n_firms") > 1, (hhi - 1.0 / n) / (1.0 - 1.0 / n)).otherwise(
                F.lit(1.0)
            ),
            round_digits,
        ).alias("hhi_normalized"),
    )


def histogram_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_bins: int = 10,
    y_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Equal-width 2-D histogram (heatmap binning) over two numeric
    columns — the joint-distribution profile a scatter plot cannot
    deliver at corpus scale (1e11 points overplot; a bins×bins count
    grid is what the dashboard actually renders) and the visual twin
    of the mutual-information / chi-squared association operators.

    Bin edges come from the EXACT min/max (one aggregate, broadcast
    back); bin index = least(floor((v − min)/width), bins−1) so the
    max lands in the last bin, the standard convention. Empty cells
    are emitted with n=0 (the dense grid via a bins×bins cross join of
    two tiny literal frames), so the output shape is
    partitioning-independent. Degenerate axes (min == max) collapse to
    one bin. Returns x_bins·y_bins rows: (x_bin, y_bin, x_lo, x_hi,
    y_lo, y_hi, n, share)."""
    if x_bins < 1 or y_bins < 1:
        raise ValueError("bins must be >= 1")
    spark = df.sparkSession
    base = df.select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    ext = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    wx = F.round((F.col("x_max") - F.col("x_min")) / x_bins, 9)
    wy = F.round((F.col("y_max") - F.col("y_min")) / y_bins, 9)
    ext = ext.select("n_tot", "x_min", "x_max", "y_min", "y_max",
                     wx.alias("wx"), wy.alias("wy"))
    xb = F.when(F.col("wx") > 0, F.least(
        F.floor((F.col("x") - F.col("x_min")) / F.col("wx")).cast("int"),
        F.lit(x_bins - 1),
    )).otherwise(F.lit(0))
    yb = F.when(F.col("wy") > 0, F.least(
        F.floor((F.col("y") - F.col("y_min")) / F.col("wy")).cast("int"),
        F.lit(y_bins - 1),
    )).otherwise(F.lit(0))
    counts = (
        base.crossJoin(F.broadcast(ext))
        .select(xb.alias("x_bin"), yb.alias("y_bin"))
        .groupBy("x_bin", "y_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    grid = (
        spark.range(0, x_bins).select(F.col("id").cast("int").alias("x_bin"))
        .crossJoin(
            spark.range(0, y_bins).select(F.col("id").cast("int").alias("y_bin"))
        )
    )
    return (
        grid.join(counts, ["x_bin", "y_bin"], "left")
        .crossJoin(F.broadcast(ext))
        .select(
            "x_bin",
            "y_bin",
            F.round(F.col("x_min") + F.col("x_bin") * F.col("wx"), round_digits
                    ).alias("x_lo"),
            F.round(F.col("x_min") + (F.col("x_bin") + 1) * F.col("wx"),
                    round_digits).alias("x_hi"),
            F.round(F.col("y_min") + F.col("y_bin") * F.col("wy"), round_digits
                    ).alias("y_lo"),
            F.round(F.col("y_min") + (F.col("y_bin") + 1) * F.col("wy"),
                    round_digits).alias("y_hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("n_tot").cast("double"),
                round_digits,
            ).alias("share"),
        )
        .orderBy("x_bin", "y_bin")
    )
