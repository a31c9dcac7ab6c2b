"""Per-series time-series screens: rolling z-score anomalies and
Holt linear-trend smoothing.

Both operators follow the engine's series discipline: the row-sized
event stream collapses FIRST to a (series, period) aggregate frame
with one map-side-combinable groupBy — counts and exact-decimal sums
— and everything sequential then runs on the period frame, which is
bounded by series_count · periods (days, hours), not by row count.
At 100 TB the heavy lifting is the one groupBy; the per-series
recurrences touch thousands of rows, not billions.

rolling z-score (the SPC / monitoring classic): each period is scored
against the trailing W-period window EXCLUDING itself (otherwise the
anomaly dilutes its own baseline). Mean and variance come from exact
integer sums (n·Σx² − (Σx)²), so the flags are bit-identical across
engines and partitionings; sqrt is IEEE-correctly-rounded everywhere.

Holt linear smoothing (Holt 1957): level/trend recurrences
l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1},
initialized l_1 = y_1, b_1 = y_2 − y_1. A recurrence cannot be
windowed, so each series runs inside applyInPandas — safe because the
grouped frame is period-bounded (documented precondition, same as the
OHLC and attribution operators). Every step is rounded to
`round_decimals` so the Python trajectory and a SQL recursive-CTE
replay walk IDENTICAL doubles (the logistic_gd/kmeans discipline).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _round_away(x: float, decimals: int) -> float:
    """SQL-engine rounding of a double: scale by 10^d, round half
    AWAY from zero, scale back — the multiply-first convention both
    Spark's round() and DuckDB's round() implement for doubles.
    Python's built-in round() instead rounds the EXACT binary value
    half-even, which disagrees whenever the scaled product lands on a
    representable .5 (e.g. round(3.5e-6, 6)) — a divergence that
    compounds through a recurrence. Valid while |x|·10^d < 2^52."""
    p = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p


def rolling_zscore_anomalies(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    window: int = 7,
    z_threshold: float = 3.0,
    min_periods: int = 3,
    out_decimals: int = 6,
) -> DataFrame:
    """Score each (series, period) row against its trailing window.

    `per_period` must already be one row per (series, period) with an
    integer-valued `value_col` (counts; scale decimals up-front for
    money). Emits baseline_n / baseline_mean / zscore / is_anomaly;
    rows with fewer than `min_periods` trailing periods or zero
    variance get NULL zscore and FALSE is_anomaly (a flat baseline
    cannot testify)."""
    v = F.col(value_col).cast("long")
    w = (
        Window.partitionBy(series_col)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    # exact-integer variance: (n·Σx² − (Σx)²) / (n·(n−1))
    var = (n * ss - s * s).cast("double") / (n * (n - 1)).cast("double")
    mean = s.cast("double") / n.cast("double")
    z = F.when(
        (n >= min_periods) & (var > 0),
        F.round((v.cast("double") - mean) / F.sqrt(var), out_decimals),
    )
    return per_period.select(
        series_col,
        order_col,
        v.alias("n"),
        n.cast("long").alias("baseline_n"),
        F.round(mean, out_decimals).alias("baseline_mean"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def holt_linear(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
    round_decimals: int = 6,
) -> DataFrame:
    """Holt double-exponential smoothing per series; ONE output row per
    series: n_periods, level, trend, forecast (level + horizon·trend),
    sse (sum of squared one-step-ahead errors, the fit diagnostic).

    Precondition: the (series, period) frame is bounded — periods per
    series is calendar-sized. Steps are the OBSERVED periods in
    `order_col` order (gaps compress, documented). Series with a
    single period return level = y_1, trend 0, sse 0."""
    series_type = per_period.schema[series_col].dataType.simpleString()
    out_schema = (
        f"{series_col} {series_type}, n_periods long, level double, "
        "trend double, forecast double, sse double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = [float(x) for x in pdf[value_col]]
        key = pdf[series_col].iloc[0]
        if len(y) == 1:
            lev, tr, sse = y[0], 0.0, 0.0
        else:
            lev, tr, sse = y[0], y[1] - y[0], 0.0
            for t in range(1, len(y)):
                pred = lev + tr
                err = y[t] - pred
                sse = _round_away(sse + err * err, round_decimals)
                new_lev = _round_away(
                    alpha * y[t] + (1.0 - alpha) * (lev + tr), round_decimals
                )
                tr = _round_away(
                    beta * (new_lev - lev) + (1.0 - beta) * tr, round_decimals
                )
                lev = new_lev
        return pd.DataFrame(
            {
                series_col: [key],
                "n_periods": [len(y)],
                "level": [_round_away(lev, round_decimals)],
                "trend": [_round_away(tr, round_decimals)],
                "forecast": [_round_away(lev + horizon * tr, round_decimals)],
                "sse": [_round_away(sse, round_decimals)],
            }
        )

    return per_period.groupBy(series_col).applyInPandas(fit, out_schema)


def sax_symbols(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    n_segments: int = 6,
    out_decimals: int = 6,
) -> DataFrame:
    """SAX symbolic discretization (Lin, Keogh et al., DMKD 2007):
    z-normalize each series, Piecewise-Aggregate-Approximate it into
    `n_segments` equal-width segments, and map each segment mean to a
    4-letter alphabet by the standard N(0,1) breakpoints
    (−0.6745, 0, 0.6745 — the quartiles). The shape-index every
    motif/novelty search over metric series starts from.

    All inputs to the z-scores are exact integer sums (Σx, Σx², seg
    sums), so PAA values are bit-identical across engines; segment
    assignment floor((t−1)·w/n) is exact because an IEEE quotient of
    integers can only BE an integer when it is exact. Series with
    zero variance emit NULL paa_z / symbol (a flat line has no
    shape). One window for the period index, two vocabulary-sized
    aggregates; nothing row-scale is sorted globally."""
    v = F.col(value_col).cast("long")
    base = per_period.select(
        F.col(series_col).alias("__s"),
        v.alias("__v"),
        F.row_number()
        .over(Window.partitionBy(series_col).orderBy(order_col))
        .alias("__t"),
    )
    stats = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__v").alias("__sum"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    segs = (
        base.join(stats.select("__s", "__n"), "__s")
        .withColumn(
            "segment",
            (
                F.floor(
                    (F.col("__t") - 1) * F.lit(int(n_segments)) / F.col("__n")
                )
                + 1
            ).cast("long"),
        )
        .groupBy("__s", "segment")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__v").alias("__segsum"),
        )
    )
    n, s, ss = F.col("__n"), F.col("__sum"), F.col("__ss")
    mu = s.cast("double") / n.cast("double")
    var = (n * ss - s * s).cast("double") / (n * (n - 1)).cast("double")
    paa = F.when(
        var > 0,
        F.round(
            (
                F.col("__segsum").cast("double") / F.col("__cnt").cast("double")
                - mu
            )
            / F.sqrt(var),
            out_decimals,
        ),
    )
    out = segs.join(stats, "__s").select(
        F.col("__s").alias(series_col),
        "segment",
        F.col("__cnt").cast("long").alias("n_obs"),
        paa.alias("paa_z"),
        F.when(paa.isNull(), F.lit(None).cast("string"))
        .when(paa < -0.6745, F.lit("a"))
        .when(paa < 0.0, F.lit("b"))
        .when(paa < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("symbol"),
    )
    return out


def theil_sen_mann_kendall(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Robust trend per series: the Theil-Sen slope estimator (median
    of all pairwise slopes — Theil 1950, Sen 1968) plus the
    Mann-Kendall monotonic-trend test (Mann 1945, Kendall 1975) with
    the standard tie-corrected variance and continuity correction.
    The outlier-proof companion to Holt: one wild day barely moves
    either statistic.

    Pair enumeration is per-series over the PERIOD frame (bounded by
    calendar²/2, e.g. 435 pairs for 30 days — never row-scale), one
    self-join keyed on the series. Slopes are IEEE quotients of exact
    integers ranked under a (slope, t_i, t_j) total order, so the
    median order statistic is engine-identical; S and the tie term
    are exact integers. Emits per series: n_periods, sen_slope,
    mk_s, mk_z, and trend in {'increasing','decreasing','none'} at
    the 5% two-sided level (|z| > 1.96)."""
    base = per_period.select(
        F.col(series_col).alias("__s"),
        F.col(value_col).cast("long").alias("__v"),
        F.row_number()
        .over(Window.partitionBy(series_col).orderBy(order_col))
        .alias("__t"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__t") < F.col("b.__t")),
    ).select(
        F.col("a.__s").alias("__s"),
        F.col("a.__t").alias("ti"),
        F.col("b.__t").alias("tj"),
        (
            (F.col("b.__v") - F.col("a.__v")).cast("double")
            / (F.col("b.__t") - F.col("a.__t")).cast("double")
        ).alias("slope"),
        F.signum((F.col("b.__v") - F.col("a.__v")).cast("double"))
        .cast("long")
        .alias("sgn"),
    )
    wp = Window.partitionBy("__s").orderBy(
        F.col("slope").asc(), F.col("ti").asc(), F.col("tj").asc()
    )
    ranked = pairs.select(
        "__s", "slope", "sgn", F.row_number().over(wp).alias("rn")
    )
    # median of pairwise slopes: join the two middle order
    # statistics back onto the ranked frame (avg of the middles;
    # equal when the pair count is odd)
    counts = pairs.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("sgn").cast("long").alias("mk_s"),
    )
    mid = counts.select(
        "__s",
        "np",
        "mk_s",
        F.floor((F.col("np") + 1) / 2).cast("int").alias("m1"),
        (F.floor(F.col("np") / 2) + 1).cast("int").alias("m2"),
    )
    med = (
        ranked.join(mid, "__s")
        .filter((F.col("rn") == F.col("m1")) | (F.col("rn") == F.col("m2")))
        .groupBy("__s", "np", "mk_s")
        .agg(
            F.round(
                F.sum("slope") / F.countDistinct("rn").cast("double"),
                out_decimals,
            ).alias("sen_slope")
        )
    )
    # tie correction: groups of equal VALUES within a series
    ties = (
        base.groupBy("__s", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
        .filter(F.col("tp") > 1)
        .groupBy("__s")
        .agg(
            F.sum(
                F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    nper = base.groupBy("__s").agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = (
        med.join(nper, "__s")
        .join(ties, "__s", "left")
        .select(
            F.col("__s").alias(series_col),
            F.col("n").alias("n_periods"),
            "sen_slope",
            "mk_s",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.coalesce(F.col("tie_term"), F.lit(0))
                ).cast("double")
                / 18.0
            ).alias("__var"),
        )
        .select(
            series_col,
            "n_periods",
            "sen_slope",
            "mk_s",
            # fully-tied series have zero variance (every period equal)
            # — no evidence either way, z pinned to 0
            F.round(
                F.when(
                    F.col("__var") > 0,
                    (
                        F.when(
                            F.col("mk_s") > 0, (F.col("mk_s") - 1).cast("double")
                        )
                        .when(
                            F.col("mk_s") < 0, (F.col("mk_s") + 1).cast("double")
                        )
                        .otherwise(F.lit(0.0))
                    )
                    / F.sqrt(F.col("__var")),
                ).otherwise(F.lit(0.0)),
                out_decimals,
            ).alias("mk_z"),
        )
        .select(
            series_col,
            "n_periods",
            "sen_slope",
            "mk_s",
            "mk_z",
            F.when((F.col("mk_z") > 1.96), F.lit("increasing"))
            .when((F.col("mk_z") < -1.96), F.lit("decreasing"))
            .otherwise(F.lit("none"))
            .alias("trend"),
        )
    )
    return out


def holt_winters_additive(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    season_len: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    round_decimals: int = 6,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing per series
    (Winters 1960) — holt_linear plus a season_len-slot additive
    seasonal state, the operator that fits the weekly rhythm
    holt_linear's straight line cannot. ONE output row per series:
    (series, n_periods, level, trend, forecast_1, sse) where
    forecast_1 = level + trend + the next period's seasonal term and
    sse sums squared one-step-ahead errors over the smoothed steps.

    Initialization is the textbook two-season scheme, chosen for
    engine replayability: level = mean(first season), trend =
    (mean(second season) - mean(first season)) / season_len, seasonal
    slot i = y_i - level; smoothing starts at t = season_len + 1.
    Series with fewer than 2·season_len periods are NOT emitted (a
    seasonal fit from under two seasons is noise — filter upstream or
    use holt_linear). Every state write rounds half-AWAY to
    `round_decimals` (timeseries._round_away — Python's bare round is
    half-even and diverges from Spark/DuckDB), so the recursive-CTE
    oracle walks an identical trajectory.

    Scale: the same applyInPandas discipline as holt_linear — the
    per-(series, period) frame is calendar-bounded, never row-sized;
    the fit is O(n_periods) per series with season_len doubles of
    state."""
    m = int(season_len)
    series_type = per_period.schema[series_col].dataType.simpleString()
    out_schema = (
        f"{series_col} {series_type}, n_periods long, level double, "
        "trend double, forecast_1 double, sse double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = [float(x) for x in pdf[value_col]]
        n = len(y)
        if n < 2 * m:
            return pd.DataFrame(
                {
                    series_col: pd.Series([], dtype=pdf[series_col].dtype),
                    "n_periods": pd.Series([], dtype="int64"),
                    "level": pd.Series([], dtype="float64"),
                    "trend": pd.Series([], dtype="float64"),
                    "forecast_1": pd.Series([], dtype="float64"),
                    "sse": pd.Series([], dtype="float64"),
                }
            )
        key = pdf[series_col].iloc[0]
        mean1 = _round_away(sum(y[:m]) / m, round_decimals)
        mean2 = _round_away(sum(y[m : 2 * m]) / m, round_decimals)
        lev = mean1
        tr = _round_away((mean2 - mean1) / m, round_decimals)
        s = [_round_away(y[i] - mean1, round_decimals) for i in range(m)]
        sse = 0.0
        for t in range(m, n):
            slot = t % m
            pred = lev + tr + s[slot]
            err = y[t] - pred
            sse = _round_away(sse + err * err, round_decimals)
            new_lev = _round_away(
                alpha * (y[t] - s[slot]) + (1.0 - alpha) * (lev + tr),
                round_decimals,
            )
            tr = _round_away(
                beta * (new_lev - lev) + (1.0 - beta) * tr, round_decimals
            )
            s[slot] = _round_away(
                gamma * (y[t] - new_lev) + (1.0 - gamma) * s[slot],
                round_decimals,
            )
            lev = new_lev
        return pd.DataFrame(
            {
                series_col: [key],
                "n_periods": [n],
                "level": [lev],
                "trend": [tr],
                "forecast_1": [
                    _round_away(lev + tr + s[n % m], round_decimals)
                ],
                "sse": [sse],
            }
        )

    return per_period.groupBy(series_col).applyInPandas(fit, out_schema)


def acf_ljung_box(
    series: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    max_lag: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Per-series autocorrelation function r_1..r_max_lag plus the
    cumulative Ljung-Box portmanteau statistic (Ljung & Box,
    Biometrika 1978):

        r_k = Σ_{t=1..n-k} (x_t - x̄)(x_{t+k} - x̄) / Σ_t (x_t - x̄)²
        Q_k = n(n+2) Σ_{j=1..k} r_j² / (n - j)

    The "is this series white noise or does it remember itself"
    screen — seasonality shows as a spike at its period, and a large
    Q rejects independence before anyone fits a forecaster.

    Exactness: multiplying every centered term by n makes it the
    integer c_t = n·x_t - Σx; numerator and denominator both scale by
    n², so r_k is a ratio of exact DECIMAL(38,0) sums, rounded to 9 dp
    before the Q accumulation (both engines square identical doubles).

    Scale shape: `series` must already be the (group, period, value)
    aggregate frame (this module's standing discipline), so the lead()
    windows and the lag-stack explode run over series·periods rows.
    Output: (group, lag, n, acf, lb_q)."""
    s = series.select(
        F.col(group_col).alias("g"),
        F.col(t_col).alias("t"),
        F.col(v_col).cast("long").alias("x"),
    )
    tot = s.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
    )
    c = (
        s.join(F.broadcast(tot), "g")
        .select(
            "g",
            "t",
            "n",
            (F.col("n") * F.col("x") - F.col("sx")).alias("c"),
        )
    )
    w = Window.partitionBy("g").orderBy("t")
    lead_cols = [F.lead("c", k).over(w).alias(f"l{k}") for k in range(1, max_lag + 1)]
    led = c.select("g", "n", "c", *lead_cols)
    denom = led.groupBy("g").agg(
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("d")
    )
    nums = led.groupBy("g").agg(
        F.max("n").alias("n"),
        *[
            F.sum((F.col("c") * F.col(f"l{k}")).cast("decimal(38,0)")).alias(f"s{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stacked = (
        nums.join(denom, "g")
        .select(
            "g",
            "n",
            "d",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("long").alias("lag"),
                            F.col(f"s{k}").alias("num"),
                        )
                        for k in range(1, max_lag + 1)
                    ]
                )
            ).alias("kv"),
        )
        .select(
            "g",
            "n",
            F.col("kv.lag").alias("lag"),
            F.round(
                F.col("kv.num").cast("double") / F.col("d").cast("double"), 9
            ).alias("acf9"),
        )
        .filter(F.col("lag") < F.col("n"))
    )
    wq = Window.partitionBy("g").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # each Q summand is rounded to a 12 dp DECIMAL before the window
    # sum: windowed double sums are accumulation-order-dependent across
    # engines (segment trees vs sequential), exact decimals are not
    summand = F.round(
        F.col("acf9") * F.col("acf9") / (F.col("n") - F.col("lag")).cast("double"),
        12,
    ).cast("decimal(20,12)")
    q = (
        F.col("n").cast("double")
        * (F.col("n") + 2).cast("double")
        * F.sum(summand).over(wq).cast("double")
    )
    return stacked.select(
        F.col("g").alias("group"),
        "lag",
        "n",
        F.round("acf9", round_digits).alias("acf"),
        F.round(q, round_digits).alias("lb_q"),
    )


def seasonal_naive_eval(
    series: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    season: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster x̂_t = x_{t-season}
    (the Hyndman-recommended baseline every real model must beat):
    per series, MAE, RMSE and sMAPE over every period with a
    season-old ancestor. Run this BEFORE shipping any forecaster — a
    model that can't beat "same day last week" is negative value.

    Exactness: errors are integer differences; |e| and e² sum as
    exact integers, sMAPE summands round to 12 dp decimals so the
    mean is accumulation-order-free; the 2|e|/(|x|+|x̂|) term is 0 by
    convention when both sides are 0. Same series discipline as the
    rest of this module: input is the (group, period, value) frame.
    Output: (group, n_eval, mae, rmse, smape)."""
    s = series.select(
        F.col(group_col).alias("g"),
        F.col(t_col).alias("t"),
        F.col(v_col).cast("long").alias("x"),
    )
    w = Window.partitionBy("g").orderBy("t")
    e = (
        s.withColumn("f", F.lag("x", season).over(w))
        .filter(F.col("f").isNotNull())
        .select(
            "g",
            (F.col("x") - F.col("f")).alias("e"),
            F.col("x"),
            F.col("f"),
        )
    )
    smape_term = F.when(
        F.abs(F.col("x")) + F.abs(F.col("f")) > 0,
        F.round(
            2.0
            * F.abs(F.col("e")).cast("double")
            / (F.abs(F.col("x")) + F.abs(F.col("f"))).cast("double"),
            12,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(20,12)")
    return e.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(
            F.sum(F.abs("e")).cast("double") / F.count(F.lit(1)),
            round_digits,
        ).alias("mae"),
        F.round(
            F.sqrt(
                F.sum((F.col("e") * F.col("e")).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ),
            round_digits,
        ).alias("rmse"),
        F.round(
            F.sum(smape_term).cast("double") / F.count(F.lit(1)),
            round_digits,
        ).alias("smape"),
    ).select(F.col("g").alias("group"), "n_eval", "mae", "rmse", "smape")


def seasonal_decompose_ma(
    series: DataFrame,
    t_col: str,
    v_col: str,
    period: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition by moving averages
    (the Macaulay/census 'method 1' every stats package ships as
    `seasonal_decompose`): trend = centered `period`-point MA,
    seasonal index = mean of the detrended values per position in the
    period, re-centered to sum 0, residual = value − trend − seasonal.
    `period` must be odd (the centered window is symmetric).

    Scale discipline: `series` is already the per-period aggregate
    frame (this module's standing rule), so every window runs over
    series-length rows. Exactness: values enter as exact longs; the
    trend is an exact integer sum / period rounded to 9 dp; detrended
    values and the seasonal means are 9 dp decimals, so both engines
    aggregate identical numbers. Rows without a full centered window
    have NULL trend/seasonal/residual (the standard edge behavior).
    Returns (t, value, trend, seasonal, residual)."""
    if period % 2 == 0:
        raise ValueError("period must be odd for a centered moving average")
    half = period // 2
    s = series.select(
        F.col(t_col).alias("t"), F.col(v_col).cast("long").alias("v")
    )
    w = Window.orderBy("t").rowsBetween(-half, half)
    wn = Window.orderBy("t")
    trended = (
        s.withColumn("w_n", F.count(F.lit(1)).over(w))
        .withColumn("w_sum", F.sum("v").over(w))
        .withColumn("pos", (F.row_number().over(wn) - 1) % period)
        .withColumn(
            "trend9",
            F.when(
                F.col("w_n") == period,
                F.round(
                    F.col("w_sum").cast("double") / F.lit(float(period)), 9
                ).cast("decimal(20,9)"),
            ),
        )
        .withColumn(
            "detr",
            F.when(
                F.col("trend9").isNotNull(),
                (F.col("v").cast("decimal(20,9)") - F.col("trend9")).cast(
                    "decimal(20,9)"
                ),
            ),
        )
    )
    per_pos = trended.filter(F.col("detr").isNotNull()).groupBy("pos").agg(
        F.round(F.sum("detr").cast("double") / F.count(F.lit(1)), 9)
        .cast("decimal(20,9)")
        .alias("s_raw"),
    )
    center = per_pos.agg(
        F.round(F.sum("s_raw").cast("double") / F.count(F.lit(1)), 9)
        .cast("decimal(20,9)")
        .alias("s_mean")
    )
    seasonal = per_pos.join(F.broadcast(center)).select(
        "pos", (F.col("s_raw") - F.col("s_mean")).alias("seas9")
    )
    out = trended.join(F.broadcast(seasonal), "pos", "left")
    return out.select(
        "t",
        F.col("v").alias("value"),
        F.round(F.col("trend9").cast("double"), round_digits).alias("trend"),
        F.when(
            F.col("trend9").isNotNull(),
            F.round(F.col("seas9").cast("double"), round_digits),
        ).alias("seasonal"),
        F.when(
            F.col("trend9").isNotNull(),
            F.round(
                (F.col("detr") - F.col("seas9")).cast("double"), round_digits
            ),
        ).alias("residual"),
    ).orderBy("t")


def cross_correlation(
    series: DataFrame,
    t_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Cross-correlation function between two aligned series — the
    lead-lag discovery tool acf can't provide: ccf(k) > 0 at k=3 means
    x today co-moves with y three periods LATER (x leads y). For each
    lag k in -max_lag..max_lag,

        ccf(k) = Σ_t c_x(t)·c_y(t+k) / sqrt(Σ c_x² · Σ c_y²)

    with the standard full-series variance normalization.

    Exactness: the acf trick — multiplying each centered term by n
    makes it the exact integer c(t) = n·v(t) − Σv; numerator and the
    two variance sums all scale by n², so every ccf is a ratio of
    exact DECIMAL(38,0) sums. Scale discipline: `series` is the
    per-period AGGREGATE frame; the lead/lag windows run over its
    length only. Returns (lag, ccf)."""
    s = series.select(
        F.col(t_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    c = s.join(F.broadcast(tot)).select(
        "t",
        (F.col("n") * F.col("x") - F.col("sx")).alias("cx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("cy"),
    )
    w = Window.orderBy("t")
    lags = list(range(-max_lag, max_lag + 1))
    led = c.select(
        "cx",
        "cy",
        *[
            (
                F.lead("cy", k).over(w) if k >= 0 else F.lag("cy", -k).over(w)
            ).alias(f"cy_{k + max_lag}")
            for k in lags
        ],
    )
    dec = "decimal(38,0)"
    sums = led.agg(
        F.sum((F.col("cx") * F.col("cx")).cast(dec)).alias("dxx"),
        F.sum((F.col("cy") * F.col("cy")).cast(dec)).alias("dyy"),
        *[
            F.sum((F.col("cx") * F.col(f"cy_{k + max_lag}")).cast(dec)).alias(
                f"s_{k + max_lag}"
            )
            for k in lags
        ],
    )
    den = F.sqrt(F.col("dxx").cast("double") * F.col("dyy").cast("double"))
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("long").alias("lag"),
                    F.when(
                        den > 0,
                        F.round(F.col(f"s_{k + max_lag}").cast("double") / den, round_digits),
                    ).alias("ccf"),
                )
                for k in lags
            ]
        )
    ).alias("kv")
    return sums.select(kv).select(F.col("kv.lag").alias("lag"), F.col("kv.ccf").alias("ccf"))


def hampel_filter(
    per_period: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    half_window: int = 3,
    n_sigmas: float = 3.0,
    out_decimals: int = 6,
) -> DataFrame:
    """Hampel despiking filter (Hampel 1974; Pearson et al. 2016): flag
    each point whose deviation from its CENTERED rolling median
    exceeds n_sigmas × 1.4826 × rolling MAD, and emit the median as
    the replacement value — the robust twin of
    rolling_zscore_anomalies (mean/std get dragged by the very spike
    being hunted; median/MAD do not, so Hampel catches isolated
    telemetry spikes a z-screen under-scores).

    The window MAD is median(|x_j − med_i|) where med_i is THIS
    window's median — the deviations depend on the center row's own
    window, so this cannot be two stacked window aggregates: instead
    the bounded (2·half_window+1)-element window is collected per row
    and the two medians are computed with in-row array HOFs
    (sort + middle pick, even counts average the two middles ×
    exactly — the engine-portable convention). `per_period` must
    already be one row per (series, period) — the module's standing
    aggregate-frame discipline, so the collected arrays are bounded
    by construction (≤ 7 elements at the default), never corpus rows.
    Rows whose window holds fewer than half_window+1 points, or whose
    MAD is 0, emit NULL score / FALSE is_spike. Returns (series,
    order, value, window_n, median, mad, score, is_spike,
    replacement)."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(order_col)
        .rowsBetween(-half_window, half_window)
    )
    v = F.col(value_col).cast("double")
    arr = F.sort_array(F.collect_list(v).over(w))
    n = F.size(arr)

    def _median(sorted_arr, cnt):
        mid = (cnt / 2).cast("int")
        return F.when(
            cnt % 2 == 1, F.element_at(sorted_arr, mid + 1)
        ).otherwise(
            (F.element_at(sorted_arr, mid) + F.element_at(sorted_arr, mid + 1)) / 2.0
        )

    base = per_period.select(
        F.col(series_col).alias("series"),
        F.col(order_col).alias("ord"),
        v.alias("value"),
        arr.alias("__w"),
        n.alias("window_n"),
    ).withColumn("median", _median(F.col("__w"), F.col("window_n")))
    dev = F.sort_array(
        F.transform(F.col("__w"), lambda x: F.abs(x - F.col("median")))
    )
    scored = base.withColumn("mad", _median(dev, F.col("window_n")))
    # 1.4826 ≈ 1/Φ⁻¹(3/4): scales MAD to a consistent σ estimate
    sigma = F.round(F.lit(1.4826) * F.col("mad"), 9)
    score = F.when(
        (F.col("window_n") >= half_window + 1) & (sigma > 0),
        F.round(F.abs(F.col("value") - F.col("median")) / sigma, out_decimals),
    )
    return scored.select(
        "series",
        "ord",
        "value",
        "window_n",
        F.round(F.col("median"), out_decimals).alias("median"),
        F.round(F.col("mad"), out_decimals).alias("mad"),
        score.alias("score"),
        F.coalesce(score > n_sigmas, F.lit(False)).alias("is_spike"),
        F.round(
            F.when(
                F.coalesce(score > n_sigmas, F.lit(False)), F.col("median")
            ).otherwise(F.col("value")),
            out_decimals,
        ).alias("replacement"),
    )


def granger_lag1_f(
    series: DataFrame,
    t_col: str,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Lag-1 Granger-causality F test (Granger 1969): does knowing
    yesterday's x improve today's y forecast beyond yesterday's y?
    Regress y_t on (1, y_{t−1}, x_{t−1}) and compare against the
    restricted fit on (1, y_{t−1}):

        F = (SSE_r − SSE_u) / (SSE_u / (n−3))

    — the hypothesis-test companion to cross_correlation: ccf(k) says
    x LEADS y, Granger says whether that lead adds predictive
    information. One restriction ⇒ F = t², so the large-sample
    p-value is the module's standing normal approximation
    erfc(√(F/2)) (documented; per-period frames here have n in the
    hundreds+ where t and normal agree beyond the 6 dp emitted).

    Exactness: cross_correlation's integer-centering trick — integer-
    valued series, every moment (Σa, Σab, …) an exact DECIMAL(38,0)
    sum over the lagged frame, centered second moments n·Σab − Σa·Σb
    exact decimals, so the closed-form 2×2 solve runs on identical
    doubles in both engines. Scale discipline: `series` is the
    per-period AGGREGATE frame; the lag window runs over its length
    only. Returns one row (n_used, beta_ylag, beta_xlag, f_stat,
    p_value); degenerate frames (constant regressors, n<4) emit
    NULLs."""
    s = series.select(
        F.col(t_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.orderBy("t")
    lagged = (
        s.select(
            F.col("y").alias("z"),
            F.lag("y", 1).over(w).alias("a"),
            F.lag("x", 1).over(w).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    dec = "decimal(38,0)"
    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast(dec).alias("sa"),
        F.sum("b").cast(dec).alias("sb"),
        F.sum("z").cast(dec).alias("sz"),
        F.sum((F.col("a") * F.col("a")).cast(dec)).alias("saa"),
        F.sum((F.col("b") * F.col("b")).cast(dec)).alias("sbb"),
        F.sum((F.col("a") * F.col("b")).cast(dec)).alias("sab"),
        F.sum((F.col("a") * F.col("z")).cast(dec)).alias("saz"),
        F.sum((F.col("b") * F.col("z")).cast(dec)).alias("sbz"),
        F.sum((F.col("z") * F.col("z")).cast(dec)).alias("szz"),
    )
    n = F.col("n").cast("double")

    def _c(sxy, sx, sy):
        # n·Σxy − Σx·Σy : exact decimal, then one cast to double
        return (
            F.col("n").cast(dec) * F.col(sxy) - F.col(sx) * F.col(sy)
        ).cast("double")

    caa, cbb, cab = _c("saa", "sa", "sa"), _c("sbb", "sb", "sb"), _c("sab", "sa", "sb")
    caz, cbz, czz = _c("saz", "sa", "sz"), _c("sbz", "sb", "sz"), _c("szz", "sz", "sz")
    det = caa * cbb - cab * cab
    ok = (F.col("n") >= 4) & (det != 0) & (caa != 0)
    b1 = (caz * cbb - cbz * cab) / det
    b2 = (cbz * caa - caz * cab) / det
    # centered sums above carry an n² scale factor; it cancels in every
    # ratio below (both SSEs share it)
    sse_u = czz - b1 * caz - b2 * cbz
    sse_r = czz - caz * caz / caa
    fstat = (sse_r - sse_u) / (sse_u / (n - 3.0))
    from .stats import _erfc_two_sided

    return m.select(
        F.col("n").alias("n_used"),
        F.round(F.when(ok, b1), round_digits).alias("beta_ylag"),
        F.round(F.when(ok, b2), round_digits).alias("beta_xlag"),
        F.round(F.when(ok, fstat), round_digits).alias("f_stat"),
        F.round(
            F.when(ok & (fstat >= 0), _erfc_two_sided(F.sqrt(fstat))),
            round_digits,
        ).alias("p_value"),
    )


def haar_wavelet_topk(
    df: DataFrame,
    key_col: str,
    pos_col: str,
    value_col: str,
    levels: int,
    top_k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Haar wavelet decomposition with top-k coefficient selection —
    the classic series-compression / multi-resolution-anomaly
    representation (Chan & Fu, ICDE 1999 for the similarity-search
    use): a length-2^L series becomes one global average plus
    details at L scales; keeping the k largest-magnitude
    coefficients is the best k-term Haar approximation, and a large
    coefficient at (level, idx) localizes WHERE the series changes
    regime at WHICH scale.

    Convention (documented for the oracle): the pairwise
    average-difference form a = (v₀+v₁)/2, d = (v₀−v₁)/2 — not the
    orthonormal /√2 scaling, so every coefficient stays a dyadic
    rational of the inputs (exactly representable; no √2 to diverge
    cross-engine). Positions must be 0..2^levels−1 per key (caller
    zero-fills); each level is ONE groupBy on (key, pos div 2) —
    L = log₂(n) map-side-combinable reduces over frames that HALVE
    each round, never a corpus sort. Coefficients round to 9 dp per
    level (pinning), final to ``round_digits``.

    Returns ≤ top_k+1 rows per key: the level-0 global average (idx
    0) plus the top_k details by (|coeff| DESC, level, idx) — ranked
    on the ROUNDED coefficient so rank order is engine-stable."""
    cur = df.select(
        F.col(key_col).alias("k"),
        F.col(pos_col).cast("long").alias("p"),
        F.col(value_col).cast("double").alias("v"),
    )
    detail_frames = []
    for lvl in range(levels, 0, -1):
        sign = 1 - 2 * (F.col("p") % 2)
        stepped = cur.groupBy("k", F.floor(F.col("p") / 2).alias("p2")).agg(
            F.round(F.sum(F.col("v")) / 2.0, 9).alias("a"),
            F.round(F.sum(F.col("v") * sign) / 2.0, 9).alias("d"),
        )
        detail_frames.append(
            stepped.select(
                "k", F.lit(lvl).alias("level"), F.col("p2").alias("idx"),
                F.col("d").alias("coeff"),
            )
        )
        cur = stepped.select("k", F.col("p2").alias("p"), F.col("a").alias("v"))
    from functools import reduce as _reduce

    details = _reduce(lambda a, b: a.unionByName(b), detail_frames)
    w = Window.partitionBy("k").orderBy(
        F.abs(F.round(F.col("coeff"), round_digits)).desc(), "level", "idx"
    )
    top = (
        details.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("k", "level", "idx", F.round("coeff", round_digits).alias("coeff"))
    )
    base = cur.select(
        "k", F.lit(0).alias("level"), F.col("p").alias("idx"),
        F.round("v", round_digits).alias("coeff"),
    )
    return base.unionByName(top).orderBy("k", "level", "idx")


def lmdi_decomposition(
    periods: DataFrame,
    period_col: str,
    factor_cols,
    round_digits: int = 6,
) -> DataFrame:
    """LMDI-I growth-accounting decomposition (Ang 2005, the survey) —
    the "WHY did the metric move" operator: when a KPI is a product
    of drivers (revenue = users × orders/user × revenue/order), the
    logarithmic-mean Divisia index attributes each period-over-period
    change to its drivers EXACTLY additively — no residual term, the
    property naive %-change attribution lacks:

        ΔV = Σ_k L(V_t, V_{t−1}) · ln(x_{k,t}/x_{k,t−1}),
        L(a,b) = (a−b)/(ln a − ln b),  L(a,a) = a

    Input is the PER-PERIOD driver frame (one row per period, one
    column per factor; V = Π factors by construction) — corpus-scale
    work happens upstream in whatever groupBy built it. Per
    consecutive pair: one lag window over the period frame; each
    factor contribution is rounded to ``round_digits`` and the exact
    ΔV rides along so additivity is auditable. Factors must be > 0
    in both periods (ln) — violating pairs emit NULL contributions.
    Returns one row per (period, factor): (period, delta_v, factor,
    contribution)."""
    from functools import reduce as _reduce
    import operator as _op

    v = _reduce(_op.mul, [F.col(c).cast("double") for c in factor_cols])
    base = periods.select(
        F.col(period_col).alias("period"),
        v.alias("v"),
        *[F.col(c).cast("double").alias(c) for c in factor_cols],
    )
    w = Window.orderBy("period")
    lagged = base.select(
        "period",
        "v",
        F.lag("v", 1).over(w).alias("v0"),
        *[F.col(c) for c in factor_cols],
        *[F.lag(c, 1).over(w).alias(f"__p_{c}") for c in factor_cols],
    ).filter(F.col("v0").isNotNull())
    lmean = F.when(
        F.round(F.col("v"), 9) == F.round(F.col("v0"), 9), F.col("v")
    ).otherwise(
        (F.col("v") - F.col("v0")) / (F.log(F.col("v")) - F.log(F.col("v0")))
    )
    rows = []
    for c in factor_cols:
        ok = (F.col(c) > 0) & (F.col(f"__p_{c}") > 0) & (F.col("v") > 0) & (
            F.col("v0") > 0
        )
        contrib = F.when(
            ok,
            F.round(lmean * F.round(F.log(F.col(c) / F.col(f"__p_{c}")), 9), round_digits),
        )
        rows.append(
            F.struct(F.lit(c).alias("factor"), contrib.alias("contribution"))
        )
    return (
        lagged.select(
            "period",
            F.round(F.col("v") - F.col("v0"), round_digits).alias("delta_v"),
            F.explode(F.array(*rows)).alias("fc"),
        )
        .select("period", "delta_v", F.col("fc.factor").alias("factor"), F.col("fc.contribution").alias("contribution"))
        .orderBy("period", "factor")
    )


def ewma_control_chart(
    df: DataFrame,
    time_col: str,
    value_col: str,
    lam: float = 0.2,
    l_sigma: float = 3.0,
    round_digits: int = 6,
) -> DataFrame:
    """EWMA control chart (Roberts 1959; Lucas & Saccucci 1990 for
    the design tables) — the small-persistent-shift monitor between
    Shewhart (misses small shifts) and CUSUM (needs a target shift
    size): each point is an exponentially weighted running mean with
    variance-correct control limits,

        z_t  = λ·x_t + (1−λ)·z_{t−1},  z_0 = μ̂
        UCLₜ = μ̂ + L·σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t}))

    computed CLOSED-FORM (no recursion): z_t = μ̂(1−λ)^t +
    λ·Σᵢ(1−λ)^{t−i}x_i, with every (1−λ)^k factor rounded to 12 dp
    so pow's last-ulp libm spread cannot compound cross-engine. μ̂/σ̂
    are the series' own exact-decimal moments (retrospective phase-I
    charting, documented). The window sum uses the numerically-safe
    scaled form over the SERIES frame (time positions from a
    row_number — the frame is an aggregate, days not events). Returns
    per point: (t_index, time_key, x, ewma, ucl, lcl, breach)."""
    import math as _math

    series = df.select(
        F.col(time_col).cast("string").alias("tk"),
        F.col(value_col).cast("double").alias("x"),
    )
    mom = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("x"), 6).cast("decimal(28,6)")).alias("s"),
        F.sum(
            F.round(F.col("x"), 6).cast("decimal(28,6)")
            * F.round(F.col("x"), 6).cast("decimal(18,6)")
        ).alias("ss"),
    ).select(
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 9).alias("mu"),
        F.round(
            F.sqrt(
                F.greatest(
                    (
                        F.col("ss").cast("double")
                        - F.col("s").cast("double")
                        * (F.col("s").cast("double") / F.col("n"))
                    )
                    / (F.col("n").cast("double") - 1.0),
                    F.lit(0.0),
                )
            ),
            9,
        ).alias("sigma"),
    )
    w = Window.orderBy("tk")
    idx = series.withColumn("t", F.row_number().over(w))
    lam = float(lam)
    one_m = 1.0 - lam
    # (1−λ)^k rounded to 12 dp, k bounded by the series length; the
    # scaled cumulative form z_t = (1−λ)^t·(μ̂ + λ·Σ x_i/(1−λ)^i)
    # overflows for long series, so use the direct per-pair sum over
    # the bounded series frame instead (t × t pairs of a day frame)
    a = idx.select(F.col("t").alias("ti"), F.col("x").alias("xi"))
    pairs = (
        idx.select("t", "tk", "x")
        .join(a, F.col("ti") <= F.col("t"))
        .select(
            "t",
            "tk",
            "x",
            F.round(
                F.lit(lam)
                * F.pow(F.lit(one_m), (F.col("t") - F.col("ti")).cast("double")),
                12,
            ).alias("wgt"),
            "xi",
        )
    )
    z = pairs.groupBy("t", "tk", "x").agg(
        F.sum(F.round(F.col("wgt") * F.col("xi"), 9).cast("decimal(38,9)")).alias("zs")
    )
    out = z.crossJoin(F.broadcast(mom))
    decay_t = F.round(F.pow(F.lit(one_m), F.col("t").cast("double")), 12)
    ewma = F.round(F.col("mu") * decay_t + F.col("zs").cast("double"), 9)
    width = F.round(
        F.lit(l_sigma)
        * F.col("sigma")
        * F.sqrt(
            F.lit(lam / (2.0 - lam))
            * (1.0 - F.round(F.pow(F.lit(one_m), 2.0 * F.col("t").cast("double")), 12))
        ),
        9,
    )
    # breach compares the ROUNDED chart values: the 12 dp weight
    # rounding leaves ~1e-11 residue on ewma, which against a
    # zero-width limit (constant series) would read as a breach
    ew6 = F.round(ewma, round_digits)
    ucl6 = F.round(F.col("mu") + width, round_digits)
    lcl6 = F.round(F.col("mu") - width, round_digits)
    return out.select(
        F.col("t").alias("t_index"),
        F.col("tk").alias("time_key"),
        F.round("x", round_digits).alias("x"),
        ew6.alias("ewma"),
        ucl6.alias("ucl"),
        lcl6.alias("lcl"),
        ((ew6 > ucl6) | (ew6 < lcl6)).alias("breach"),
    ).orderBy("t_index")


def hurst_rescaled_range(
    df: DataFrame,
    pos_col: str,
    value_col: str,
    block_sizes=(8, 16, 32, 64),
    round_digits: int = 6,
) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951;
    Mandelbrot-Wallis 1969) — LONG-memory detection: acf sees a few
    lags, H sees whether deviations persist across ALL horizons
    (H ≈ 0.5 random walk, > 0.5 trending/persistent, < 0.5 mean-
    reverting). The difference decides whether a capacity buffer can
    assume independent days or must plan for runs.

    For each block size s: split the series into ⌊n/s⌋ complete
    blocks; per block R = range of the mean-adjusted cumulative sum,
    S = the block's own std; average R/S across blocks (R/S of an
    s-block grows ∝ sᴴ). Ĥ = OLS slope of ln(avg R/S) on ln s over
    the size ladder — closed form on |sizes| points.

    Determinism: per-block moments are exact 6 dp-decimal sums;
    cumulative deviations round to 9 dp before the running min/max;
    per-size averages are 9 dp-decimal sums; the final OLS runs on
    those pinned values. Scale shape: one window pass per block size
    over the SERIES frame (positions from the caller — an aggregate
    grid, not corpus rows); blocks with S = 0 are excluded
    (documented). Returns the size ladder plus the fit: one row per
    size (size, n_blocks, avg_rs) + one summary row (size = 0) with
    avg_rs = Ĥ."""
    base = df.select(
        F.col(pos_col).cast("long").alias("p"), F.col(value_col).cast("double").alias("x")
    )
    rs_rows = []
    for s in block_sizes:
        blk = base.withColumn("b", F.floor(F.col("p") / F.lit(int(s))).cast("long"))
        sizes = blk.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("bn"))
        complete = sizes.filter(F.col("bn") == int(s)).select("b")
        rows = blk.join(F.broadcast(complete), "b")
        moms = rows.groupBy("b").agg(
            F.round(
                F.sum(F.round(F.col("x"), 6).cast("decimal(28,6)")).cast("double")
                / float(s),
                9,
            ).alias("mean"),
            F.round(
                F.sqrt(
                    F.greatest(
                        (
                            F.sum(
                                F.round(F.col("x"), 6).cast("decimal(28,6)")
                                * F.round(F.col("x"), 6).cast("decimal(18,6)")
                            ).cast("double")
                            - F.sum(F.round(F.col("x"), 6).cast("decimal(28,6)")).cast(
                                "double"
                            )
                            * (
                                F.sum(
                                    F.round(F.col("x"), 6).cast("decimal(28,6)")
                                ).cast("double")
                                / float(s)
                            )
                        )
                        / float(s),
                        F.lit(0.0),
                    )
                ),
                9,
            ).alias("sd"),
        )
        wb = (
            Window.partitionBy("b").orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
        )
        dev = (
            rows.join(F.broadcast(moms), "b")
            .withColumn(
                "cum", F.round(F.sum(F.round(F.col("x") - F.col("mean"), 9)).over(wb), 9)
            )
        )
        rng = dev.groupBy("b").agg(
            (F.max("cum") - F.min("cum")).alias("r"), F.first("sd").alias("sd")
        )
        per_size = rng.filter(F.col("sd") > 0).agg(
            F.lit(int(s)).cast("long").alias("size"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.round(
                F.sum(
                    F.round(F.col("r") / F.col("sd"), 9).cast("decimal(38,9)")
                ).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_rs"),
        )
        rs_rows.append(per_size)
    from functools import reduce as _reduce

    ladder = _reduce(lambda a, b: a.unionByName(b), rs_rows).localCheckpoint(eager=True)
    import math as _math

    lns = ladder.select(
        "size",
        "n_blocks",
        "avg_rs",
        F.round(F.log(F.col("size").cast("double")), 9).alias("lx"),
        F.round(F.log(F.col("avg_rs")), 9).alias("ly"),
    )
    fit = lns.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.round(F.col("lx"), 9).cast("decimal(38,9)")).alias("sx"),
        F.sum(F.round(F.col("ly"), 9).cast("decimal(38,9)")).alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("ly"), 9).cast("decimal(38,9)")).alias("sxy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 9).cast("decimal(38,9)")).alias("sxx"),
    )
    h = fit.select(
        F.lit(0).cast("long").alias("size"),
        F.lit(0).cast("long").alias("n_blocks"),
        F.round(
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double") / F.col("k")
            )
            / (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("k")
            ),
            round_digits,
        ).alias("avg_rs"),
    )
    return ladder.select(
        "size", "n_blocks", F.round("avg_rs", round_digits).alias("avg_rs")
    ).unionByName(h).orderBy("size")


def yule_walker_ar2(
    df: DataFrame,
    time_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """AR(2) fit by the Yule-Walker equations — the parametric
    completion of acf_ljung_box's diagnostics: once the ACF says the
    series has memory, this says HOW MUCH of it two lags explain.

        φ₁ = r₁(1 − r₂)/(1 − r₁²),  φ₂ = (r₂ − r₁²)/(1 − r₁²)
        σ²  = c₀·(1 − φ₁r₁ − φ₂r₂)

    with rₖ = cₖ/c₀ the lag-k autocorrelations computed the module's
    standing ACF way: full-series mean, lag products via ROW-frame
    window lags, population covariances of exact 6 dp-quantized
    values rounded to 9 dp. Also emits the stationarity check
    (φ₂ ∈ (−1, 1), φ₁+φ₂ < 1, φ₂−φ₁ < 1) as ar2_stationary. Returns
    one row: (n, phi1, phi2, sigma2, r1, r2, ar2_stationary)."""
    w = Window.orderBy("t")
    base = df.select(
        F.col(time_col).alias("t"),
        F.round(F.col(value_col).cast("double"), 6).alias("x"),
    )
    lagged = base.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
    )
    q = lambda c: F.col(c).cast("decimal(28,6)")  # noqa: E731
    q6 = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q("x")).alias("sx"),
        F.sum(q("x") * q6("x")).alias("sxx"),
        F.count("x1").cast("long").alias("n1"),
        F.sum(q("x") * q6("x1")).alias("sx1"),
        F.sum(q("x1")).alias("sa1"),
        F.sum(F.when(F.col("x1").isNotNull(), q("x"))).alias("sb1"),
        F.count("x2").cast("long").alias("n2"),
        F.sum(q("x") * q6("x2")).alias("sx2"),
        F.sum(q("x2")).alias("sa2"),
        F.sum(F.when(F.col("x2").isNotNull(), q("x"))).alias("sb2"),
    )
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / n
    c0 = F.round(
        F.col("sxx").cast("double") / n - mu * mu, 9
    )

    def _ck(spq, sa, sb, nk):
        nkd = F.col(nk).cast("double")
        return F.round(
            (
                F.col(spq).cast("double")
                - mu * F.col(sa).cast("double")
                - mu * F.col(sb).cast("double")
                + nkd * mu * mu
            )
            / n,
            9,
        )

    c1 = _ck("sx1", "sa1", "sb1", "n1")
    c2 = _ck("sx2", "sa2", "sb2", "n2")
    r1 = F.round(F.when(c0 > 0, c1 / c0), 9)
    r2 = F.round(F.when(c0 > 0, c2 / c0), 9)
    den = 1.0 - r1 * r1
    phi1 = F.round(F.when(F.abs(den) > 0, r1 * (1.0 - r2) / den), 9)
    phi2 = F.round(F.when(F.abs(den) > 0, (r2 - r1 * r1) / den), 9)
    sigma2 = F.round(c0 * (1.0 - phi1 * r1 - phi2 * r2), 9)
    stationary = (
        (phi2 > -1.0) & (phi2 < 1.0) & (phi1 + phi2 < 1.0) & (phi2 - phi1 < 1.0)
    ).cast("int")
    return agg.select(
        "n",
        F.round(phi1, round_digits).alias("phi1"),
        F.round(phi2, round_digits).alias("phi2"),
        F.round(sigma2, round_digits).alias("sigma2"),
        F.round(r1, round_digits).alias("r1"),
        F.round(r2, round_digits).alias("r2"),
        stationary.alias("ar2_stationary"),
    )


def page_hinkley(
    df: DataFrame,
    time_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 10.0,
    round_digits: int = 6,
) -> DataFrame:
    """Page-Hinkley upward-shift monitor (Page 1954; Hinkley 1971) —
    the sequential cousin of cusum_changepoint built for STREAMS of
    summaries: maintain mₜ = Σ(xᵢ − x̄ᵢ − δ) with x̄ᵢ the RUNNING mean
    up to i, and alarm when PHₜ = mₜ − min_{s≤t} mₛ exceeds λ. Unlike
    the retrospective CUSUM (which needs the full-series mean), every
    term here is causally computable at time t — this frame is the
    batch REPLAY of what the streaming monitor would have emitted,
    which is exactly how you backtest a λ before deploying it.

    All running quantities are ROW-frame window sums over the time
    order (one sort shuffle, no iteration); the running mean is
    rounded to 9 dp before entering mₜ so both engines accumulate
    identical doubles. Returns the full monitor trace: (t, x,
    running_mean, m_t, ph_t, alarm) with alarm = PHₜ > λ."""
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    base = df.select(
        F.col(time_col).alias("t"),
        F.round(F.col(value_col).cast("double"), 6).alias("x"),
    )
    with_mean = base.withColumn(
        "running_mean",
        F.round(
            F.sum(F.col("x").cast("decimal(28,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            9,
        ),
    )
    with_m = with_mean.withColumn(
        "m_t",
        F.round(
            F.sum(
                F.round(
                    F.col("x") - F.col("running_mean") - F.lit(float(delta)), 9
                ).cast("decimal(28,9)")
            )
            .over(w)
            .cast("double"),
            9,
        ),
    )
    out = with_m.withColumn(
        "ph_t", F.round(F.col("m_t") - F.min("m_t").over(w), 9)
    )
    return out.select(
        "t",
        F.round("x", round_digits).alias("x"),
        F.round("running_mean", round_digits).alias("running_mean"),
        F.round("m_t", round_digits).alias("m_t"),
        F.round("ph_t", round_digits).alias("ph_t"),
        (F.col("ph_t") > F.lit(float(lam))).cast("int").alias("alarm"),
    )


def croston_forecast(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.2,
    round_digits: int = 6,
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972; the
    SBA bias correction of Syntetos & Boylan 2005 rides along) — the
    forecaster for series that are mostly zeros (spare parts, long-
    tail SKU demand, rare event classes), where plain SES smears mass
    across the zero gaps. Separate SES estimates for nonzero demand
    SIZE ẑ and inter-demand INTERVAL p̂, updated only at demand
    points; forecast per period = ẑ/p̂, SBA = (1−α/2)·ẑ/p̂.

    Both SES chains are computed CLOSED-FORM (the ewma_control_chart
    discipline — no recursion): after N demands,
    ẑ = (1−α)^{N−1}z₁ + α·Σ_{i≥2}(1−α)^{N−i}zᵢ, each pow factor
    rounded to 12 dp so libm's last-ulp spread cannot compound, each
    product rounded to 9 dp and summed as decimals. Intervals are
    position gaps between consecutive demand periods (first demand
    seeds no interval). Series with <2 demands emit NULL p̂/forecast.
    Returns per group: (group, n_periods, n_demands, z_hat, p_hat,
    croston_forecast, sba_forecast)."""
    a = float(alpha)
    wg = Window.partitionBy("g").orderBy("t")
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(time_col).alias("t"),
        F.round(F.col(value_col).cast("double"), 6).alias("x"),
    ).withColumn("idx", F.row_number().over(wg))
    totals = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_periods")
    )
    nz = base.filter(F.col("x") > 0).withColumn(
        "i", F.row_number().over(wg)
    ).withColumn("prev_idx", F.lag("idx").over(wg))
    wn = Window.partitionBy("g")
    nz = nz.withColumn("N", F.max("i").over(wn)).withColumn(
        "gap", (F.col("idx") - F.col("prev_idx")).cast("double")
    )
    # demand-size SES: weight (1-a)^(N-i), alpha factor except i=1
    powz = F.round(F.pow(F.lit(1.0 - a), (F.col("N") - F.col("i")).cast("double")), 12)
    z_term = F.round(
        F.when(F.col("i") == 1, powz * F.col("x")).otherwise(
            F.lit(a) * powz * F.col("x")
        ),
        9,
    )
    # interval SES over gaps j = i-1 = 1..N-1 (rows with i >= 2)
    powp = F.round(
        F.pow(F.lit(1.0 - a), (F.col("N") - F.col("i")).cast("double")), 12
    )
    p_term = F.round(
        F.when(F.col("i") == 2, powp * F.col("gap")).otherwise(
            F.lit(a) * powp * F.col("gap")
        ),
        9,
    )
    agg = nz.groupBy("g").agg(
        F.max("N").cast("long").alias("n_demands"),
        F.round(
            F.sum(z_term.cast("decimal(28,9)")).cast("double"), 9
        ).alias("z_hat"),
        F.round(
            F.sum(
                F.when(F.col("i") >= 2, p_term).cast("decimal(28,9)")
            ).cast("double"),
            9,
        ).alias("p_hat"),
    )
    out = totals.join(agg, "g", "left")
    fc = F.round(
        F.when(F.col("p_hat") > 0, F.col("z_hat") / F.col("p_hat")), 9
    )
    return out.select(
        F.col("g").alias("group"),
        "n_periods",
        F.coalesce(F.col("n_demands"), F.lit(0)).alias("n_demands"),
        F.round(F.col("z_hat"), round_digits).alias("z_hat"),
        F.round(F.col("p_hat"), round_digits).alias("p_hat"),
        F.round(fc, round_digits).alias("croston_forecast"),
        F.round(F.lit(1.0 - a / 2.0) * fc, round_digits).alias("sba_forecast"),
    )


def engle_granger_coint(
    df: DataFrame,
    time_col: str,
    y_col: str,
    x_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Engle-Granger two-step cointegration screen (Engle & Granger
    1987) — do two trending series share a long-run equilibrium?
    Correlation on levels lies under common trends (the classic
    spurious-regression trap this module's pearson/granger seats
    can't see); cointegration asks whether the RESIDUAL of y~x is
    stationary. Step 1: OLS y = a + b·x on levels (exact decimal
    moments). Step 2: Dickey-Fuller regression Δe_t = ρ·e_{t−1}
    (no-constant form), DF statistic = ρ̂/SE(ρ̂); ρ̂ significantly
    below 0 → residual mean-reverts → cointegrated. The DF stat is
    reported against the Engle-Granger 5% critical value −3.34
    (2-variable case, MacKinnon 1991) as coint_flag. Lags via ROW
    windows over the aligned series frame. Returns one row: (n,
    slope, intercept, rho, df_stat, coint_flag)."""
    w = Window.orderBy("t")
    base = df.select(
        F.col(time_col).alias("t"),
        F.round(F.col(y_col).cast("double"), 6).alias("y"),
        F.round(F.col(x_col).cast("double"), 6).alias("x"),
    )
    q = lambda c: F.round(F.col(c), 6).cast("decimal(28,6)")  # noqa: E731
    q6 = lambda c: F.round(F.col(c), 6).cast("decimal(18,6)")  # noqa: E731
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q("x")).alias("sx"),
        F.sum(q("y")).alias("sy"),
        F.sum(q("x") * q6("x")).alias("sxx"),
        F.sum(q("x") * q6("y")).alias("sxy"),
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
    slope = F.round(cxy / cxx, 9)
    fit = mom.select(
        "n",
        slope.alias("b"),
        F.round(
            F.col("sy").cast("double") / n - slope * (F.col("sx").cast("double") / n),
            9,
        ).alias("a"),
    )
    resid = base.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        "a",
        "b",
        F.round(F.col("y") - F.col("a") - F.col("b") * F.col("x"), 9).alias("e"),
    )
    lagged = resid.withColumn("e1", F.lag("e").over(w)).filter(
        F.col("e1").isNotNull()
    )
    # DF no-constant regression: rho = Σ e1·Δe / Σ e1², SE from the
    # regression residual variance
    de = F.round(F.col("e") - F.col("e1"), 9)
    dfagg = lagged.groupBy("n", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.round(
            F.sum(
                F.round(F.col("e1") * de, 9).cast("decimal(28,9)")
            ).cast("double"),
            9,
        ).alias("s_ed"),
        F.round(
            F.sum(
                F.round(F.col("e1") * F.col("e1"), 9).cast("decimal(28,9)")
            ).cast("double"),
            9,
        ).alias("s_ee"),
        F.round(
            F.sum(F.round(de * de, 9).cast("decimal(28,9)")).cast("double"), 9
        ).alias("s_dd"),
    )
    rho = F.round(F.col("s_ed") / F.col("s_ee"), 9)
    sig2 = F.round(
        (F.col("s_dd") - rho * F.col("s_ed")) / (F.col("m") - 1.0), 9
    )
    se = F.sqrt(sig2 / F.col("s_ee"))
    dfstat = F.round(rho / se, 9)
    return dfagg.select(
        "n",
        F.round(F.col("b"), round_digits).alias("slope"),
        F.round(F.col("a"), round_digits).alias("intercept"),
        F.round(rho, round_digits).alias("rho"),
        F.round(dfstat, round_digits).alias("df_stat"),
        (dfstat < -3.34).cast("int").alias("coint_flag"),
    )


def periodogram_power(
    df: DataFrame,
    time_index_col: str,
    value_col: str,
    periods: list,
    round_digits: int = 6,
) -> DataFrame:
    """Periodicity-strength screen at CANDIDATE periods — the Goertzel
    /single-bin-DFT answer to "is there a weekly cycle?" that
    seasonal_decompose_ma assumes and q_acf only hints at. For each
    candidate period P (in time-index units), the normalized spectral
    power

        p(P) = ((Σ x̃·cos(2πt/P))² + (Σ x̃·sin(2πt/P))²) · 2/(n·Σx̃²)

    with x̃ the mean-centered series — p ≈ 1 means a pure sinusoid at
    that period, p ≈ 0 white noise; a zero-variance series has no
    spectrum and emits NULL power. One aggregate evaluates ALL
    candidate bins (two slots per period); no window, no FFT,
    engine-replayable because cos/sin arguments are exact integer
    ratios rounded to 12 dp before libm. Returns one row per period:
    (period, n, power, dominant) with dominant flagging the argmax."""
    t = F.col(time_index_col).cast("double")
    base = df.select(
        t.alias("t"), F.round(F.col(value_col).cast("double"), 6).alias("x")
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("x").cast("decimal(28,6)")).cast("double"), 9
        ).alias("sx"),
    )
    centered = base.crossJoin(F.broadcast(mom)).select(
        "t",
        "n",
        F.round(F.col("x") - F.col("sx") / F.col("n"), 9).alias("xc"),
    )
    two_pi = 6.283185307179586
    aggs = [
        F.max("n").alias("n"),
        F.round(
            F.sum(
                F.round(F.col("xc") * F.col("xc"), 9).cast("decimal(28,9)")
            ).cast("double"),
            9,
        ).alias("ss"),
    ]
    for p in periods:
        ang = F.round(F.lit(two_pi) * F.col("t") / F.lit(float(p)), 12)
        aggs.append(
            F.round(
                F.sum(
                    F.round(F.col("xc") * F.cos(ang), 9).cast("decimal(28,9)")
                ).cast("double"),
                9,
            ).alias(f"c_{int(p)}")
        )
        aggs.append(
            F.round(
                F.sum(
                    F.round(F.col("xc") * F.sin(ang), 9).cast("decimal(28,9)")
                ).cast("double"),
                9,
            ).alias(f"s_{int(p)}")
        )
    wide = centered.groupBy().agg(*aggs)
    rows = None
    for p in periods:
        power = F.round(
            F.when(
                F.col("ss") > 0,
                (
                    F.col(f"c_{int(p)}") * F.col(f"c_{int(p)}")
                    + F.col(f"s_{int(p)}") * F.col(f"s_{int(p)}")
                )
                * 2.0
                / (F.col("n") * F.col("ss")),
            ),
            9,
        )
        one = wide.select(
            F.lit(int(p)).alias("period"),
            F.col("n"),
            power.alias("power"),
        )
        rows = one if rows is None else rows.unionAll(one)
    w_all = Window.partitionBy()
    return rows.withColumn(
        "dominant", (F.col("power") == F.max("power").over(w_all)).cast("int")
    ).select(
        "period",
        "n",
        F.round(F.col("power"), round_digits).alias("power"),
        "dominant",
    ).orderBy("period")


def theta_forecast(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    horizon: int = 7,
    alpha: float = 0.2,
    round_digits: int = 6,
) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 —
    the M3-competition winner and the strongest simple univariate
    baseline after seasonal-naive): decompose the series into the
    θ=0 line (the pure least-squares trend, carrying long-run
    direction) and the θ=2 line (2·y − trend, doubling local
    curvature), forecast the first by extrapolation and the second by
    SES, and average:

        ŷ(n+h) = ½·[ (a + b·(n+h)) + ℓ_n ]

    with ℓ_n the SES level of the θ=2 line. SES is CLOSED-FORM (the
    croston/ewma discipline — no recursion): weights (1−α)^{n−i}
    rounded to 12 dp, products to 9 dp, summed as exact decimals, so
    the oracle replays the identical arithmetic. The trend comes from
    one exact-moment aggregate per group over the row index. Returns
    one row per (group, h): (group, h, trend_component,
    ses_component, forecast)."""
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    a = float(alpha)
    wg = Window.partitionBy("g").orderBy("t")
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(time_col).alias("t"),
        F.round(F.col(value_col).cast("double"), 6).alias("x"),
    ).withColumn("i", F.row_number().over(wg).cast("double"))
    dsum = "decimal(38,6)"
    mom = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("i").cast(dsum)).alias("si"),
        F.sum(F.col("x").cast(dsum)).alias("sx"),
        F.sum(F.round(F.col("i") * F.col("i"), 6).cast(dsum)).alias("sii"),
        F.sum(F.round(F.col("i") * F.col("x"), 6).cast(dsum)).alias("six"),
    )
    n = F.col("n").cast("double")
    cii = F.col("sii").cast("double") - F.col("si").cast("double") * F.col(
        "si"
    ).cast("double") / n
    cix = F.col("six").cast("double") - F.col("si").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    b = F.round(F.when(cii > 0, cix / cii).otherwise(F.lit(0.0)), 9)
    fit = mom.select(
        "g",
        "n",
        b.alias("b"),
        F.round(
            F.col("sx").cast("double") / n - b * F.col("si").cast("double") / n, 9
        ).alias("a"),
    )
    # θ=2 line and its closed-form SES level
    theta2 = base.join(fit, "g").select(
        "g",
        "i",
        F.col("n"),
        F.round(
            2.0 * F.col("x") - (F.col("a") + F.col("b") * F.col("i")), 9
        ).alias("z"),
    )
    pw = F.round(
        F.pow(F.lit(1.0 - a), F.col("n").cast("double") - F.col("i")), 12
    )
    term = F.round(
        F.when(F.col("i") == 1.0, pw * F.col("z")).otherwise(
            F.lit(a) * pw * F.col("z")
        ),
        9,
    )
    ses = theta2.select("g", term.cast("decimal(28,9)").alias("term")).groupBy(
        "g"
    ).agg(F.round(F.sum("term").cast("double"), 9).alias("level"))
    spark = df.sparkSession
    hs = F.broadcast(
        spark.range(1, int(horizon) + 1).select(F.col("id").alias("h"))
    )
    out = fit.join(ses, "g").crossJoin(hs)
    trend_c = F.round(
        F.col("a") + F.col("b") * (F.col("n").cast("double") + F.col("h")), 9
    )
    return out.select(
        "g",
        F.col("h").cast("long").alias("h"),
        F.round(trend_c, round_digits).alias("trend_component"),
        F.round(F.col("level"), round_digits).alias("ses_component"),
        F.round(0.5 * (trend_c + F.col("level")), round_digits).alias(
            "forecast"
        ),
    ).orderBy("g", "h")


# Shewhart X̄-R constants (ASTM E2587 / Montgomery, "Introduction to
# Statistical Quality Control", Appendix VI): subgroup size n ->
# (A2, D3, D4). Published values, pinned — the same
# table every SPC implementation ships.
_XBAR_R_CONSTANTS = {
    2: (1.880, 0.0, 3.267),
    3: (1.023, 0.0, 2.574),
    4: (0.729, 0.0, 2.282),
    5: (0.577, 0.0, 2.114),
    6: (0.483, 0.0, 2.004),
    7: (0.419, 0.076, 1.924),
    8: (0.373, 0.136, 1.864),
    9: (0.337, 0.184, 1.816),
    10: (0.308, 0.223, 1.777),
}


def xbar_r_chart(
    df: DataFrame,
    subgroup_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Shewhart X̄-R control chart (Shewhart 1931; constants from the
    published ASTM/Montgomery tables) — the rational-subgroup SPC
    chart the EWMA chart (ewma_control_chart) and CUSUM cousins sit
    beside: X̄ catches mean shifts between subgroups, R catches
    spread changes within them, and the A2/D3/D4 constants convert
    the average range into 3σ limits without ever estimating σ
    directly:

        X̄ chart: X̿ ± A2·R̄        R chart: [D3·R̄, D4·R̄]

    Phase-I retrospective charting: limits come from the data itself.
    Subgroups must share ONE size n ∈ [2, 10] (the constants are
    n-specific) — mixed sizes raise. Scale shape: one
    map-side-combinable groupBy collapses rows to the subgroup frame
    (exact-decimal sums, exact min/max), one 1-row reduce computes
    X̿/R̄/limits, broadcast back; the only corpus-scale work is the
    first groupBy. Returns per subgroup: (subgroup, n, xbar, r,
    xbar_ucl, xbar_lcl, r_ucl, r_lcl, out_xbar, out_r)."""
    sub = (
        df.groupBy(F.col(subgroup_col).alias("subgroup"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.round(F.col(value_col).cast("double"), 6).cast(
                    "decimal(28,6)"
                )
            ).alias("s"),
            F.max(F.round(F.col(value_col).cast("double"), 6)).alias("vmax"),
            F.min(F.round(F.col(value_col).cast("double"), 6)).alias("vmin"),
        )
        .select(
            "subgroup",
            "n",
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), 9)
            .alias("xbar"),
            F.round(F.col("vmax") - F.col("vmin"), 9).alias("r"),
        )
    )
    sizes = [
        r[0]
        for r in sub.select("n").distinct().orderBy("n").limit(3).collect()
    ]
    if len(sizes) != 1:
        raise ValueError(
            f"xbar_r_chart needs one uniform subgroup size, got {sizes}"
        )
    n = int(sizes[0])
    if n not in _XBAR_R_CONSTANTS:
        raise ValueError(f"subgroup size {n} outside the published 2..10 table")
    a2, d3, d4 = _XBAR_R_CONSTANTS[n]
    center = sub.groupBy().agg(
        F.round(
            F.sum(F.round(F.col("xbar"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("xbarbar"),
        F.round(
            F.sum(F.round(F.col("r"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("rbar"),
    )
    lim = center.select(
        "xbarbar",
        "rbar",
        F.round(F.col("xbarbar") + a2 * F.col("rbar"), 9).alias("xucl"),
        F.round(F.col("xbarbar") - a2 * F.col("rbar"), 9).alias("xlcl"),
        F.round(d4 * F.col("rbar"), 9).alias("rucl"),
        F.round(d3 * F.col("rbar"), 9).alias("rlcl"),
    )
    out = sub.crossJoin(F.broadcast(lim))
    return out.select(
        "subgroup",
        "n",
        F.round(F.col("xbar"), round_digits).alias("xbar"),
        F.round(F.col("r"), round_digits).alias("r"),
        F.round(F.col("xucl"), round_digits).alias("xbar_ucl"),
        F.round(F.col("xlcl"), round_digits).alias("xbar_lcl"),
        F.round(F.col("rucl"), round_digits).alias("r_ucl"),
        F.round(F.col("rlcl"), round_digits).alias("r_lcl"),
        (
            (F.col("xbar") > F.col("xucl")) | (F.col("xbar") < F.col("xlcl"))
        ).cast("int").alias("out_xbar"),
        ((F.col("r") > F.col("rucl")) | (F.col("r") < F.col("rlcl")))
        .cast("int")
        .alias("out_r"),
    )
