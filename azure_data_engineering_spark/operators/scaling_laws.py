"""Corpus scaling-law fits: Zipf rank-frequency and Heaps vocabulary
growth.

Two log-log OLS fits every corpus characterization report carries
(Zipf 1949; Heaps 1978; Baeza-Yates & Ribeiro-Neto 1999 §6):

- Zipf: term frequency ~ C · rank^(−s). The exponent s is fit by OLS
  over (ln rank, ln freq) of the top-K terms — s ≈ 1 for natural
  language; a materially different s flags synthetic, templated, or
  boilerplate-heavy text before it pollutes a training mix.
- Heaps: distinct terms per document ~ K · n_tokens^β, fit by OLS
  over per-document (ln tokens, ln distinct). β well below ~0.4–0.6
  means repetitive documents; β near 1 means near-random text.

Scale shape: the Zipf fit runs on the TERM frame (one word-count
groupBy, then a top-K limit under a (freq desc, term) total order —
K is constant, so the OLS moment frame is O(K)); the Heaps fit is one
per-doc aggregate and ONE pass of moment sums. Cross-engine
determinism: each ln() value is scaled by 1e6 and rounded to an exact
integer before summation, so the OLS normal equations are pure
HUGEINT/decimal arithmetic — summation-order-free and bit-identical
across engines (the ridge_closed_form discipline applied to
transcendental inputs; a last-ulp libm difference cannot flip a
rounding 5e-7 away from the boundary).

OLS closed form on scaled-integer moments, computed per fit:
slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept = (Σy − slope·Σx)/n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _ln_scaled(c: Column) -> Column:
    """ln(c) · 1e6 rounded to an exact integer (decimal(38,0))."""
    return F.round(F.log(c.cast("double")) * _SCALE, 0).cast("decimal(38,0)")


def _ols_agg(df: DataFrame, x: Column, y: Column, slope_alias: str,
             intercept_alias: str, n_alias: str,
             out_decimals: int = 6) -> DataFrame:
    """One-row OLS over scaled-integer (x, y) columns. All moments are
    exact decimals; the two divisions happen once on the 1-row frame.
    The intercept is reported back on the ln scale (divided by the
    1e6 scaling), the slope is scale-free."""
    pts = df.select(x.alias("__x"), y.alias("__y"))
    m = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("__x").cast("decimal(38,0)").alias("sx"),
        F.sum("__y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("decimal(38,0)").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return m.select(
        F.col("n").cast("long").alias(n_alias),
        F.round(slope, out_decimals).alias(slope_alias),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / _SCALE,
            out_decimals,
        ).alias(intercept_alias),
    )


def zipf_fit(term_freqs: DataFrame, term_col: str, freq_col: str,
             top_k: int = 500, out_decimals: int = 6) -> DataFrame:
    """Fit ln(freq) = intercept − s·ln(rank) over the top_k terms of a
    (term, freq) frame. Returns one row: n_terms_fit, zipf_s (the
    POSITIVE exponent), zipf_intercept (ln C)."""
    w = Window.orderBy(F.col(freq_col).desc(), F.col(term_col).asc())
    top = (
        term_freqs.select(
            F.col(freq_col).alias("__f"),
            F.row_number().over(w).alias("__r"),
        )
        .filter(F.col("__r") <= top_k)
    )
    fit = _ols_agg(
        top,
        _ln_scaled(F.col("__r")),
        _ln_scaled(F.col("__f")),
        "__slope",
        "zipf_intercept",
        "n_terms_fit",
        out_decimals,
    )
    return fit.select(
        "n_terms_fit",
        F.round(-F.col("__slope"), out_decimals).alias("zipf_s"),
        "zipf_intercept",
    )


def heaps_fit(per_doc: DataFrame, tokens_col: str, distinct_col: str,
              out_decimals: int = 6) -> DataFrame:
    """Fit ln(distinct) = ln K + β·ln(tokens) over a per-document
    (n_tokens, n_distinct) frame (docs with zero tokens excluded).
    Returns one row: n_docs_fit, heaps_beta, heaps_ln_k."""
    pts = per_doc.filter(F.col(tokens_col) > 0)
    return _ols_agg(
        pts,
        _ln_scaled(F.col(tokens_col)),
        _ln_scaled(F.col(distinct_col)),
        "heaps_beta",
        "heaps_ln_k",
        "n_docs_fit",
        out_decimals,
    )
