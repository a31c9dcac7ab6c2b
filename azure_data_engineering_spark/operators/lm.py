"""Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995;
Chen & Goodman 1998 empirical study) — the perplexity-quality scorer
the stupid-backoff bigram filter (q_bigram_logprob) approximates.

Stupid backoff is a heuristic: its scores are not probabilities and
its backoff weight is a constant. Kneser-Ney's two ideas are what make
it the reference smoothing for data-quality perplexity filtering:
absolute discounting (subtract a fixed D from every seen bigram count
and redistribute exactly that mass) and the CONTINUATION unigram
(back off to "how many distinct contexts does w appear after?", not
raw frequency — 'francisco' is frequent but occurs after almost
nothing except 'san', so its continuation probability is tiny).

    P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1)
                  + D·N₁₊(w1 ·)/c(w1) · N₁₊(· w2)/N₁₊(· ·)

All factors are ratios of exact integer counts plus the constant D, so
both engines compute bit-identical doubles; per-bigram NLL rounds to
9 dp before the per-doc sum (order-independence discipline). Scoring
the training corpus itself means every bigram has c ≥ 1 — no OOV path
is needed (the operator is an IN-CORPUS quality scorer, the DSIR/CCNet
setting, not a held-out evaluator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kneser_ney_bigram(
    pairs: DataFrame,
    id_col: str = "doc_id",
    w1_col: str = "w1",
    w2_col: str = "w2",
    discount: float = 0.75,
    top_n: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """Score every document's bigrams under the interpolated-KN model
    estimated from the SAME corpus and return the ``top_n`` most
    surprising documents — the filter-worthy tail of a perplexity
    screen.

    Scale shape: the model lives on the bigram TYPE frame (one
    groupBy of the token-pair stream); left-context/continuation
    statistics are two more groupBys OVER THE TYPE FRAME (vocabulary-
    sized, not corpus-sized); scoring is ONE equi-join of the pair
    stream onto the type frame on (w1, w2). No per-row window, no
    driver loop. Returns (doc_id, n_bigrams, avg_nll, ppl) ordered by
    (avg_nll DESC, doc_id), ties impossible to flip because avg_nll
    is rounded identically in both engines."""
    d = float(discount)
    p = pairs.select(
        F.col(id_col).alias("doc_id"), F.col(w1_col).alias("w1"), F.col(w2_col).alias("w2")
    )
    c12 = p.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    # c1 and the fan-out N1+(w1·) both fall out of the type frame
    w1s = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
    )
    w2s = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("fanin"))
    ntypes = c12.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    model = (
        c12.join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(ntypes))
        .select(
            "w1",
            "w2",
            (
                F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
                / F.col("c1").cast("double")
                + d
                * F.col("fanout").cast("double")
                / F.col("c1").cast("double")
                * (F.col("fanin").cast("double") / F.col("n_types").cast("double"))
            ).alias("p_kn"),
        )
    )
    scored = p.join(model, ["w1", "w2"]).select(
        "doc_id", F.round(-F.log(F.col("p_kn")), 9).cast("decimal(38,9)").alias("nll")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll").alias("nll_sum"),
    )
    avg_nll = F.round(
        F.col("nll_sum").cast("double") / F.col("n_bigrams").cast("double"), round_digits
    )
    return (
        per_doc.select(
            "doc_id",
            "n_bigrams",
            avg_nll.alias("avg_nll"),
            F.round(F.exp(avg_nll), round_digits).alias("ppl"),
        )
        .orderBy(F.col("avg_nll").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )
