"""Distributed multinomial Naive Bayes — train AND predict as one
declarative plan.

The classic bag-of-words classifier (McCallum & Nigam, AAAI-98
workshop formulation): log P(lang | doc) ∝ ln prior(lang) +
Σ_tokens ln((c_{lang,token} + α) / (n_lang + α·V)) with Laplace
smoothing α. It remains the strongest cheap baseline for
language/topic/source routing in corpus pipelines — and unlike
gradient-trained models it is EXACTLY expressible as aggregations, so
the whole train+predict cycle runs inside Catalyst with no model
server, no driver-side fit, and an oracle that replays every count.

Scale shape:
- training collapses the corpus to (class, token) counts in ONE
  tokenize+aggregate pass; class totals, vocabulary size, and priors
  re-aggregate from that pair table (the raw text is read once);
- prediction explodes test docs to tokens (multiplicity kept — the
  multinomial model), crosses each token with the CLASS frame (|C|
  rows, broadcast), LEFT-joins the count table on (token, class) so
  unseen tokens genuinely back off to the smoothed floor, and reduces
  with one (doc, class) sum + one deterministic argmax;
- every joined frame is either broadcast-sized (classes, scalars) or
  keyed by token (AQE handles hot boilerplate tokens like any
  aggregation key).

Determinism discipline: log-likelihoods are IEEE functions of exact
integer counts, but the per-(doc, class) SUM is accumulation-order
dependent, so scores are ROUNDED before the argmax (the engine's
standard argmin rounding rule) and ties break toward the smallest
class label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def naive_bayes_predict(
    train: DataFrame,
    test: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    alpha: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Fit multinomial NB on `train` and classify `test` in one plan.

    Returns (id, predicted_label, score) — score is the rounded joint
    log-likelihood of the winning class."""
    from ..functions.text import normalize_text

    tok = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token")

    train_toks = (
        train.select(F.col(label_col).alias("cls"), tok)
        .filter(F.col("token") != "")
    )
    # ONE pass to (class, token) counts; everything else derives
    counts = train_toks.groupBy("cls", "token").agg(
        F.count(F.lit(1)).alias("c_ct")
    )
    cls_tot = counts.groupBy("cls").agg(F.sum("c_ct").alias("n_c"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    doc_counts = train.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total_docs = doc_counts.agg(F.sum("n_docs").alias("n_all"))
    priors = doc_counts.join(F.broadcast(total_docs)).select(
        "cls", F.log(F.col("n_docs") / F.col("n_all")).alias("ln_prior")
    )
    classes = (
        priors.join(cls_tot, "cls")
        .join(F.broadcast(vocab))
        .select("cls", "ln_prior", "n_c", "v")
    )

    test_toks = test.select(
        F.col(id_col).alias("id"), tok
    ).filter(F.col("token") != "")
    # token x class fan-out (|C| is small: broadcast), then the count
    # LEFT-join so absent (token, class) pairs hit the smoothed floor
    scored = (
        test_toks.join(F.broadcast(classes))
        .join(counts, ["token", "cls"], "left")
        .withColumn(
            "ln_p",
            F.log(
                (F.coalesce(F.col("c_ct"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_c") + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    per_class = scored.groupBy("id", "cls", "ln_prior").agg(
        F.sum("ln_p").alias("ln_like")
    )
    ranked = per_class.select(
        "id",
        "cls",
        F.round(F.col("ln_prior") + F.col("ln_like"), round_digits).alias("score"),
    )
    # deterministic argmax: best rounded score, ties to smallest class
    best = ranked.groupBy("id").agg(
        F.min_by(
            F.struct(F.col("cls").alias("predicted_label"), F.col("score")),
            F.struct((-F.col("score")).alias("ns"), F.col("cls")),
        ).alias("win")
    )
    return best.select("id", "win.predicted_label", "win.score")
