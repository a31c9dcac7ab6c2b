"""Preference-pair construction for RLHF/DPO-style training data.

Preference optimization (DPO, RLHF reward modeling) consumes
(chosen, rejected) response pairs per prompt group. Given any scored
candidate frame — model scores, heuristic quality, human ratings —
the pair builder is a pure aggregation problem: per group, the
arg-max and arg-min under a DETERMINISTIC total order, gated on a
minimum margin so near-ties (which teach the model nothing and add
label noise) never become pairs.

Scale shape: two window row_numbers over the same (group) partition —
one shuffle total — then a group-sized join. No corpus-scale state;
the standard discipline for argmax/argmin extraction (same shape as
linkage.golden_record's mode selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    min_margin: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """One (chosen, rejected) pair per group: chosen = highest score,
    rejected = lowest, ties broken by smallest id on BOTH ends so the
    pair is a pure function of the data. Groups with fewer than 2
    candidates, a chosen==rejected collision, or margin < min_margin
    emit nothing. Scores compare on the rounded value (round_digits)
    so an ulp of upstream drift cannot flip a winner cross-engine.

    Returns (group, chosen_id, rejected_id, chosen_score,
    rejected_score, margin)."""
    s = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("cid"),
        F.round(F.col(score_col), round_digits).alias("score"),
    ).filter(F.col("score").isNotNull())
    w_hi = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    w_lo = Window.partitionBy("grp").orderBy(
        F.col("score").asc(), F.col("cid").asc()
    )
    ranked = s.select(
        "grp",
        "cid",
        "score",
        F.row_number().over(w_hi).alias("r_hi"),
        F.row_number().over(w_lo).alias("r_lo"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    hi = ranked.filter(F.col("r_hi") == 1).select(
        "grp",
        F.col("cid").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
        "n",
    )
    lo = ranked.filter(F.col("r_lo") == 1).select(
        "grp", F.col("cid").alias("rejected_id"), F.col("score").alias("rejected_score")
    )
    pairs = hi.join(lo, "grp").filter(
        (F.col("n") >= 2) & (F.col("chosen_id") != F.col("rejected_id"))
    )
    margin = F.round(F.col("chosen_score") - F.col("rejected_score"), round_digits)
    return (
        pairs.withColumn("margin", margin)
        .filter(F.col("margin") >= F.lit(min_margin))
        .select(
            F.col("grp").alias("group"),
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            "margin",
        )
    )
