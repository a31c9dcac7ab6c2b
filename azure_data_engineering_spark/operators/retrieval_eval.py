"""Retrieval-quality evaluation: recall@k and MRR for ANN results.

Closes the loop on the ANN family (similarity.py, ivf.py): an
embedding-search migration is only safe when the approximate index is
continuously scored against exact truth on a bounded query set — this
module is that dashboard. Truth comes from the existing brute-force
pass (similarity.brute_force_top_k) over the SAME query set, computed
in-plan; at 100 TB the query panel is a few thousand rows, so the truth
pass is panel x corpus work batched through the same broadcast
machinery the ANN paths use, while the metrics themselves aggregate a
panel-sized join — negligible next to the index it audits.

Metrics (standard IR definitions):
- recall@k: |ANN top-k  ∩  true top-k| / |true top-k|, aggregated over
  the panel (per-query recall on weakly-clustered embeddings is
  high-variance by nature — same argument as _ann_recall_frame).
- MRR: mean over queries of 1/rank of the TRUE nearest neighbor within
  the ANN list (0 when the true NN is absent) — "how high does the one
  right answer sit".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    ann: DataFrame,
    truth: DataFrame,
    ks: Sequence[int] = (1, 3, 5),
    round_digits: int = 6,
) -> DataFrame:
    """One row per k in `ks`: (k, n_true, recall, mrr). `ann` and
    `truth` both carry (query_id, neighbor_id, rank) with rank 1-based
    and dense per query (the shape every top-k operator in the engine
    returns). MRR is k-independent and repeated on each row for a
    self-contained dashboard frame.

    Plan: ONE equi-join of the two panel-sized frames on
    (query_id, neighbor_id), then conditional aggregation per k over a
    literal-exploded k column — no shuffle touches anything
    corpus-sized."""
    kcol = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    a = ann.select(
        "query_id", "neighbor_id", F.col("rank").alias("ann_rank")
    )
    t = truth.select(
        "query_id", "neighbor_id", F.col("rank").alias("true_rank")
    )
    hits = t.join(a, ["query_id", "neighbor_id"], "left")

    n_queries = truth.select("query_id").distinct().count()
    mrr_frame = (
        hits.filter(F.col("true_rank") == 1)
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("ann_rank").isNotNull(), 1.0 / F.col("ann_rank")
                    ).otherwise(0.0)
                )
                / F.lit(float(n_queries))
            ).alias("mrr")
        )
        .select(F.round("mrr", round_digits).alias("mrr"))
    )

    per_k = (
        hits.select("true_rank", "ann_rank", kcol)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("_n_pairs"),
            F.sum(
                F.when(F.col("true_rank") <= F.col("k"), F.lit(1)).otherwise(0)
            ).alias("n_true"),
            F.sum(
                F.when(
                    (F.col("true_rank") <= F.col("k"))
                    & (F.col("ann_rank") <= F.col("k")),
                    F.lit(1),
                ).otherwise(0)
            ).alias("_n_hit"),
        )
        .select(
            "k",
            "n_true",
            F.round(F.col("_n_hit") / F.col("n_true"), round_digits).alias(
                "recall"
            ),
        )
    )
    return per_k.crossJoin(F.broadcast(mrr_frame))


def ndcg_at_k(
    ann: DataFrame,
    truth: DataFrame,
    ks: Sequence[int] = (1, 3, 5),
    round_digits: int = 6,
) -> DataFrame:
    """NDCG@k with binary relevance (Järvelin & Kekäläinen 2002): an
    ANN neighbor is relevant iff it appears in the exact top-k for the
    same query. One row per k: (k, ndcg).

    DCG@k = Σ_{r≤k, relevant} gain(r) with gain(r) = 1/log2(r+1);
    IDCG@k packs each query's OWN truth rows into the top positions
    (Σ_{r=1..min(n_truth_q,k)} gain(r)), so short truth lists are
    normalized correctly. NDCG is the mean of per-query DCG/IDCG over
    ALL truth queries — a query missing from `ann` scores 0 rather
    than silently leaving the panel.

    Determinism discipline: the only transcendental is log2 over the
    FIXED rank set 1..max(k); each gain is rounded to 9 dp and summed
    as an exact decimal, so a last-ulp libm difference between engines
    cannot move the metric. Plan: the same panel-sized
    (query_id, neighbor_id) equi-join as retrieval_metrics — nothing
    corpus-sized is touched."""
    kcol = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    gain = F.round(
        F.lit(1.0) / F.log2(F.col("ann_rank").cast("double") + 1.0), 9
    ).cast("decimal(20,9)")
    a = ann.select("query_id", "neighbor_id", F.col("rank").alias("ann_rank"))
    # Re-rank truth by row_number over (true_rank, neighbor_id) ONCE
    # and use that same re-ranked position `pos` for BOTH the DCG
    # relevance gate and the IDCG packing. Gating DCG on the RAW
    # true_rank while packing IDCG from re-ranked positions would make
    # a perfect ranking score < 1.0 whenever truth ranks are non-dense
    # (e.g. ranks {1,7} with k=3: raw-gated DCG can never credit the
    # rank-7 row, but IDCG counts it at position 2).
    w = Window.partitionBy("query_id").orderBy("true_rank", "neighbor_id")
    t = truth.select(
        "query_id", "neighbor_id", F.col("rank").alias("true_rank")
    ).withColumn("pos", F.row_number().over(w))
    pairs = a.join(
        t.select("query_id", "neighbor_id", "pos"),
        ["query_id", "neighbor_id"],
        "left",
    ).select("query_id", "ann_rank", "pos", kcol)
    per_q = pairs.groupBy("query_id", "k").agg(
        F.sum(
            F.when(
                (F.col("ann_rank") <= F.col("k"))
                & (F.col("pos") <= F.col("k")),
                gain,
            ).otherwise(F.lit(0).cast("decimal(20,9)"))
        ).alias("dcg")
    )
    # IDCG is computed PER QUERY from that query's own truth rows: the
    # ideal ordering packs the query's relevant items into positions
    # 1..min(n_truth_q, k), so a query with fewer than k truth rows is
    # normalized by its own shorter ideal list, not a global dense-1..k
    # assumption. Because DCG above gates on the SAME re-ranked `pos`,
    # DCG's attainable maximum equals IDCG exactly, dense ranks or not.
    # The truth frame is panel-sized, so the window is bounded.
    ideal = (
        t.select("query_id", "pos", kcol)
        .groupBy("query_id", "k")
        .agg(
            F.sum(
                F.when(
                    F.col("pos") <= F.col("k"),
                    F.round(
                        F.lit(1.0) / F.log2(F.col("pos").cast("double") + 1.0),
                        9,
                    ).cast("decimal(20,9)"),
                ).otherwise(F.lit(0).cast("decimal(20,9)"))
            ).alias("idcg")
        )
    )
    # The panel is anchored on TRUTH queries: a query the ANN index
    # failed to return at all contributes NDCG 0 to the mean instead
    # of silently dropping out (which would inflate the metric).
    # per-query NDCG is rounded to 9 dp and averaged as an exact
    # decimal so the panel mean is summation-order-free.
    per_q_ndcg = F.round(
        F.coalesce(F.col("dcg"), F.lit(0).cast("decimal(20,9)")).cast("double")
        / F.col("idcg").cast("double"),
        9,
    ).cast("decimal(20,9)")
    return (
        ideal.join(per_q, ["query_id", "k"], "left")
        .groupBy("k")
        .agg(
            F.round(
                F.sum(per_q_ndcg).cast("double") / F.count(F.lit(1)),
                round_digits,
            ).alias("ndcg")
        )
        .select(F.col("k").cast("long").alias("k"), "ndcg")
    )
