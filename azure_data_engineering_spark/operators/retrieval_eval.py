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


def map_at_k(
    ann: DataFrame,
    truth: DataFrame,
    ks: Sequence[int] = (1, 3, 5),
    round_digits: int = 6,
) -> DataFrame:
    """MAP@k — mean average precision with binary relevance: an ANN
    neighbor is relevant iff it sits in the query's truth top-k (the
    same re-ranked-pos gate ndcg_at_k uses). Per query,

        AP@k = Σ_{r≤k, rel(r)} P@r / min(n_rel_q, k),  P@r = cum_rel/r

    and MAP is the mean over ALL truth queries (a query the candidate
    list missed scores 0 instead of dropping out). The rank-sensitive
    cousin of recall@k — it pays for putting the right answers high,
    not just somewhere in the list.

    Determinism: each P@r summand and each per-query AP is rounded to
    a 9 dp DECIMAL before its sum, so panel means are
    summation-order-free. Plan: one panel-sized equi-join + bounded
    windows — nothing corpus-sized. One row per k: (k, map)."""
    kcol = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    w = Window.partitionBy("query_id").orderBy("true_rank", "neighbor_id")
    t = truth.select(
        "query_id", "neighbor_id", F.col("rank").alias("true_rank")
    ).withColumn("pos", F.row_number().over(w))
    a = ann.select("query_id", "neighbor_id", F.col("rank").alias("ann_rank"))
    pairs = a.join(
        t.select("query_id", "neighbor_id", "pos"),
        ["query_id", "neighbor_id"],
        "left",
    ).select("query_id", "ann_rank", "pos", kcol)
    # cumulative relevant count along the candidate ranking (per k)
    w_rank = Window.partitionBy("query_id", "k").orderBy("ann_rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rel = F.when(F.col("pos") <= F.col("k"), 1).otherwise(0)
    scored = pairs.withColumn("rel", rel).withColumn(
        "cum_rel", F.sum("rel").over(w_rank)
    )
    p_at_r = F.round(
        F.col("cum_rel").cast("double") / F.col("ann_rank").cast("double"), 9
    ).cast("decimal(20,9)")
    per_q = (
        scored.filter((F.col("ann_rank") <= F.col("k")) & (F.col("rel") == 1))
        .groupBy("query_id", "k")
        .agg(F.sum(p_at_r).alias("ap_num"))
    )
    n_rel = t.select("query_id", "pos", kcol).groupBy("query_id", "k").agg(
        F.sum(F.when(F.col("pos") <= F.col("k"), 1).otherwise(0)).alias("n_rel")
    )
    per_q_ap = F.round(
        F.coalesce(F.col("ap_num"), F.lit(0).cast("decimal(20,9)")).cast("double")
        / F.least(F.col("n_rel"), F.col("k")).cast("double"),
        9,
    ).cast("decimal(20,9)")
    return (
        n_rel.join(per_q, ["query_id", "k"], "left")
        .groupBy("k")
        .agg(
            F.round(
                F.sum(per_q_ap).cast("double") / F.count(F.lit(1)), round_digits
            ).alias("map")
        )
        .select(F.col("k").cast("long").alias("k"), "map")
    )


def reciprocal_rank_fusion(
    rankings: Sequence[DataFrame],
    k0: int = 60,
    top_k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009): combine N rankings of the same query panel by
    score(q, d) = Σ_lists 1/(k0 + rank_list(q, d)) and re-rank — the
    standard zero-training way to fuse lexical (BM25) and vector
    retrieval, robust because it only consumes RANKS, never
    incomparable raw scores.

    Each input frame carries (query_id, neighbor_id, rank). Summands
    1/(k0+rank) are rounded to 9 dp DECIMALs so the fused score is an
    EXACT sum — the ORDER BY that produces the fused rank compares
    exact decimals, not drift-prone doubles (ties then break on
    neighbor_id). Plan: one unionByName + one (query, neighbor)
    groupBy + one panel-sized top-k window (WindowGroupLimit prunes
    during the sort). Returns (query_id, neighbor_id, n_lists,
    rrf_score, fused_rank) for the top_k fused rows per query."""
    tagged = None
    for r in rankings:
        cur = r.select("query_id", "neighbor_id", "rank")
        tagged = cur if tagged is None else tagged.unionByName(cur)
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(k0)) + F.col("rank").cast("double")), 9
    ).cast("decimal(20,9)")
    fused = tagged.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum(contrib).alias("score_d"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_d").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            "n_lists",
            F.round(F.col("score_d").cast("double"), round_digits).alias("rrf_score"),
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


def err_at_k(
    ann: DataFrame,
    truth: DataFrame,
    k: int = 5,
    gmax: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Expected reciprocal rank (Chapelle et al., CIKM 2009) — the
    CASCADE-model metric the position-discount family (NDCG/MAP) is
    not: a user scans down and STOPS at the first satisfying result,
    so a near-perfect hit at rank 1 makes everything below it almost
    worthless. ERR is the metric that says so; NDCG still credits the
    tail.

        R_i   = (2^{g_i} − 1) / 2^{gmax}         (stop probability)
        ERR@k = Σ_{i≤k} (1/i) · R_i · Π_{j<i} (1 − R_j)

    Grades come from the TRUTH ranking: its re-ranked position p maps
    to g = gmax + 1 − p (clamped ≥ 0), so the exact top hit carries
    gmax. Every R is a dyadic rational < 1 (no zero to guard), the
    survival product uses the engine's exp-of-summed-ln discipline
    with each ln term rounded to 9 dp, and per-position ERR summands
    round to 9 dp DECIMALs. All windows run on the ≤k-rows-per-query
    candidate frame. Returns one row per query: (query_id,
    n_ranked, err)."""
    wt = Window.partitionBy("query_id").orderBy("true_rank", "neighbor_id")
    graded = truth.select(
        "query_id", "neighbor_id", F.col("rank").alias("true_rank")
    ).withColumn("pos", F.row_number().over(wt)).select(
        "query_id",
        "neighbor_id",
        F.greatest(F.lit(0), F.lit(gmax + 1) - F.col("pos")).alias("g"),
    )
    cand = (
        ann.select("query_id", "neighbor_id", F.col("rank").alias("ann_rank"))
        .filter(F.col("ann_rank") <= k)
        .join(graded, ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            "ann_rank",
            (
                (F.pow(F.lit(2.0), F.coalesce(F.col("g"), F.lit(0)).cast("double")) - 1.0)
                / float(2**gmax)
            ).alias("r"),
        )
    )
    prior = (
        Window.partitionBy("query_id")
        .orderBy("ann_rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = cand.withColumn(
        "surv",
        F.coalesce(
            F.exp(F.sum(F.round(F.log(1.0 - F.col("r")), 9)).over(prior)), F.lit(1.0)
        ),
    ).select(
        "query_id",
        F.round(F.col("r") / F.col("ann_rank") * F.col("surv"), 9)
        .cast("decimal(38,9)")
        .alias("c"),
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
            F.round(F.sum("c").cast("double"), round_digits).alias("err"),
        )
        .orderBy("query_id")
    )
