"""Market-basket affinity: association rules over co-occurrence.

Classic support / confidence / lift rule mining (Agrawal, Imielinski
& Swami, SIGMOD 1993) restricted to pairwise rules — the 2-itemset
slice of Apriori, which is the part that matters for
recommendation-style "bought X -> consider Y" surfaces and is the
only part with a tractable exact plan at warehouse scale (longer
itemsets explode combinatorially and are mined on samples).

Scale shape: the pair generation is a self-join of the (basket,
item) table on the basket key — pair volume is sum over baskets of
C(|basket|, 2), bounded by basket size (TPC-H ≤ 7 lines; retail
carts tens), never by item-catalog size. One shuffle hashes the
basket key; item-level marginals reuse the same (basket, item)
table. min_support prunes before the rule join, so the rules frame
is small enough that the singles marginals broadcast onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise association rules a -> b (BOTH directions emitted)
    with:

        support(a,b) = n_ab / n_baskets
        confidence(a->b) = n_ab / n_a
        lift(a->b) = confidence / (n_b / n_baskets)

    over distinct (basket, item) pairs (multiplicity within a basket
    does not count). Returns (antecedent, consequent, n_pair,
    support, confidence, lift) for pairs with n_ab >= min_pair_count.
    """
    bi = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = bi.agg(F.countDistinct("bk").cast("double").alias("__nb"))
    singles = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    # both rule directions from each unordered pair
    rules = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "n_pair"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "n_pair"
        )
    )
    sa = singles.select(F.col("item").alias("antecedent"), F.col("n_item").alias("n_a"))
    sb = singles.select(F.col("item").alias("consequent"), F.col("n_item").alias("n_b"))
    return (
        rules.join(sa, "antecedent")
        .join(sb, "consequent")
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(F.col("n_pair") / F.col("__nb"), round_digits).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), round_digits).alias("confidence"),
            F.round(
                (F.col("n_pair") / F.col("n_a")) / (F.col("n_b") / F.col("__nb")),
                round_digits,
            ).alias("lift"),
        )
    )


def item_similarity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Item-item co-occurrence cosine — the classic neighborhood
    collaborative-filtering similarity (Sarwar et al., WWW 2001):

        sim(a, b) = n_ab / sqrt(n_a * n_b)

    over distinct (basket, item) incidence. Same bounded pair
    generation as association_rules (pair volume scales with basket
    size, never catalog size); the statistic is a single sqrt over
    exact integer counts, so round(., 6) is engine-identical.
    Returns one row per unordered pair (item_a < item_b):
    (item_a, item_b, n_pair, cosine)."""
    bi = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    singles = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    sa = singles.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    sb = singles.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(
                F.col("n_pair") / F.sqrt(F.col("n_a") * F.col("n_b")), round_digits
            ).alias("cosine"),
        )
    )


def recommend_top_n(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    sims: DataFrame,
    n: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Item-based CF recommendation — the last mile on top of
    item_similarity (Sarwar et al., WWW 2001 §4): a user's score for
    candidate item c is the SUM of similarities between c and the
    items in the user's history; seen items are excluded; top-n per
    user under a (score desc, item) total order.

    `sims` is the (item_a, item_b, cosine) frame item_similarity
    emits (each pair once, a < b); it is symmetrized here. Plan: one
    history×sims equi-join on the history item (volume bounded by the
    similarity fan-out per item, never catalog²), one groupBy, one
    left-anti seen filter, one per-user top-n window — every shuffle
    keys on user or item. Cosines are 6 dp-rounded decimals summed
    exactly, so scores and ranks are engine-identical."""
    hist = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("it")
    ).distinct()
    s = sims.select(
        F.col("item_a").alias("it"),
        F.col("item_b").alias("cand"),
        F.col("cosine").alias("sim"),
    ).unionByName(
        sims.select(
            F.col("item_b").alias("it"),
            F.col("item_a").alias("cand"),
            F.col("cosine").alias("sim"),
        )
    ).select(
        "it", "cand",
        F.round(F.col("sim"), round_digits).cast("decimal(18,6)").alias("sim"),
    )
    scored = (
        hist.join(s, "it")
        .groupBy("u", "cand")
        .agg(F.sum("sim").alias("__s"))
        .join(
            hist.select("u", F.col("it").alias("cand")),
            ["u", "cand"],
            "left_anti",
        )
        .select(
            "u",
            "cand",
            F.round(F.col("__s").cast("double"), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("u").orderBy(
        F.col("score").desc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= n)
        .select(
            F.col("u").alias(user_col),
            F.col("rec_rank").cast("long").alias("rec_rank"),
            F.col("cand").alias(item_col),
            "score",
        )
    )
