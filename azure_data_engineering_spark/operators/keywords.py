"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
"Automatic Keyword Extraction from Individual Documents") as a
word-count-shaped plan.

RAKE's insight: content keywords are the maximal runs of non-stopword
tokens ("candidate phrases"), and a word matters when it appears in
long phrases (high co-occurrence degree) relative to how often it
appears at all. Scores:

    deg(w)  = Σ over phrase occurrences containing w of len(phrase)
    score(w) = deg(w) / freq(w)
    score(phrase) = Σ score(w) over the phrase's words

The plan is two explodes + three map-side-combinable aggregates —
exactly the canonical word-count shape, so it scales like q_vocab_topk:
no joins touch anything bigger than the (word) and (phrase) vocabulary
frames. Phrase splitting is ONE regexp pass: normalized text has every
stopword token replaced by a '|' delimiter, then splits — an identical
RE2-safe expression on both engines.

Determinism: deg and freq are exact integers; per-word scores are
rounded to 9 dp and summed as exact decimals into phrase scores, so
the final (score desc, phrase) top-k total order is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

# the compact English stopword list shipped with the original RAKE
# evaluation corpora, trimmed to the high-frequency core; a LITERAL so
# the SQL twin embeds the same alternation
RAKE_STOPWORDS = (
    "a an and are as at be by for from has have he her his i in is it "
    "its my not of on or our she that the their they this to was we "
    "were will with you your"
).split()


def rake_phrases(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc id, phrase) candidate frame: maximal non-stopword runs of
    the normalized text, multi-occurrence preserved."""
    alt = "|".join(RAKE_STOPWORDS)
    # normalize, then delimit every stopword token; runs of delimiters
    # and blanks collapse when splitting
    marked = F.regexp_replace(
        normalize_text(F.col(text_col)), rf"\b({alt})\b", "|"
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(marked, r"\|")).alias("phrase_raw"),
        )
        .select("doc_id", F.trim(F.col("phrase_raw")).alias("phrase"))
        .filter(F.col("phrase") != "")
    )


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 20,
    min_count: int = 2,
    out_decimals: int = 6,
) -> DataFrame:
    """Corpus-level RAKE keywords: top_k phrases by summed member-word
    score (ties broken by phrase), each with its occurrence count.
    Phrases seen fewer than `min_count` times are dropped first —
    corpus keywords should recur."""
    phrases = rake_phrases(df, id_col, text_col)
    words = phrases.select(
        "phrase",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        (F.size(F.split(F.col("phrase"), " "))).alias("plen"),
    )
    wscore = (
        words.groupBy("w")
        .agg(
            F.sum("plen").cast("long").alias("deg"),
            F.count(F.lit(1)).cast("long").alias("freq"),
        )
        .select(
            "w",
            F.round(F.col("deg").cast("double") / F.col("freq").cast("double"), 9)
            .cast("decimal(20,9)")
            .alias("wscore"),
        )
    )
    pcount = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    ).filter(F.col("n_occurrences") >= min_count)
    # distinct member words per phrase (RAKE sums each member once)
    members = (
        pcount.select(
            "phrase", F.explode(F.array_distinct(F.split(F.col("phrase"), " "))).alias("w")
        )
    )
    pscore = (
        members.join(wscore, "w")
        .groupBy("phrase")
        .agg(F.sum("wscore").alias("__s"))
        .select(
            "phrase",
            F.round(F.col("__s").cast("double"), out_decimals).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("phrase").asc())
    return (
        pcount.join(pscore, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            "score",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= top_k)
        .select(F.col("rank").cast("long").alias("rank"), "phrase", "n_occurrences", "score")
    )


def log_odds_terms(
    df: DataFrame,
    text_col: str,
    is_a_col: str,
    alpha0: float = 500.0,
    min_count: int = 5,
    top_k: int = 15,
    round_digits: int = 6,
) -> DataFrame:
    """"Fightin' words" — log-odds-ratio with an informative Dirichlet
    prior (Monroe, Colaresi & Quinn, Political Analysis 2008): which
    terms distinguish corpus A from corpus B, shrunk toward the pooled
    distribution so rare words can't dominate. For term w with counts
    y_aw / y_bw, totals n_a / n_b, prior α_w = α0·(y_aw+y_bw)/(n_a+n_b)
    (so Σα = α0):

        δ_w = ln[(y_aw+α_w)/(n_a+α0-y_aw-α_w)]
            - ln[(y_bw+α_w)/(n_b+α0-y_bw-α_w)]
        z_w = δ_w / sqrt(1/(y_aw+α_w) + 1/(y_bw+α_w))

    The corpus-comparison primitive behind "what words make source X
    different" dashboards — strictly better than raw frequency ratios
    (Monroe et al. §3 demolishes those).

    Scale shape: ONE tokenize+count pass to (term, y_a, y_b); totals
    re-aggregate from it (broadcast 1-row); every score is arithmetic
    over exact integers + the α0 literal, so both engines evaluate
    identical doubles. Emits top_k most-A and top_k most-B terms by
    rounded z (term tiebreak), side-tagged."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
    pairs = (
        df.select(F.col(is_a_col).cast("int").alias("ia"), toks)
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.sum("ia").cast("long").alias("ya"),
            F.sum(1 - F.col("ia")).cast("long").alias("yb"),
        )
    )
    tot = pairs.agg(
        F.sum("ya").cast("long").alias("na"), F.sum("yb").cast("long").alias("nb")
    )
    scored = (
        pairs.filter(F.col("ya") + F.col("yb") >= min_count)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "alpha",
            F.lit(alpha0)
            * (F.col("ya") + F.col("yb")).cast("double")
            / (F.col("na") + F.col("nb")).cast("double"),
        )
    )
    ya = F.col("ya").cast("double") + F.col("alpha")
    yb = F.col("yb").cast("double") + F.col("alpha")
    delta = F.log(
        ya / (F.col("na").cast("double") + F.lit(alpha0) - ya)
    ) - F.log(yb / (F.col("nb").cast("double") + F.lit(alpha0) - yb))
    z = F.round(delta / F.sqrt(1.0 / ya + 1.0 / yb), round_digits)
    zed = scored.select("term", "ya", "yb", z.alias("z"))
    top_a = (
        zed.orderBy(F.col("z").desc(), F.col("term").asc())
        .limit(top_k)
        .withColumn("side", F.lit("A"))
    )
    top_b = (
        zed.orderBy(F.col("z").asc(), F.col("term").asc())
        .limit(top_k)
        .withColumn("side", F.lit("B"))
    )
    return top_a.unionByName(top_b).select("side", "term", "ya", "yb", "z")


def textrank_word_edges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 3,
) -> DataFrame:
    """TextRank candidate graph (Mihalcea & Tarau, EMNLP 2004): nodes
    are normalized content words (lowercase, ≥min_len letters, not a
    stopword), edges connect words ADJACENT in the filtered token
    sequence of any document, both directions, distinct. Corpus-level
    (all docs vote into one graph), so the node set is
    vocabulary-sized while the scan is one pass of corpus tokens."""
    pat = "^[a-z]{%d,}$" % min_len
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "pos", "tok"
            ),
        )
        .filter(F.col("tok").rlike(pat))
        .filter(~F.col("tok").isin(list(RAKE_STOPWORDS)))
    )
    w = Window.partitionBy("doc").orderBy("pos")
    pairs = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("tok")))
        .select(F.col("tok").alias("src"), F.col("nxt").alias("dst"))
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def textrank_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 25,
    iterations: int = 4,
    damping: float = 0.85,
    min_len: int = 3,
) -> DataFrame:
    """Corpus TextRank keywords: PageRank over the word-adjacency
    graph (textrank_word_edges) — the unsupervised keyword extractor
    that beats frequency because a word matters when IMPORTANT words
    co-occur with it, recursively. Composes the engine's own
    operators/graph.pagerank (fixed damped rounds, dangling-mass
    redistribution, one join + one aggregate per round,
    localCheckpoint lineage truncation), so the result is a pure
    algebraic function of the edge set that an oracle can replay by
    unrolling the rounds. Returns the top_n words as (word, rank,
    position) under the deterministic (round(rank,6) desc, word)
    order."""
    from azure_data_engineering_spark.operators.graph import pagerank

    edges = textrank_word_edges(df, id_col, text_col, min_len=min_len)
    pr = pagerank(edges, iterations=iterations, damping=damping)
    w = Window.orderBy(F.col("rank").desc(), F.col("word").asc())
    return (
        pr.select(F.col("node").alias("word"), F.round("rank", 6).alias("rank"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .filter(F.col("position") <= top_n)
    )
