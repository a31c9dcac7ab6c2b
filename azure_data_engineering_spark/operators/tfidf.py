"""TF-IDF term weighting over a document corpus.

The classic sparse-retrieval / keyword-importance primitive (Salton &
Buckley 1988), used in data pipelines for topic filtering, near-dup
triage, and building keyword indexes over pretraining corpora.

Spark-first plan: explode normalized tokens once, then two hash
aggregations — (doc, term) term frequencies and per-term document
frequencies — joined on term. Both aggregations combine map-side, so
the shuffles carry distinct (doc, term) / (term) partials, never raw
text: the word-count shape that scales linearly to 100 TB. The
doc-frequency side is aggregated to |vocab| rows before the join, and
Spark/AQE broadcasts it when the vocabulary fits (it usually does —
vocab grows sub-linearly in corpus size).

Weighting: tf = raw count, idf = ln(N / df) (no smoothing — matches
the textbook form and is exactly reproducible in ANSI SQL for the
oracle). Tokenization = dedup.normalize_text split on spaces, shared
with the dedup/minhash stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — raw counts of non-empty normalized tokens."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf, df_count, tfidf) for every (doc, term) pair."""
    n_docs = df.select(id_col).distinct().count()
    tf = term_frequencies(df, text_col, id_col)
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    return tf.join(docfreq, "term").select(
        id_col,
        "term",
        "tf",
        "df_count",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_count"))).alias("tfidf"),
    )


def top_terms_per_doc(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """The k highest-tfidf terms per document (tfidf desc, term asc
    tiebreak — deterministic). WindowGroupLimit prunes to k per doc
    during the sort, so the shuffle output is bounded at k·|docs|."""
    scored = tfidf(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "df_count", F.round("tfidf", 6).alias("tfidf"), F.col("__rn").alias("term_rank"))
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str,
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranking (Robertson & Walker, SIGIR 1994): the k
    best-matching documents for a bag-of-terms query. The default
    sparse-retrieval scorer everywhere TF-IDF has been retired —
    in curation pipelines it backs targeted corpus search and
    quality-probe retrieval.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len_d/avg_len))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    non-negative Robertson-Sparck-Jones form).

    Scale plan: the (doc, term) tf table is filtered to the query's
    terms BEFORE any join — the per-query work is |postings of query
    terms|, not |corpus| (the filter pushes into the tf aggregation's
    output; at 100 TB you'd serve this from a materialized tf table,
    which is exactly the `term_frequencies` output). Doc lengths ride
    along from one token-count projection; corpus stats (N, avg_len)
    are a 1-row broadcast frame, never a collect. Final top-k is a
    TakeOrderedAndProject, no full sort.

    Query terms go through the SAME normalization pipeline as the
    index (lowercase, non-alphanumerics to spaces — a raw term like
    "Spark-SQL" splits into the two index terms it actually produces;
    plain lowercasing would make it unmatchable forever). Duplicate
    query terms contribute multiplicatively: each term's score is
    weighted by its query-term frequency, the standard bag-of-terms
    BM25 treatment.
    """
    import re as _re

    from ..functions.text import normalize_text as _norm

    # normalize the query with the exact pipeline the index uses
    qtf: dict[str, int] = {}
    for raw in query_terms:
        for t in _re.sub(r"[^a-z0-9]+", " ", raw.lower()).split():
            qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return df.select(id_col).limit(0).withColumn(
            "bm25", F.lit(None).cast("double")
        )

    toks = F.split(_norm(F.col(text_col)), " ")
    lens = df.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda t: t != "")).cast("double").alias("dl"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    tf = term_frequencies(df, text_col, id_col).filter(
        F.col("term").isin(list(qtf))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    idf = docfreq.join(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df_count") + 0.5) / (F.col("df_count") + 0.5)
        ).alias("idf"),
        "avg_dl",
    )
    # query-term multiplicity as a tiny literal map (broadcast by value)
    qtf_map = F.create_map(
        *[F.lit(x) for t, n in sorted(qtf.items()) for x in (t, float(n))]
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, id_col)
        .select(
            F.col(id_col),
            (
                qtf_map[F.col("term")]
                * F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avg_dl"))
                )
            ).alias("term_score"),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def query_likelihood_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str,
    id_col: str,
    k: int = 10,
    mu: float = 2000.0,
    round_digits: int = 6,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty,
    SIGIR 2001) — the language-modeling retrieval scorer beside
    bm25_search (Indri/Galago's default; LM retrieval is also the
    probabilistic ancestor of the Kneser-Ney quality screens in
    operators/lm):

        score(d) = Σ_t qtf_t · ln( (tf_{t,d} + μ·p(t|C)) / (len_d + μ) )

    with p(t|C) the collection unigram model cf_t/|C| and μ the
    Dirichlet prior mass. Candidates are documents matching ≥ 1 query
    term (the standard inverted-index restriction); for those, EVERY
    query term contributes — missing terms through the background
    model alone, so long documents are not rewarded for padding.

    Scale plan mirrors bm25_search: the (doc, term) tf table filters
    to the query's terms BEFORE any join (per-query work =
    |postings|, not |corpus|); collection stats ride a broadcast
    term-frame; candidates × query-terms is |candidates|·|q| rows.
    Per-term log arguments are exact ratios rounded to 9 dp before
    ln. Final top-k is TakeOrderedAndProject. Query normalization is
    the index's own pipeline (the bm25_search contract). Returns
    (id, ql_score) for the top k, ties broken by id."""
    import re as _re

    from ..functions.text import normalize_text as _norm

    qtf: dict[str, int] = {}
    for raw in query_terms:
        for t in _re.sub(r"[^a-z0-9]+", " ", raw.lower()).split():
            qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return df.select(id_col).limit(0).withColumn(
            "ql_score", F.lit(None).cast("double")
        )
    spark = df.sparkSession

    toks = F.split(_norm(F.col(text_col)), " ")
    lens = df.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda t: t != "")).cast("long").alias("dl"),
    )
    coll_len = lens.agg(F.sum("dl").cast("long").alias("cl"))
    tf = term_frequencies(df, text_col, id_col).filter(
        F.col("term").isin(list(qtf))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    qterms = F.broadcast(
        spark.createDataFrame(
            sorted(qtf.items()), "term string, q_tf int"
        )
        .join(cf, "term", "left")
        .crossJoin(F.broadcast(coll_len))
        .select(
            "term",
            "q_tf",
            # background model p(t|C); an unseen term would zero every
            # candidate, so it is floored at 1/|C| (epsilon smoothing)
            F.round(
                F.greatest(F.coalesce(F.col("cf"), F.lit(0)), F.lit(1)).cast(
                    "double"
                )
                / F.col("cl").cast("double"),
                12,
            ).alias("p_c"),
        )
    )
    cands = tf.select(id_col).distinct().join(lens, id_col)
    grid = cands.crossJoin(qterms).join(
        tf.withColumnRenamed("tf", "tf_d"), [id_col, "term"], "left"
    )
    term_score = F.col("q_tf").cast("double") * F.round(
        F.log(
            F.round(
                (
                    F.coalesce(F.col("tf_d"), F.lit(0)).cast("double")
                    + float(mu) * F.col("p_c")
                )
                / (F.col("dl").cast("double") + float(mu)),
                12,
            )
        ),
        9,
    )
    scored = grid.groupBy(id_col).agg(
        F.round(F.sum(F.round(term_score, 9)), round_digits).alias("ql_score")
    )
    return scored.orderBy(F.col("ql_score").desc(), F.col(id_col).asc()).limit(k)
