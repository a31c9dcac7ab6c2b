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
