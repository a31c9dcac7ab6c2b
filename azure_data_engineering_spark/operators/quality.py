"""Repetition-based quality signals (Gopher-style) for corpus filtering.

Rae et al., "Scaling Language Models: ... Gopher" (2021), filter
pretraining documents on repetition statistics: the fraction of
duplicate lines/sentences and the fraction of characters claimed by the
most frequent word n-gram. Both are implemented Spark-first:

- `duplicate_unit_fraction` is pure array algebra (split /
  array_distinct) — whole-stage codegen, zero shuffle, linear in bytes.
- `top_ngram_stats` explodes n-grams and aggregates per (doc, gram) —
  two hash aggregations that combine map-side, so the shuffle carries
  only distinct (doc, gram) partial counts, never raw text. At 100 TB
  this is the same shape as a word-count, the canonical scale-safe job.

Reference parity: the reference has no quality stage (it is an ETL
service); this extends its sanitize-before-load step
(SharedCode/HelperFunction.py:36-41) with the statistical filters an
LLM corpus requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def duplicate_unit_fraction(col: Column, sep_regex: str = r"\.\s*") -> Column:
    """Fraction of text units (sentences by default, lines with
    sep_regex='\\n') that are duplicates of another unit in the same
    document. Empty units (e.g. after a trailing period) are ignored;
    documents with no units score 0.0."""
    units = F.filter(F.split(col, sep_regex), lambda u: F.trim(u) != "")
    n = F.size(units)
    dups = n - F.size(F.array_distinct(units))
    return F.when(n == 0, F.lit(0.0)).otherwise(dups / n)


def word_ngrams(col: Column, n: int = 2) -> Column:
    """Non-distinct word n-grams of lowercased whitespace-split text.

    zip_with chain over shifted slices — O(len) and codegen-friendly
    (a transform(sequence(...)) formulation is interpreted and O(len²);
    see operators/dedup.py:69 for the measured 15x gap). Documents with
    fewer than n words yield an empty array."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    m = F.size(words) - (n - 1)
    out = F.slice(words, 1, F.greatest(m, F.lit(0)))
    for j in range(1, n):
        out = F.zip_with(out, F.slice(words, j + 1, F.greatest(m, F.lit(0))), lambda x, y: F.concat_ws(" ", x, y))
    return F.when(m < 1, F.array().cast("array<string>")).otherwise(out)


def top_ngram_stats(df: DataFrame, text_col: str, id_col: str, n: int = 2) -> DataFrame:
    """Per-document most-frequent word n-gram and the fraction of the
    document's characters it accounts for (count * len(gram) / chars).

    Ties break on the lexicographically smallest gram so results are
    deterministic across partitionings and engines. Documents with no
    n-gram (fewer than n words) are kept with nulls and fraction 0.0.
    """
    grams = df.select(
        F.col(id_col),
        F.length(text_col).alias("_n_chars"),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy(id_col, "_n_chars", "gram").agg(F.count(F.lit(1)).alias("gram_count"))
    w = Window.partitionBy(id_col).orderBy(F.col("gram_count").desc(), F.col("gram").asc())
    top = counts.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    frac = F.when(
        F.col("gram").isNull() | (F.col("_n_chars") == 0), F.lit(0.0)
    ).otherwise(F.col("gram_count") * F.length("gram") / F.col("_n_chars"))
    return top.select(
        F.col(id_col),
        F.col("gram").alias("top_gram"),
        F.when(F.col("gram").isNull(), F.lit(0)).otherwise(F.col("gram_count")).alias("top_gram_count"),
        frac.alias("top_gram_char_frac"),
    )


def drop_repeated_units(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 3,
    sep_regex: str = r"\.\s*",
    joiner: str = ". ",
) -> DataFrame:
    """Cross-document boilerplate removal (the CCNet / RefinedWeb line-
    dedup stage): split each document into units (sentences by default),
    drop every unit whose normalized form appears in >= `min_docs`
    distinct documents, and reassemble the survivors in their original
    order.

    Scale shape: posexplode keeps (doc, position) lineage; the global
    unit-frequency table is a word-count-style hash aggregation (map-
    side combined, the shuffle carries distinct normalized units, not
    raw text); membership is one equi-join on the normalized unit; and
    reassembly is sort_array(collect_list(struct(pos, unit))) per doc —
    one shuffle on the doc id, no driver materialization. Returns
    (id_col, text_col (rebuilt), n_units, n_kept).
    """
    units = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_regex)).alias("__pos", "__unit"),
        )
        .filter(F.trim(F.col("__unit")) != "")
        .withColumn("__norm", F.lower(F.trim(F.col("__unit"))))
    )
    freq = units.groupBy("__norm").agg(F.count_distinct(F.col(id_col)).alias("__nd"))
    kept = units.join(freq, "__norm").filter(F.col("__nd") < min_docs)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__unit"))),
                lambda s: s["__unit"],
            ),
            joiner,
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = units.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_units"))
    # left join back so fully-boilerplate docs survive with empty text
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            "n_units",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )
