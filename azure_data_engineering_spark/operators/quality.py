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


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 2,
    min_count: int = 5,
    k: int = 50,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks, 1990): ordered word pairs co-occurring within `window`
    positions, scored PMI = ln(p(a,b) / (p(a) p(b))) with pair
    probabilities over the skip-gram pair space and unigram
    probabilities over the token space. The standard corpus-analysis
    lens for multi-word expressions and boilerplate discovery
    (a curation signal: top PMI pairs that are template fragments
    flag machine-generated text).

    Scale shape: posexplode tokens, self-join ON THE DOCUMENT KEY with
    the position window as a join residual — candidate volume is
    O(corpus_tokens * window), linear in the corpus, never the O(L^2)
    all-pairs-within-document blowup. One pair-count agg with map-side
    combine; unigram totals and the two corpus scalars ride 1-row
    broadcast frames. min_count filters BEFORE the top-k (PMI's
    low-frequency pathology: a pair seen once between two hapaxes
    maxes the score). Output ordering is total: (pmi DESC, w1, w2)
    on the ROUNDED score, so the top-k set is engine-portable."""
    from ..functions.text import normalize_text

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
            )
        ).alias("__pos", "__w"),
    )
    a = toks.select(
        F.col("__id"), F.col("__pos").alias("__pa"), F.col("__w").alias("w1")
    )
    b = toks.select(
        F.col("__id"), F.col("__pos").alias("__pb"), F.col("__w").alias("w2")
    )
    pairs = a.join(b, "__id").filter(
        (F.col("__pb") > F.col("__pa"))
        & (F.col("__pb") - F.col("__pa") <= int(window))
    )
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    total_pairs = pair_counts.agg(
        F.sum("n_pair").cast("double").alias("__np_total")
    )
    uni = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("n_w"))
    total_words = uni.agg(F.sum("n_w").cast("double").alias("__nw_total"))
    # unigram joins stay plain equi-joins: the vocabulary is NOT
    # broadcastable at corpus scale (100M+ distinct words on the web);
    # AQE broadcasts it when it is small, shuffles when it isn't
    scored = (
        pair_counts.filter(F.col("n_pair") >= int(min_count))
        .join(uni.select(F.col("__w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("__w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(total_pairs))
        .crossJoin(F.broadcast(total_words))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("__np_total"))
                    / (
                        (F.col("n_w1") / F.col("__nw_total"))
                        * (F.col("n_w2") / F.col("__nw_total"))
                    )
                ),
                round_digits,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(int(k))


def novelty_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    reference: DataFrame,
    ref_text_col: str,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction
    of the doc's distinct word k-shingles that do NOT occur anywhere
    in the reference —

        novelty = 1 - |grams(doc) ∩ grams(ref)| / |grams(doc)|

    The continuous complement of benchmark decontamination
    (operators/decontaminate.py drops docs over an overlap threshold;
    this SCORES overlap for mixing/sampling decisions — e.g. boost
    novel documents, de-weight near-paraphrases of an existing
    corpus).

    Scale shape: the reference collapses to its DISTINCT gram set
    once (one agg); docs explode to (id, gram) and LEFT-join that set
    on the gram key — an equi-join shuffle bounded by gram counts,
    never a doc x ref pair join. Hot boilerplate grams are plain join
    keys handled by AQE. Returns (id, n_grams, n_seen, novelty)."""
    from .dedup import shingles

    ref_grams = (
        reference.select(F.explode(shingles(F.col(ref_text_col), k)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_grams = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("g")
    )
    per_doc = (
        doc_grams.join(ref_grams, "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_seen"),
        )
    )
    return per_doc.withColumn(
        "novelty",
        F.round(1.0 - F.col("n_seen") / F.col("n_grams"), round_digits),
    )


def term_burstiness(
    toks: DataFrame,
    doc_col: str,
    term_col: str,
    n_docs_total: DataFrame,
    min_df: int = 5,
    top_k: int = 30,
    out_decimals: int = 6,
) -> DataFrame:
    """Bursty-term screen via the variance-to-mean ratio of per-doc
    term counts over the WHOLE corpus, zeros included (Church & Gale
    1995, "Poisson mixtures"): for Poisson (content-neutral) usage
    VMR ≈ 1; boilerplate and template terms concentrate in few docs
    and push VMR far above 1 — the signal that separates navigation
    chrome and legalese from vocabulary before a dedup/quality pass.

    With T = Σc total occurrences over N docs and Σc² summed over
    docs containing the term (zero docs contribute zero):
    mean = T/N, var = (Σc² − T²/N)/(N−1) — all exact integer inputs,
    one division tree, engine-identical. `toks` is the exploded
    (doc, term) frame; `n_docs_total` a 1-row frame with column n
    (include empty docs in it — they dilute every term equally).
    Output: top_k terms by (vmr desc, term) among terms with
    document frequency ≥ min_df."""
    per = toks.groupBy(F.col(term_col).alias("term"), F.col(doc_col).alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    per_term = per.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    n = F.col("n").cast("double")
    t = F.col("total").cast("double")
    vmr = F.round(
        ((F.col("ss").cast("double") - t * t / n) / (n - 1)) / (t / n),
        out_decimals,
    )
    w = Window.orderBy(F.col("vmr").desc(), F.col("term").asc())
    return (
        per_term.filter(F.col("df") >= min_df)
        .join(F.broadcast(n_docs_total))
        .select("term", "df", "total", vmr.alias("vmr"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col("rank").cast("long").alias("rank"), "term", "df", "total", "vmr")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    round_digits: int = 6,
) -> DataFrame:
    """The Gopher corpus-quality rule set (Rae et al. 2021, table A1 —
    the published heuristics behind MassiveText, reused by most
    open-data pipelines since): per document,

    - word count in [min_words, max_words]
    - mean word length in [3, 10] characters
    - symbol-to-word ratio ('#' or '...') ≤ 0.1
    - ≥ 80% of words contain at least one alphabetic character
    - at least 2 of the 8 canonical stop words present

    Scale shape: every metric is a pure Column HOF over the in-row
    token array — zero shuffles, codegen-resident except the one
    higher-order aggregate; the 100 TB quality floor runs as a scan.

    Exactness: every rule flag is an INTEGER comparison (mean length
    ≥ 3 ⇔ total_len ≥ 3·n_words, ratio ≤ 0.1 ⇔ 10·symbols ≤ n_words)
    so no float ever decides a flag; mean_word_len is emitted rounded
    for the dashboard only. Returns per doc: counts, mean_word_len,
    the five rule flags, and keep = AND of all rules."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n_words = F.size(words).cast("long")
    total_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    alpha_words = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    hash_count = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    ell_count = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    symbols = (hash_count + ell_count).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        total_len.alias("total_len"),
        alpha_words.alias("alpha_words"),
        symbols.alias("symbols"),
        stop_hits.alias("stop_hits"),
    )
    r_nwords = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    r_meanlen = (F.col("total_len") >= 3 * F.col("n_words")) & (
        F.col("total_len") <= 10 * F.col("n_words")
    )
    r_symbol = 10 * F.col("symbols") <= F.col("n_words")
    r_alpha = 5 * F.col("alpha_words") >= 4 * F.col("n_words")
    r_stop = F.col("stop_hits") >= 2
    return base.select(
        "doc_id",
        "n_words",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("total_len").cast("double") / F.col("n_words").cast("double"),
            ),
            round_digits,
        ).alias("mean_word_len"),
        "alpha_words",
        "symbols",
        "stop_hits",
        r_nwords.cast("int").alias("rule_n_words"),
        r_meanlen.cast("int").alias("rule_mean_len"),
        r_symbol.cast("int").alias("rule_symbol_ratio"),
        r_alpha.cast("int").alias("rule_alpha_frac"),
        r_stop.cast("int").alias("rule_stopwords"),
        (r_nwords & r_meanlen & r_symbol & r_alpha & r_stop)
        .cast("int")
        .alias("keep"),
    )


def c4_quality_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_sentences: int = 5,
    min_words_per_line: int = 3,
) -> DataFrame:
    """The C4 line-level cleaning rule set (Raffel et al. JMLR 2020
    §2.2 — the filters that produced the Colossal Clean Crawled
    Corpus, the other canonical published recipe next to the Gopher
    document-level rules):

    - keep only lines ending in a terminal punctuation mark (. ! ? ")
    - drop lines with fewer than `min_words_per_line` words
    - drop lines containing the word "javascript" (case-insensitive)
    - drop the whole page if it contains "lorem ipsum" (case-insens)
    - drop the whole page if it contains a curly brace "{"
    - drop the whole page if fewer than `min_sentences` sentences
      survive (sentences counted as terminal marks in kept lines)

    Scale shape: gopher_quality_rules' twin — every rule is a pure
    Column HOF over the in-row line array (split on newline), zero
    shuffles, codegen-resident; the 100 TB cleaning floor runs as a
    scan. Every flag is an integer/boolean comparison; the cleaned
    page (kept lines re-joined) is emitted as md5 + length so the
    keep decision AND the surviving text are both auditable without
    shipping the corpus. Returns per doc: (doc_id, n_lines,
    n_kept_lines, n_sentences, has_lorem_ipsum, has_brace, keep,
    clean_len, clean_md5)."""
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(lines, F.trim)
    line_words = lambda l: F.size(  # noqa: E731
        F.filter(F.split(l, r"\s+"), lambda x: x != "")
    )
    kept = F.filter(
        trimmed,
        lambda l: l.rlike('[.!?"]$')
        & (line_words(l) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    # sentences = terminal marks across kept lines (C4 counts sentences
    # to apply its >= 5-sentence page floor)
    n_sentences = F.aggregate(
        kept,
        F.lit(0).cast("long"),
        lambda acc, l: acc
        + (F.length(l) - F.length(F.regexp_replace(l, r"[.!?]", ""))).cast("long"),
    )
    clean = F.array_join(kept, "\n")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        clean.alias("__clean"),
    )
    return base.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_lorem_ipsum",
        "has_brace",
        (
            (F.col("n_sentences") >= min_sentences)
            & ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace")
            & (F.col("n_kept_lines") > 0)
        ).alias("keep"),
        F.length("__clean").cast("long").alias("clean_len"),
        F.md5("__clean").alias("clean_md5"),
    )


def script_mixing_stats(
    df: DataFrame,
    text_col: str,
    group_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Mixed-script / invisible-character screen per source — the
    homoglyph-spoof and adversarial-crawl audit (Boucher et al.,
    IEEE S&P 2022 "Bad Characters"): Cyrillic/Greek letters inside
    Latin text defeat exact dedup and poison tokenizers; zero-width
    and bidi-control characters hide payloads that survive every
    visible-text filter. Per document this counts Latin, Cyrillic and
    Greek letters plus zero-width (U+200B-D, U+FEFF) and bidi-control
    (U+202A-E, U+2066-69) characters; a doc is MIXED when Latin and a
    confusable script co-occur. ONE regexp pass per class (JVM-side
    regexp_count, no UDF), one group reduce. Returns per group:
    (group, n_docs, n_mixed_script, n_zero_width, n_bidi,
    pct_clean)."""
    t = F.col(text_col)
    latin = F.regexp_count(t, F.lit("[A-Za-z]"))
    cyr = F.regexp_count(t, F.lit("[Ѐ-ӿ]"))
    greek = F.regexp_count(t, F.lit("[Ͱ-Ͽ]"))
    zw = F.regexp_count(t, F.lit("[​‌‍﻿]"))
    bidi = F.regexp_count(t, F.lit("[‪-‮⁦-⁩]"))
    per_doc = df.select(
        F.col(group_col).alias("group"),
        ((latin > 0) & ((cyr + greek) > 0)).cast("long").alias("mixed"),
        (zw > 0).cast("long").alias("has_zw"),
        (bidi > 0).cast("long").alias("has_bidi"),
    )
    return (
        per_doc.groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("mixed").cast("long").alias("n_mixed_script"),
            F.sum("has_zw").cast("long").alias("n_zero_width"),
            F.sum("has_bidi").cast("long").alias("n_bidi"),
            F.round(
                1.0
                - F.sum(
                    F.greatest(F.col("mixed"), F.col("has_zw"), F.col("has_bidi"))
                ).cast("double")
                / F.count(F.lit(1)),
                out_decimals,
            ).alias("pct_clean"),
        )
        .orderBy("group")
    )


def vocabulary_coverage(
    df: DataFrame,
    token_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Unseen-vocabulary estimation from token frequency-of-frequencies
    — Chao1 richness (Chao 1984) and Good-Turing coverage (Good 1953):
    how much MORE vocabulary is out there than this sample shows, and
    what probability mass the next document will spend on never-seen
    tokens? The pair zipf_heaps' curve-fit can't give directly, and
    the right answer to "is this corpus slice big enough to freeze the
    tokenizer vocab?".

        Chao1    = D + f₁²/(2 f₂)        (f₁ singletons, f₂ doubletons)
        coverage = 1 − f₁/N              (Good-Turing; unseen mass = f₁/N)

    Everything is a ratio of exact integer counts: one token groupBy
    (vocabulary-sized), one frequency-of-frequency groupBy (tiny), one
    reduce. Chao1's bias-corrected form uses f₁(f₁−1)/(2(f₂+1)) when
    f₂ = 0 (documented; avoids the divide-by-zero). Returns one row:
    (n_tokens, n_types, f1, f2, chao1, coverage, unseen_mass)."""
    counts = df.groupBy(F.col(token_col).alias("tok")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    fof = counts.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("ff"))
    agg = fof.agg(
        F.sum(F.col("c") * F.col("ff")).cast("long").alias("n_tokens"),
        F.sum("ff").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, F.col("ff")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("ff")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    d = F.col("n_types").cast("double")
    chao1 = F.when(F.col("f2") > 0, d + f1 * f1 / (2.0 * f2)).otherwise(
        d + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))
    )
    unseen = f1 / F.col("n_tokens").cast("double")
    return agg.select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.round(chao1, out_decimals).alias("chao1"),
        F.round(1.0 - unseen, out_decimals).alias("coverage"),
        F.round(unseen, out_decimals).alias("unseen_mass"),
    )


def distinct_n_diversity(
    df: DataFrame,
    text_col: str,
    group_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Distinct-n diversity (Li et al., NAACL 2016) per group — the
    generation-diversity metric: distinct n-grams / total n-grams for
    n = 1, 2, 3. A mode-collapsed generator (or a boilerplate-heavy
    crawl source) scores low; repetition_stats flags WITHIN-document
    loops, this flags corpus-level sameness ACROSS documents.

    Tokens via the engine's standing normalize_text split; n-grams by
    the zip_with adjacent-slice idiom (shuffle-free construction).
    Per (group, n): one distinct-count + one total-count aggregate of
    the n-gram stream — ratios of exact longs. Returns per group:
    (group, n_tokens, distinct_1, distinct_2, distinct_3)."""
    from ..functions.text import normalize_text

    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")
    base = df.select(F.col(group_col).alias("g"), toks.alias("toks"))
    n = F.size(F.col("toks"))

    def _grams(nn):
        if nn == 1:
            return F.col("toks")
        parts = [
            F.slice(F.col("toks"), i + 1, F.greatest(n - nn + 1, F.lit(0)))
            for i in range(nn)
        ]
        g = parts[0]
        for p in parts[1:]:
            g = F.zip_with(g, p, lambda a, b: F.concat(a, F.lit(" "), b))
        return g

    outs = []
    for nn in (1, 2, 3):
        grams = base.select("g", F.explode(_grams(nn)).alias("gram"))
        agg = grams.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias(f"tot{nn}"),
            F.countDistinct("gram").cast("long").alias(f"dis{nn}"),
        )
        outs.append(agg)
    # left-join the 2/3-gram frames onto the 1-gram frame: a group whose
    # documents are all shorter than n tokens has NO n-gram rows and
    # would vanish under an inner join — it must still appear, with
    # NULL distinct_2/distinct_3 (every non-empty group has 1-grams)
    j = outs[0].join(outs[1], "g", "left").join(outs[2], "g", "left")
    return j.select(
        F.col("g").alias("group"),
        F.col("tot1").alias("n_tokens"),
        F.round(F.col("dis1").cast("double") / F.col("tot1"), out_decimals).alias(
            "distinct_1"
        ),
        F.round(
            F.when(
                F.col("tot2") > 0, F.col("dis2").cast("double") / F.col("tot2")
            ),
            out_decimals,
        ).alias("distinct_2"),
        F.round(
            F.when(
                F.col("tot3") > 0, F.col("dis3").cast("double") / F.col("tot3")
            ),
            out_decimals,
        ).alias("distinct_3"),
    ).orderBy("group")
