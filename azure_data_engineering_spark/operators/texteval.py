"""Generation-quality text evaluation: corpus BLEU.

The training-data engine's output is consumed by models whose quality
is read back through n-gram overlap metrics; scoring a candidate
corpus (distilled rewrites, machine-translated augmentations, OCR
re-extractions) against references IS a corpus-scale join+aggregate
problem, not a driver loop. BLEU here is the Papineni et al. (ACL
2002) corpus formulation: modified (clipped) n-gram precision summed
over documents, geometric mean over n = 1..max_n, times the brevity
penalty.

Scale shape: per n, one explode + one (doc, gram) count aggregate per
side and one equi-join on (doc, gram) — everything rides the (doc,
gram) key, embarrassingly parallel, no driver round-trips. Counts stay
exact longs until the final log/exp, whose inputs are exact integer
ratios rounded to 9 dp so both engines feed libm identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(col, nn):
    """Adjacent n-gram array from a token array (the zip_with slice
    idiom shared with quality.distinct_n_diversity — shuffle-free)."""
    if nn == 1:
        return col
    n = F.size(col)
    parts = [
        F.slice(col, i + 1, F.greatest(n - nn + 1, F.lit(0))) for i in range(nn)
    ]
    g = parts[0]
    for p in parts[1:]:
        g = F.zip_with(g, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return g


def bleu_corpus(
    df: DataFrame,
    id_col: str,
    hyp_col: str,
    ref_col: str,
    max_n: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus BLEU of a hypothesis token-array column against a
    reference token-array column (single reference per document).

        p_n  = Σ_docs clipped_matches_n / Σ_docs hyp_ngrams_n
        BP   = 1 if hyp_len ≥ ref_len else exp(1 − ref_len/hyp_len)
        BLEU = BP · exp(Σ_n (1/max_n)·ln p_n)

    Clipping: per (doc, gram), matches = min(count_hyp, count_ref) —
    the standard defense against "the the the". Returns ONE row:
    (n_docs, hyp_len, ref_len, p1..p{max_n}, brevity_penalty, bleu);
    BLEU is 0 when any p_n is 0 (the corpus-level convention)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )
    lens = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("hyp")).cast("long").alias("hyp_len"),
        F.sum(F.size("ref")).cast("long").alias("ref_len"),
    )
    out = lens
    for nn in range(1, max_n + 1):
        h = (
            base.select("id", F.explode(_grams(F.col("hyp"), nn)).alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count(F.lit(1)).cast("long").alias("ch"))
        )
        r = (
            base.select("id", F.explode(_grams(F.col("ref"), nn)).alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count(F.lit(1)).cast("long").alias("cr"))
        )
        joined = h.join(r, ["id", "gram"], "left").select(
            F.col("ch"), F.coalesce(F.col("cr"), F.lit(0)).alias("cr")
        )
        stats = joined.agg(
            F.sum(F.least(F.col("ch"), F.col("cr"))).cast("long").alias(f"m{nn}"),
            F.sum("ch").cast("long").alias(f"t{nn}"),
        )
        out = out.crossJoin(F.broadcast(stats))
    ps = [
        F.round(
            F.when(
                F.col(f"t{nn}") > 0,
                F.col(f"m{nn}").cast("double") / F.col(f"t{nn}").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        )
        for nn in range(1, max_n + 1)
    ]
    bp = F.round(
        F.when(F.col("hyp_len") >= F.col("ref_len"), F.lit(1.0)).otherwise(
            F.exp(
                F.round(
                    1.0
                    - F.col("ref_len").cast("double")
                    / F.col("hyp_len").cast("double"),
                    9,
                )
            )
        ),
        9,
    )
    any_zero = None
    for p in ps:
        z = p <= 0.0
        any_zero = z if any_zero is None else (any_zero | z)
    log_sum = None
    for p in ps:
        term = F.round(F.log(F.greatest(p, F.lit(1e-300))), 9)
        log_sum = term if log_sum is None else log_sum + term
    bleu = F.when(any_zero, F.lit(0.0)).otherwise(
        F.round(bp * F.exp(F.round(log_sum / float(max_n), 9)), 9)
    )
    cols = [
        "n_docs",
        "hyp_len",
        "ref_len",
        *[
            F.round(p, round_digits).alias(f"p{nn}")
            for nn, p in zip(range(1, max_n + 1), ps)
        ],
        F.round(bp, round_digits).alias("brevity_penalty"),
        F.round(bleu, round_digits).alias("bleu"),
    ]
    return out.select(*cols)


def rouge_n_corpus(
    df: DataFrame,
    id_col: str,
    hyp_col: str,
    ref_col: str,
    max_n: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus ROUGE-N (Lin, ACL 2004 workshop) of a hypothesis
    token-array column against a reference token-array column — the
    RECALL-oriented complement to bleu_corpus (BLEU asks "is what I
    generated in the reference?", ROUGE asks "did I cover the
    reference?" — the summarization/distillation gate):

        R_n = Σ_docs clipped_matches_n / Σ_docs ref_ngrams_n
        P_n = Σ_docs clipped_matches_n / Σ_docs hyp_ngrams_n
        F_n = 2·P·R/(P+R)

    Same clipping, same (doc, gram) equi-join scale shape as
    bleu_corpus; counts exact longs, ratios rounded at the end.
    Returns one row: (n_docs, then per n: r{n}_recall, r{n}_precision,
    r{n}_f1)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )
    out = base.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    cols = ["n_docs"]
    for nn in range(1, max_n + 1):
        h = (
            base.select("id", F.explode(_grams(F.col("hyp"), nn)).alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count(F.lit(1)).cast("long").alias("ch"))
        )
        r = (
            base.select("id", F.explode(_grams(F.col("ref"), nn)).alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count(F.lit(1)).cast("long").alias("cr"))
        )
        joined = h.join(r, ["id", "gram"], "full_outer").select(
            F.coalesce(F.col("ch"), F.lit(0)).alias("ch"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
        stats = joined.agg(
            F.sum(F.least(F.col("ch"), F.col("cr"))).cast("long").alias(f"m{nn}"),
            F.sum("ch").cast("long").alias(f"h{nn}"),
            F.sum("cr").cast("long").alias(f"r{nn}"),
        )
        out = out.crossJoin(F.broadcast(stats))
        rec = F.round(
            F.when(
                F.col(f"r{nn}") > 0,
                F.col(f"m{nn}").cast("double") / F.col(f"r{nn}").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        )
        prec = F.round(
            F.when(
                F.col(f"h{nn}") > 0,
                F.col(f"m{nn}").cast("double") / F.col(f"h{nn}").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        )
        out = (
            out.withColumn(f"__rec{nn}", rec)
            .withColumn(f"__prec{nn}", prec)
            .withColumn(
                f"__f{nn}",
                F.round(
                    F.when(
                        F.col(f"__rec{nn}") + F.col(f"__prec{nn}") > 0,
                        2.0
                        * F.col(f"__rec{nn}")
                        * F.col(f"__prec{nn}")
                        / (F.col(f"__rec{nn}") + F.col(f"__prec{nn}")),
                    ).otherwise(F.lit(0.0)),
                    9,
                ),
            )
        )
        cols += [f"r{nn}_recall", f"r{nn}_precision", f"r{nn}_f1"]
        out = (
            out.withColumnRenamed(f"__rec{nn}", f"r{nn}_recall")
            .withColumnRenamed(f"__prec{nn}", f"r{nn}_precision")
            .withColumnRenamed(f"__f{nn}", f"r{nn}_f1")
        )
    sel = [F.col("n_docs")]
    for nn in range(1, max_n + 1):
        sel += [
            F.round(F.col(f"r{nn}_recall"), round_digits).alias(f"r{nn}_recall"),
            F.round(F.col(f"r{nn}_precision"), round_digits).alias(
                f"r{nn}_precision"
            ),
            F.round(F.col(f"r{nn}_f1"), round_digits).alias(f"r{nn}_f1"),
        ]
    return out.select(*sel)


def chrf_corpus(
    df: DataFrame,
    id_col: str,
    hyp_col: str,
    ref_col: str,
    max_n: int = 4,
    beta: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus chrF (Popović, WMT 2015): CHARACTER-n-gram F-score —
    the tokenization-free eval that survives morphology and
    hyphenation differences word-level BLEU/ROUGE trip over (its
    original use is MT; in a data engine it scores OCR re-extraction
    and normalization pipelines where word boundaries themselves are
    what changed). `hyp_col`/`ref_col` are STRING columns; whitespace
    is removed (the standard convention), char n-grams n = 1..max_n
    counted per doc, clipped corpus-wide:

        P = (1/N) Σ_n Σm_n/Σh_n,   R = (1/N) Σ_n Σm_n/Σr_n
        chrF_β = (1+β²)·P·R / (β²·P + R)

    Scale shape: per n, one position explode (sequence + substring,
    all codegen) + the (doc, gram) equi-join — identical to
    bleu_corpus but on chars. Returns one row (n_docs, chr_precision,
    chr_recall, chrf)."""
    strip = lambda c: F.regexp_replace(c, r"\s+", "")  # noqa: E731
    base = df.select(
        F.col(id_col).alias("id"),
        strip(F.col(hyp_col)).alias("hyp"),
        strip(F.col(ref_col)).alias("ref"),
    )
    out = base.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    p_terms, r_terms = [], []
    for nn in range(1, max_n + 1):
        def side(col_name: str, alias: str):
            # Guard the bound: Spark's sequence(1, 0) yields the
            # DESCENDING array [1, 0], so an unguarded len-nn+1 <= 0
            # would emit two spurious partial grams per short/empty
            # doc (DuckDB's generate_series(1, 0) is empty). Same
            # clamp-to-empty discipline as dedup._shingles.
            pos = F.explode(
                F.when(
                    F.length(col_name) >= nn,
                    F.sequence(F.lit(1), F.length(col_name) - nn + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos")
            g = base.select("id", F.col(col_name), pos).select(
                "id",
                F.expr(f"substring({col_name}, pos, {nn})").alias("gram"),
            )
            return g.groupBy("id", "gram").agg(
                F.count(F.lit(1)).cast("long").alias(alias)
            )

        h = side("hyp", "ch")
        r = side("ref", "cr")
        joined = h.join(r, ["id", "gram"], "full_outer").select(
            F.coalesce(F.col("ch"), F.lit(0)).alias("ch"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
        stats = joined.agg(
            F.sum(F.least(F.col("ch"), F.col("cr"))).cast("long").alias(f"m{nn}"),
            F.sum("ch").cast("long").alias(f"h{nn}"),
            F.sum("cr").cast("long").alias(f"r{nn}"),
        )
        out = out.crossJoin(F.broadcast(stats))
        p_terms.append(
            F.round(
                F.when(
                    F.col(f"h{nn}") > 0,
                    F.col(f"m{nn}").cast("double") / F.col(f"h{nn}").cast("double"),
                ).otherwise(F.lit(0.0)),
                9,
            )
        )
        r_terms.append(
            F.round(
                F.when(
                    F.col(f"r{nn}") > 0,
                    F.col(f"m{nn}").cast("double") / F.col(f"r{nn}").cast("double"),
                ).otherwise(F.lit(0.0)),
                9,
            )
        )
    p_avg = F.round(sum(p_terms[1:], p_terms[0]) / float(max_n), 9)
    r_avg = F.round(sum(r_terms[1:], r_terms[0]) / float(max_n), 9)
    b2 = float(beta) * float(beta)
    chrf = F.round(
        F.when(
            b2 * p_avg + r_avg > 0,
            (1.0 + b2) * p_avg * r_avg / (b2 * p_avg + r_avg),
        ).otherwise(F.lit(0.0)),
        9,
    )
    return out.select(
        "n_docs",
        F.round(p_avg, round_digits).alias("chr_precision"),
        F.round(r_avg, round_digits).alias("chr_recall"),
        F.round(chrf, round_digits).alias("chrf"),
    )
