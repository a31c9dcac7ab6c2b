"""Distributed byte-pair-encoding tokenizer — train + encode,
Spark-first (SURVEY.md §2B "LLM-pipeline extensions"; no reference
analog — the reference ships rows, not token streams).

Every real training-data pipeline budgets chunking/packing in actual
tokenizer tokens, not whitespace words; this module closes that gap
with the classic BPE algorithm (Sennrich, Haddow & Birch, ACL 2016)
re-expressed in Spark's execution model.

Scale architecture (the 100 TB story):
- The ONLY full-corpus pass is the word-frequency aggregation — one
  hash shuffle with map-side partial counts that collapses the corpus
  into its word histogram (|distinct normalized words|, ~10-100 M rows
  at web scale: 5-7 orders of magnitude smaller than the corpus).
  This mirrors how production tokenizer trainers work: the distributed
  heavy lifting IS the histogram; the merge loop runs on the
  histogram, never the corpus.
- Each merge round is then O(|vocab|) work: adjacent-pair counts
  (explode + sum(freq) with map-side combine), a global argmax
  (orderBy+limit(1) = TakeOrdered, no full sort), and one literal
  string replace over the symbol sequences. The pair argmax rides a
  1-row localCheckpointed frame crossJoined into the next round —
  the same no-collect scalar-broadcast discipline as graph.pagerank
  and kmeans.lloyd_kmeans, so training is a deterministic algebraic
  function of the input and the DuckDB oracle replays the identical
  rounds as chained CTEs.
- Rounds are the sequential depth: classic single-pair BPE needs
  num_merges rounds. For 32k-merge production vocabularies you run
  the histogram reduction distributed (this module's
  word_frequencies) and the merge loop over the collapsed histogram
  wherever it's cheapest; the round loop here keeps even that stage
  distributed and oracle-replayable at moderate merge counts, which
  is what chunk/pack token budgeting needs.

Symbol-sequence representation: each word is a string of
0x1F-wrapped symbols ("\\x1fa\\x1f\\x1fb\\x1f..."), so applying merge
(a, b) is a plain non-regex replace of "\\x1fa\\x1f\\x1fb\\x1f" with
"\\x1fab\\x1f" — left-to-right non-overlapping, exactly Sennrich's
simultaneous-replacement semantics ("aaa" + (a,a) -> ["aa","a"]), in
pure whole-stage codegen on both engines. Pre-tokenization is
normalize_text (lowercase, non-alphanumerics to word boundaries), so
the 0x1F separator can never collide with symbol bytes.

Encoding ships as a twin pair, same discipline as
q_grouped_map/q_user_profile_builtin:
- bpe_encode_replay: the learned merges applied in rank order as a
  chain of codegen replaces — SQL-replayable (this is the oracle
  surface) and exact.
- bpe_encode: the production path for large merge tables — greedy
  rank-priority BPE (the GPT-2 bpe() loop) in an Arrow-batched pandas
  UDF over DISTINCT words only (dictionary encoding: work is
  O(|vocab|), not O(corpus)), then a broadcast join back onto the
  corpus. Proven equal to the replay path in tests/test_bpe.py —
  sequential rank-order merge application IS rank-priority BPE.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def _wrap_chars(col):
    """word -> 0x1F-wrapped symbol string: 'ab' -> '\\x1fa\\x1f\\x1fb\\x1f'.
    Wraps every non-space char, so applied to a whole normalized
    document the spaces survive as word boundaries no merge pattern
    can cross."""
    return F.regexp_replace(col, "(\\S)", SEP + "$1" + SEP)


def _tokens_from_seq(seq):
    """Wrapped symbol string (single word or space-joined document)
    -> array of tokens."""
    glued = F.replace(seq, F.lit(" "), F.lit(""))
    return F.split(
        F.substring(glued, 2, F.length(glued) - 2), SEP + SEP
    )


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (w, freq) word histogram over normalized text. The
    one corpus-sized shuffle in BPE training; everything after runs
    on this collapsed frame."""
    from ..functions.text import normalize_text

    w = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    return (
        df.select(w)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
) -> DataFrame:
    """Learn `num_merges` BPE merges from the corpus.

    Returns ALL num_merges rows (merge_rank, lhs, rhs, merged,
    pair_count, applied): `applied` is false for rounds whose best
    pair fell below min_freq — those rounds are replace no-ops (the
    guard keeps late rounds deterministic instead of early-stopping,
    the same fixed-iteration discipline as lloyd_kmeans), and callers
    presenting a vocabulary filter on it. Tie-breaks are total:
    (pair_count DESC, lhs ASC, rhs ASC), so the learned table is a
    deterministic function of the corpus and the oracle unrolls the
    identical rounds as chained SQL CTEs.

    Per round: one vocab-sized pair-count agg, one TakeOrdered(1)
    argmax (a sentinel row keeps the frame at exactly 1 row even when
    no pairs remain), one codegen replace; localCheckpoint(eager) on
    the (vocab-sized) word frame and the 1-row best frame truncates
    lineage so round N's plan never re-derives rounds 1..N-1.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    spark = df.sparkSession
    words = (
        word_frequencies(df, text_col)
        .select("freq", _wrap_chars(F.col("w")).alias("seq"))
        .localCheckpoint(eager=True)
    )
    sentinel = spark.createDataFrame(
        [("", "", -1)], "lhs string, rhs string, pair_count long"
    )
    best_frames: list[DataFrame] = []
    for rank in range(num_merges):
        s = F.split(F.substring("seq", 2, F.length("seq") - 2), SEP + SEP)
        n = F.size(s)
        zipped = F.arrays_zip(
            F.slice(s, 1, n - 1).alias("lhs"), F.slice(s, 2, n - 1).alias("rhs")
        )
        pc = (
            words.select("freq", F.explode(zipped).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        # lazy checkpoint: the 1-row argmax materializes as part of the
        # next words checkpoint's job instead of spawning its own —
        # halves the per-round job count (round depth is the whole cost
        # of the loop at small scale)
        best = (
            pc.unionByName(sentinel)
            .orderBy(
                F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(1)
            .withColumn("merge_rank", F.lit(rank))
            .localCheckpoint(eager=False)
        )
        best_frames.append(best)
        pat = F.concat(
            F.lit(SEP), F.col("lhs"), F.lit(SEP + SEP), F.col("rhs"), F.lit(SEP)
        )
        rep = F.concat(F.lit(SEP), F.col("lhs"), F.col("rhs"), F.lit(SEP))
        words = (
            words.crossJoin(F.broadcast(best))
            .withColumn(
                "seq",
                F.when(
                    F.col("pair_count") >= F.lit(int(min_freq)),
                    F.replace(F.col("seq"), pat, rep),
                ).otherwise(F.col("seq")),
            )
            .select("freq", "seq")
            # lazy: materializes inside the NEXT round's broadcast-build
            # job (which is the first thing that touches it) instead of
            # spawning a second scheduled job per round — still truncates
            # lineage, so round N never re-derives rounds 1..N-1
            .localCheckpoint(eager=False)
        )
    merges = reduce(DataFrame.unionByName, best_frames)
    return merges.select(
        "merge_rank",
        "lhs",
        "rhs",
        F.concat("lhs", "rhs").alias("merged"),
        "pair_count",
        (F.col("pair_count") >= F.lit(int(min_freq))).alias("applied"),
    )


def bpe_encode_replay(
    df: DataFrame,
    text_col: str,
    merges: DataFrame,
    min_freq: int = 2,
    num_merges: int | None = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Exact, SQL-replayable encode: apply the learned merges in rank
    order as a chain of codegen replaces over the whole (normalized,
    0x1F-wrapped) document — word boundaries are spaces, which no
    merge pattern can cross. Adds `out_col` (array<string> of tokens)
    to df. Cost is num_merges chained replaces inside one codegen
    stage — the right tool for the moderate merge counts a token
    budget needs; use bpe_encode for large vocabularies."""
    if num_merges is None:
        num_merges = merges.agg(F.max("merge_rank")).first()[0] + 1
    # Validate the merge table up front (ADVICE r4): each rank in
    # range(num_merges) must appear EXACTLY once — a missing rank
    # would make that round's broadcast frame empty and the crossJoin
    # would silently drop every input row; a duplicate rank would
    # silently multiply rows. One bounded driver-side agg (the merge
    # table is a vocab-sized artifact, never corpus-sized).
    n_rows, n_ranks, lo, hi = (
        merges.filter(F.col("merge_rank") < F.lit(int(num_merges)))
        .agg(
            F.count("*"),
            F.countDistinct("merge_rank"),
            F.min("merge_rank"),
            F.max("merge_rank"),
        )
        .first()
    )
    if n_ranks != num_merges or n_rows != num_merges:
        raise ValueError(
            f"bpe_encode_replay: merges table must carry exactly one row per "
            f"merge_rank in 0..{num_merges - 1}; got {n_rows} rows over "
            f"{n_ranks} distinct ranks (min={lo}, max={hi}). Pass the full "
            f"table bpe_train returns (including applied=false rows), not a "
            f"filtered or concatenated one."
        )
    from ..functions.text import normalize_text

    # r12: ONE broadcast of the whole rank-sorted merge table as a
    # 1-row array — instead of num_merges separate
    # crossJoin(broadcast(1-row)) steps, each of which costs a
    # broadcast-exchange build job before the chain even runs. The
    # replace chain itself stays STATICALLY UNROLLED over literal
    # array indexes (element_at/getField are whole-stage-codegen; an
    # F.aggregate fold is interpreted per row and measured SLOWER
    # over a corpus-sized frame than the 12 broadcasts it saves).
    # Identical F.replace patterns in identical rank order under the
    # identical min_freq gate, so the emitted token arrays are
    # byte-identical.
    marr = merges.filter(F.col("merge_rank") < F.lit(int(num_merges))).agg(
        F.array_sort(
            F.collect_list(
                F.struct("merge_rank", "lhs", "rhs", "pair_count")
            )
        ).alias("__ms")
    )
    out = df.withColumn(
        "__seq", _wrap_chars(normalize_text(F.col(text_col)))
    ).crossJoin(F.broadcast(marr))
    for rank in range(num_merges):
        m = F.col("__ms")[rank]
        out = out.withColumn(
            "__seq",
            F.when(
                m["pair_count"] >= F.lit(int(min_freq)),
                F.replace(
                    F.col("__seq"),
                    F.concat(
                        F.lit(SEP),
                        m["lhs"],
                        F.lit(SEP + SEP),
                        m["rhs"],
                        F.lit(SEP),
                    ),
                    F.concat(F.lit(SEP), m["lhs"], m["rhs"], F.lit(SEP)),
                ),
            ).otherwise(F.col("__seq")),
        )
    out = out.drop("__ms")
    return out.withColumn(
        out_col,
        F.when(F.col("__seq") == "", F.array().cast("array<string>")).otherwise(
            _tokens_from_seq(F.col("__seq"))
        ),
    ).drop("__seq")


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merge_list: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Production encode for large merge tables: rank-order BPE in an
    Arrow-batched pandas UDF, evaluated over DISTINCT words only and
    broadcast-joined back onto the exploded corpus (dictionary
    encoding: tokenization work is O(|vocab|), not O(corpus)). The
    merge table is a bounded driver-side artifact (like IVF
    centroids) — 32k merges is ~1 MB.

    Merges apply SEQUENTIALLY in rank order, each rank one
    simultaneous left-to-right replacement pass — byte-identical to
    bpe_encode_replay by construction (tests/test_bpe.py). The
    classic rank-priority-heap loop (GPT-2 bpe()) is the
    constant-factor optimization of this, but it can diverge when two
    DIFFERENT merges yield string-identical symbols (a later merge
    manufactures an occurrence of an earlier merge's pair, which the
    heap would retroactively apply and sequential replay must not);
    exactness wins here. Ranks whose pair never occurs in a word cost
    O(1) via an adjacent-pair set, so a word's cost is
    O(num_merges + merges_applied * word_len), dominated by the
    dict probes.

    `id_col` must be unique per row (the regroup key after the word
    explode). Adds `out_col` (array<string>) to df."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.text import normalize_text

    merges = list(merge_list)

    @pandas_udf("array<string>")
    def _bpe_word(words: pd.Series) -> pd.Series:
        def enc(w):
            if not w:
                return []
            toks = list(w)
            pairs = set(zip(toks, toks[1:]))
            for lhs, rhs in merges:
                if len(toks) < 2:
                    break
                if (lhs, rhs) not in pairs:
                    continue
                out, i = [], 0
                while i < len(toks):
                    if i < len(toks) - 1 and toks[i] == lhs and toks[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
                pairs = set(zip(toks, toks[1:]))
            return toks

        return words.map(enc)

    base = df.withColumn(
        "__words",
        F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""),
    )
    vocab = (
        base.select(F.explode("__words").alias("__w"))
        .distinct()
        .withColumn("__toks", _bpe_word(F.col("__w")))
    )
    exploded = base.select(
        id_col, F.posexplode_outer("__words").alias("__pos", "__w")
    )
    joined = exploded.join(F.broadcast(vocab), "__w", "left")
    toks = (
        joined.groupBy(id_col)
        .agg(
            F.coalesce(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__pos", "__toks"))),
                        lambda s: s["__toks"],
                    )
                ),
                F.array().cast("array<string>"),
            ).alias(out_col)
        )
    )
    return df.join(toks, id_col)


def save_merges(merges: DataFrame, path: str) -> None:
    """Persist the learned merge table as the tokenizer artifact —
    a single parquet file (coalesce(1): the table is num_merges rows,
    KBs even at 32k merges). Training once and reusing the artifact
    across pipeline runs is the production contract; retraining per
    run would silently shift every token budget downstream."""
    merges.coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> DataFrame:
    """Load a saved merge table, ordered by merge_rank (ready for
    bpe_encode_replay or, collected, for bpe_encode's merge_list)."""
    return spark.read.parquet(path).orderBy("merge_rank")


def merge_list(merges: DataFrame) -> list[tuple[str, str]]:
    """The applied merges as the ordered driver-side list bpe_encode
    consumes — bounded by num_merges (a 32k-merge table is ~1 MB)."""
    return [
        (r.lhs, r.rhs)
        for r in merges.filter(F.col("applied")).orderBy("merge_rank").collect()
    ]
