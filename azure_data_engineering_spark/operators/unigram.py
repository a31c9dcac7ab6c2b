"""Distributed unigram-LM tokenizer (SentencePiece-style) — train +
encode, Spark-first (SURVEY.md §2B "LLM-pipeline extensions"; no
reference analog — the reference ships rows, not token streams).

The OTHER tokenizer a training stack actually runs beside BPE
(operators/bpe.py): Kudo's unigram language model (Kudo, ACL 2018;
Kudo & Richardson, EMNLP 2018 SentencePiece). Where BPE grows a vocab
bottom-up by merging, unigram starts from a large seed of candidate
pieces and re-estimates piece probabilities by EM over the best
(Viterbi) segmentation of the corpus, then prunes to the target size.
This module implements the hard-EM (Viterbi-EM) variant — the
standard approximation the SentencePiece trainer's E-step converges
toward — as a deterministic algebraic function of the corpus, so the
DuckDB oracle replays the identical trajectory as chained CTEs
(the bpe_train discipline).

Scale architecture (the 100 TB story):
- The ONLY corpus-sized pass is the word-frequency aggregation
  (bpe.word_frequencies — one hash shuffle with map-side combine).
  Training runs on the collapsed word histogram, never the corpus.
- Candidate spans are enumerated ONCE per distinct word:
  O(len · max_piece_len) rows per histogram entry, checkpointed.
- Viterbi is expressed RELATIONALLY: dp[i] = max over spans (s, i) of
  dp[s] + logp(piece). Positions are bounded (max_word_len), so the
  forward pass unrolls into max_word_len join+max rounds and the
  best-path extraction into ≤ max_word_len backwalk rounds — every
  round an equi-join on the word key plus a bounded window. No
  collects, no UDF in the train path.
- Exactness: piece log-probs are rounded to 9 dp and carried as
  DECIMAL(28,9); dp sums of ≤ max_word_len such terms are exact
  decimal arithmetic, so the argmax (and therefore the learned vocab)
  is bit-identical cross-engine. Tie-breaks are total:
  (score DESC, start ASC, piece ASC).
- Words longer than max_word_len are EXCLUDED from training (they are
  a vanishing tail of a normalized web corpus and their exclusion is
  part of the replayed definition); encode handles any length via the
  pandas-UDF production path.

Encode ships as a twin pair (the bpe_encode discipline):
- unigram_encode_replay: in-plan Viterbi over words ≤ max_word_len
  with a GIVEN piece table — SQL-replayable (the oracle surface).
- unigram_encode: production path — Arrow-batched pandas UDF Viterbi
  over DISTINCT words only (dictionary encoding: O(|vocab|·len·
  max_piece_len) work, not O(corpus)), broadcast-joined back. Proven
  equal to the replay path on the replay domain in tests/test_unigram.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bpe import word_frequencies

_DP = "decimal(28,9)"


def _spans(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(w, freq) -> all candidate spans (w, freq, s, e, piece) with
    1 <= e-s <= max_piece_len over the word's 1..len positions.
    O(len·max_piece_len) rows per histogram entry."""
    e = F.explode(F.sequence(F.lit(1), F.length("w"))).alias("e")
    with_e = words.select("w", "freq", e)
    s = F.explode(
        F.sequence(F.greatest(F.lit(0), F.col("e") - max_piece_len), F.col("e") - 1)
    ).alias("s")
    return with_e.select("w", "freq", "e", s).select(
        "w",
        "freq",
        "s",
        "e",
        F.substring(F.col("w"), F.col("s") + 1, F.col("e") - F.col("s")).alias(
            "piece"
        ),
    )


def _logp(cnt_col, total_col):
    """Piece log-prob, rounded to 9 dp then carried as exact decimal —
    the module's cross-engine dp-sum discipline."""
    return F.round(
        F.log(cnt_col.cast("double") / total_col.cast("double")), 9
    ).cast(_DP)


def _viterbi_best_path(
    words: DataFrame,
    scored: DataFrame,
    max_word_len: int,
    max_piece_len: int = 8,
) -> DataFrame:
    """Relational Viterbi: forward dp over positions 1..len(w), then a
    deterministic backwalk emitting the best segmentation's spans.
    `words` = (w, freq); `scored` = (w, s, e, piece, lp exact decimal).
    Every char must be coverable (single-char pieces present for every
    char of every word), which train/encode guarantee.
    Returns (w, piece, s) — one row per used piece occurrence.

    Execution shape (r12): each word's dp table is bounded
    (max_word_len positions × max_piece_len spans), so the whole
    forward pass + backwalk run IN-ROW over one per-word span array —
    ONE exchange (the per-word collect_list) + one codegen stage —
    instead of max_word_len scheduled join+max rounds followed by
    max_word_len join+window backwalk rounds (~0.25 s of pure stage
    scheduling per round on a KB-sized histogram; the markov /
    hbos_scores r12 discipline). Numerics are unchanged: lp lives on
    the 1e-9 decimal grid, so dp values are carried as UNSCALED 1e-9
    longs — integer adds reproduce the old decimal(28,9) sums
    term-for-term, and the backwalk argmax sorts by
    (-score, s, piece), the exact (score DESC, s ASC, piece ASC)
    total tie-break the window form used (UTF8-binary piece order on
    both paths)."""
    edges = scored.select(
        "w",
        F.struct(
            F.col("e").cast("int").alias("e"),
            F.col("s").cast("int").alias("s"),
            "piece",
            (F.col("lp") * 1_000_000_000).cast("long").alias("lp"),
        ).alias("ed"),
    ).groupBy("w").agg(F.collect_list("ed").alias("E"))
    n = F.length("w")
    # forward: dp[0..len] as a growing array<long>; dp[i] = max over
    # spans ending at i of dp[s] + lp (candidates whose dp[s] is
    # unreachable are skipped, matching the join form's semantics)
    dp = F.aggregate(
        F.sequence(F.lit(1), n),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.concat(
            acc,
            F.array(
                F.array_max(
                    F.filter(
                        F.transform(
                            F.filter(F.col("E"), lambda ed: ed["e"] == i),
                            lambda ed: F.element_at(acc, ed["s"] + 1)
                            + ed["lp"],
                        ),
                        lambda v: v.isNotNull(),
                    )
                )
            ),
        ),
    )
    withdp = edges.withColumn("dp", dp)
    # backwalk: fold over at most len(w) steps; each step picks the
    # span ending at `cur` with the best (score DESC, s ASC, piece
    # ASC) — encoded as an ascending struct sort on (-score, s, piece)
    # — and moves cur to its start. Unreachable-score candidates are
    # filtered exactly as the join form dropped them.
    def _step(acc, _r):
        best = F.element_at(
            F.array_sort(
                F.filter(
                    F.transform(
                        F.filter(
                            F.col("E"), lambda ed: ed["e"] == acc["cur"]
                        ),
                        lambda ed: F.struct(
                            (
                                -(
                                    F.element_at(F.col("dp"), ed["s"] + 1)
                                    + ed["lp"]
                                )
                            ).alias("neg"),
                            ed["s"].alias("s"),
                            ed["piece"].alias("piece"),
                        ),
                    ),
                    lambda c: c["neg"].isNotNull(),
                )
            ),
            1,
        )
        nxt = F.struct(
            best["s"].alias("cur"),
            F.concat(
                acc["picked"],
                F.array(
                    F.struct(best["s"].alias("s"), best["piece"].alias("piece"))
                ),
            ).alias("picked"),
        )
        return F.when((acc["cur"] > 0) & best.isNotNull(), nxt).otherwise(acc)

    picked = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            n.cast("int").alias("cur"),
            F.array().cast("array<struct<s:int,piece:string>>").alias("picked"),
        ),
        _step,
        lambda acc: acc["picked"],
    )
    return (
        withdp.select("w", F.explode(picked).alias("p"))
        .select("w", F.col("p.s").alias("s"), F.col("p.piece").alias("piece"))
        .select("w", "piece", "s")
    )


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    max_piece_len: int = 4,
    max_word_len: int = 10,
    em_rounds: int = 2,
    seed_size: int = 400,
) -> DataFrame:
    """Learn a unigram-LM piece vocabulary from the corpus (Kudo
    ACL'18, hard-EM variant).

    Trajectory (fixed rounds, fully in-plan, oracle-replayable):
    1. word histogram (ONE corpus shuffle), words > max_word_len
       excluded;
    2. seed = top `seed_size` substrings (length ≤ max_piece_len) by
       corpus frequency, plus every single char (coverage guarantee);
       initial logp ∝ seed frequency;
    3. `em_rounds` rounds of hard EM: Viterbi-segment every histogram
       word under current piece logps (relational dp + backwalk, see
       _viterbi_best_path), recount pieces from the best paths
       (weighted by word freq), re-normalize; single chars are floored
       at count 1 so coverage never collapses;
    4. prune to the top `vocab_size` pieces by (count DESC, piece ASC);
       single-char pieces are always retained (the SentencePiece
       required-character set).

    Returns (rank, piece, n_uses, logp) for kept pieces, rank dense
    over the kept set. Deterministic by construction — every argmax is
    exact-decimal scored with a total tie-break."""
    if vocab_size < 1 or em_rounds < 1:
        raise ValueError("vocab_size and em_rounds must be >= 1")
    words = (
        word_frequencies(df, text_col)
        .filter(F.length("w") <= max_word_len)
        .localCheckpoint(eager=True)
    )
    spans = _spans(words, max_piece_len).localCheckpoint(eager=True)
    chars = spans.filter(F.length("piece") == 1).select("piece").distinct()
    seed_counts = spans.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    top_seed = (
        seed_counts.orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(int(seed_size))
    )
    pieces = (
        top_seed.unionByName(
            chars.join(seed_counts, "piece", "left").select(
                "piece", F.coalesce(F.col("cnt"), F.lit(1)).alias("cnt")
            )
        )
        .groupBy("piece")
        .agg(F.max("cnt").alias("cnt"))
    )
    wtot = Window.partitionBy()
    pieces = pieces.select(
        "piece", "cnt", _logp(F.col("cnt"), F.sum("cnt").over(wtot)).alias("lp")
    ).localCheckpoint(eager=True)
    for _ in range(em_rounds):
        # single consumer since the in-row Viterbi rewrite — no
        # checkpoint needed (it would only add a serial job per round)
        scored = spans.join(pieces.select("piece", "lp"), "piece").select(
            "w", "s", "e", "piece", "lp"
        )
        used = _viterbi_best_path(words, scored, max_word_len, max_piece_len)
        counts = (
            used.join(words, "w")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
        )
        multi = counts.filter(F.length("piece") > 1)
        singles = chars.join(counts, "piece", "left").select(
            "piece",
            F.greatest(F.coalesce(F.col("cnt"), F.lit(0)), F.lit(1)).alias("cnt"),
        )
        pieces = (
            multi.unionByName(singles)
            .select(
                "piece",
                "cnt",
                _logp(F.col("cnt"), F.sum("cnt").over(wtot)).alias("lp"),
            )
            .localCheckpoint(eager=True)
        )
    wrank = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    ranked = pieces.withColumn("rank", F.row_number().over(wrank))
    return (
        ranked.filter(
            (F.col("rank") <= int(vocab_size)) | (F.length("piece") == 1)
        )
        .select(
            "rank",
            "piece",
            F.col("cnt").cast("long").alias("n_uses"),
            F.col("lp").cast("double").alias("logp"),
        )
    )


def unigram_encode_replay(
    df: DataFrame,
    text_col: str,
    pieces: DataFrame,
    max_word_len: int = 14,
) -> DataFrame:
    """In-plan Viterbi encode with a GIVEN piece table — the
    SQL-replayable oracle surface. `pieces` = (piece, logp double);
    single-char coverage for every a-z0-9 char is the caller's
    contract (normalize_text maps everything else to word breaks).
    Words longer than max_word_len are EXCLUDED from the token count
    and reported per doc (the production pandas-UDF path has no such
    cap). Returns (doc_id, n_tokens, n_words, n_words_long)."""
    from ..functions.text import normalize_text

    max_piece_len = 8  # spans bounded by the longest plausible piece
    doc_words = df.select(
        F.col("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    words = (
        doc_words.filter(F.length("w") <= max_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    p = pieces.select(
        "piece", F.round(F.col("logp"), 9).cast(_DP).alias("lp")
    )
    scored = (
        _spans(words, max_piece_len)
        .join(p, "piece")
        .select("w", "s", "e", "piece", "lp")
    )
    used = _viterbi_best_path(words, scored, max_word_len, max_piece_len)
    per_word = used.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    return (
        doc_words.join(per_word, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).cast("long").alias(
                "n_tokens"
            ),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum((F.length("w") > max_word_len).cast("long")).alias(
                "n_words_long"
            ),
        )
    )


def unigram_encode(
    df: DataFrame,
    text_col: str,
    pieces: DataFrame,
) -> DataFrame:
    """Production Viterbi encode: Arrow-batched pandas UDF over
    DISTINCT normalized words (dictionary encoding — work is
    O(|vocab| · len · max_piece_len), never O(corpus)), broadcast join
    back onto the corpus. Handles any word length; characters absent
    from the piece table fall back to one token each (unk-per-char,
    the SentencePiece byte-fallback analog). The piece table is
    driver-collected — bounded by vocab_size, the same bounded-collect
    contract as bpe.merge_list. Returns (doc_id, n_tokens, n_words).

    Equality with unigram_encode_replay on the replay domain (words ≤
    its max_word_len) is asserted in tests/test_unigram.py."""
    from ..functions.text import normalize_text

    plist = [
        (r["piece"], float(r["logp"]))
        for r in pieces.select("piece", "logp").collect()
    ]
    lp = dict(plist)
    max_piece_len = max((len(k) for k in lp), default=1)

    @F.pandas_udf("long")
    def _vit_count(ws: pd.Series) -> pd.Series:
        def count(w: str) -> int:
            n = len(w)
            if n == 0:
                return 0
            NEG = float("-inf")
            dp = [0.0] + [NEG] * n
            back = [0] * (n + 1)
            for i in range(1, n + 1):
                best, bs = NEG, i - 1
                for s in range(max(0, i - max_piece_len), i):
                    piece = w[s:i]
                    v = lp.get(piece)
                    if v is None and i - s == 1:
                        v = -100.0  # unk-per-char fallback
                    if v is None or dp[s] == NEG:
                        continue
                    # logps live on the 1e-9 grid (replay carries them
                    # as exact decimals); re-rounding each sum to 9 dp
                    # recovers exactness so tie-breaks match the
                    # replay's decimal argmax bit-for-bit
                    cand = round(dp[s] + v, 9)
                    if cand > best:
                        best, bs = cand, s
                dp[i], back[i] = best, bs
            toks, i = 0, n
            while i > 0:
                toks += 1
                i = back[i]
            return toks

        return ws.map(count)

    doc_words = df.select(
        F.col("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    per_word = (
        doc_words.select("w")
        .distinct()
        .withColumn("n_tok", _vit_count(F.col("w")))
    )
    return (
        doc_words.join(F.broadcast(per_word), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
