"""Unigram-LM tokenizer tests (operators/unigram): the trainer against
a pure-Python reference implementation of hard-EM Viterbi training
(Kudo ACL'18), the two encode paths against each other, edge semantics
(unk fallback, long-word accounting), and the BPE-vs-unigram fertility
comparison on the documents fixture."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.unigram import (
    unigram_encode,
    unigram_encode_replay,
    unigram_train,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------- reference impl


def _norm_words(text):
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]


def _r9(x):
    return round(x, 9)


def _viterbi(w, lp, max_piece_len):
    """dp + deterministic backwalk, scores re-rounded to the 1e-9 grid
    (the operator's exact-decimal discipline). Returns the list of
    pieces used (in backwalk order)."""
    n = len(w)
    NEG = float("-inf")
    dp = [0.0] + [NEG] * n
    for i in range(1, n + 1):
        best = NEG
        for s in range(max(0, i - max_piece_len), i):
            piece = w[s:i]
            v = lp.get(piece)
            if v is None or dp[s] == NEG:
                continue
            cand = _r9(dp[s] + v)
            if cand > best:
                best = cand
        dp[i] = best
    used, cur = [], n
    while cur > 0:
        cands = []
        for s in range(max(0, cur - max_piece_len), cur):
            piece = w[s:cur]
            v = lp.get(piece)
            if v is None or dp[s] == NEG:
                continue
            cands.append((-_r9(dp[s] + v), s, piece))
        _, s, piece = min(cands)
        used.append(piece)
        cur = s
    return used


def ref_unigram_train(texts, vocab_size, max_piece_len, max_word_len,
                      em_rounds, seed_size):
    """Pure-Python mirror of unigram_train's replayed trajectory."""
    from collections import Counter

    hist = Counter()
    for t in texts:
        hist.update(_norm_words(t))
    hist = {w: f for w, f in hist.items() if len(w) <= max_word_len}
    seed_counts: Counter = Counter()
    chars = set()
    for w, f in hist.items():
        for e in range(1, len(w) + 1):
            for s in range(max(0, e - max_piece_len), e):
                seed_counts[w[s:e]] += f
                if e - s == 1:
                    chars.add(w[s:e])
    top = sorted(seed_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    pieces = {p: c for p, c in top}
    for c in chars:
        pieces[c] = max(pieces.get(c, 0), seed_counts.get(c, 1))
    total = sum(pieces.values())
    lp = {p: _r9(math.log(c / total)) for p, c in pieces.items()}
    for _ in range(em_rounds):
        counts: Counter = Counter()
        for w, f in hist.items():
            for piece in _viterbi(w, lp, max_piece_len):
                counts[piece] += f
        pieces = {p: c for p, c in counts.items() if len(p) > 1}
        for c in chars:
            pieces[c] = max(counts.get(c, 0), 1)
        total = sum(pieces.values())
        lp = {p: _r9(math.log(c / total)) for p, c in pieces.items()}
    ranked = sorted(pieces.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {}
    for rank, (p, c) in enumerate(ranked, start=1):
        if rank <= vocab_size or len(p) == 1:
            out[p] = (rank, c, lp[p])
    return out


CORPUS = [
    "the cat sat on the mat and the dog sat too",
    "cats and dogs and mats and hats",
    "the dog ate the cat food from the mat",
    "a hat and a mat for the cat and the dog",
    "dogs eat cat food the cats eat dog food",
]


class TestUnigramTrainVsReference:
    def test_trajectory_matches_pure_python(self, spark):
        params = dict(vocab_size=15, max_piece_len=3, max_word_len=6,
                      em_rounds=2, seed_size=40)
        ref = ref_unigram_train(CORPUS, **params)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
        )
        got = {
            r.piece: (r.rank, r.n_uses, r.logp)
            for r in unigram_train(df, "text", **params).collect()
        }
        assert set(got) == set(ref), (set(got) ^ set(ref))
        for p, (rank, cnt, lp) in ref.items():
            grank, gcnt, glp = got[p]
            assert (grank, gcnt) == (rank, cnt), (p, got[p], ref[p])
            assert abs(glp - lp) < 2e-9, (p, glp, lp)

    def test_learns_frequent_words_as_pieces(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
        )
        top = [
            r.piece
            for r in unigram_train(
                df, "text", vocab_size=10, max_piece_len=3,
                max_word_len=6, em_rounds=2, seed_size=40,
            ).orderBy("rank").collect()
        ][:6]
        assert "the" in top and "cat" in top

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            unigram_train(df, "text", vocab_size=0)


class TestEncodeTwins:
    PIECES = (
        [(c, -3.5) for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
        + [("th", -2.8), ("he", -2.8), ("at", -2.8), ("nd", -2.8)]
        + [("the", -2.2), ("and", -2.2)]
    )

    def _pieces(self, spark):
        return spark.createDataFrame(self.PIECES, "piece string, logp double")

    def test_replay_equals_production_on_replay_domain(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
        )
        p = self._pieces(spark)
        rep = {
            r.doc_id: (r.n_tokens, r.n_words)
            for r in unigram_encode_replay(docs, "text", p, max_word_len=12).collect()
        }
        prod = {
            r.doc_id: (r.n_tokens, r.n_words)
            for r in unigram_encode(docs, "text", p).collect()
        }
        assert rep == prod

    def test_long_words_reported_not_segmented(self, spark):
        docs = spark.createDataFrame(
            [(1, "short extraordinarily")], "doc_id long, text string"
        )
        r = unigram_encode_replay(
            docs, "text", self._pieces(spark), max_word_len=8
        ).collect()[0]
        # 'extraordinarily' (15 chars) excluded from the count, reported
        assert r.n_words == 2 and r.n_words_long == 1
        # 'short' -> s+h+o+r+t has no multi-char wins here: 5 tokens
        assert r.n_tokens == 5

    def test_production_unk_char_fallback(self, spark):
        # piece table without 'z': each z falls back to one unk token
        pieces = spark.createDataFrame(
            [(c, -3.5) for c in "ab"], "piece string, logp double"
        )
        docs = spark.createDataFrame([(1, "zab azz")], "doc_id long, text string")
        r = unigram_encode(docs, "text", pieces).collect()[0]
        assert r.n_tokens == 6 and r.n_words == 2

    def test_longest_piece_wins(self, spark):
        docs = spark.createDataFrame([(1, "the band")], "doc_id long, text string")
        r = unigram_encode_replay(
            docs, "text", self._pieces(spark), max_word_len=8
        ).collect()[0]
        # 'the' -> 1 token; 'band' -> b + and (=-3.5-2.2) beats
        # b+a+nd / b+at... -> 2 tokens
        assert r.n_tokens == 3


class TestFertilityVsBpe:
    def test_fertility_comparison_on_documents_fixture(self, spark):
        """The VERDICT r10 ask: unigram vs BPE fertility (tokens per
        whitespace word) on the documents fixture. Both must compress
        below the char-level baseline; the trained unigram vocab (40
        pieces + chars) should be at least as frugal as a 12-merge BPE
        — the standard finding that unigram matches or beats BPE at
        equal (here: small) vocabulary budgets."""
        from azure_data_engineering_spark.catalog import load_table
        from azure_data_engineering_spark.functions.text import normalize_text
        from azure_data_engineering_spark.operators.bpe import (
            bpe_encode_replay,
            bpe_train,
        )

        d = load_table(spark, SF_DIR, "documents")
        base = d.select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
        ).filter(F.col("w") != "")
        stats = base.agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
        ).collect()[0]
        char_fertility = stats.n_chars / stats.n_words

        vocab = unigram_train(
            d, "text", vocab_size=40, max_piece_len=4, max_word_len=8,
            em_rounds=2, seed_size=300,
        ).select("piece", "logp")
        uni = unigram_encode(d, "text", vocab).agg(
            F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w")
        ).collect()[0]
        f_uni = uni.t / uni.w

        merges = bpe_train(d, "text", num_merges=12, min_freq=2)
        enc = bpe_encode_replay(d, "text", merges, num_merges=12)
        bpe = enc.select(
            F.size("bpe_tokens").alias("t"),
            F.size(
                F.filter(F.split(normalize_text(F.col("text")), " "),
                         lambda w: w != "")
            ).alias("w"),
        ).agg(F.sum("t").alias("t"), F.sum("w").alias("w")).collect()[0]
        f_bpe = bpe.t / bpe.w

        assert 1.0 < f_uni < char_fertility, (f_uni, char_fertility)
        assert 1.0 < f_bpe < char_fertility, (f_bpe, char_fertility)
        # unigram's 40-piece vocab vs BPE's 12 merges: unigram should
        # not be grossly worse; record both in the failure message
        assert f_uni < f_bpe * 1.25, (f_uni, f_bpe, char_fertility)
