"""BPE tokenizer tests (operators/bpe): the trainer against a
pure-Python reference implementation of classic BPE (Sennrich
ACL'16), the two encode paths against each other, and the
simultaneous-replacement edge semantics."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_replay,
    bpe_train,
)


# ---------------------------------------------------------- reference impl


def _norm_words(text):
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]


def _merge_word(syms, lhs, rhs):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_bpe_train(texts, num_merges, min_freq=2):
    """Classic BPE on the word histogram; ties break (count desc,
    lhs asc, rhs asc). Returns [(lhs, rhs, count, applied)] for ALL
    rounds (sub-min_freq rounds are no-ops, mirroring the fixed-
    iteration operator)."""
    vocab = Counter()
    for t in texts:
        vocab.update(_norm_words(t))
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if pc:
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            (lhs, rhs), cnt = best
        else:
            (lhs, rhs), cnt = ("", ""), -1
        applied = cnt >= min_freq
        merges.append((lhs, rhs, cnt, applied))
        if applied:
            words = {w: _merge_word(s, lhs, rhs) for w, s in words.items()}
    return merges


def ref_bpe_encode(text, merges):
    toks_out = []
    for w in _norm_words(text):
        syms = list(w)
        for lhs, rhs, _, applied in merges:
            if applied:
                syms = _merge_word(syms, lhs, rhs)
        toks_out.extend(syms)
    return toks_out


# ------------------------------------------------------------------- tests

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new lower"),
    (3, "widest wide wider new low"),
    (4, ""),
    (5, "!!! ??? ..."),
    (6, "Low, LOWER; newest-newest"),
]


class TestBpeTrain:
    def test_textbook_merges(self, spark):
        """The Sennrich running example learns (l,o), (lo,w), then the
        er/est suffixes — pinned exactly."""
        df = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
        got = [
            (r.lhs, r.rhs, r.pair_count)
            for r in bpe_train(df, "text", num_merges=4, min_freq=2)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == [("l", "o", 7), ("lo", "w", 7), ("e", "w", 5), ("n", "ew", 5)]

    def test_matches_reference_on_random_corpora(self, spark):
        """Property: the distributed trainer equals the pure-Python
        classic-BPE reference on random corpora (3 seeds)."""
        for seed in (7, 19, 23):
            rng = random.Random(seed)
            alphabet = "abcd"
            texts = [
                " ".join(
                    "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                    for _ in range(rng.randint(3, 12))
                )
                for _ in range(40)
            ]
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
            )
            got = [
                (r.lhs, r.rhs, r.pair_count, r.applied)
                for r in bpe_train(df, "text", num_merges=10, min_freq=2)
                .orderBy("merge_rank")
                .collect()
            ]
            want = ref_bpe_train(texts, 10, 2)
            assert got == want, f"seed {seed}: {got} != {want}"

    def test_min_freq_rounds_are_noops(self, spark):
        """Once every pair falls below min_freq the remaining rounds
        report applied=false and change nothing."""
        df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
        m = bpe_train(df, "text", num_merges=4, min_freq=2).orderBy("merge_rank")
        rows = m.collect()
        assert [r.applied for r in rows] == [True, False, False, False]
        assert (rows[0].lhs, rows[0].rhs) == ("a", "b")

    def test_deterministic_across_runs(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        a = [tuple(r) for r in bpe_train(df, "text", 6).orderBy("merge_rank").collect()]
        b = [tuple(r) for r in bpe_train(df, "text", 6).orderBy("merge_rank").collect()]
        assert a == b


class TestBpeEncode:
    def test_replay_matches_reference(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges_df = bpe_train(df, "text", num_merges=8)
        enc = {
            r.doc_id: r.bpe_tokens
            for r in bpe_encode_replay(df, "text", merges_df, num_merges=8).collect()
        }
        ref_merges = ref_bpe_train([t for _, t in CORPUS], 8, 2)
        for doc_id, text in CORPUS:
            assert enc[doc_id] == ref_bpe_encode(text, ref_merges), doc_id

    def test_production_udf_matches_replay(self, spark):
        """The pandas-UDF dictionary-encode path is byte-identical to
        the codegen replay chain, including empty and punct-only
        docs."""
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges_df = bpe_train(df, "text", num_merges=8)
        replay = {
            r.doc_id: r.bpe_tokens
            for r in bpe_encode_replay(df, "text", merges_df, num_merges=8).collect()
        }
        ml = [
            (r.lhs, r.rhs)
            for r in merges_df.filter("applied").orderBy("merge_rank").collect()
        ]
        prod = {
            r.doc_id: r.bpe_tokens
            for r in bpe_encode(df, "text", "doc_id", ml).collect()
        }
        assert replay == prod
        assert prod[4] == [] and prod[5] == []

    def test_simultaneous_replacement_left_to_right(self, spark):
        """'aaa' under merge (a,a) becomes [aa, a] — one simultaneous
        left-to-right pass, never the overlapping [a, aa]."""
        df = spark.createDataFrame(
            [(1, "aaa aaa aaa")], "doc_id long, text string"
        )
        m = bpe_train(df, "text", num_merges=1, min_freq=2)
        r = bpe_encode_replay(df, "text", m, num_merges=1).first()
        assert r.bpe_tokens == ["aa", "a"] * 3

    def test_merge_chain_compounds(self, spark):
        """(a,a)->aa then (aa,aa)->aaaa: rank order compounds."""
        df = spark.createDataFrame(
            [(1, "aaaa aaaa")], "doc_id long, text string"
        )
        m = bpe_train(df, "text", num_merges=2, min_freq=2)
        pairs = [(r.lhs, r.rhs) for r in m.orderBy("merge_rank").collect()]
        assert pairs == [("a", "a"), ("aa", "aa")]
        r = bpe_encode_replay(df, "text", m, num_merges=2).first()
        assert r.bpe_tokens == ["aaaa", "aaaa"]

    def test_token_counts_vs_whitespace(self, spark):
        """BPE token count is >= word count before merges saturate,
        and never exceeds character count."""
        df = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
        m = bpe_train(df, "text", num_merges=6)
        enc = bpe_encode_replay(df, "text", m, num_merges=6)
        for r in enc.collect():
            n = len(r.bpe_tokens)
            words = _norm_words(r.text)
            assert n >= len(words)
            assert n <= sum(len(w) for w in words)


class TestMergeArtifact:
    def test_save_load_roundtrip_and_encode_parity(self, spark, tmp_path):
        """The persisted merge table is the tokenizer artifact: a
        loaded table must reproduce byte-identical encodings."""
        from azure_data_engineering_spark.operators.bpe import (
            load_merges,
            merge_list,
            save_merges,
        )

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        m = bpe_train(df, "text", num_merges=8)
        path = str(tmp_path / "merges")
        save_merges(m, path)
        m2 = load_merges(spark, path)
        assert [tuple(r) for r in m.orderBy("merge_rank").collect()] == [
            tuple(r) for r in m2.collect()
        ]
        enc1 = {r.doc_id: r.bpe_tokens
                for r in bpe_encode_replay(df, "text", m, num_merges=8).collect()}
        enc2 = {r.doc_id: r.bpe_tokens
                for r in bpe_encode(df, "text", "doc_id", merge_list(m2)).collect()}
        assert enc1 == enc2
