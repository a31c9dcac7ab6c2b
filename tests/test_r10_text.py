"""Round-10 wave-B: corpus BLEU, chat turn stats, assistant loss mask."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _tok_df(spark, pairs):
    rows = [(i, h.split(), r.split()) for i, (h, r) in enumerate(pairs)]
    return spark.createDataFrame(
        rows, "id long, hyp array<string>, ref array<string>"
    )


class TestBleu:
    def _run(self, spark, pairs, max_n=4):
        from azure_data_engineering_spark.operators.texteval import bleu_corpus

        return bleu_corpus(_tok_df(spark, pairs), "id", "hyp", "ref", max_n=max_n).collect()[0]

    def test_identical_is_one(self, spark):
        r = self._run(spark, [("a b c d e", "a b c d e")])
        assert r.bleu == 1.0 and r.p4 == 1.0 and r.brevity_penalty == 1.0

    def test_clipping_the_the_the(self, spark):
        # hyp repeats 'the' 4x; ref has 'the' twice -> p1 clipped to 2/4
        r = self._run(spark, [("the the the the", "the cat the mat")], max_n=1)
        assert abs(r.p1 - 0.5) < 1e-9

    def test_zero_ngram_overlap_gives_zero(self, spark):
        r = self._run(spark, [("x y z w", "a b c d")])
        assert r.bleu == 0.0

    def test_brevity_penalty(self, spark):
        # hyp = first 4 of 8 ref tokens: p_n all 1, BP = exp(1-2) = e^-1
        r = self._run(spark, [("a b c d", "a b c d e f g h")])
        assert abs(r.brevity_penalty - math.exp(-1.0)) < 1e-6
        assert abs(r.bleu - math.exp(-1.0)) < 1e-6

    def test_corpus_level_pools_counts(self, spark):
        # two docs; precision pooled over docs, not averaged
        r = self._run(
            spark, [("a b", "a b"), ("x y", "p q")], max_n=1
        )
        assert abs(r.p1 - 0.5) < 1e-9


def _chat_df(spark, rows):
    return spark.createDataFrame(rows, "id long, tr string")


class TestChatTurnStats:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.chat import chat_turn_stats

        return {
            r.id: r
            for r in chat_turn_stats(_chat_df(spark, rows), "id", "tr").collect()
        }

    def test_basic_parse(self, spark):
        tr = "user: hello there\nassistant: hi\nuser: bye now ok"
        r = self._run(spark, [(1, tr)])[1]
        assert r.n_turns == 3 and r.n_user == 2 and r.n_assistant == 1
        assert r.starts_with_user == 1
        assert r.alternation_violations == 0
        assert r.total_tokens == 6 and r.assistant_tokens == 1
        assert abs(r.assistant_share - 1 / 6) < 1e-6

    def test_alternation_violation_counted(self, spark):
        tr = "user: a\nuser: b\nassistant: c"
        r = self._run(spark, [(1, tr)])[1]
        assert r.alternation_violations == 1

    def test_system_runs_not_violations(self, spark):
        tr = "system: a\nsystem: b\nuser: c"
        r = self._run(spark, [(1, tr)])[1]
        assert r.alternation_violations == 0 and r.n_system == 2

    def test_malformed_line_counted(self, spark):
        tr = "user: a\nno role prefix here\nassistant: b"
        r = self._run(spark, [(1, tr)])[1]
        assert r.n_malformed == 1
        # malformed content tokens still count toward total
        assert r.total_tokens == 6


class TestAssistantLossMask:
    def _run(self, spark, rows):
        from azure_data_engineering_spark.operators.chat import assistant_loss_mask

        return {
            r.id: r
            for r in assistant_loss_mask(_chat_df(spark, rows), "id", "tr").collect()
        }

    def test_spans_and_offsets(self, spark):
        # tokens: user[0,1] assistant[2] assistant[3,4] user[5]
        tr = "user: a b\nassistant: c\nassistant: d e\nuser: f"
        r = self._run(spark, [(1, tr)])[1]
        assert r.n_tokens == 6 and r.n_loss_tokens == 3
        # adjacent assistant turns merge into ONE span
        assert r.n_spans == 1
        assert r.first_span_start == 2 and r.last_span_end == 5
        assert abs(r.loss_ratio - 0.5) < 1e-9

    def test_two_separated_spans(self, spark):
        tr = "assistant: a\nuser: b\nassistant: c d"
        r = self._run(spark, [(1, tr)])[1]
        assert r.n_spans == 2
        assert r.first_span_start == 0 and r.last_span_end == 4

    def test_no_assistant_content(self, spark):
        tr = "user: a b\nsystem: c"
        r = self._run(spark, [(1, tr)])[1]
        assert r.n_loss_tokens == 0 and r.n_spans == 0
        assert r.first_span_start is None and r.last_span_end is None
