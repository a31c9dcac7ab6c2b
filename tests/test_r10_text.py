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


class TestUnimax:
    def _run(self, spark, sizes, budget, max_epochs=2.0):
        from azure_data_engineering_spark.operators.sampling import (
            unimax_allocation,
        )

        rows = [(s, n) for s, n in sizes.items()]
        df = spark.createDataFrame(rows, "source string, n long")
        return {
            r.source: r
            for r in unimax_allocation(
                df, "source", "n", budget=budget, max_epochs=max_epochs
            ).collect()
        }

    def test_uniform_when_budget_fits(self, spark):
        # budget 300, three big sources: everyone gets 100
        got = self._run(spark, {"a": 1000, "b": 2000, "c": 3000}, 300.0)
        assert all(abs(got[s].allocation - 100.0) < 1e-6 for s in "abc")

    def test_small_source_capped_surplus_redistributed(self, spark):
        # caps (2 epochs): a=20, b=2000, c=2000; budget 620:
        # a capped at 20, remaining 600 split 300/300
        got = self._run(spark, {"a": 10, "b": 1000, "c": 1000}, 620.0)
        assert abs(got["a"].allocation - 20.0) < 1e-6
        assert abs(got["a"].epochs - 2.0) < 1e-6
        assert abs(got["b"].allocation - 300.0) < 1e-6
        assert abs(got["c"].allocation - 300.0) < 1e-6

    def test_budget_exceeds_total_capacity(self, spark):
        got = self._run(spark, {"a": 10, "b": 20}, 1000.0)
        assert abs(got["a"].allocation - 20.0) < 1e-6
        assert abs(got["b"].allocation - 40.0) < 1e-6

    def test_cascading_caps(self, spark):
        # caps: a=2, b=8, c=100; budget 30: a capped (2), b capped (8),
        # c gets 20
        got = self._run(spark, {"a": 1, "b": 4, "c": 50}, 30.0)
        assert abs(got["a"].allocation - 2.0) < 1e-6
        assert abs(got["b"].allocation - 8.0) < 1e-6
        assert abs(got["c"].allocation - 20.0) < 1e-6


class TestRobots:
    def _eval(self, spark, rules, urls):
        from azure_data_engineering_spark.operators.robots import robots_evaluate

        r = spark.createDataFrame(rules, "directive string, path string")
        u = spark.createDataFrame(urls, "id long, url string")
        return {row.id: row for row in robots_evaluate(u, r).collect()}

    def test_longest_match_wins(self, spark):
        rules = [("disallow", "/private"), ("allow", "/private/press")]
        urls = [(1, "https://x.com/private/hr"), (2, "https://x.com/private/press/a")]
        got = self._eval(spark, rules, urls)
        assert got[1].allowed == 0 and got[1].matched_path == "/private"
        assert got[2].allowed == 1 and got[2].matched_path == "/private/press"

    def test_default_allow_unmatched(self, spark):
        got = self._eval(spark, [("disallow", "/x")], [(1, "https://a.b/ok")])
        assert got[1].allowed == 1 and got[1].matched_directive is None

    def test_allow_wins_length_tie(self, spark):
        rules = [("disallow", "/p/a"), ("allow", "/p/b")]
        # craft a tie: both rules length 4; only one matches each url,
        # so instead tie on the SAME prefix with both directives
        rules = [("disallow", "/page"), ("allow", "/page")]
        got = self._eval(spark, rules, [(1, "https://a.b/page/1")])
        assert got[1].allowed == 1

    def test_empty_path_is_root(self, spark):
        rules = [("disallow", "/")]
        got = self._eval(spark, rules, [(1, "https://a.b")])
        assert got[1].path == "/" and got[1].allowed == 0

    def test_equal_length_same_directive_deterministic(self, spark):
        # two distinct matching rules of equal length and the same
        # directive: matched_path must be a total order — the lexically
        # smallest path — not whichever partition arrives first
        # (ADVICE r10)
        rules = [("disallow", "/zz/a"), ("disallow", "/zz/b"),
                 ("disallow", "/zz")]
        urls = [(1, "https://a.b/zz/a"), (2, "https://a.b/zz/b3")]
        for _ in range(3):
            got = self._eval(spark, rules, urls)
            assert got[1].matched_path == "/zz/a"
            assert got[2].matched_path == "/zz/b"

    def test_multihost_routes_by_host(self, spark):
        from azure_data_engineering_spark.operators.robots import (
            robots_evaluate_multihost,
        )

        rules = spark.createDataFrame(
            [("a.com", "disallow", "/x"), ("b.com", "allow", "/x"),
             ("b.com", "disallow", "/")],
            "host string, directive string, path string",
        )
        urls = spark.createDataFrame(
            [(1, "https://a.com/x/1"), (2, "https://b.com/x/1"),
             (3, "https://B.com/y"), (4, "https://c.com/x/1")],
            "id long, url string",
        )
        got = {r.id: r for r in robots_evaluate_multihost(urls, rules).collect()}
        # same path, different verdict per host
        assert got[1].allowed == 0 and got[2].allowed == 1
        # host matching is case-insensitive; '/' disallow catches /y
        assert got[3].allowed == 0 and got[3].host == "b.com"
        # no rule group for c.com -> default allow
        assert got[4].allowed == 1 and got[4].matched_directive is None

    def test_multihost_plan_is_host_equi_join(self, spark):
        # VERDICT r10 ask 6: the rule lookup must be a hash join on the
        # host key (prefix match as residual), never a nested loop over
        # the all-hosts rule table
        from azure_data_engineering_spark.operators.robots import (
            robots_evaluate_multihost,
        )

        rules = spark.createDataFrame(
            [("a.com", "disallow", "/x")],
            "host string, directive string, path string",
        )
        urls = spark.createDataFrame(
            [(1, "https://a.com/x/1")], "id long, url string"
        )
        plan = robots_evaluate_multihost(urls, rules)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert any(j in plan for j in
                   ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")), plan

    def test_parser_strips_comments_and_junk(self, spark):
        from azure_data_engineering_spark.operators.robots import (
            robots_rules_from_text,
        )

        body = "User-agent: *\nDisallow: /a # comment\nallow: /a/b\nDisallow:\nnoise"
        df = spark.createDataFrame([(1, body)], "id int, body string")
        rules = {
            (r.directive, r.path)
            for r in robots_rules_from_text(df, "id", "body").collect()
        }
        assert rules == {("disallow", "/a"), ("allow", "/a/b")}
