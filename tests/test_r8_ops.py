"""Round-8 operators: Spearman midranks, ACF/Ljung-Box, seasonal-naive
backtest, URL canonicalization, geohash, weighted SSSP, Jaro-Winkler,
confusion F1, Cohen's kappa, log-odds terms, quantile normalization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestSpearman:
    def test_monotonic_is_one_and_ties_average(self, spark):
        from azure_data_engineering_spark.operators.stats import spearman_corr

        rows = [("g", x, x * x) for x in [1, 2, 3, 4, 5]] + [
            # group h: y has ties; hand-computed rho
            ("h", 1, 10),
            ("h", 2, 10),
            ("h", 3, 30),
            ("h", 4, 20),
        ]
        df = spark.createDataFrame(rows, "g string, x int, y int")
        got = {r.group: (r.n, r.spearman_rho) for r in spearman_corr(df, "g", "x", "y").collect()}
        assert got["g"] == (5, 1.0)  # strictly monotonic
        # h: ranks x = 1,2,3,4; y midranks = 1.5,1.5,4,3
        # pearson over those ranks:
        rx = [1, 2, 3, 4]
        ry = [1.5, 1.5, 4, 3]
        n = 4
        sx, sy = sum(rx), sum(ry)
        sxx = sum(a * a for a in rx)
        syy = sum(a * a for a in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert got["h"][1] == pytest.approx(round(rho, 6), abs=1e-9)

    def test_constant_column_yields_null(self, spark):
        from azure_data_engineering_spark.operators.stats import spearman_corr

        df = spark.createDataFrame(
            [("g", 1, 7), ("g", 2, 7), ("g", 3, 7)], "g string, x int, y int"
        )
        [r] = spearman_corr(df, "g", "x", "y").collect()
        assert r.spearman_rho is None  # zero rank variance on y


class TestAcfLjungBox:
    def test_alternating_series_lag1_negative(self, spark):
        from azure_data_engineering_spark.operators.timeseries import acf_ljung_box

        # x alternates 0,10 -> r1 should be strongly negative, r2 positive
        rows = [("s", f"d{i:02d}", 10 * (i % 2)) for i in range(12)]
        df = spark.createDataFrame(rows, "g string, t string, x int")
        got = {r.lag: r.acf for r in acf_ljung_box(df, "g", "t", "x", max_lag=3).collect()}
        assert got[1] < -0.8
        assert got[2] > 0.6
        # hand-check lag-1 with the n-scaled formula
        x = [10 * (i % 2) for i in range(12)]
        n, s = len(x), sum(x)
        c = [n * v - s for v in x]
        r1 = sum(c[i] * c[i + 1] for i in range(n - 1)) / sum(v * v for v in c)
        assert got[1] == pytest.approx(round(r1, 6), abs=1e-9)

    def test_lb_q_cumulative(self, spark):
        from azure_data_engineering_spark.operators.timeseries import acf_ljung_box

        rows = [("s", f"d{i:02d}", (i * 7919) % 13) for i in range(20)]
        df = spark.createDataFrame(rows, "g string, t string, x int")
        out = sorted(acf_ljung_box(df, "g", "t", "x", max_lag=4).collect(), key=lambda r: r.lag)
        qs = [r.lb_q for r in out]
        assert qs == sorted(qs)  # Q is cumulative, non-decreasing


class TestSeasonalNaive:
    def test_perfectly_seasonal_series_scores_zero(self, spark):
        from azure_data_engineering_spark.operators.timeseries import seasonal_naive_eval

        rows = [("s", f"d{i:02d}", [3, 1, 4, 1, 5, 9, 2][i % 7]) for i in range(21)]
        df = spark.createDataFrame(rows, "g string, t string, x int")
        [r] = seasonal_naive_eval(df, "g", "t", "x", season=7).collect()
        assert (r.n_eval, r.mae, r.rmse, r.smape) == (14, 0.0, 0.0, 0.0)

    def test_known_errors(self, spark):
        from azure_data_engineering_spark.operators.timeseries import seasonal_naive_eval

        # season=1: forecast = previous value
        rows = [("s", f"d{i}", v) for i, v in enumerate([10, 13, 9])]
        df = spark.createDataFrame(rows, "g string, t string, x int")
        [r] = seasonal_naive_eval(df, "g", "t", "x", season=1).collect()
        assert r.n_eval == 2
        assert r.mae == pytest.approx(3.5)  # |3| and |-4|
        assert r.rmse == pytest.approx(round(math.sqrt((9 + 16) / 2), 6))


class TestUrlCanonicalize:
    CASES = [
        ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://Example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/?gclid=zz", "http://example.com/"),
        ("not a url", None),
    ]

    def test_cases(self, spark):
        from azure_data_engineering_spark.functions.urls import canonicalize_url

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "u string")
        got = [r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
        assert got == [want for _, want in self.CASES]


class TestGeohash:
    def test_public_vectors(self, spark):
        from azure_data_engineering_spark.operators.spatial import geohash

        df = spark.createDataFrame(
            [(57.64911, 10.40744), (-25.382708, -49.265506), (90.0, 180.0)],
            "lat double, lon double",
        )
        got = [
            r.g
            for r in df.select(geohash(F.col("lat"), F.col("lon"), 6).alias("g")).collect()
        ]
        assert got == ["u4pruy", "6gkzwg", "zzzzzz"]


class TestSsspWeighted:
    def test_small_graph_exact(self, spark):
        from azure_data_engineering_spark.operators.graph import sssp_weighted

        # 1 -> 2 (w5), 1 -> 3 (w1), 3 -> 2 (w1): shortest 1->2 is 2 via 3
        edges = spark.createDataFrame(
            [(1, 2, 5), (1, 3, 1), (3, 2, 1), (2, 4, 1)],
            "src long, dst long, w int",
        )
        got = {r.node: r.dist for r in sssp_weighted(edges, 1, rounds=3).collect()}
        assert got == {1: 0, 2: 2, 3: 1, 4: 3}

    def test_rounds_bound_path_length(self, spark):
        from azure_data_engineering_spark.operators.graph import sssp_weighted

        edges = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w int"
        )
        got = {r.node: r.dist for r in sssp_weighted(edges, 1, rounds=2).collect()}
        assert got == {1: 0, 2: 1, 3: 2}  # node 4 needs 3 hops


class TestJaroWinkler:
    def test_public_vectors(self):
        from azure_data_engineering_spark.operators.linkage import jaro_winkler_py

        assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611111111111111)
        assert jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(0.8133333333333332)
        assert jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.8400000000000001)
        assert jaro_winkler_py("CRATE", "TRACE") == pytest.approx(0.7333333333333334)
        assert jaro_winkler_py("abc", "abc") == 1.0
        assert jaro_winkler_py("abc", "xyz") == 0.0
        assert jaro_winkler_py("", "x") == 0.0

    def test_matches_duckdb_bit_for_bit(self):
        import duckdb

        from azure_data_engineering_spark.operators.linkage import jaro_winkler_py

        con = duckdb.connect()
        pairs = [
            ("JELLYFISH", "SMELLYFISH"),
            ("prefixmatch", "prefixmatXh"),
            ("aaaaaaaaab", "baaaaaaaaa"),
            ("goldenrod lavender", "goldenrod lace"),
        ]
        for a, b in pairs:
            (want,) = con.sql(
                "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
            ).fetchone()
            assert jaro_winkler_py(a, b) == want  # exact, no tolerance


class TestConfusionF1:
    def test_hand_counts_with_unpredicted_class(self, spark):
        from azure_data_engineering_spark.operators.mlplan import confusion_f1

        rows = [("a", "a")] * 3 + [("a", "b")] * 1 + [("b", "b")] * 2 + [("c", "a")] * 2
        df = spark.createDataFrame(rows, "t string, p string")
        got = {r["class"]: r for r in confusion_f1(df, "t", "p").collect()}
        # class a: tp=3, n_true=4, n_pred=5
        assert (got["a"].tp, got["a"].n_true, got["a"].n_pred) == (3, 4, 5)
        assert got["a"].precision == pytest.approx(0.6)
        assert got["a"].recall == pytest.approx(0.75)
        # class c never predicted: f1 must be 0, not NULL
        assert got["c"].f1 == 0.0
        assert got["__micro"].f1 == pytest.approx(round(5 / 8, 6))
        f1a = 2 * 0.6 * 0.75 / 1.35
        f1b = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
        assert got["__macro"].f1 == pytest.approx(round((round(f1a, 9) + round(f1b, 9) + 0) / 3, 6))


class TestCohensKappa:
    def test_perfect_and_chance(self, spark):
        from azure_data_engineering_spark.operators.mlplan import cohens_kappa

        df = spark.createDataFrame(
            [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
        )
        [r] = cohens_kappa(df, "a", "b").collect()
        assert (r.p_o, r.kappa) == (1.0, 1.0)
        # classic textbook example: 2 raters, known marginals
        rows = [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
        [r2] = cohens_kappa(spark.createDataFrame(rows, "a string, b string"), "a", "b").collect()
        # p_o = 35/50 = .7; p_e = (25*30 + 25*20)/2500 = .5; kappa = .4
        assert (r2.p_o, r2.p_e, r2.kappa) == (0.7, 0.5, pytest.approx(0.4))


class TestLogOdds:
    def test_discriminative_terms_surface(self, spark):
        from azure_data_engineering_spark.operators.keywords import log_odds_terms

        rows = [(1, "alpha alpha alpha shared shared")] * 6 + [
            (0, "beta beta beta shared shared")
        ] * 6
        df = spark.createDataFrame(rows, "ia int, text string")
        out = log_odds_terms(df, "text", "ia", alpha0=10.0, min_count=2, top_k=2).collect()
        a_terms = [r.term for r in out if r.side == "A"]
        b_terms = [r.term for r in out if r.side == "B"]
        assert a_terms[0] == "alpha"
        assert b_terms[0] == "beta"
        z = {(r.side, r.term): r.z for r in out}
        assert z[("A", "alpha")] > 0 > z[("B", "beta")]


class TestQuantileNormalize:
    def test_distributions_equalized(self, spark):
        from azure_data_engineering_spark.operators.features import quantile_normalize

        rows = [("g1", 1, 10.0), ("g1", 2, 20.0), ("g1", 3, 30.0),
                ("g2", 4, 100.0), ("g2", 5, 200.0), ("g2", 6, 300.0)]
        df = spark.createDataFrame(rows, "g string, id int, v double")
        out = quantile_normalize(df, "g", "id", "v").collect()
        by_group = {}
        for r in out:
            by_group.setdefault(r.group, []).append(r.normalized)
        # both groups end with the identical (rank-mean) distribution
        assert sorted(by_group["g1"]) == sorted(by_group["g2"]) == [55.0, 110.0, 165.0]

    def test_unequal_group_sizes(self, spark):
        from azure_data_engineering_spark.operators.features import quantile_normalize

        rows = [("g1", 1, 10.0), ("g1", 2, 20.0), ("g2", 3, 100.0)]
        df = spark.createDataFrame(rows, "g string, id int, v double")
        got = {r.id: r.normalized for r in quantile_normalize(df, "g", "id", "v").collect()}
        assert got[1] == 55.0   # rank 1 mean of (10, 100)
        assert got[2] == 20.0   # rank 2: only g1 present


class TestPipeTextSink:
    def test_roundtrip_with_nulls_and_success_marker(self, spark, tmp_path):
        import json
        import os

        from azure_data_engineering_spark.sources.csv_pipe import read_pipe_csv
        from azure_data_engineering_spark.sources.pydatasource import register_sink

        register_sink(spark)
        out = str(tmp_path / "sink")
        df = spark.createDataFrame(
            [(1, "a", 2.5), (2, None, 3.5), (3, "c", None)],
            "k int, s string, v double",
        ).repartition(2)
        df.write.format("pipetext").option("path", out).mode("append").save()
        # two-phase commit: no staging files survive, _SUCCESS names totals
        names = os.listdir(out)
        assert not [n for n in names if n.startswith("_staging")]
        marker = json.load(open(os.path.join(out, "_SUCCESS")))
        assert marker["rows"] == 3
        back = read_pipe_csv(spark, out).collect()
        got = sorted((r._c0, r._c1, r._c2) for r in back)
        assert got == [("1", "a", "2.5"), ("2", None, "3.5"), ("3", "c", None)]

    def test_delimiter_and_quote_values_roundtrip(self, spark, tmp_path):
        """ADVICE r8: values containing the delimiter, quotes, or
        backslashes must round-trip through read_pipe_csv (the sink
        quotes exactly like Spark's own CSV writer for sep='|')."""
        from azure_data_engineering_spark.sources.csv_pipe import read_pipe_csv
        from azure_data_engineering_spark.sources.pydatasource import register_sink

        register_sink(spark)
        out = str(tmp_path / "sink_q")
        vals = ["plain", "has|pipe", 'has"quote', "back\\slash", 'mix|"x\\', "\\"]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "k int, s string")
        df.write.format("pipetext").option("path", out).mode("append").save()
        back = {int(r._c0): r._c1 for r in read_pipe_csv(spark, out).collect()}
        assert back == dict(enumerate(vals))

    def test_overwrite_clears_stale_parts_append_never_clobbers(self, spark, tmp_path):
        """ADVICE r8: save(mode='overwrite') must remove previously
        committed parts (no phantom rows when the new job writes fewer
        parts), and two append jobs must never clobber each other's
        part files (job-token-uniquified names)."""
        from azure_data_engineering_spark.sources.csv_pipe import read_pipe_csv
        from azure_data_engineering_spark.sources.pydatasource import register_sink

        register_sink(spark)
        out = str(tmp_path / "sink_ow")
        big = spark.createDataFrame([(i,) for i in range(8)], "k int").repartition(8)
        big.write.format("pipetext").option("path", out).mode("append").save()
        more = spark.createDataFrame([(100,), (101,)], "k int").repartition(2)
        more.write.format("pipetext").option("path", out).mode("append").save()
        got = sorted(int(r._c0) for r in read_pipe_csv(spark, out).collect())
        assert got == list(range(8)) + [100, 101]  # append kept both jobs
        small = spark.createDataFrame([(42,)], "k int").coalesce(1)
        small.write.format("pipetext").option("path", out).mode("overwrite").save()
        got = [int(r._c0) for r in read_pipe_csv(spark, out).collect()]
        assert got == [42]  # no phantom rows from the earlier 10 parts


class TestAudioQuality:
    def test_known_clip_and_quarantine(self, spark):
        import struct

        import pandas as pd

        from azure_data_engineering_spark.sources.media_codecs import wav_encode
        from azure_data_engineering_spark.sources.multimodal import audio_quality_stats

        samples = [0, 0, 1000, -32767, 32760, 50]  # 3 silent-ish, 2 clipped
        raw = struct.pack("<6h", *samples)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"id": [1, 2], "payload": [wav_encode(raw, 8000, channels=1), b"junk"]}
            )
        )
        got = {r.id: r for r in audio_quality_stats(df, 32000, 100).collect()}
        r = got[1]
        assert r.n_frames == 6
        assert r.peak == 32767
        assert r.clip_frac == pytest.approx(round(2 / 6, 6))
        assert r.silence_frac == pytest.approx(0.5)
        import math as _m

        want_rms = round(_m.sqrt(sum(s * s for s in samples) / 6), 6)
        assert r.rms == pytest.approx(want_rms)
        assert got[2].n_frames == 0 and got[2].rms is None  # quarantine row


class TestDauMau:
    def test_rolling_window_and_ratio(self, spark):
        from azure_data_engineering_spark.operators.funnel import dau_mau_stickiness

        rows = []
        # day 1: users 1,2 ; day 2: user 1 ; day 31: user 3 (window
        # excludes day 1-2 users at 28 days)
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        for u, d in [(1, 0), (2, 0), (1, 1), (3, 30)]:
            rows.append((u, base + dt.timedelta(days=d)))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {r.day: (r.dau, r.mau, r.stickiness) for r in dau_mau_stickiness(df).collect()}
        assert got["2024-01-01"] == (2, 2, 1.0)
        assert got["2024-01-02"] == (1, 2, 0.5)   # MAU still {1,2}
        assert got["2024-01-31"] == (1, 1, 1.0)   # 28-day window rolled off days 1-2
