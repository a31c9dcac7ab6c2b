"""Behavioral tests for the round-3 analytic additions: triangle
counting, time-decay sums, Markov transitions, MAD outliers,
chi-squared association, spatial nearest join, and BM25 — each pinned
on hand-built fixtures with known closed-form answers (the oracle
gate checks them against DuckDB at data scale; these pin the
semantics a SQL oracle can't isolate, e.g. plan shape and edge
cases)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.graph import triangle_count
from azure_data_engineering_spark.operators.spatial import spatial_nearest
from azure_data_engineering_spark.operators.stats import chi_squared, mad_outliers
from azure_data_engineering_spark.operators.tfidf import bm25_search
from azure_data_engineering_spark.operators.window_ops import (
    markov_transitions,
    time_decay_sum,
)


class TestTriangleCount:
    def test_k4_every_node_in_three_triangles(self, spark):
        """K4 has C(4,3)=4 triangles; every node sits in exactly 3."""
        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_direction_duplicates_and_self_loops_ignored(self, spark):
        """Both directions listed + dup rows + a self loop: still one
        triangle."""
        rows = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 2)]
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        assert got == {0: 1, 1: 1, 2: 1}

    def test_star_graph_has_no_triangles(self, spark):
        df = spark.createDataFrame(
            [(0, i) for i in range(1, 8)], "src long, dst long"
        )
        assert triangle_count(df).count() == 0

    def test_hot_node_orientation_bounds_fanout(self, spark):
        """A 500-leaf star plus one closing edge: the naive wedge join
        would put C(500,2)≈125k wedges on the hub; orientation points
        every spoke AWAY from high-degree hub, leaving only the two
        closed wedges. Assert correctness (1 triangle) — the bound is
        structural."""
        rows = [(0, i) for i in range(1, 501)] + [(1, 2)]
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        assert got == {0: 1, 1: 1, 2: 1}


class TestTimeDecay:
    def test_half_life_algebra(self, spark):
        """Second event exactly one half-life later: decayed sum =
        x1/2 + x2; third one more half-life: x1/4 + x2/2 + x3."""
        day = 86400
        rows = [
            (1, 0 * day, 10.0),
            (1, 7 * day, 4.0),
            (1, 14 * day, 1.0),
        ]
        df = spark.createDataFrame(rows, "k long, t long, v double").select(
            "k", F.timestamp_seconds("t").alias("ts"), "v"
        )
        r = time_decay_sum(df, "k", "ts", "v", half_life_days=7.0)
        vals = [x.decayed_sum for x in r.orderBy("ts").collect()]
        assert vals[0] == pytest.approx(10.0)
        assert vals[1] == pytest.approx(9.0)  # 10/2 + 4
        assert vals[2] == pytest.approx(5.5)  # 10/4 + 4/2 + 1

    def test_tied_timestamps_deterministic(self, spark):
        """RANGE frame: both tied rows see the full tied sum, under
        any partition layout."""
        rows = [(1, 0, 3.0), (1, 0, 5.0)]
        df = spark.createDataFrame(rows, "k long, t long, v double").select(
            "k", F.timestamp_seconds("t").alias("ts"), "v"
        )
        r = time_decay_sum(df, "k", "ts", "v", half_life_days=1.0)
        assert [x.decayed_sum for x in r.collect()] == [8.0, 8.0]


class TestMarkovTransitions:
    def test_known_sequence(self, spark):
        """a->b, b->a, a->b for one user: P(b|a)=1, P(a|b)=1, counts
        2 and 1; terminal event contributes nothing."""
        rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b")]
        df = spark.createDataFrame(rows, "u long, t long, s string").select(
            "u", F.timestamp_seconds("t").alias("ts"), "s", F.col("t").alias("eid")
        )
        r = markov_transitions(df, "u", "ts", "s", order_tiebreak="eid")
        got = {(x.from_state, x.to_state): (x.n, x.p) for x in r.collect()}
        assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    def test_probabilities_sum_to_one_per_state(self, spark, sf_dir):
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        r = markov_transitions(e, "user_id", "ts", "event_type", "event_id")
        sums = r.groupBy("from_state").agg(F.sum("p").alias("sp")).collect()
        assert all(abs(x.sp - 1.0) < 1e-9 for x in sums)


class TestMadOutliers:
    def test_plants_single_spike(self, spark):
        """49 values in [0,1] plus one at 100: only the spike flags."""
        rows = [(i, "g", (i % 7) / 7.0) for i in range(49)] + [(99, "g", 100.0)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        r = mad_outliers(df, "g", "v")
        flagged = [x.id for x in r.filter("is_outlier").collect()]
        assert flagged == [99]

    def test_zero_mad_yields_no_flags(self, spark):
        """>=50% identical values => MAD 0 => null scores, no flags,
        no division error."""
        rows = [(i, "g", 5.0) for i in range(10)] + [(10, "g", 6.0)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        r = mad_outliers(df, "g", "v")
        assert r.filter("is_outlier").count() == 0
        assert r.filter(F.col("mod_z").isNotNull()).count() == 0


class TestChiSquared:
    def test_perfect_independence(self, spark):
        """Uniform 2x2 grid: chi2 = 0, V = 0."""
        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_squared(df, "a", "b").collect()[0]
        assert r.chi2 == pytest.approx(0.0)
        assert r.cramers_v == pytest.approx(0.0)
        assert r.dof == 1 and r.n == 40

    def test_perfect_association(self, spark):
        """Deterministic mapping a->b: chi2 = n, Cramer's V = 1."""
        rows = [("x", "u")] * 10 + [("y", "v")] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        r = chi_squared(df, "a", "b").collect()[0]
        assert r.chi2 == pytest.approx(20.0)
        assert r.cramers_v == pytest.approx(1.0)


class TestSpatialNearest:
    def test_planted_nearest_and_radius_cutoff(self, spark):
        pts = spark.createDataFrame(
            [(1, 40.0, -100.0), (2, 48.0, -80.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [
                (10, 40.1, -100.0),   # ~11 km from point 1
                (11, 41.0, -100.0),   # ~111 km from point 1
                (12, 0.0, 0.0),       # nowhere near anything
            ],
            "fid long, lat double, lon double",
        )
        r = spatial_nearest(pts, fac, radius_km=50.0)
        rows = r.collect()
        assert len(rows) == 1  # point 2 has nothing in range
        assert rows[0].pid == 1 and rows[0].fid_f == 10
        assert rows[0].dist_km == pytest.approx(11.12, abs=0.05)

    def test_no_cartesian_product_in_plan(self, spark):
        pts = spark.createDataFrame(
            [(i, 40.0 + i / 100.0, -100.0) for i in range(20)],
            "pid long, lat double, lon double",
        )
        fac = spark.createDataFrame(
            [(i, 40.0 + i / 50.0, -100.0) for i in range(10)],
            "fid long, lat double, lon double",
        )
        plan = spatial_nearest(pts, fac, radius_km=25.0)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_neighbor_cell_match_found(self, spark):
        """Point and facility 1 km apart but in different grid cells
        (straddling a cell boundary): the 3x3 replication still finds
        the pair."""
        cell = 150.0 / 111.19 / math.cos(math.radians(75.0))  # operator's cell edge
        lat_lo = math.floor(40.0 / cell) * cell
        pts = spark.createDataFrame(
            [(1, lat_lo - 0.004, -100.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [(7, lat_lo + 0.004, -100.0)], "fid long, lat double, lon double"
        )
        r = spatial_nearest(pts, fac, radius_km=150.0).collect()
        assert len(r) == 1 and r[0].fid_f == 7


class TestBm25:
    def test_tf_and_length_normalization(self, spark):
        """Same tf: shorter doc scores higher; higher tf (same length)
        scores higher; docs without the term don't appear."""
        docs = [
            (1, "spark spark filler filler filler filler"),
            (2, "spark spark"),
            (3, "spark filler"),
            (4, "nothing here"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = {x.doc_id: x.bm25 for x in bm25_search(df, ["spark"], "text", "doc_id", k=10).collect()}
        assert set(r) == {1, 2, 3}
        assert r[2] > r[1]      # same tf=2, doc 2 much shorter
        assert r[2] > r[3]      # same length-2 doc, higher tf


class TestTokenDrift:
    def test_identical_groups_have_zero_divergence(self, spark):
        from azure_data_engineering_spark.operators.stats import (
            token_distribution_drift,
        )

        rows = [(g, "alpha beta gamma") for g in ("a", "b") for _ in range(5)]
        df = spark.createDataFrame(rows, "src string, text string")
        r = token_distribution_drift(df, "text", "src").collect()
        assert all(abs(x.kl) < 1e-12 and abs(x.js) < 1e-12 for x in r)

    def test_disjoint_vocab_js_is_half_ln2_kl_ln2(self, spark):
        """Two equal-size groups with disjoint vocabularies: corpus
        dist gives each term q = p/2, so KL(group||corpus) = ln 2 and
        JS(group, corpus) = 0.5*ln(2) - ... closed form: each present
        term has p, q=p/2 => js_present = p*ln(4/3) + (p/2)*ln(2/3);
        absent mass = 1/2 => js = 0.5*(ln(4/3) + 0.5*ln(2/3)) +
        0.25*ln2. Pin both numerically."""
        import math

        from azure_data_engineering_spark.operators.stats import (
            token_distribution_drift,
        )

        rows = [("a", "one two three four")] * 4 + [("b", "five six seven eight")] * 4
        df = spark.createDataFrame(rows, "src string, text string")
        r = {x.grp: x for x in token_distribution_drift(df, "text", "src").collect()}
        expected_js = 0.5 * (math.log(4 / 3) + 0.5 * math.log(2 / 3)) + 0.25 * math.log(2)
        for g in ("a", "b"):
            assert r[g].kl == pytest.approx(math.log(2), abs=1e-12)
            assert r[g].js == pytest.approx(expected_js, abs=1e-12)


class TestLloydKmeans:
    def test_two_obvious_clusters(self, spark):
        """Points at ~(0,0) and ~(10,10): 2-means separates them and
        every point lands with its own blob regardless of init."""
        from azure_data_engineering_spark.operators.kmeans import lloyd_kmeans

        rows = [(i, [0.0 + i / 100.0, 0.0]) for i in range(10)] + [
            (100 + i, [10.0, 10.0 + i / 100.0]) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        r = lloyd_kmeans(df, "embedding", "vec_id", k=2, iterations=3)
        got = {x.id: x.cid for x in r.collect()}
        blob_a = {got[i] for i in range(10)}
        blob_b = {got[100 + i] for i in range(10)}
        assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b

    def test_converged_fixture_distances(self, spark):
        """A symmetric fixture where the final centroids are the blob
        means: per-point dist equals the hand-computed value."""
        from azure_data_engineering_spark.operators.kmeans import lloyd_kmeans

        rows = [(0, [0.0]), (1, [2.0]), (10, [10.0]), (11, [12.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        r = lloyd_kmeans(df, "embedding", "vec_id", k=2, iterations=3)
        got = {x.id: (x.cid, x.dist) for x in r.collect()}
        # centroids converge to 1.0 and 11.0; every point is 1 away
        assert all(d == 1.0 for _, d in got.values())
        assert got[0][0] == got[1][0] != got[10][0] == got[11][0]


class TestSpatialEdges:
    def test_antimeridian_pair_found(self, spark):
        """Point at lon -179.95 and facility at lon +179.95 are ~11 km
        apart across the dateline; wrapped lon cells must pair them."""
        pts = spark.createDataFrame(
            [(1, 0.0, -179.95)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [(7, 0.0, 179.95), (8, 0.0, 150.0)],
            "fid long, lat double, lon double",
        )
        r = spatial_nearest(pts, fac, radius_km=50.0).collect()
        assert len(r) == 1 and r[0].fid_f == 7
        assert r[0].dist_km == pytest.approx(11.12, abs=0.1)

    def test_lat_beyond_bound_raises(self, spark):
        """|lat| > max_abs_lat would silently shrink lon cells below
        the radius; the operator must fail loudly at execution time."""
        pts = spark.createDataFrame(
            [(1, 80.0, 0.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [(7, 80.0, 0.1)], "fid long, lat double, lon double"
        )
        with pytest.raises(Exception, match="max_abs_lat"):
            spatial_nearest(pts, fac, radius_km=50.0).collect()

    def test_polar_pair_found_with_raised_bound(self, spark):
        """Same polar pair succeeds once max_abs_lat covers it (cells
        widen as 1/cos)."""
        pts = spark.createDataFrame(
            [(1, 80.0, 0.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [(7, 80.0, 0.1)], "fid long, lat double, lon double"
        )
        r = spatial_nearest(pts, fac, radius_km=50.0, max_abs_lat=85.0).collect()
        assert len(r) == 1 and r[0].fid_f == 7


class TestBm25QueryNormalization:
    def test_messy_query_matches_index_terms(self, spark):
        """'Spark-SQL' must split into the index terms ('spark','sql');
        plain lowercasing would make it unmatchable."""
        docs = [(1, "spark sql engine"), (2, "unrelated words")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = bm25_search(df, ["Spark-SQL"], "text", "doc_id", k=10).collect()
        assert [x.doc_id for x in r] == [1]

    def test_duplicate_terms_weight_double(self, spark):
        """A term repeated in the query contributes with qtf=2: the
        score equals exactly 2x the single-term score."""
        docs = [
            (1, "spark engine engine filler"),
            (2, "engine spark spark filler"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        single = {
            x.doc_id: x.bm25
            for x in bm25_search(df, ["spark"], "text", "doc_id", k=10).collect()
        }
        double = {
            x.doc_id: x.bm25
            for x in bm25_search(
                df, ["spark", "spark"], "text", "doc_id", k=10
            ).collect()
        }
        for d in (1, 2):
            assert double[d] == pytest.approx(2.0 * single[d], rel=1e-12)

    def test_empty_normalized_query_returns_empty(self, spark):
        docs = [(1, "spark sql engine")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = bm25_search(df, ["!!!", "---"], "text", "doc_id", k=10)
        assert r.columns == ["doc_id", "bm25"] and r.count() == 0


class TestSpatialKnn:
    def test_k_nearest_ordering_and_radius(self, spark):
        from azure_data_engineering_spark.operators.spatial import spatial_knn

        pts = spark.createDataFrame(
            [(1, 40.0, -100.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [
                (10, 40.1, -100.0),   # ~11 km
                (11, 40.3, -100.0),   # ~33 km
                (12, 40.6, -100.0),   # ~67 km
                (13, 41.0, -100.0),   # ~111 km — beyond radius 100
                (14, 0.0, 0.0),
            ],
            "fid long, lat double, lon double",
        )
        rows = spatial_knn(pts, fac, radius_km=100.0, k=3).orderBy("knn_rank").collect()
        assert [r.fid_f for r in rows] == [10, 11, 12]
        assert [r.knn_rank for r in rows] == [1, 2, 3]
        assert rows[0].dist_km < rows[1].dist_km < rows[2].dist_km

    def test_fewer_than_k_returns_what_exists(self, spark):
        from azure_data_engineering_spark.operators.spatial import spatial_knn

        pts = spark.createDataFrame(
            [(1, 40.0, -100.0), (2, -40.0, 100.0)], "pid long, lat double, lon double"
        )
        fac = spark.createDataFrame(
            [(10, 40.1, -100.0)], "fid long, lat double, lon double"
        )
        rows = spatial_knn(pts, fac, radius_km=100.0, k=5).collect()
        assert len(rows) == 1 and rows[0].pid == 1  # point 2 drops

    def test_matches_nearest_at_k1(self, spark):
        from azure_data_engineering_spark.operators.spatial import (
            spatial_knn,
            spatial_nearest,
        )

        pts = spark.createDataFrame(
            [(i, 40.0 + i / 50.0, -100.0 + i / 80.0) for i in range(30)],
            "pid long, lat double, lon double",
        )
        fac = spark.createDataFrame(
            [(i, 40.0 + i / 30.0, -100.0 + i / 60.0) for i in range(12)],
            "fid long, lat double, lon double",
        )
        knn1 = {
            (r.pid, r.fid_f)
            for r in spatial_knn(pts, fac, radius_km=120.0, k=1).collect()
        }
        near = {
            (r.pid, r.fid_f)
            for r in spatial_nearest(pts, fac, radius_km=120.0).collect()
        }
        assert knn1 == near


class TestTemperatureMix:
    def test_smallest_source_keeps_everything(self, spark):
        from azure_data_engineering_spark.operators.sampling import temperature_mix

        rows = [(i, "big") for i in range(900)] + [
            (10000 + i, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        mixed = temperature_mix(df, "source", "doc_id", alpha=0.5)
        got = {r.source: r.cnt for r in
               mixed.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        assert got["small"] == 100  # rate exactly 1.0
        # big thins by (900/100)^(-0.5) = 1/3: expect ~300, binomial sd ~14
        assert 230 <= got["big"] <= 370

    def test_alpha_one_is_identity(self, spark):
        from azure_data_engineering_spark.operators.sampling import temperature_mix

        rows = [(i, "a" if i % 3 else "b") for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        assert temperature_mix(df, "source", "doc_id", alpha=1.0).count() == 300

    def test_deterministic_across_runs(self, spark):
        from azure_data_engineering_spark.operators.sampling import temperature_mix

        rows = [(i, "x" if i % 4 else "y") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = sorted(r.doc_id for r in temperature_mix(df, "source", "doc_id", 0.3).collect())
        b = sorted(r.doc_id for r in temperature_mix(df, "source", "doc_id", 0.3).collect())
        assert a == b and 0 < len(a) < 400


class TestPoissonBootstrap:
    def test_ci_brackets_point_and_is_partition_invariant(self, spark, sf_dir):
        from azure_data_engineering_spark.catalog import load_table
        from azure_data_engineering_spark.operators.stats import (
            poisson_bootstrap_ci,
        )

        o = load_table(spark, sf_dir, "orders")
        r = poisson_bootstrap_ci(o, "o_totalprice", "o_orderkey", n_resamples=64).first()
        assert r.n_resamples == 64
        assert r.ci_lo < r.point_mean < r.ci_hi
        # width sane: within +-10% of the mean for this n
        assert (r.ci_hi - r.ci_lo) < 0.2 * r.point_mean
        again = poisson_bootstrap_ci(
            o.repartition(7), "o_totalprice", "o_orderkey", n_resamples=64
        ).first()
        assert (r.ci_lo, r.ci_hi, r.point_mean) == (again.ci_lo, again.ci_hi, again.point_mean)

    def test_weights_mean_one(self, spark, sf_dir):
        """Poisson(1) weights must average ~1 so replicate sample sizes
        concentrate around n (the bootstrap's validity condition)."""
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.catalog import load_table
        from azure_data_engineering_spark.operators.stats import _POISSON1_CDF

        o = load_table(spark, sf_dir, "orders").limit(2000)
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("|boot|0"))),
                    1, 8,
                ), 16, 10,
            ).cast("double") / F.lit(4294967296.0)
        )
        w = None
        for c in _POISSON1_CDF:
            t = (u >= F.lit(c)).cast("int")
            w = t if w is None else w + t
        mean_w = o.select(w.alias("w")).agg(F.avg("w")).first()[0]
        assert 0.9 < mean_w < 1.1
