"""Behavioral tests for the round-6c additions: grid DBSCAN, rank-1
ALS, SAX discretization, and the clustering-coefficient summary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.als import als_rank1
from azure_data_engineering_spark.operators.dbscan import grid_dbscan
from azure_data_engineering_spark.operators.graph import clustering_coefficient
from azure_data_engineering_spark.operators.timeseries import sax_symbols


class TestGridDbscan:
    def test_two_blobs_and_noise(self, spark):
        rows = [(1, 0.0, 0.0), (2, 0.1, 0.0), (3, 0.0, 0.1), (4, 0.1, 0.1),
                (5, 0.2, 0.2),
                (6, 10.0, 10.0), (7, 10.1, 10.0), (8, 10.0, 10.1), (9, 10.1, 10.1),
                (10, 5.0, 5.0)]
        df = spark.createDataFrame(rows, "pid long, x double, y double")
        got = {r.pid: (r.role, r.cluster_id)
               for r in grid_dbscan(df, "pid", "x", "y", eps=0.5, min_pts=3).collect()}
        assert got[10] == ("noise", -1)
        assert {got[i] for i in (1, 2, 3, 4, 5)} == {("core", 1)}
        assert {got[i] for i in (6, 7, 8, 9)} == {("core", 6)}

    def test_border_point(self, spark):
        # 1-4 dense core cluster; 5 within eps of 4 only -> border
        rows = [(1, 0.0, 0.0), (2, 0.1, 0.0), (3, 0.0, 0.1), (4, 0.1, 0.1),
                (5, 0.5, 0.1)]
        df = spark.createDataFrame(rows, "pid long, x double, y double")
        got = {r.pid: (r.role, r.cluster_id)
               for r in grid_dbscan(df, "pid", "x", "y", eps=0.45, min_pts=4).collect()}
        assert got[5] == ("border", 1)
        assert got[1] == ("core", 1)

    def test_cross_cell_neighbors_found(self, spark):
        # two points straddling a cell boundary, within eps
        rows = [(1, 0.99, 0.0), (2, 1.01, 0.0), (3, 1.00, 0.1)]
        df = spark.createDataFrame(rows, "pid long, x double, y double")
        got = {r.pid: r.role
               for r in grid_dbscan(df, "pid", "x", "y", eps=1.0, min_pts=3).collect()}
        assert set(got.values()) == {"core"}


class TestAlsRank1:
    def test_rank1_matrix_recovered(self, spark):
        # r_ij = a_i * b_j exactly rank 1 -> tiny reconstruction error
        a = {1: 1.0, 2: 2.0, 3: 3.0}
        b = {"x": 2.0, "y": 4.0}
        rows = [(u, i, a[u] * b[i]) for u in a for i in b]
        df = spark.createDataFrame(rows, "u long, i string, r double").select(
            "u", "i", F.col("r").cast("decimal(18,2)").alias("r")
        )
        out = {r.i: r for r in als_rank1(df, "u", "i", "r", rounds=3).collect()}
        assert set(out) == {"x", "y"}
        r0 = out["x"]
        assert r0.rmse < 0.2  # lam=0.1 shrinkage keeps it from exact 0
        # factor ratio must match b ratio
        assert out["y"].v / out["x"].v == pytest.approx(2.0, rel=0.05)

    def test_deterministic(self, spark):
        rows = [(u, str(i % 3), float(u * i % 7 + 1)) for u in range(1, 20) for i in range(3)]
        df = spark.createDataFrame(rows, "u long, i string, r double").select(
            "u", "i", F.col("r").cast("decimal(18,2)").alias("r")
        )
        v1 = {r.i: (r.v, r.rmse) for r in als_rank1(df, "u", "i", "r").collect()}
        v2 = {r.i: (r.v, r.rmse) for r in als_rank1(df, "u", "i", "r").collect()}
        assert v1 == v2


class TestAlsRankK:
    def _rank2_fixture(self, spark):
        # r_ij = x_u*a_i + y_u*b_j: genuinely rank 2, so rank-1 cannot
        # fit it and every higher rank can.
        rows = []
        for u in range(30):
            x, y = (u % 3) + 1.0, ((u * 7) % 5) + 1.0
            for i in range(12):
                a, b = (i % 4) + 1.0, ((i * 3) % 6) + 0.5
                rows.append((u, i, round(x * a + y * b, 2)))
        return spark.createDataFrame(rows, "u long, i long, r double").select(
            "u", "i", F.col("r").cast("decimal(18,2)").alias("r")
        )

    def test_rank2_strictly_beats_rank1(self, spark):
        from azure_data_engineering_spark.operators.als import als_rank_k

        df = self._rank2_fixture(spark)
        r1 = float(als_rank1(df, "u", "i", "r", rounds=4).first()["rmse"])
        r2 = float(als_rank_k(df, "u", "i", "r", k=2, rounds=4).first()["rmse"])
        assert r2 < r1  # strict improvement on the rank-2 fixture
        assert r2 < 0.05  # and it actually FITS the rank-2 structure

    def test_rank4_arrow_path_beats_rank1(self, spark):
        # k>2 exercises the Arrow-batched np.linalg.solve branch
        from azure_data_engineering_spark.operators.als import als_rank_k

        df = self._rank2_fixture(spark)
        r1 = float(als_rank1(df, "u", "i", "r", rounds=4).first()["rmse"])
        out = als_rank_k(df, "u", "i", "r", k=4, rounds=4)
        row = out.first()
        assert {"v0", "v1", "v2", "v3"} <= set(out.columns)
        assert float(row["rmse"]) < r1

    def test_rank_k_deterministic(self, spark):
        from azure_data_engineering_spark.operators.als import als_rank_k

        df = self._rank2_fixture(spark)
        a = {r.i: (r.v0, r.v1, r.rmse)
             for r in als_rank_k(df, "u", "i", "r", k=2).collect()}
        b = {r.i: (r.v0, r.v1, r.rmse)
             for r in als_rank_k(df, "u", "i", "r", k=2).collect()}
        assert a == b


class TestSaxSymbols:
    def _run(self, spark, vals, **kw):
        rows = [("s", f"d{i:02d}", v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, d string, v long")
        return sax_symbols(df, "g", "d", "v", **kw).orderBy("segment").collect()

    def test_ramp_maps_to_ordered_symbols(self, spark):
        out = self._run(spark, list(range(24)), n_segments=4)
        assert [r.symbol for r in out] == ["a", "b", "c", "d"]
        assert [r.n_obs for r in out] == [6, 6, 6, 6]
        zs = [r.paa_z for r in out]
        assert zs == sorted(zs)
        assert zs[0] < 0 < zs[-1]

    def test_flat_series_has_no_shape(self, spark):
        out = self._run(spark, [5] * 12, n_segments=4)
        assert all(r.paa_z is None and r.symbol is None for r in out)

    def test_uneven_segment_split(self, spark):
        out = self._run(spark, list(range(10)), n_segments=4)
        assert sum(r.n_obs for r in out) == 10
        assert len(out) == 4


class TestClusteringCoefficient:
    def test_complete_graph(self, spark):
        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
        assert r.transitivity == 1.0 and r.avg_local_cc == 1.0

    def test_path_graph_no_triangles(self, spark):
        df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
        r = clustering_coefficient(df).collect()[0]
        assert r.n_triangles == 0 and r.transitivity == 0.0
        assert r.avg_local_cc == 0.0  # the two middle nodes, both C=0

    def test_triangle_plus_pendant(self, spark):
        # triangle 0-1-2 plus pendant 3 on node 0
        df = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (0, 3)], "src long, dst long")
        r = clustering_coefficient(df).collect()[0]
        assert r.n_triangles == 1
        # wedges: d=[3,2,2,1] -> sum d(d-1) = 6+2+2+0 = 10; 2*3/10 = 0.6
        assert r.transitivity == 0.6
        # local: node0 C=2*1/6=1/3, nodes 1,2 C=1 -> avg = (1/3+1+1)/3
        assert r.avg_local_cc == pytest.approx((1 / 3 + 2) / 3, abs=1e-6)

    def test_duplicate_directions_normalized(self, spark):
        df = spark.createDataFrame(
            [(0, 1), (1, 0), (1, 2), (0, 2), (2, 0)], "src long, dst long"
        )
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_edges, r.n_triangles) == (3, 1)
