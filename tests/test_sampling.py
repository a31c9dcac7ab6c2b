"""Training-data pipeline operators: deterministic sampling/splits,
token chunking, near-dup cluster resolution (connected components)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.chunking import chunk_by_tokens
from azure_data_engineering_spark.operators.clustering import connected_components
from azure_data_engineering_spark.operators.sampling import (
    deterministic_sample,
    split_assign,
    stratified_sample_exact,
)


class TestDeterministicSample:
    def test_stable_under_repartitioning(self, spark):
        """The core contract vs df.sample(): the selected row set is a
        pure function of the key — identical at any partitioning."""
        df = spark.range(2000).withColumnRenamed("id", "k")
        a = {r["k"] for r in deterministic_sample(df, "k", 0.2).collect()}
        b = {r["k"] for r in deterministic_sample(df.repartition(17), "k", 0.2).collect()}
        c = {r["k"] for r in deterministic_sample(df.coalesce(1), "k", 0.2).collect()}
        assert a == b == c
        assert 0.15 < len(a) / 2000 < 0.25

    def test_salt_draws_independent_sample(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "k")
        a = {r["k"] for r in deterministic_sample(df, "k", 0.2, salt="x").collect()}
        b = {r["k"] for r in deterministic_sample(df, "k", 0.2, salt="y").collect()}
        assert a != b
        # independent draws overlap ~ fraction^2
        assert len(a & b) < 0.1 * 2000


class TestSplitAssign:
    def test_disjoint_exhaustive_and_sized(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "k")
        sp = split_assign(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 5000  # exhaustive, disjoint by construction
        assert abs(counts["train"] / 5000 - 0.8) < 0.03
        assert abs(counts["val"] / 5000 - 0.1) < 0.02
        assert abs(counts["test"] / 5000 - 0.1) < 0.02

    def test_weights_must_sum_to_one(self, spark):
        df = spark.range(10)
        with pytest.raises(ValueError, match="sum to 1"):
            split_assign(df, "id", {"a": 0.5, "b": 0.4})


class TestMixCorpora:
    def test_rates_and_tags(self, spark):
        from azure_data_engineering_spark.operators.sampling import mix_corpora

        a = spark.range(2000).withColumnRenamed("id", "k")
        b = spark.range(2000, 4000).withColumnRenamed("id", "k")
        out = mix_corpora({"a": (a, 0.9), "b": (b, 0.1)}, "k")
        counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["a"] / 2000 - 0.9) < 0.05
        assert abs(counts["b"] / 2000 - 0.1) < 0.03

    def test_reproducible(self, spark):
        from azure_data_engineering_spark.operators.sampling import mix_corpora

        a = spark.range(500).withColumnRenamed("id", "k")
        m1 = {(r["source"], r["k"]) for r in mix_corpora({"a": (a, 0.5)}, "k").collect()}
        m2 = {(r["source"], r["k"]) for r in mix_corpora({"a": (a.repartition(7), 0.5)}, "k").collect()}
        assert m1 == m2

    def test_empty_sources_raise(self, spark):
        from azure_data_engineering_spark.operators.sampling import mix_corpora

        with pytest.raises(ValueError, match="at least one"):
            mix_corpora({}, "k")


class TestQuantization:
    def test_roundtrip_error_bound(self, spark):
        from azure_data_engineering_spark.functions.vectors import (
            dequantize_int8,
            max_abs,
            quantize_int8,
        )

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = df.select(
            "vec_id",
            "embedding",
            quantize_int8(F.col("embedding")).alias("q"),
            max_abs(F.col("embedding")).alias("m"),
        ).select(
            "vec_id", "embedding", "q", dequantize_int8(F.col("q"), F.col("m")).alias("back")
        )
        rows = {r["vec_id"]: r for r in out.collect()}
        assert rows[1]["q"] == [63, -127, 31, 0]  # trunc(x * 127/max|x|)
        err = max(abs(a - b) for a, b in zip(rows[1]["embedding"], rows[1]["back"]))
        assert err <= 1.0 / 127  # one quantization step of max|x|=1.0
        assert rows[2]["q"] == [0, 0, 0, 0]  # zero vector stays zero


class TestStratifiedSample:
    def test_exact_k_per_stratum(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = stratified_sample_exact(d, ["lang"], "doc_id", k=7)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {lang: min(7, n) for lang, n in sizes.items()}

    def test_deterministic(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = {r["doc_id"] for r in stratified_sample_exact(d, ["lang"], "doc_id", 5).collect()}
        b = {r["doc_id"] for r in stratified_sample_exact(d.repartition(13), ["lang"], "doc_id", 5).collect()}
        assert a == b


class TestChunking:
    def test_chunk_shapes_and_text(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, ""), (3, "x y")], "id long, text string"
        )
        rows = {
            (r["id"], r["chunk_id"]): r
            for r in chunk_by_tokens(docs, "id", "text", max_tokens=2).collect()
        }
        assert rows[(1, 0)]["chunk_text"] == "a b" and rows[(1, 0)]["token_len"] == 2
        assert rows[(1, 2)]["chunk_text"] == "e" and rows[(1, 2)]["token_len"] == 1
        assert rows[(1, 0)]["n_chunks"] == 3
        # empty doc survives as one empty chunk
        assert rows[(2, 0)]["token_len"] == 0 and rows[(2, 0)]["chunk_text"] == ""
        assert rows[(3, 0)]["chunk_text"] == "x y" and (3, 1) not in rows

    def test_reassembly_identity(self, spark, sf_dir):
        """Concatenating a doc's chunks reproduces the document — no
        token lost or duplicated at any boundary."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 100)
        chunks = chunk_by_tokens(d, "doc_id", "text", max_tokens=7)
        glued = (
            chunks.orderBy("doc_id", "chunk_id")
            .groupBy("doc_id")
            .agg(F.array_join(F.collect_list("chunk_text"), " ").alias("glued"))
        )
        joined = d.select("doc_id", F.trim("text").alias("text")).join(glued, "doc_id")
        assert joined.filter(F.col("text") != F.col("glued")).count() == 0

    def test_rejects_bad_max_tokens(self, spark):
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_by_tokens(spark.range(1).withColumn("text", F.lit("a")), "id", "text", 0)

    def test_pack_sequences_budget_binning(self, spark, sf_dir):
        """Every chunk lands in exactly one sequence; each sequence's
        token total stays within max_tokens + one chunk's overflow; the
        assignment is deterministic under repartitioning."""
        from azure_data_engineering_spark.operators.chunking import pack_sequences

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 200)
        chunks = chunk_by_tokens(d, "doc_id", "text", max_tokens=30, chunk_text=False)
        packed = pack_sequences(chunks, "doc_id", "chunk_id", "token_len", max_tokens=100, buckets=4)
        assert packed.count() == chunks.count()  # nothing lost or duplicated
        seqs = packed.groupBy("bucket", "seq_id").agg(
            F.sum("token_len").alias("t"), F.max("token_len").alias("biggest")
        )
        over = seqs.filter(F.col("t") > 100 + F.col("biggest")).count()
        assert over == 0  # overflow bounded by one straddling chunk
        a = sorted(map(tuple, packed.select("doc_id", "chunk_id", "bucket", "seq_id").collect()))
        b = sorted(
            map(
                tuple,
                pack_sequences(
                    chunks.repartition(11), "doc_id", "chunk_id", "token_len", 100, 4
                ).select("doc_id", "chunk_id", "bucket", "seq_id").collect(),
            )
        )
        assert a == b


class TestConnectedComponents:
    def test_chain_star_isolated(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(n,) for n in [1, 2, 3, 4, 10, 11, 12, 13, 99]], "n long")
        out = {r["node"]: r["component"] for r in connected_components(edges, nodes=nodes).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}

    def test_bridge_merges_components(self, spark):
        edges = spark.createDataFrame([(1, 2), (3, 4), (2, 3)], "src long, dst long")
        out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert set(out.values()) == {1}

    def test_direction_irrelevant(self, spark):
        a = connected_components(spark.createDataFrame([(5, 1)], "src long, dst long"))
        assert {r["component"] for r in a.collect()} == {1}


class TestWeightedBernoulli:
    def test_inclusion_tracks_weight(self, spark):
        """Rows with 9x the weight must be sampled ~9x as often, and
        the realized size must track expected_k."""
        from azure_data_engineering_spark.operators.sampling import weighted_bernoulli
        import pyspark.sql.functions as F

        rows = [(i, 90 if i % 10 == 0 else 10) for i in range(20000)]
        df = spark.createDataFrame(rows, "id bigint, w bigint")
        k = 1000.0
        s = weighted_bernoulli(df, "id", "w", expected_k=k, salt="t")
        got = {r["heavy"]: r["n"] for r in
               s.groupBy((F.col("w") == 90).alias("heavy")).agg(F.count(F.lit(1)).alias("n")).collect()}
        n_heavy, n_light = got.get(True, 0), got.get(False, 0)
        total = n_heavy + n_light
        assert abs(total - k) < 0.15 * k
        # heavy rows: 2000 rows at p=k*90/360000=0.25 -> ~500;
        # light rows: 18000 at p~0.0278 -> ~500; ratio of RATES ~9
        rate_heavy = n_heavy / 2000
        rate_light = n_light / 18000
        assert 6 < rate_heavy / rate_light < 12

    def test_deterministic_under_repartition(self, spark):
        from azure_data_engineering_spark.operators.sampling import weighted_bernoulli

        rows = [(i, i % 7 + 1) for i in range(5000)]
        df = spark.createDataFrame(rows, "id bigint, w bigint")
        a = sorted(r["id"] for r in weighted_bernoulli(df, "id", "w", 300.0).collect())
        b = sorted(
            r["id"] for r in weighted_bernoulli(df.repartition(13), "id", "w", 300.0).collect()
        )
        assert a == b and len(a) > 0


class TestSplitByCluster:
    def test_near_dups_never_cross_the_boundary(self, spark):
        """Pairs (a,b) near-dup => same split, whatever the hash says
        about the individual ids; singletons split independently."""
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.operators.clustering import split_by_cluster

        docs = spark.createDataFrame(
            [(i, f"doc number {i}") for i in range(40)], ["doc_id", "text"]
        )
        # chain 0-1-2 one cluster; 10-11 another; rest singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
        )
        sp = split_by_cluster(docs, pairs, "doc_id", {"train": 0.5, "test": 0.5}, salt="t")
        rows = {r.doc_id: (r.cluster_id, r.split) for r in sp.collect()}
        assert len(rows) == 40  # every doc assigned exactly once
        assert rows[0] == rows[1] == rows[2]  # whole chain moves together
        assert rows[10] == rows[11]
        # no cluster spans splits
        spans = (
            sp.groupBy("cluster_id")
            .agg(F.count_distinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .count()
        )
        assert spans == 0
        # both splits non-trivially populated (50/50 over ~37 clusters)
        by_split = {r.split: r.n for r in sp.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(by_split) == {"train", "test"}


class TestContentDefinedChunking:
    def _chunks(self, spark, rows, mod=4):
        from azure_data_engineering_spark.operators.chunking import chunk_by_content

        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = chunk_by_content(df, "doc_id", "text", boundary_mod=mod).collect()
        by_doc: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
            by_doc.setdefault(r["doc_id"], []).append((r["chunk_tokens"], r["chunk_md5"]))
        return by_doc

    def test_insertion_leaves_later_chunks_identical(self, spark):
        base = " ".join(f"w{i}" for i in range(200))
        edited = "INSERTED " + base  # one token prepended
        got = self._chunks(spark, [(1, base), (2, edited)])
        # fixed-window chunking would shift every chunk; CDC must keep
        # the suffix chunk stream identical once past the edit
        tail1 = [md5 for _, md5 in got[1][1:]]
        tail2 = [md5 for _, md5 in got[2][-len(tail1):]]
        assert len(got[1]) > 3  # sanity: the doc actually chunked
        assert tail1 == tail2

    def test_reassembly_covers_every_token(self, spark):
        text = " ".join(f"t{i}" for i in range(57))
        got = self._chunks(spark, [(9, text)])
        assert sum(n for n, _ in got[9]) == 57

    def test_chunk_ids_contiguous_from_zero(self, spark):
        from azure_data_engineering_spark.operators.chunking import chunk_by_content

        df = spark.createDataFrame(
            [(3, " ".join(f"x{i}" for i in range(100)))], "doc_id int, text string"
        )
        ids = sorted(
            r["chunk_id"]
            for r in chunk_by_content(df, "doc_id", "text", boundary_mod=4).collect()
        )
        assert ids == list(range(len(ids)))
