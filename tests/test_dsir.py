"""DSIR importance resampling (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.dsir import dsir_select


def _frame(spark):
    # target-looking docs share the 'alpha beta' vocabulary; raw noise
    # docs use disjoint tokens
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", 1))
    for i in range(20, 40):
        rows.append((i, f"noise{i} junk{i} filler{i} blob{i}", 0))
    # unlabeled docs that LOOK like the target must score high
    rows.append((100, "alpha beta alpha beta gamma", 0))
    rows.append((101, "noise7 junk9 filler3 blob5", 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, is_t int")


class TestDsir:
    def test_target_alike_scores_higher(self, spark):
        df = _frame(spark)
        got = {
            r["doc_id"]: r["dsir_score"]
            for r in dsir_select(df, F.col("is_t") == 1).collect()
        }
        # doc 100 (target vocabulary) must outscore doc 101 (noise)
        assert got[100] > 0 > got[101]
        # and every in-target doc outscores every noise doc
        assert min(got[i] for i in range(20)) > max(got[i] for i in range(20, 40))

    def test_selection_prefers_target_alike(self, spark):
        df = _frame(spark)
        sel = {
            r["doc_id"]: r["selected"]
            for r in dsir_select(df, F.col("is_t") == 1, rate=0.9).collect()
        }
        picked_target = sum(sel[i] for i in range(20))
        picked_noise = sum(sel[i] for i in range(20, 40))
        assert picked_target > picked_noise

    def test_repartition_invariant(self, spark):
        df = _frame(spark)
        a = sorted(map(tuple, dsir_select(df, F.col("is_t") == 1).collect()))
        b = sorted(
            map(tuple, dsir_select(df.repartition(13), F.col("is_t") == 1).collect())
        )
        assert [r[0] for r in a] == [r[0] for r in b]
        assert all(abs(x[1] - y[1]) < 1e-9 and x[2] == y[2] for x, y in zip(a, b))
