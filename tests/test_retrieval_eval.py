"""retrieval_metrics: known-answer checks on hand-built rankings."""

from __future__ import annotations

from azure_data_engineering_spark.operators.retrieval_eval import retrieval_metrics


def _frame(spark, rows):
    return spark.createDataFrame(rows, "query_id long, neighbor_id long, rank int")


class TestRetrievalMetrics:
    def test_perfect_ann_scores_one(self, spark):
        truth = _frame(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)])
        m = {r.k: r for r in retrieval_metrics(truth, truth, ks=(1, 2)).collect()}
        assert m[1].recall == 1.0 and m[2].recall == 1.0
        assert m[1].mrr == 1.0
        assert m[1].n_true == 2 and m[2].n_true == 4

    def test_known_partial_overlap(self, spark):
        """q1: ANN finds the true NN at rank 2 (RR=0.5) and misses the
        true #2. q2: ANN top-1 is the true NN (RR=1). recall@1 = 1/2,
        recall@2 = 2/4, MRR = 0.75."""
        truth = _frame(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)])
        ann = _frame(spark, [(1, 99, 1), (1, 10, 2), (2, 20, 1), (2, 98, 2)])
        m = {r.k: r for r in retrieval_metrics(ann, truth, ks=(1, 2)).collect()}
        assert m[1].recall == 0.5
        assert m[2].recall == 0.5
        assert m[1].mrr == 0.75

    def test_true_nn_absent_counts_zero(self, spark):
        truth = _frame(spark, [(1, 10, 1), (2, 20, 1)])
        ann = _frame(spark, [(1, 55, 1), (2, 20, 1)])
        m = retrieval_metrics(ann, truth, ks=(1,)).first()
        assert m.mrr == 0.5  # (0 + 1) / 2
        assert m.recall == 0.5
