"""Expectation-suite unit tests: each violation counter on a frame
with seeded defects, and the one-scan plan discipline."""

from __future__ import annotations

from azure_data_engineering_spark.operators.expectations import Suite, check
from azure_data_engineering_spark.plans.inspect import formatted_plan


class TestExpectations:
    def _df(self, spark):
        rows = [
            (1, 10, 50.0, "O", "a@x.com"),
            (1, 11, 60.0, "F", "b@x.com"),      # dup pk
            (2, None, 70.0, "P", "c@x.com"),    # null fk
            (3, 12, -5.0, "O", "bad-email"),    # range + regex violations
            (4, 99, 80.0, "Z", None),           # bad status, orphan fk
        ]
        return spark.createDataFrame(
            rows, "pk bigint, fk bigint, amount double, status string, email string"
        )

    def test_each_counter(self, spark):
        df = self._df(spark)
        dim = spark.createDataFrame([(10,), (11,), (12,)], "id bigint")
        suite = (
            Suite()
            .unique("pk")
            .not_null("fk")
            .in_range("amount", 0, 100)
            .accepted_values("status", ["O", "F", "P"])
            .matches("email", r"^[^@]+@[^@]+$")
            .foreign_key(["fk"], dim, ["id"])
        )
        r = check(df, suite).collect()[0]
        assert r["pk_unique_violations"] == 1
        assert r["fk_not_null_violations"] == 1
        assert r["amount_in_range_violations"] == 1
        assert r["status_accepted_violations"] == 1
        assert r["email_matches_violations"] == 1
        # null fk row joins nowhere -> orphan; 99 -> orphan
        assert r["fk_fk_violations"] == 2
        assert r["passed"] is False

    def test_clean_table_passes(self, spark):
        df = spark.createDataFrame([(1, 10), (2, 11)], "pk bigint, fk bigint")
        dim = spark.createDataFrame([(10,), (11,)], "id bigint")
        suite = Suite().unique("pk").not_null("fk").foreign_key(["fk"], dim, ["id"])
        r = check(df, suite).collect()[0]
        assert r["passed"] is True

    def test_column_expectations_share_one_scan(self, spark, sf_dir):
        """Every column-level expectation folds into a single
        aggregate: without FKs the plan scans the table exactly once."""
        from azure_data_engineering_spark.catalog import load_table

        o = load_table(spark, sf_dir, "orders")
        suite = (
            Suite().unique("o_orderkey").not_null("o_custkey").in_range("o_totalprice", 0, 1e9)
        )
        plan = formatted_plan(check(o, suite))
        # formatted explain prints each node once in the tree and once
        # in the detail section — count detail headers "(n) Scan parquet"
        scans = [
            ln for ln in plan.splitlines() if ln.startswith("(") and "Scan parquet" in ln
        ]
        assert len(scans) == 1
