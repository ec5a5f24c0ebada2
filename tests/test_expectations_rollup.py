"""check_expectations + HLL distinct-user rollup (mergeable sketches)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestExpectations:
    def test_single_pass_counts(self, spark):
        from datacapsule_spark.operators.expectations import check_expectations

        df = spark.createDataFrame(
            [(1, 10.0, "O"), (2, -5.0, "F"), (3, 7.0, None), (4, None, "O")],
            "k long, price double, status string",
        )
        out = {
            r["rule"]: (r["n_violations"], r["n_rows"], r["passed"])
            for r in check_expectations(
                df,
                [
                    ("key_not_null", F.col("k").isNotNull()),
                    ("price_positive", F.col("price") > 0),
                    ("status_in_domain", F.col("status").isin("O", "F")),
                ],
            ).collect()
        }
        assert out["key_not_null"] == (0, 4, True)
        # -5 violates; NULL price is a violation under strict semantics
        assert out["price_positive"] == (2, 4, False)
        assert out["status_in_domain"] == (1, 4, False)

    def test_validation(self, spark):
        from datacapsule_spark.operators.expectations import check_expectations

        df = spark.range(1)
        with pytest.raises(ValueError):
            check_expectations(df, [])
        with pytest.raises(ValueError):
            check_expectations(
                df, [("a", F.lit(True)), ("a", F.lit(False))]
            )


class TestDistinctRollup:
    def test_union_of_partials_equals_whole(self, spark):
        from datacapsule_spark.operators.rollup import (
            hourly_distinct_users, read_distinct_users,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        # two "batches" built independently, unioned as sketch partials
        b1 = hourly_distinct_users(ev.where(F.col("event_id") % 2 == 0))
        b2 = hourly_distinct_users(ev.where(F.col("event_id") % 2 == 1))
        merged = {
            (r["hour"], r["event_type"]): r["n_users"]
            for r in read_distinct_users(b1.unionByName(b2)).collect()
        }
        whole = {
            (r["hour"], r["event_type"]): r["n_users"]
            for r in read_distinct_users(hourly_distinct_users(ev)).collect()
        }
        assert merged == whole  # sketches merge losslessly

    def test_estimate_matches_exact_at_test_scale(self, spark):
        from datacapsule_spark.operators.rollup import (
            hourly_distinct_users, read_distinct_users,
        )

        ev = spark.read.parquet(f"{SF}/events.parquet")
        est = {
            r["event_type"]: r["n_users"]
            for r in read_distinct_users(
                hourly_distinct_users(ev), by=["event_type"]
            ).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for k, v in exact.items():
            assert abs(est[k] - v) <= max(1, 0.03 * v)  # HLL tolerance
