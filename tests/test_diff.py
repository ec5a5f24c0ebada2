"""table_diff / skew_report — snapshot diff and hot-key screens."""

import pytest

from datacapsule_spark.operators.diff import skew_report, table_diff


class TestTableDiff:
    def test_add_remove_change(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
        )
        new = spark.createDataFrame(
            [(2, "b", 20), (3, "CHANGED", 30), (4, "d", 40)],
            "k long, s string, v long",
        )
        got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_null_vs_string_and_field_shift(self, spark):
        # (NULL,'a') vs ('a',NULL) and ('a b','c') vs ('a','b c') must differ
        old = spark.createDataFrame(
            [(1, None, "a"), (2, "a b", "c")], "k long, s string, t string"
        )
        new = spark.createDataFrame(
            [(1, "a", None), (2, "a", "b c")], "k long, s string, t string"
        )
        got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
        assert got == {1: "changed", 2: "changed"}

    def test_identical_snapshots_empty(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
        assert table_diff(df, df, ["k"]).count() == 0

    def test_requires_value_column(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            table_diff(df, df, ["k"])

    def test_plan_one_exchange_per_side_no_cartesian(self, spark):
        from datacapsule_spark.plans.audit import explain_report

        old = spark.createDataFrame([(1, "x" * 100)], "k long, payload string")
        new = spark.createDataFrame([(1, "y" * 100)], "k long, payload string")
        rep = explain_report(table_diff(old, new, ["k"]))
        assert rep.cartesian_products == 0 and rep.nested_loop_joins == 0
        # hash-to-hash compare: exactly the join's two key exchanges,
        # payload reduced to md5 below them
        assert rep.exchanges <= 2


class TestSkewReport:
    def test_flags_hot_key(self, spark):
        rows = [("hot", i) for i in range(50)] + [
            (k, 0) for k in ("a", "b", "c", "d", "e")
        ]
        df = spark.createDataFrame(rows, "key string, v long")
        got = skew_report(df, ["key"], threshold=10.0).collect()
        assert [r["key"] for r in got] == ["hot"]
        assert got[0]["n_rows"] == 50 and got[0]["median_count"] == 1
        assert got[0]["skew_ratio"] == 50.0

    def test_uniform_keys_clean(self, spark):
        rows = [(k, i) for k in "abcdef" for i in range(3)]
        df = spark.createDataFrame(rows, "key string, v long")
        assert skew_report(df, ["key"], threshold=2.0).count() == 0


class TestTableDiffSchema:
    def test_reordered_columns_diff_clean(self, spark):
        # identical data, columns merely reordered: zero churn
        old = spark.createDataFrame([(1, "a", 10)], "k long, s string, v long")
        new = spark.createDataFrame([(1, 10, "a")], "k long, v long, s string")
        assert table_diff(old, new, ["k"]).count() == 0

    def test_schema_mismatch_raises(self, spark):
        import pytest as _pt

        old = spark.createDataFrame([(1, "a")], "k long, s string")
        new = spark.createDataFrame([(1, 1)], "k long, other long")
        with _pt.raises(ValueError, match="schema mismatch"):
            table_diff(old, new, ["k"])


class TestTableDiffRandomized:
    def test_matches_bruteforce_on_random_snapshots(self, spark):
        """Seeded random churn: diff output equals the set-computed
        expectation for every key."""
        import random

        rng = random.Random(42)
        old_rows = {k: (rng.randint(0, 5), rng.choice("abc")) for k in range(200)}
        new_rows = {}
        for k, v in old_rows.items():
            r = rng.random()
            if r < 0.15:
                continue  # removed
            if r < 0.35:
                new_rows[k] = (v[0] + 10, v[1])  # changed
            else:
                new_rows[k] = v  # unchanged
        for k in range(200, 230):
            new_rows[k] = (rng.randint(0, 5), rng.choice("abc"))  # added

        expect = {}
        for k in old_rows.keys() | new_rows.keys():
            if k not in new_rows:
                expect[k] = "removed"
            elif k not in old_rows:
                expect[k] = "added"
            elif old_rows[k] != new_rows[k]:
                expect[k] = "changed"

        old = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in old_rows.items()], "k long, a long, b string"
        )
        new = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in new_rows.items()], "k long, a long, b string"
        )
        got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
        assert got == expect
