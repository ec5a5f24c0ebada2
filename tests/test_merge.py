"""merge_plan / merge_into_partitioned — partition-pruned upsert."""

import os

from pyspark.sql import functions as F

from datacapsule_spark.operators.merge import merge_into_partitioned, merge_plan


def _files(path):
    out = {}
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


class TestMergePlan:
    def test_upsert_semantics(self, spark):
        target = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        source = spark.createDataFrame(
            [(2, "B"), (4, "d")], "k long, v string"
        )
        got = {r["k"]: r["v"] for r in merge_plan(target, source, ["k"]).collect()}
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


class TestMergeIntoPartitioned:
    def _seed(self, spark, path):
        df = spark.createDataFrame(
            [
                (1, "x", "a"), (2, "x", "a"),
                (3, "x", "b"),
                (4, "x", "c"),
                (5, "x", "d"),
            ],
            "k long, v string, p string",
        )
        df.write.partitionBy("p").parquet(path)

    def test_rewrites_only_affected_partitions(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        before_d = {
            f: s for f, s in _files(path).items() if "/p=d/" in f
        }
        delta = spark.createDataFrame(
            [
                (3, "upd", "b"),     # in-place update
                (6, "new", "a"),     # insert
                (4, "moved", "a"),   # update that MOVES c -> a
            ],
            "k long, v string, p string",
        )
        touched = merge_into_partitioned(spark, path, delta, ["k"], "p")
        assert touched == ["a", "b", "c"]

        back = {r["k"]: (r["v"], r["p"]) for r in spark.read.parquet(path).collect()}
        assert back == {
            1: ("x", "a"), 2: ("x", "a"), 3: ("upd", "b"),
            4: ("moved", "a"), 5: ("x", "d"), 6: ("new", "a"),
        }
        # untouched partition d: identical files (size + mtime)
        after_d = {f: s for f, s in _files(path).items() if "/p=d/" in f}
        assert after_d == before_d
        # partition c emptied by the move: directory removed, no stale row
        assert not os.path.exists(os.path.join(path, "p=c"))

    def test_idempotent_replay(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        delta = spark.createDataFrame([(3, "upd", "b")], "k long, v string, p string")
        merge_into_partitioned(spark, path, delta, ["k"], "p")
        merge_into_partitioned(spark, path, delta, ["k"], "p")
        got = spark.read.parquet(path)
        assert got.count() == 5
        assert got.where(F.col("k") == 3).collect()[0]["v"] == "upd"

    def test_emptied_partition_with_escaped_value(self, spark, tmp_path):
        # Spark escapes ' ' and ':' in partition directory names
        # (p=x%3Ay); the emptied-directory delete must build the path
        # with the same escaping or the stale files survive and
        # duplicate rows on the next read.
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "x", "x:y 1"), (2, "x", "keep")], "k long, v string, p string"
        )
        df.write.partitionBy("p").parquet(path)
        delta = spark.createDataFrame(
            [(1, "moved", "keep")], "k long, v string, p string"
        )
        merge_into_partitioned(spark, path, delta, ["k"], "p")
        back = {r["k"]: (r["v"], r["p"]) for r in spark.read.parquet(path).collect()}
        assert back == {1: ("moved", "keep"), 2: ("x", "keep")}
        assert not any("x%3Ay" in d for d in os.listdir(path))

    def test_empty_delta_touches_nothing(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        before = _files(path)
        delta = spark.createDataFrame([], "k long, v string, p string")
        assert merge_into_partitioned(spark, path, delta, ["k"], "p") == []
        assert _files(path) == before


class TestLatestByKey:
    def test_latest_version_wins(self, spark):
        from datacapsule_spark.operators.merge import latest_by_key

        df = spark.createDataFrame(
            [(1, 1, "old"), (1, 3, "new"), (1, 2, "mid"), (2, 1, "only")],
            "k long, ver long, v string",
        )
        got = {r["k"]: (r["ver"], r["v"])
               for r in latest_by_key(df, ["k"], ["ver"]).collect()}
        assert got == {1: (3, "new"), 2: (1, "only")}

    def test_tiebreak_on_second_order_col(self, spark):
        from datacapsule_spark.operators.merge import latest_by_key

        df = spark.createDataFrame(
            [(1, 5, 10, "a"), (1, 5, 20, "b")], "k long, ver long, seq long, v string"
        )
        got = latest_by_key(df, ["k"], ["ver", "seq"]).collect()
        assert len(got) == 1 and got[0]["v"] == "b"
