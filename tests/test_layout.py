"""write_clustered / clustering_report — sort-based layout for skipping."""

import pytest

from datacapsule_spark.sources.layout import clustering_report, write_clustered

SF = "/root/testdata/sf0.001"


class TestClusteredWrite:
    def test_range_clustered_files_disjoint(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = str(tmp_path / "clustered")
        write_clustered(ev, out, ["event_id"], num_files=8)
        rep = clustering_report(out, "event_id")
        assert rep.n_files == 8
        assert rep.disjoint, rep.ranges
        # files tile the key domain: global span equals union of spans
        assert rep.ranges[0][1] == 0

    def test_hash_layout_overlaps_as_contrast(self, spark, tmp_path):
        # the same data hash-repartitioned: every file spans ~the whole
        # domain, min/max stats are useless — the layout this operator fixes
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = str(tmp_path / "hashed")
        ev.repartition(8, "event_id").write.parquet(out)
        rep = clustering_report(out, "event_id")
        assert rep.n_files == 8 and rep.n_overlaps > 0

    def test_composes_with_hive_partitioning(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = str(tmp_path / "part")
        write_clustered(ev, out, ["ts"], partition_cols=["event_type"], num_files=4)
        rep = clustering_report(out, "ts")
        assert rep.n_files >= 4
        # clustering holds within each hive partition directory
        types = {r[0].split("event_type=")[1].split("/")[0] for r in rep.ranges}
        assert len(types) > 1
        for t in types:
            sub = clustering_report(f"{out}/event_type={t}", "ts")
            assert sub.disjoint

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = str(tmp_path / "rt")
        write_clustered(ev, out, ["event_id"], num_files=4)
        back = spark.read.parquet(out)
        assert back.count() == ev.count()
        assert set(back.columns) == set(ev.columns)

    def test_requires_cluster_cols(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        with pytest.raises(ValueError):
            write_clustered(ev, str(tmp_path / "x"), [])


class TestCompaction:
    def _pq_files(self, path):
        import glob
        return glob.glob(f"{path}/**/*.parquet", recursive=True)

    def test_compacts_to_one_file(self, spark, tmp_path):
        from datacapsule_spark.sources.layout import compact_dataset
        import os

        path = str(tmp_path / "many")
        ev = spark.read.parquet(f"{SF}/events.parquet")
        ev.repartition(32).write.parquet(path)
        assert len(self._pq_files(path)) == 32
        n_rows = ev.count()
        n = compact_dataset(spark, path, target_file_bytes=1 << 40)
        assert n == 1 and len(self._pq_files(path)) == 1
        back = spark.read.parquet(path)
        assert back.count() == n_rows
        assert not os.path.exists(path + ".compact-tmp")

    def test_compaction_preserves_hive_partitioning(self, spark, tmp_path):
        from datacapsule_spark.sources.layout import compact_dataset
        import os

        import pytest
        from pyspark.sql import functions as F

        path = str(tmp_path / "parts")
        ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
            "etype", F.col("event_type")
        )
        ev.repartition(8).write.partitionBy("etype").parquet(path)
        n_rows, n_types = ev.count(), ev.select("etype").distinct().count()
        assert len(self._pq_files(path)) > n_types
        compact_dataset(spark, path, target_file_bytes=1 << 40)
        # directory layout survives: still etype=... dirs, pruning intact
        dirs = [d for d in os.listdir(path) if d.startswith("etype=")]
        assert len(dirs) == n_types
        back = spark.read.parquet(path)
        assert back.count() == n_rows
        assert "etype" in back.columns
        one = back.where(F.col("etype") == dirs[0].split("=", 1)[1])
        # partition filter scans only that directory's file(s)
        assert one.count() > 0
        assert not os.path.exists(path + ".compact-old")
        with pytest.raises(ValueError, match="hive-partitioned"):
            compact_dataset(spark, path, cluster_cols=["event_id"])

    def test_compaction_repairs_clustering(self, spark, tmp_path):
        from datacapsule_spark.sources.layout import compact_dataset
        import os

        path = str(tmp_path / "drifted")
        ev = spark.read.parquet(f"{SF}/events.parquet")
        ev.repartition(16, "event_id").write.parquet(path)
        assert clustering_report(path, "event_id").n_overlaps > 0
        total = sum(os.path.getsize(f) for f in self._pq_files(path))
        n = compact_dataset(
            spark, path, target_file_bytes=total // 4, cluster_cols=["event_id"]
        )
        rep = clustering_report(path, "event_id")
        assert rep.n_files == n >= 2
        assert rep.disjoint
