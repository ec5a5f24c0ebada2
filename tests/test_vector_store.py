"""Log-structured vector store: upsert / delete / read / compact
semantics (S6 tail — the reference rewrites its whole JSON store per
mutation, nanovector_db.py:36-47; VERDICT r01 "What's missing" #4)."""

from __future__ import annotations

from datacapsule_spark import vector_store as vs


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id string, kind string, entity_type string, name string, "
        "embedding array<float>"
    )


def test_upsert_read_latest_wins(spark, tmp_path):
    path = str(tmp_path / "store")
    vs.upsert(_batch(spark, [
        ("a", "entity", "file", "a", [1.0, 0.0]),
        ("b", "entity", "file", "b", [0.0, 1.0]),
    ]), path, version=1)
    vs.upsert(_batch(spark, [
        ("b", "entity", "file", "b-v2", [0.5, 0.5]),
        ("c", "entity", "file", "c", [1.0, 1.0]),
    ]), path, version=2)

    got = {r["id"]: r["name"] for r in vs.read(spark, path).collect()}
    assert got == {"a": "a", "b": "b-v2", "c": "c"}


def test_delete_tombstone_and_compact(spark, tmp_path):
    path = str(tmp_path / "store2")
    vs.upsert(_batch(spark, [
        ("a", "entity", "file", "a", [1.0, 0.0]),
        ("b", "entity", "file", "b", [0.0, 1.0]),
        ("c", "entity", "file", "c", [1.0, 1.0]),
    ]), path, version=1)
    vs.delete(spark, path, ["b"], version=2)

    ids = {r["id"] for r in vs.read(spark, path).collect()}
    assert ids == {"a", "c"}
    # the log still physically holds 4 rows (3 data + 1 tombstone)
    assert spark.read.parquet(path).count() == 4

    n = vs.compact(spark, path)
    assert n == 2
    assert spark.read.parquet(path).count() == 2  # log folded
    # resolved view identical after compaction; a revived id works
    assert {r["id"] for r in vs.read(spark, path).collect()} == {"a", "c"}
    vs.upsert(_batch(spark, [("b", "entity", "file", "b-back", [0.1, 0.9])]),
              path, version=3)
    got = {r["id"]: r["name"] for r in vs.read(spark, path).collect()}
    assert got["b"] == "b-back" and len(got) == 3


def test_same_version_tie_tombstone_wins(spark, tmp_path):
    """A delete and an upsert stamped with the SAME version resolve
    deterministically: the tombstone wins (conservative order), and
    compact() bakes the same outcome."""
    from datacapsule_spark import vector_store as vs

    path = str(tmp_path / "store_tie")
    df = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("y", [0.0, 1.0])], "id string, embedding array<double>"
    )
    vs.upsert(df, path, version=1)
    vs.delete(spark, path, ["x"], version=5)
    vs.upsert(
        spark.createDataFrame([("x", [9.0, 9.0])], "id string, embedding array<double>"),
        path,
        version=5,
    )
    for _ in range(3):  # stable across repeated reads
        ids = {r["id"] for r in vs.read(spark, path).collect()}
        assert ids == {"y"}
    vs.compact(spark, path)
    assert {r["id"] for r in vs.read(spark, path).collect()} == {"y"}
