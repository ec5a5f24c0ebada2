"""Incremental vector store: log-structured upsert over parquet (S6 tail).

The reference rewrites its entire JSON store on every mutation
(nanovector_db.py:36-47 — load-all, mutate in RAM, dump-all), which is
O(store) per upsert and driver-RAM-bound. The distributed re-expression
is a write-ahead layout:

- `upsert`   appends the new batch with a caller-supplied version —
             no read, no rewrite, O(batch) I/O only;
- `read`     resolves latest-per-id with one window (and drops
             tombstones), so readers always see upsert-then-delete
             semantics without any compaction having run;
- `delete`   appends tombstone rows (same O(batch) cost);
- `compact`  folds the log back to one resolved snapshot — the
             maintenance job, not the write path.

On Iceberg this maps 1:1 to MERGE INTO + snapshot expiry; the parquet
layout keeps identical semantics in catalog-less environments. Versions
are caller-supplied (batch ids, epoch millis) — the store itself never
invents time, so replays and backfills stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_META = ("_version", "_deleted")


def upsert(df: DataFrame, path: str, version: int) -> None:
    """Append a batch of embedding rows as version `version`. Rows with
    ids already in the store supersede them at read time (latest
    version wins); nothing is read or rewritten here."""
    (
        df.withColumn("_version", F.lit(int(version)).cast("long"))
        .withColumn("_deleted", F.lit(False))
        .write.mode("append")
        .parquet(path)
    )


def delete(spark: SparkSession, path: str, ids: list[str], version: int) -> None:
    """Append tombstones for `ids` at `version` — visible immediately
    via read(), physically removed by the next compact()."""
    base = spark.read.parquet(path)
    tomb = spark.createDataFrame([(i,) for i in ids], "id string")
    # carry the store schema so the appended file unions cleanly
    cols = [c for c in base.columns if c not in ("id", *_META)]
    row = tomb.select(
        "id",
        *[F.lit(None).cast(base.schema[c].dataType).alias(c) for c in cols],
        F.lit(int(version)).cast("long").alias("_version"),
        F.lit(True).alias("_deleted"),
    )
    row.write.mode("append").parquet(path)


def read(spark: SparkSession, path: str) -> DataFrame:
    """Resolved view: latest version per id, tombstones dropped. One
    shuffle on id; at scale the window prunes to the partitions a
    query touches when the store is written bucketed by id.

    Same-version ties resolve DETERMINISTICALLY: the tombstone wins
    (a delete and an upsert stamped with the same version read as
    deleted — the conservative order), never an arbitrary shuffle-
    dependent pick."""
    df = spark.read.parquet(path)
    w = Window.partitionBy("id").orderBy(
        F.desc("_version"), F.desc("_deleted")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (~F.col("_deleted")))
        .drop("_rn", *_META)
    )


def compact(spark: SparkSession, path: str) -> int:
    """Fold the append log into a single resolved snapshot (version 0).
    Returns the resolved row count. Snapshot-swap is a driver-side
    rename here; on object stores this is the Iceberg rewrite-data-files
    action with the same semantics."""
    import os
    import shutil

    resolved = read(spark, path)
    tmp = f"{path}__compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        resolved.withColumn("_version", F.lit(0).cast("long"))
        .withColumn("_deleted", F.lit(False))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    n = spark.read.parquet(tmp).count()
    # swap via rename-aside: a full copy of the store exists on disk at
    # every instant (path, path__old, or tmp) — a crash anywhere in the
    # sequence never loses the live data, unlike rmtree-then-rename
    old = f"{path}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n
