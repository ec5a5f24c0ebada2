"""Incremental MinHash-LSH dedup index: near-dup candidates for a
DELTA against a standing corpus, without recomputing the corpus.

The in-memory path (dedup.minhash_lsh_pairs) re-shingles everything per
run — right for one-off screens, wrong for a corpus that grows daily:
at 100 TB the standing corpus' signatures are a sunk cost that should
be paid once. This module materializes the band table (the exact
analogue of retrieval.py's BM25 postings and vector_store's log):

- `<path>/bands`  — (doc_id, band_idx, band_hash, _version),
  partitioned by band_idx (a probe for one band prunes to its
  partition; band_hash min/max footers skip row groups).
- `<path>/docs`   — the version log (doc_id, _version, _deleted):
  latest version wins, tombstone deletes — vector_store.read's window,
  shared contract with the BM25 index.
- `<path>/params` — one row per write batch (n_hashes, shingle_n,
  n_bands, rows_per_band, hash_fn); probes and upserts re-read the
  FIRST build's params so every batch bands identically.

Writes are O(batch): upserts append new band rows at a higher version,
deletes append tombstones; superseded band rows stop matching through
the (doc_id, _version) resolution join without being touched.
Compaction is the maintenance job (rename-aside swap, reads identical
before/after — pytest-pinned).

Banding itself is dedup.band_rows — ONE implementation shared with the
in-memory path, so `lsh_index_pairs` after any build/upsert/delete
history equals `minhash_lsh_pairs` on the live corpus (pytest-pinned),
and the md5 hash_fn keeps the whole index DuckDB-reproducible (gated
dedup_lsh_index_docs replays banding over the final corpus in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import band_rows, minhash_signatures


def build_lsh_index(
    docs: DataFrame,
    path: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
    n_bands: int = 4,
    hash_fn: str = "md5",
    text_col: str = "text",
    id_col: str = "doc_id",
    _mode: str = "overwrite",
    _version: int = 0,
) -> None:
    """Materialize the band index for `docs`. One shingle→signature
    pass + one band explode — the same single wide pass the in-memory
    path pays, amortized over every future probe."""
    if n_hashes % n_bands != 0:
        raise ValueError("n_bands must divide n_hashes")
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        n_hashes=n_hashes, shingle_n=shingle_n, hash_fn=hash_fn,
    )
    bands = band_rows(sigs, n_bands, rows_per_band, hash_fn).withColumn(
        "_version", F.lit(int(_version)).cast("long")
    )
    bands.write.mode(_mode).partitionBy("band_idx").parquet(f"{path}/bands")
    docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(int(_version)).cast("long").alias("_version"),
        F.lit(False).alias("_deleted"),
    ).write.mode(_mode).parquet(f"{path}/docs")
    docs.sparkSession.createDataFrame(
        [(n_hashes, shingle_n, n_bands, rows_per_band, hash_fn)],
        "n_hashes int, shingle_n int, n_bands int, rows_per_band int, "
        "hash_fn string",
    ).write.mode(_mode).parquet(f"{path}/params")


def _params(spark: SparkSession, path: str):
    return spark.read.parquet(f"{path}/params").collect()[0]


def _resolved_docs(spark: SparkSession, path: str) -> DataFrame:
    """Latest (doc_id, _version) wins, tombstones dropped; ties resolve
    tombstone-wins (vector_store.read's window)."""
    from pyspark.sql import Window

    log = spark.read.parquet(f"{path}/docs")
    wv = Window.partitionBy("doc_id").orderBy(
        F.desc("_version"), F.desc("_deleted")
    )
    return (
        log.withColumn("_rn", F.row_number().over(wv))
        .where((F.col("_rn") == 1) & (~F.col("_deleted")))
        .select("doc_id", "_version")
    )


def _live_bands(spark: SparkSession, path: str) -> DataFrame:
    """Band rows of live doc versions only: superseded/tombstoned rows
    fail the resolution join without being rewritten. shuffle_hash:
    bands are corpus×n_bands rows, the live set corpus-scale — neither
    may land on the driver as a no-stats fallback broadcast."""
    bands = spark.read.parquet(f"{path}/bands")
    return bands.join(
        _resolved_docs(spark, path).hint("shuffle_hash"),
        ["doc_id", "_version"],
    ).select("doc_id", "band_idx", "band_hash")


def upsert_lsh_index(
    docs: DataFrame,
    path: str,
    version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Re-index CHANGED (or new) docs in O(batch): the batch's band
    rows and doc-log rows append stamped `version`; the docs' previous
    bands stop matching through the resolution join. Versions are
    caller-supplied and must be strictly higher than any prior version
    of the same doc (the BM25/vector_store contract)."""
    p = _params(docs.sparkSession, path)
    build_lsh_index(
        docs, path, n_hashes=p["n_hashes"], shingle_n=p["shingle_n"],
        n_bands=p["n_bands"], hash_fn=p["hash_fn"], text_col=text_col,
        id_col=id_col, _mode="append", _version=version,
    )


def delete_lsh_docs(
    spark: SparkSession, path: str, ids: list, version: int
) -> None:
    """Append tombstones: the docs stop pairing immediately, no band
    rows touched — O(batch). An empty id list is a no-op (schema
    inference can't see an empty local list)."""
    if not ids:
        return
    spark.createDataFrame([(i,) for i in ids], ["doc_id"]).select(
        F.col("doc_id"),
        F.lit(int(version)).cast("long").alias("_version"),
        F.lit(True).alias("_deleted"),
    ).write.mode("append").parquet(f"{path}/docs")


def lsh_index_pairs(spark: SparkSession, path: str) -> DataFrame:
    """Candidate near-dup pairs (a < b) over the index's LIVE corpus —
    identical to minhash_lsh_pairs on the current docs by construction
    (shared band_rows; pytest-pinned across upsert/delete histories).
    Self-join on (band_idx, band_hash), shuffle_hash both ways."""
    bands = _live_bands(spark, path).localCheckpoint(eager=False)
    left = bands.alias("l")
    right = bands.hint("shuffle_hash").alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def lsh_index_probe(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """THE incremental query: candidates of a new batch AGAINST the
    standing index only — O(delta) compute (the batch's shingle pass)
    plus a join onto the materialized band table; the corpus is never
    re-shingled. Returns (new_id, index_id); pairs WITHIN the batch are
    the caller's (screen the delta with minhash_lsh_pairs first —
    delta-sized, cheap). A doc probed under an id it already holds in
    the index never pairs with itself."""
    spark = new_docs.sparkSession
    p = _params(spark, path)
    sigs = minhash_signatures(
        new_docs, text_col=text_col, id_col=id_col,
        n_hashes=p["n_hashes"], shingle_n=p["shingle_n"],
        hash_fn=p["hash_fn"],
    )
    probe = band_rows(
        sigs, p["n_bands"], p["rows_per_band"], p["hash_fn"]
    ).alias("q")
    live = _live_bands(spark, path).hint("shuffle_hash").alias("i")
    return (
        probe.join(
            live,
            (F.col("q.band_idx") == F.col("i.band_idx"))
            & (F.col("q.band_hash") == F.col("i.band_hash"))
            & (F.col("q.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.col("q.doc_id").alias("new_id"),
            F.col("i.doc_id").alias("index_id"),
        )
        .distinct()
    )


def compact_lsh_index(spark: SparkSession, path: str) -> int:
    """Fold the version log into a resolved snapshot: superseded and
    tombstoned rows physically removed, everything restamped version 0.
    Rename-aside swap (a full copy exists on disk at every instant);
    reads identical before/after by construction. Returns the live doc
    count.

    Constraints (ADVICE r06): the swap is two os.rename calls, so (a)
    it assumes a LOCAL filesystem — unlike the Spark writes that build
    the index, it will not work against object stores; and (b) between
    the two renames the index path briefly does not exist, so run
    compaction in a maintenance window: single writer, no concurrent
    reader (e.g. pause the streaming foreachBatch probe). For a
    no-gap swap, point readers at a versioned directory via an
    indirection of your own (pointer file / symlink flip)."""
    import os
    import shutil

    p = _params(spark, path)
    live = _resolved_docs(spark, path)
    bands = spark.read.parquet(f"{path}/bands").join(
        live.hint("shuffle_hash"), ["doc_id", "_version"]
    )

    tmp = f"{path}__compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        bands.withColumn("_version", F.lit(0).cast("long"))
        .write.partitionBy("band_idx")
        .parquet(f"{tmp}/bands")
    )
    (
        live.select(
            "doc_id",
            F.lit(0).cast("long").alias("_version"),
            F.lit(False).alias("_deleted"),
        ).write.parquet(f"{tmp}/docs")
    )
    spark.createDataFrame(
        [tuple(p)], spark.read.parquet(f"{path}/params").schema
    ).write.parquet(f"{tmp}/params")
    n = spark.read.parquet(f"{tmp}/docs").count()

    old = f"{path}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n
