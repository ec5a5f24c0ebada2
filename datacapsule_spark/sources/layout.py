"""Sort-clustered parquet layout — data skipping as a write-time choice.

At 100 TB the cheapest scan is the one that never happens: parquet
keeps min/max statistics per file and per row group, and both Spark's
scan and any other reader (DuckDB, Trino) prune against them — but
only if the writer made the stats selective. A table written in
arrival order has every file spanning the whole key domain (min/max
useless); the same table repartitionByRange'd + sortWithinPartitions
on the filter column has pairwise-disjoint file ranges, so a point or
range predicate touches O(selectivity) of the files instead of all of
them.

write_clustered packages that: one range exchange (sampled split
points, so skew in the cluster key spreads instead of pinning a
reducer) + an in-partition sort that spills, never a global sort on
the driver path. Composes with hive partitionBy for the coarse
(low-cardinality) dimension — partition prune first, row-group skip
within.

clustering_report reads the written footers (pyarrow, metadata only —
no data pages) and quantifies the layout: per-file min/max and the
overlap count between file ranges. It is the test's oracle and the
ops screen for "did this table keep its clustering after the last
backfill".
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on cluster_cols: file k holds keys
    strictly below file k+1 (ties at sampled split points aside), and
    rows inside each file are sorted, so row-group stats are tight.

    num_files caps output file count (repartitionByRange argument);
    default lets Spark use spark.sql.shuffle.partitions. Pass the
    partition column(s) you'd filter by equality on into
    partition_cols (directory pruning) and the range/point column
    into cluster_cols (stat pruning)."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    if num_files is not None:
        out = df.repartitionByRange(num_files, *cluster_cols)
    else:
        out = df.repartitionByRange(*cluster_cols)
    out = out.sortWithinPartitions(*cluster_cols)
    w = out.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


@dataclass
class ClusteringReport:
    n_files: int
    ranges: list[tuple]  # (path, min, max) per file, sorted by min
    # adjacent file pairs (sorted by min) whose [min,max] ranges
    # intersect; 0 here iff ALL pairs are disjoint (any overlapping
    # pair implies an overlapping adjacent pair under min-order)
    n_overlaps: int

    @property
    def disjoint(self) -> bool:
        return self.n_overlaps == 0


def clustering_report(path: str, column: str) -> ClusteringReport:
    """Footer-only audit of a parquet dataset's clustering on `column`:
    collects per-file min/max from row-group statistics and counts
    intersecting file pairs. 0 overlaps == a range predicate touches
    the minimal file set. Driver-side by design — it reads O(files)
    footers, not data (at very large file counts, run it over a
    DataFrame of footer rows instead)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if column not in idx:
            raise ValueError(f"{column} not in {f}")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[column]).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((f, lo, hi))
    ranges.sort(key=lambda r: (r[1], r[2]))
    overlaps = 0
    for i in range(1, len(ranges)):
        # sorted by min: file i overlaps i-1 iff it starts before i-1 ends
        if ranges[i][1] < ranges[i - 1][2]:
            overlaps += 1
    return ClusteringReport(len(ranges), ranges, overlaps)


def compact_dataset(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite the dataset at `path` into
    ceil(total_bytes / target_file_bytes) files. Returns the new file
    count.

    Small files are the classic large-table failure mode — every one
    costs a task, a footer read, and an open per scan; a 100 TB table
    ingested in tiny increments degrades O(files), not O(bytes).
    Sizing reads ONLY file lengths (a listing, no data). With
    cluster_cols the rewrite goes through repartitionByRange + sort,
    so compaction REPAIRS clustering (post-ingest drift) rather than
    destroying it; without, a plain repartition balances bytes. A
    hive-partitioned dataset (dir=value directories) is rewritten WITH
    its partitioning preserved — rows hash to tasks by partition key so
    each directory compacts to whole files; combining that with
    cluster_cols is refused (range-clustering within hive partitions
    needs a per-partition rewrite — use write_clustered per partition).

    The swap is write-aside + rename-old-aside + promote-tmp (same
    FileSystem): a complete copy of the dataset exists under some name
    at every instant, so a crash never loses data and the primary path
    is absent only between two metadata renames (not for the duration
    of a delete); on object stores use a table-format commit (Iceberg
    rewrite_data_files) instead."""
    import math
    import re

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    # hive-partition detection: top-level name=value dirs (nested keys
    # follow by induction on the first chain)
    part_cols: list[str] = []
    probe = p
    while True:
        sub = [
            s.getPath().getName()
            for s in fs.listStatus(probe)
            if s.isDirectory() and "=" in s.getPath().getName()
        ]
        m = re.match(r"([^=]+)=", sub[0]) if sub else None
        if not m:
            break
        part_cols.append(m.group(1))
        probe = jvm.org.apache.hadoop.fs.Path(probe, sub[0])
    if part_cols and cluster_cols:
        raise ValueError(
            f"dataset at {path} is hive-partitioned by {part_cols}; "
            "cluster_cols compaction would need a per-partition range "
            "rewrite — compact without cluster_cols, or rewrite each "
            "partition with write_clustered"
        )
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_cols:
        out = df.repartitionByRange(n_out, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    elif part_cols:
        # hash by partition key: each task holds whole partitions, so
        # each directory gets ~1 file; partition layout (and pruning)
        # survives the rewrite
        out = df.repartition(n_out, *part_cols)
    else:
        out = df.repartition(n_out)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".compact-tmp")
    old = jvm.org.apache.hadoop.fs.Path(path + ".compact-old")
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(str(tmp))
    # Hadoop FileSystem.rename/delete signal failure by returning false,
    # not raising — an unchecked false here would nest the compacted
    # copy inside the live dataset (duplicate rows on next read) or
    # silently no-op while we report success. Check every step.
    if fs.exists(old) and not fs.delete(old, True):
        raise IOError(f"compact swap: could not remove leftover {old}")
    if not fs.rename(p, old):
        raise IOError(f"compact swap: rename {p} -> {old} failed")
    if not fs.rename(tmp, p):
        # put the original back so the dataset stays readable — and if
        # the restore ALSO fails, say where the data lives instead of
        # reporting only the forward failure over a missing dataset
        if not fs.rename(old, p):
            raise IOError(
                f"compact swap: rename {tmp} -> {p} failed AND restoring "
                f"the original failed — dataset is missing at {p}; the "
                f"original data is intact at {old}, rename it back manually"
            )
        raise IOError(f"compact swap: rename {tmp} -> {p} failed")
    if not fs.delete(old, True):
        raise IOError(
            f"compact swap succeeded but could not remove backup {old}; "
            "remove it manually before the next compaction"
        )
    return n_out
