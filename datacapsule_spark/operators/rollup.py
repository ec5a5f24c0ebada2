"""Incrementally-maintained time rollups (hypertable continuous
aggregates, TimescaleDB-style) over the events table.

The rollup stores MERGEABLE partials (n, sum_value) — never avg — one
row per (hour, event_type, batch): a delta batch folds in by rewriting
only its affected hour partitions, and because each batch's rows are
keyed by its batch id, REPLAYING a batch replaces its own prior rows
instead of double-counting — refresh is idempotent per batch id, which
is exactly what an at-least-once feed (Structured Streaming
foreachBatch) needs for effectively-once results. Reads aggregate the
partials (read_rollup / with_avg); at 100 TB the refresh reads are
partition-pruned to the delta's hours, so cost scales with the delta,
not rollup history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type, n, sum_value) — the mergeable-partial shape.
    hour is a STRING partition key (yyyy-MM-dd-HH) so the rollup
    directory layout is stable and prunable."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd-HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Aggregate the per-batch partials to (hour, event_type, n,
    sum_value) — the serving shape."""
    return (
        spark.read.parquet(rollup_dir)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value"), 6).alias("sum_value"),
        )
    )


def with_avg(rollup: DataFrame) -> DataFrame:
    """The serving view: avg derives from the partials at read time."""
    return rollup.withColumn(
        "avg_value", F.round(F.col("sum_value") / F.col("n"), 6)
    )


def refresh_hourly_rollup(
    spark: SparkSession,
    rollup_dir: str,
    events_delta: DataFrame,
    batch_id: str | int | None = None,
    max_hours: int = 5000,
) -> list[str]:
    """Fold a delta batch into the on-disk rollup; returns the list of
    affected hour partitions.

    Plan: aggregate the delta (small), collect its affected hours (a
    bounded driver list — hours, not rows), read ONLY those partitions
    back (partition-pruned scan), drop any rows previously written by
    THIS batch id, and rewrite just those partitions through dynamic
    partition overwrite with the delta's rows appended. Re-running the
    same batch id therefore replaces rather than double-counts —
    idempotent under at-least-once delivery, including a CORRECTED
    replay whose content covers different hours (the batch's previously
    written hours are unioned into the affected set, so stale rows in
    hours the new content no longer touches are purged too). batch_id=
    None derives a deterministic id from the delta's aggregated content,
    so an accidental ad-hoc replay of the identical delta is a no-op.

    The affected-hours driver list is hours, not rows, but a year-long
    backfill delta would still make it (and the rewrite) unbounded —
    refuse above max_hours and point at the full-rebuild path instead."""
    delta = hourly_rollup(events_delta).localCheckpoint(eager=True)
    hours = [r["hour"] for r in delta.select("hour").distinct().collect()]
    if not hours:
        return []
    if batch_id is None:
        chk = delta.select(
            F.bit_xor(F.xxhash64("hour", "event_type", "n", "sum_value")).alias("h")
        ).collect()[0]["h"]
        batch_id = f"adhoc-{chk & 0xFFFFFFFFFFFF:012x}"
    batch_id = str(batch_id)
    delta = delta.withColumn("_batch", F.lit(batch_id))

    import os

    merged = delta
    if os.path.isdir(rollup_dir) and any(
        e.startswith("hour=") for e in os.listdir(rollup_dir)
    ):
        store = spark.read.parquet(rollup_dir)
        # a corrected replay may cover FEWER hours than its first
        # submission; union in the hours this batch wrote before so its
        # old rows there are purged rather than left to double-count
        prior = store.where(F.col("_batch") == batch_id).select("hour").distinct()
        hours = sorted({*hours, *(r["hour"] for r in prior.collect())})
        existing = (
            store
            .where(F.col("hour").isin(hours))
            .where(F.col("_batch") != batch_id)  # replay replaces itself
        )
        merged = delta.unionByName(existing.select(*delta.columns))
    if len(hours) > max_hours:
        raise ValueError(
            f"delta touches {len(hours)} hour partitions (> max_hours="
            f"{max_hours}); this is a backfill, not an increment — rebuild "
            f"with hourly_rollup(events).write.partitionBy('hour') instead, "
            f"or raise max_hours explicitly"
        )
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("hour").parquet(rollup_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only rewrites partitions with rows in `merged`;
    # an hour this batch vacated entirely (corrected replay, no other
    # batch there) must be deleted explicitly or its stale files survive.
    # hour values are date_format 'yyyy-MM-dd-HH' — no chars Spark escapes.
    kept = {r["hour"] for r in merged.select("hour").distinct().collect()}
    import shutil

    for h in set(hours) - kept:
        d = os.path.join(rollup_dir, f"hour={h}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return sorted(hours)


def hourly_distinct_users(events: DataFrame) -> DataFrame:
    """(hour, event_type, users_hll) — distinct-user partials as
    Datasketches HLL (binary, MERGEABLE — the property plain
    count(DISTINCT) partials lack: two hours' or two batches' sketches
    union without re-reading rows). The continuous-aggregate shape for
    the one metric exact rollups can't maintain incrementally."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd-HH").alias("hour"),
            "event_type",
        )
        .agg(F.hll_sketch_agg("user_id").alias("users_hll"))
    )


def read_distinct_users(partials: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Serving read over sketch partials: union the sketches at any
    grouping coarser than they were built at, estimate once. Rolling
    hour partials up to (event_type,) or () never rescans events."""
    by = ["hour", "event_type"] if by is None else by
    agg = F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("n_users")
    if by:
        return partials.groupBy(*by).agg(agg)
    return partials.agg(agg)
