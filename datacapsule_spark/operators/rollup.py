"""Incrementally-maintained time rollups (hypertable continuous
aggregates, TimescaleDB-style) over the events table.

The rollup stores MERGEABLE partials (n, sum_value) — never avg — so a
delta batch folds in with one union+re-aggregate of only the affected
hours. Refresh writes through Spark's DYNAMIC partition overwrite:
only the hour partitions present in the merged frame are replaced; the
rest of the rollup is untouched on disk (asserted by file mtimes in
tests). At 100 TB the rollup read is partition-pruned to the delta's
hours, so refresh cost scales with the delta, not rollup history.
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


def with_avg(rollup: DataFrame) -> DataFrame:
    """The serving view: avg derives from the partials at read time."""
    return rollup.withColumn(
        "avg_value", F.round(F.col("sum_value") / F.col("n"), 6)
    )


def refresh_hourly_rollup(
    spark: SparkSession, rollup_dir: str, events_delta: DataFrame
) -> list[str]:
    """Fold a delta batch into the on-disk rollup; returns the list of
    affected hour partitions.

    Plan: aggregate the delta (small), collect its affected hours (a
    bounded driver list — hours, not rows), read ONLY those partitions
    back from the rollup (partition-pruned scan), merge partials by
    (hour, event_type), and rewrite just those partitions via dynamic
    partition overwrite. Idempotence note: re-running the SAME delta
    double-counts — feed each batch once (pair with
    streaming_exact_dedup / StageTracker markers upstream for
    exactly-once feeds)."""
    delta = hourly_rollup(events_delta).localCheckpoint(eager=True)
    hours = [r["hour"] for r in delta.select("hour").distinct().collect()]
    if not hours:
        return []
    import os

    merged = delta
    if os.path.isdir(rollup_dir) and any(
        e.startswith("hour=") for e in os.listdir(rollup_dir)
    ):
        existing = spark.read.parquet(rollup_dir).where(F.col("hour").isin(hours))
        merged = delta.unionByName(existing.select(*delta.columns))
    merged = merged.groupBy("hour", "event_type").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("sum_value"), 6).alias("sum_value"),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("hour").parquet(rollup_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(hours)
