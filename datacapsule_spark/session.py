"""SparkSession factory with scale-oriented defaults.

Single place where engine-level Spark tuning lives so tests, bench and
spark-submit entry all agree:

- AQE on (runtime re-plan, skew-join splitting) — at 100 TB the static
  plan is always wrong somewhere.
- Arrow on for all pandas UDF / mapInPandas exchange (the extraction hot
  path is Arrow-batched, never row-at-a-time).
- shuffle partitions sized for local[32] testing; on a real cluster this
  is overridden via spark-submit --conf (AQE coalesces anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "datacapsule-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # snappy over zstd: this workload is CPU-bound, not disk-bound
        # (A/B at 16 cores: snappy 44.5s/432MB vs zstd 49.0s/244MB for
        # the same extract+write) — buy CPU back, spend disk
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # ad-hoc conf overrides for A/B measurement without code edits:
    # SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd,k=v"
    # (subprocess-based harnesses like bench/scaling.py inherit it).
    # Comma-separated k=v pairs — values must not contain commas.
    # Loudly announced: a leftover export from an A/B run would
    # otherwise silently alter correctness-gate / test sessions.
    extra_env = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    if extra_env:
        import sys

        print(
            f"[datacapsule-spark] WARNING: SPARK_GRAFT_EXTRA_CONF active: "
            f"{extra_env!r} — session configs overridden",
            file=sys.stderr,
        )
    for pair in filter(None, extra_env.split(",")):
        k, _, v = pair.partition("=")
        b = b.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
