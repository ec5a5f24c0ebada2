#!/usr/bin/env bash
# spark-submit entry for the KG construction DAG (north rule shape:
# `spark-submit --py-files` on a cluster; master defaults to local[*]
# in this sandbox, override with SPARK_MASTER / extra confs).
#
#   tools/submit.sh <input repos parquet/table> <output work dir> [extra args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input repos path}"; OUTPUT="${2:?output work dir}"; shift 2

ZIP="$(mktemp -d)/datacapsule_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" datacapsule_spark -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-32}" \
  "$REPO/tools/run_pipeline.py" --input "$INPUT" --output "$OUTPUT" "$@"
