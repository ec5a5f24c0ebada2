"""Multimodal column plumbing: binary payloads + typed metadata.

Images / audio / video ride as opaque `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages. The decode kernels are STUBBED
(this container has no image/audio libs — clearly marked below); the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape
— is real and tested (tests/test_operators.py).

At scale: binary payloads are the bandwidth cost; the plan keeps them
out of every shuffle (metadata-only projections until the final
mapInPandas) and partitions by content-size bucket so one 4K video
doesn't skew a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes) -> "object":
    """STUB: real implementation would use PIL/opencv (absent in this
    container). The pipeline contract is: bytes → decoded frame."""
    raise NotImplementedError("image decode requires PIL/opencv — not in container")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: sha256
    bytes → dim floats in [-0.5, 0.5). Keeps the distributed plumbing
    (batching, schema, partitioning) fully testable without media libs."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 - 0.5 for i in range(dim)]


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media (MEDIA schema) → MEDIA_FEATURES via Arrow-batched
    mapInPandas. Uses the deterministic fake extractor; swap
    `_fake_features` for a real decode+model kernel on a cluster with
    media libs installed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": [_fake_features(bytes(p), dim) for p in pdf["payload"]],
                }
            )

    # size-bucketed repartition: payload bytes skew → spread big blobs
    sized = media.withColumn(
        "_bkt", F.pmod(F.xxhash64("media_id"), F.lit(64))
    ).repartition(F.col("_bkt")).drop("_bkt")
    return sized.mapInPandas(gen, schema=MEDIA_FEATURES)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode target timestamps
    metadata-only (payload untouched until the decode stage) — the
    shuffle moves (media_id, ts) pairs, never bytes."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ts_ms"),
        )
    )
