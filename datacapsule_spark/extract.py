"""Distributed triple extraction: Arrow-batched mapInPandas over repos.

Spark-first re-expression of the reference's sequential per-record loop
(tools/entity_extraction.py:59-271): the whole corpus is a DataFrame,
extraction is a 1→N row expansion (`mapInPandas`, Arrow transfer, no
per-row Python UDFs per the north rule), and hot-repo skew is handled by
salted repartitioning BEFORE the expansion so one monorepo can't pin a
single task.

Scale notes (100 TB design):
- `mapInPandas` keeps the Python worker cost amortized over Arrow
  batches (`spark.sql.execution.arrow.maxRecordsPerBatch`).
- salting key = (repo, lang, salt) where salt = pmod(xxhash64(path), S)
  for repos above the hot threshold — computed with one cheap
  pre-aggregation (groupBy(repo).count()), broadcast back.
- the extractor is pure CPU per row; output size ~ O(lines). No state
  is shared across rows, so the stage scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extraction_schema import extract_file
from .schema import TRIPLES_RAW

_TRIPLE_COLS = [f.name for f in TRIPLES_RAW.fields]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {c: [] for c in _TRIPLE_COLS}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            for t in extract_file(repo, path, commit, lang, content):
                for c in _TRIPLE_COLS:
                    out[c].append(t[c])
        yield pd.DataFrame(out, columns=_TRIPLE_COLS)


def salted_repartition(
    repos: DataFrame,
    num_partitions: int | None = None,
    hot_threshold: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition by (repo, lang, salt), salting only hot repos.

    First pass computes per-repo file counts (tiny aggregate — one row
    per repo); repos above `hot_threshold` (default: 4× the mean) get a
    per-path salt so their files spread over `salt_buckets` partitions.
    This is the explicit skew handling the north rule requires for the
    extraction stage (AQE only fixes join/agg skew, not input skew into
    mapInPandas).
    """
    spark = repos.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    counts = repos.groupBy("repo").count()
    if hot_threshold is None:
        stats = counts.agg(
            F.avg("count").alias("avg"), F.count("*").alias("n")
        ).first()
        hot_threshold = max(int((stats["avg"] or 0) * 4), 100)
    hot = counts.where(F.col("count") >= hot_threshold).select(
        "repo", F.lit(True).alias("_hot")
    )
    salted = (
        repos.join(F.broadcast(hot), "repo", "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64("path"), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .repartition(num_partitions, "repo", "lang", "_salt")
        .drop("_hot", "_salt")
    )
    return salted


def extract_triples(repos: DataFrame, salt: bool = True) -> DataFrame:
    """repos(repo,path,commit,lang,content) → triples_raw DataFrame."""
    df = salted_repartition(repos) if salt else repos
    return df.mapInPandas(_extract_batches, schema=TRIPLES_RAW)
