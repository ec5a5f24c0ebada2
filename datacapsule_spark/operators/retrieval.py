"""Inverted-index BM25: build-once postings, partition-pruned queries.

`text.bm25_topk` scans the corpus per query — right for one-off
curation screens, wrong for a query workload. This module materializes
the classic IR layout instead: postings (tok, doc_id, tf) written
partitioned by a deterministic token bucket, per-doc lengths, and the
corpus constants — so a query reads ONLY its terms' bucket partitions
(PartitionFilters, plan-tested), never the corpus. The exact analogue
of the IVF layout for the lexical path.

The bucket function is md5-prefix mod n_buckets, computed identically
JVM-side (build) and in Python (query-side pruning) — the same
cross-engine-determinism trick the sampling operators use.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import _tokens


def _bucket_col(tok_col: str, n_buckets: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col(tok_col)), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def _bucket_py(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def build_bm25_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize `<path>/postings` (bucket=<b>/ partitioned:
    tok, doc_id, tf), `<path>/doclens` (doc_id, dl), and
    `<path>/stats` (n_docs, avgdl, n_buckets).

    One explode + one (tok, doc_id) aggregation — the single wide pass
    any inverted-index build pays; per-term df is NOT stored because
    a query recomputes it from its own postings slice for free (one
    partial agg over the rows it already reads), keeping the index
    append-friendly."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(_tokens(text_col), lambda t: t != "")).alias("tok"),
    )
    postings = (
        toks.groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", _bucket_col("tok", n_buckets))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    doclens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(_tokens(text_col), lambda t: t != ""))
        .cast("double")
        .alias("dl"),
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    doclens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{path}/stats"
    )


def bm25_index_topk(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Query the materialized index: identical scores to
    text.bm25_topk over the indexed corpus (equivalence-pinned in
    pytest), but the postings scan touches only the query terms'
    bucket partitions + an isin row filter — corpus-size-independent
    I/O for a bounded vocabulary slice."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    n, avgdl, n_buckets = stats["n_docs"], float(stats["avgdl"] or 1.0), stats["n_buckets"]
    buckets = sorted({_bucket_py(t, n_buckets) for t in query_terms})
    # read twice (df agg + scoring) WITHOUT a checkpoint: both reads
    # are bucket-pruned postings-slice scans — re-reading the slice is
    # cheaper than materializing it, and keeps the PartitionFilters
    # visible in the scoring plan (plan-tested)
    post = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(buckets))  # partition pruning
        .where(F.col("tok").isin(list(query_terms)))
    )
    # per-term df from the slice just read (bounded: Q terms)
    dfs = {
        r["tok"]: r["df"]
        for r in post.groupBy("tok").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    idf = {t: math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5)) for t in query_terms}
    idf_map = F.create_map(
        *[x for t in query_terms for x in (F.lit(t), F.lit(idf[t]))]
    )
    doclens = spark.read.parquet(f"{path}/doclens")
    scored = (
        post.join(doclens, "doc_id")
        .withColumn(
            "_s",
            idf_map[F.col("tok")]
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("bm25"))
        .where(F.col("bm25") > 0)
    )
    return (
        scored.select("doc_id", F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
