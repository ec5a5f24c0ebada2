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
    _mode: str = "overwrite",
) -> None:
    """Materialize `<path>/postings` (bucket=<b>/ partitioned:
    tok, doc_id, tf), `<path>/doclens` (doc_id, dl), and
    `<path>/stats` MERGEABLE partials (n_docs, sum_dl, n_buckets) —
    one partial row per build/append batch, summed at query time.

    One explode + one (tok, doc_id) aggregation — the single wide pass
    any inverted-index build pays. Nothing global is stored
    NON-mergeably: per-term df is recomputed by each query from its
    own postings slice (one partial agg over rows it already reads),
    and the corpus constants are sum-mergeable partials — which is
    what makes `append_bm25_index` a pure O(batch) append."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(_tokens(text_col), lambda t: t != "")).alias("tok"),
    )
    postings = (
        toks.groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", _bucket_col("tok", n_buckets))
    )
    postings.write.mode(_mode).partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    doclens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(_tokens(text_col), lambda t: t != ""))
        .cast("double")
        .alias("dl"),
    )
    doclens.write.mode(_mode).parquet(f"{path}/doclens")
    doclens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode(_mode).parquet(
        f"{path}/stats"
    )


def append_bm25_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold a batch of NEW documents into an existing index — O(batch)
    I/O only: the batch's postings append into their bucket
    partitions, its doclens append, and one stats partial row appends
    (summed with the others at query time). Queries over the appended
    index equal queries over an index built from scratch on the union
    (pytest-pinned). Caller contract: doc_ids not already indexed —
    re-indexing a changed doc needs a rebuild (or a delete log, the
    vector_store pattern)."""
    spark = new_docs.sparkSession
    n_buckets = spark.read.parquet(f"{path}/stats").collect()[0]["n_buckets"]
    build_bm25_index(
        new_docs, path, n_buckets=n_buckets, text_col=text_col,
        id_col=id_col, _mode="append",
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
    # term-set semantics, same as text.bm25_topk (duplicate literals
    # would also trip Spark's duplicate-map-key EXCEPTION policy)
    query_terms = list(dict.fromkeys(query_terms))
    stats = (
        spark.read.parquet(f"{path}/stats")
        .agg(
            F.sum("n_docs").alias("n"),
            F.sum("sum_dl").alias("sum_dl"),
            F.max("n_buckets").alias("n_buckets"),
        )
        .collect()[0]
    )
    n, n_buckets = stats["n"], stats["n_buckets"]
    avgdl = float(stats["sum_dl"] or 0.0) / n if n else 1.0
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
