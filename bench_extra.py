"""Extra benchmarks for the r07 optimization round (bench.py is frozen
for measurement; guide §1.4 noop-sink isolation lives here).

Modes:

    python bench_extra.py queries NAME [NAME...] [--repeats N]
        Time headline queries with the noop sink (computes every column,
        no count()-style pruning) in one JVM, best-of-N per query.

    python bench_extra.py neardedup
        Stage-by-stage attribution of the kg_pipeline_neardedup tier's
        stage_05 (near_dedup on the 50k-file bench corpus): signatures,
        band self-join pairs, jaccard gate, CC + anti-join (full op).

One JSON line per mode to stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(build) -> float:
    """Time CONSTRUCTION + noop execution: iterative operators (CC,
    SCC, any checkpointed loop) do most of their work during DataFrame
    construction, so timing only the final write under-counts them."""
    t0 = time.time()
    _noop(build())
    return time.time() - t0


def run_queries(names: list[str], repeats: int) -> None:
    from datacapsule_spark.queries import QUERIES
    from datacapsule_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warmup

    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            best = min(best, _timed(lambda: QUERIES[name](spark, sf_dir)))
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"mode": "queries", "repeats": repeats, "queries": out}))


def run_neardedup() -> None:
    from pyspark.sql import functions as F

    from datacapsule_spark.corpus import ensure_corpus
    from datacapsule_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        near_dedup,
        ngram_jaccard_pairs,
    )
    from datacapsule_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra-nd", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus("bench", spark=spark)
    repos = spark.read.parquet(corpus)
    repos.count()  # warmup the scan
    keyed = repos.withColumn("_id", F.concat_ws("::", "repo", "path"))

    out: dict[str, float] = {}

    def stage(name, build, repeats=2):
        best = float("inf")
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"nd:{name}")
            best = min(best, _timed(build))
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)

    kw = dict(text_col="content", id_col="_id", hash_fn="xxhash64")

    stage("signatures", lambda: minhash_signatures(keyed, **kw))
    stage(
        "pairs_lsh",
        lambda: minhash_lsh_pairs(minhash_signatures(keyed, **kw),
                                  hash_fn="xxhash64"),
    )

    def gate():
        pairs = minhash_lsh_pairs(
            minhash_signatures(keyed, **kw), hash_fn="xxhash64"
        ).localCheckpoint(eager=False)
        return ngram_jaccard_pairs(
            keyed, pairs, text_col="content", id_col="_id", threshold=0.9
        )

    stage("pairs_plus_gate", gate)

    stage(
        "near_dedup_full",
        lambda: near_dedup(keyed, text_col="content", id_col="_id",
                           min_jaccard=0.9, hash_fn="xxhash64"),
    )
    print(json.dumps({"mode": "neardedup", "stages": out}))


def main() -> None:
    mode = sys.argv[1]
    if mode == "queries":
        args = sys.argv[2:]
        repeats = 2
        if "--repeats" in args:
            i = args.index("--repeats")
            repeats = int(args[i + 1])
            args = args[:i] + args[i + 2:]
        run_queries(args, repeats)
    elif mode == "neardedup":
        run_neardedup()
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
