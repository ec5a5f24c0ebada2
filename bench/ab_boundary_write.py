"""A/B: planned-write sort vs concurrent writers for the pred-partitioned
extraction boundary (the per-job constant identified in bench/BASELINE.md).

Spark 4.x planned writes (spark.sql.optimizer.plannedWrite.enabled, default
true) inject a per-task local sort by the dynamic-partition columns before a
`partitionBy("pred")` parquet write. With only ~10 distinct pred values,
the alternative is concurrent writers: disable the planned-write sort and
let each task hold up to spark.sql.maxConcurrentOutputFileWriters open
files. This script measures extract+boundary-write wall for both variants
in fresh JVMs (subprocess per sample), alternating so host drift hits both.

Usage: python bench/ab_boundary_write.py [--level 16] [--repeats 3]
        [--corpus data/repos_scaling_v2]
Run on an idle machine only (CLAUDE.md measurement gotchas).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

_CHILD = """
import json, shutil, sys, time
corpus, cpus, variant, work = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, ".")
from datacapsule_spark.session import get_spark

extra = {}
if variant == "concurrent":
    extra = {
        "spark.sql.optimizer.plannedWrite.enabled": "false",
        "spark.sql.maxConcurrentOutputFileWriters": "32",
    }
spark = get_spark(
    f"ab-boundary-{variant}", master=f"local[{cpus}]",
    shuffle_partitions=max(cpus * 2, 16), extra_conf=extra,
)
assert spark.sparkContext.defaultParallelism == cpus
spark.sparkContext.setLogLevel("ERROR")

repos = spark.read.parquet(corpus)
repos.count()  # warm input listing/page cache the same way for both arms

from datacapsule_spark.extract import extract_triples

shutil.rmtree(work, ignore_errors=True)
t0 = time.time()
(extract_triples(repos)
    .write.mode("overwrite").partitionBy("pred").parquet(work))
wall = time.time() - t0
n = spark.read.parquet(work).count()
print(json.dumps({"variant": variant, "wall_sec": round(wall, 2), "triples": n}))
"""


def run_sample(corpus: str, cpus: int, variant: str) -> dict:
    work = f"/tmp/ab_boundary_{variant}"
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, corpus, str(cpus), variant, work],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)) or ".",
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        res = json.loads(line)
    except (ValueError, IndexError):
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"sample failed ({variant})")
    shutil.rmtree(work, ignore_errors=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--corpus", default="data/repos_scaling_v2")
    args = ap.parse_args()

    samples: list[dict] = []
    for rep in range(args.repeats):
        for variant in ("planned", "concurrent"):  # alternate within each rep
            load1 = os.getloadavg()[0]
            while load1 > 1.5:
                print(f"# waiting for idle (load {load1:.1f})", flush=True)
                time.sleep(30)
                load1 = os.getloadavg()[0]
            res = run_sample(args.corpus, args.level, variant)
            res["rep"] = rep
            res["load1_before"] = round(load1, 2)
            samples.append(res)
            print(json.dumps(res), flush=True)

    best = {}
    for v in ("planned", "concurrent"):
        walls = [s["wall_sec"] for s in samples if s["variant"] == v]
        best[v] = min(walls)
    print(json.dumps({"level": args.level, "best": best, "samples": samples}))


if __name__ == "__main__":
    main()
