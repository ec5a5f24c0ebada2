"""One-shot smoke test for the Iceberg-gated branches (see ICEBERG.md).

Run on a session WITH an Iceberg catalog configured (this sandbox has
none — the script exits 2 with the probe's message there):

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-... \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=/tmp/iceberg-wh \
      tools/iceberg_smoke.py [catalog_namespace]   # default local.kg_smoke
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession

# runnable both via spark-submit --py-files and straight from the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ns = sys.argv[1] if len(sys.argv) > 1 else "local.kg_smoke"
    catalog = ns.split(".", 1)[0]
    spark = SparkSession.builder.appName("iceberg-smoke").getOrCreate()

    from datacapsule_spark.lineage import StageTracker
    from datacapsule_spark.materialize import iceberg_available, write_graph

    if not iceberg_available(spark):
        print(
            "no Iceberg catalog on this session — add the "
            "iceberg-spark-runtime jar and spark.sql.catalog.* configs "
            "(see ICEBERG.md)",
            file=sys.stderr,
        )
        return 2

    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")

    nodes = spark.createDataFrame(
        [("n:a", "symbol", "a"), ("n:b", "file", "b")],
        "node_id string, node_type string, name string",
    )
    edges = spark.createDataFrame(
        [("n:a", "n:b", "defined_in")], "src string, dst string, relation string"
    )
    # S2 sink: writeTo(...).partitionedBy(...).createOrReplace()
    write_graph(nodes, edges, ns, iceberg=True)
    back = spark.read.table(f"{ns}.nodes").where("node_type = 'symbol'")
    assert back.count() == 1, "partition-pruned readback failed"

    # lineage MERGE INTO, run twice — second merge must be idempotent
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {ns}.lineage "
        "(run_id string, stage string, partition_id int, input_rows bigint, "
        "output_rows bigint, wall_ms double) USING iceberg"
    )
    with tempfile.TemporaryDirectory() as d:
        tr = StageTracker(spark, d)
        tr.materialize("10_smoke", lambda: nodes)  # writes lineage rows
        tr.merge_lineage_iceberg(f"{ns}.lineage")
        n1 = spark.read.table(f"{ns}.lineage").count()
        tr.merge_lineage_iceberg(f"{ns}.lineage")
        n2 = spark.read.table(f"{ns}.lineage").count()
    assert n1 == n2 > 0, f"MERGE not idempotent: {n1} -> {n2}"

    print("ICEBERG SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
