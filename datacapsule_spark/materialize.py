"""Graph + relational materialization (SURVEY.md G5, S2, S4).

triples_raw → deduped `edges` + attr-merged `nodes` (the GraphFrames
encoding of the reference's nx.DiGraph, tools/entity_extraction.py:93-133
and nx.write_graphml :252-255), plus the 4-table normalized relational
layer mirroring tools/entity_extraction_db.py:85-137.

Writes are partitioned parquet (`partitionBy(node_type / relation)`) —
the Iceberg `writeTo(...).partitionedBy(...)` call is a one-line swap
when an Iceberg catalog is configured (`iceberg=True`); partition
pruning semantics are identical. Entity ids are content-derived
(xxhash64) — no sequences, no lastrowid (entity_extraction_db.py:436),
so re-runs are idempotent and distributed-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(triples: DataFrame, assume_unique: bool = False) -> DataFrame:
    """Distinct (src, relation, dst) with first-seen provenance —
    NetworkX add_edge overwrite semantics → dropDuplicates.

    assume_unique=True skips the dedup shuffle when the input is
    already distinct on (subj, pred, obj) — the pipeline's canonical
    stage guarantees this, and re-deduplicating 10^10 rows is a full
    shuffle bought for nothing (measured 14.3s of a 126s run)."""
    out = triples.select(
        F.col("subj").alias("src"),
        F.col("pred").alias("relation"),
        F.col("obj").alias("dst"),
        "repo",
        "path",
    )
    return out if assume_unique else out.dropDuplicates(["src", "relation", "dst"])


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Distinct (subj, pred, obj) with deterministic minimum provenance
    — ONE shuffle that doubles as the edge-dedup (NetworkX add_edge
    overwrite semantics). Replaces dropDuplicates' arbitrary row pick
    with min(struct(...)) so resumed/re-run pipelines are bit-identical.

    This is the pipeline's single post-canonicalization shuffle: its
    output boundary IS the edges table modulo projection (VERDICT r01
    item 1 — the old 40_canon_triples + 60_edges pair wrote the full
    triple stream twice and read it three times)."""
    rest = [c for c in triples.columns if c not in ("subj", "pred", "obj")]
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(F.min(F.struct(*rest)).alias("_m"))
        .select("subj", "pred", "obj", *[F.col(f"_m.{c}").alias(c) for c in rest])
    )


def canonical_edges(triples: DataFrame, mapping) -> DataFrame:
    """Canonical rewrite + dedup of ONLY the collision-prone stream.

    Extraction dedups (subj, pred, obj) within each file
    (extraction_schema.py:255-261) and every non-`contains` subj is the
    file id, so a row can be a duplicate only if (a) pred == contains
    (taxonomy chains re-emitted per file) or (b) its subj/obj HIT the
    alias mapping — the mapping contains its own roots, so BOTH sides
    of any potential collision flag. Everything else streams map-side
    into the sink with no shuffle. Output ≡ dedup_triples(rewrite(all))
    (equivalence-tested); sortWithinPartitions(subj) re-clusters rows
    for parquet encoding."""
    from .canonicalize import apply_canonical

    t = apply_canonical(triples, mapping, ["subj", "obj"], flag="_hit")
    dup_prone = (F.col("pred") == "contains") | F.col("_hit")
    deduped = dedup_triples(t.where(dup_prone).drop("_hit"))
    passthrough = t.where(~dup_prone).drop("_hit")
    return deduped.unionByName(passthrough).sortWithinPartitions("subj")


def build_nodes(triples: DataFrame) -> DataFrame:
    """Union of subj and obj projections, attr-merged per node_id.

    Mirrors add_node merge-on-same-key semantics: one row per node_id,
    node_type = first observed, name = display segment of the id
    (after the "type:" prefix), attrs carries provenance counts.
    """
    subj = triples.select(
        F.col("subj").alias("node_id"), F.col("subj_type").alias("node_type")
    )
    obj = triples.select(
        F.col("obj").alias("node_id"), F.col("obj_type").alias("node_type")
    )
    ids = subj.unionByName(obj)
    return (
        ids.groupBy("node_id")
        .agg(F.min("node_type").alias("node_type"), F.count("*").alias("degree"))
        .withColumn(
            "name", F.regexp_replace(F.col("node_id"), r"^[a-z]+:", "")
        )
        .withColumn(
            "attrs",
            F.create_map(
                F.lit("degree"), F.col("degree").cast("string")
            ),
        )
        .drop("degree")
        .select("node_id", "node_type", "name", "attrs")
    )


def node_type_histogram(nodes: DataFrame) -> DataFrame:
    """Census check mirroring entity_extraction.py:257-269."""
    return nodes.groupBy("node_type").agg(F.count("*").alias("n")).orderBy("node_type")


def relation_histogram(edges: DataFrame) -> DataFrame:
    return edges.groupBy("relation").agg(F.count("*").alias("n")).orderBy("relation")


# ----------------------------------------------------------- relational

def build_relational(
    triples: DataFrame, assume_unique: bool = False
) -> dict[str, DataFrame]:
    """Pivot triples_raw into the 4-table schema of
    tools/entity_extraction_db.py:85-137 (species→entities,
    distributions→entity_mentions, numerical_traits→numerical_facts,
    descriptions→descriptions).

    assume_unique=True skips the mentions/descriptions dedup shuffles:
    their projections are injective per (subj, pred, obj), so input
    already distinct on the triple key (the pipeline's canonical
    boundary) needs no re-dedup — measured 26s@4 / 13s@16 cores bought
    back at 29.6M triples."""
    files = triples.where(F.col("subj_type") == "file")

    # entities ≈ species: one row per file entity, with year/author attrs
    year = (
        files.where(F.col("pred") == "named_in")
        .select(
            "subj",
            F.regexp_replace("obj", "^year:", "").cast("int").alias("naming_year"),
        )
        .groupBy("subj")
        .agg(F.min("naming_year").alias("naming_year"))
    )
    author = (
        files.where(F.col("pred") == "authored_by")
        .select("subj", F.regexp_replace("obj", "^author:", "").alias("author"))
        .groupBy("subj")
        .agg(F.min("author").alias("author"))
    )
    # every file emits exactly one has_loc triple (extraction_schema.py:
    # 333, unconditional) carrying the same (repo, path, lang) as all of
    # the file's rows — restricting to that pred reads 1 of 10 pred
    # partitions for an identical result
    base = files.where(F.col("pred") == "has_loc").groupBy("subj").agg(
        F.first("repo").alias("repo"),
        F.min("path").alias("first_path"),
        F.first("lang").alias("lang"),
    )
    entities = (
        base.join(year, "subj", "left")
        .join(author, "subj", "left")
        .select(
            F.xxhash64("subj").alias("entity_id"),
            F.col("subj").alias("name"),
            F.lit("file").alias("kind"),
            "lang",
            "repo",
            "first_path",
            "naming_year",
            "author",
        )
    )

    # entity_mentions ≈ distributions: which symbols / modules does each
    # file entity reference (1:N). entity_id = xxhash64(subj) — the SAME
    # key as entities.entity_id, so the FK joins (the distributions shape:
    # distributions.species_id → species.id, entity_extraction_db.py:
    # 96-104); the referenced symbol is the value column `target`.
    mentions = triples.where(
        F.col("pred").isin("imports", "calls", "defines_function", "defines_class")
    ).select(
        F.xxhash64("subj").alias("entity_id"),
        F.col("obj").alias("target"),
        "repo",
        "path",
        F.col("pred").alias("kind"),
    )
    if not assume_unique:
        mentions = mentions.distinct()

    # numerical_facts ≈ numerical_traits (REAL value + unit)
    facts = (
        files.where(F.col("pred").isin("has_loc", "has_size"))
        .select(
            F.xxhash64("subj").alias("entity_id"),
            F.col("pred").alias("fact_type"),
            F.regexp_extract("obj", r":([0-9.]+)$", 1).cast("double").alias("value"),
            F.when(F.col("pred") == "has_loc", F.lit("lines"))
            .otherwise(F.lit("kb"))
            .alias("unit"),
        )
    )

    # descriptions ≈ raw-text payloads (X7 fallbacks + provenance);
    # raw: objs occur only under `imports` (extraction_schema.py:313),
    # so the projection is injective per triple too
    descriptions = triples.where(F.col("obj_type") == "raw").select(
        F.xxhash64("subj").alias("entity_id"),
        F.lit("raw_fallback").alias("description_type"),
        F.regexp_replace("obj", "^raw:", "").alias("content"),
    )
    if not assume_unique:
        descriptions = descriptions.distinct()

    return {
        "entities": entities,
        "entity_mentions": mentions,
        "numerical_facts": facts,
        "descriptions": descriptions,
    }


# ----------------------------------------------------------------- sinks

def iceberg_available(spark) -> bool:
    """True iff the session's JVM can load the Iceberg Spark catalog
    (jars on the classpath). The sandbox has none, so the iceberg=True
    branches raise cleanly here and run on a real cluster unchanged."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — capability probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg=True but no Iceberg catalog on this session: add the "
            "iceberg-spark-runtime jar and a spark.sql.catalog.<name> "
            "config (smoke script + full branch inventory: ICEBERG.md), "
            "or use the partitioned-parquet path (iceberg=False)."
        )


def write_graphml(
    nodes: DataFrame, edges: DataFrame, path: str, max_nodes: int = 200_000
) -> str:
    """GraphML sink — format parity with the reference's
    nx.write_graphml (tools/entity_extraction.py:252-255). Key ids match
    graph_data_new/graph_entity_relation_detailed.graphml where the
    attributes coincide: d4=node_type, d5=name, d6=relation (readers
    resolve by attr.name, so id parity is cosmetic but kept anyway).

    GraphML is a single-document XML format, inherently driver-side:
    this collects, so it is guarded to graphs that fit the driver
    (serving/debug exports). The distributed sink is write_graph.
    """
    import xml.sax.saxutils as sx

    n = nodes.count()
    if n > max_nodes:
        raise ValueError(
            f"GraphML export is driver-side; {n} nodes > guard {max_nodes}. "
            "Use write_graph (partitioned parquet) at scale."
        )
    lines = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="d4" for="node" attr.name="node_type" attr.type="string"/>',
        '  <key id="d5" for="node" attr.name="name" attr.type="string"/>',
        '  <key id="d6" for="edge" attr.name="relation" attr.type="string"/>',
        '  <graph edgedefault="directed">',
    ]
    for r in nodes.select("node_id", "node_type", "name").toLocalIterator():
        nid = sx.escape(r["node_id"], {'"': "&quot;"})
        lines.append(f'    <node id="{nid}">')
        lines.append(f"      <data key=\"d4\">{sx.escape(r['node_type'])}</data>")
        lines.append(f"      <data key=\"d5\">{sx.escape(r['name'] or '')}</data>")
        lines.append("    </node>")
    for r in edges.select("src", "relation", "dst").toLocalIterator():
        s = sx.escape(r["src"], {'"': "&quot;"})
        d = sx.escape(r["dst"], {'"': "&quot;"})
        lines.append(f'    <edge source="{s}" target="{d}">')
        lines.append(f"      <data key=\"d6\">{sx.escape(r['relation'])}</data>")
        lines.append("    </edge>")
    lines += ["  </graph>", "</graphml>", ""]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path


def write_graph(
    nodes: DataFrame,
    edges: DataFrame,
    base_dir: str,
    mode: str = "overwrite",
    iceberg: bool = False,
) -> None:
    """Partitioned sink (S2). nodes by node_type, edges by relation.

    iceberg=True: `base_dir` is a catalog namespace (e.g.
    "local.kg") and the write is `writeTo(...).partitionedBy(...)` —
    identical partition-pruning semantics, plus snapshot isolation.
    Raises cleanly when the session has no Iceberg catalog (this
    sandbox); the parquet path is the default everywhere else."""
    if iceberg:
        spark = nodes.sparkSession
        _require_iceberg(spark)
        nodes.writeTo(f"{base_dir}.nodes").partitionedBy(
            F.col("node_type")
        ).createOrReplace()
        edges.writeTo(f"{base_dir}.edges").partitionedBy(
            F.col("relation")
        ).createOrReplace()
        return
    nodes.write.mode(mode).partitionBy("node_type").parquet(f"{base_dir}/nodes")
    edges.write.mode(mode).partitionBy("relation").parquet(f"{base_dir}/edges")


def write_graph_bucketed(
    nodes: DataFrame,
    edges: DataFrame,
    db: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> tuple[str, str]:
    """Bucketed catalog sink: nodes bucketed+sorted on node_id, edges
    on src, SAME bucket count — so every downstream traversal join
    (edges.src = nodes.node_id, the G1-G4 hop shape) is co-located:
    Catalyst plans a SortMergeJoin with ZERO shuffle Exchange on
    either side (asserted in tests/test_plans.py). At 100 TB this is
    the difference between re-shuffling the edge table per hop and
    reading pre-placed buckets; the Iceberg analog is
    `partitionedBy(bucket(N, col))` via write_graph(iceberg=True).

    Returns the two table names. Bucketing requires a catalog table
    (saveAsTable) — plain .parquet(path) cannot carry bucket metadata."""
    spark = nodes.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    nodes_t, edges_t = f"{db}.nodes_b", f"{db}.edges_b"
    (
        nodes.write.mode(mode)
        .bucketBy(n_buckets, "node_id")
        .sortBy("node_id")
        .saveAsTable(nodes_t)
    )
    (
        edges.write.mode(mode)
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .saveAsTable(edges_t)
    )
    return nodes_t, edges_t
