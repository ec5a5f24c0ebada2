"""Canonical StructTypes for every table the engine reads or writes.

Mirrors SURVEY.md §1.3. The input table shape is fixed by the north rule
(BASELINE.json input_hint): an Iceberg table of source-code repositories
(repo, path, commit, lang, content). Everything downstream is derived.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- source
# The Iceberg source table of source-code repositories (input_hint).
REPOS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# ------------------------------------------------------------- extraction
# One detected mention of a symbol in a file (reference: the per-slot
# extractor outputs of tools/entity_extraction.py:136-249, re-expressed
# as a 1→N row expansion).
MENTIONS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("kind", StringType(), False),  # import|def_function|def_class|call|author|year|...
        StructField("name", StringType(), False),
        StructField("line", IntegerType(), True),
    ]
)

# Pre-linking triples (reference: every add_edge site,
# tools/entity_extraction.py:103-241). content_sha256 carries the
# per-row invariant demanded by the north rule.
TRIPLES_RAW = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("subj_type", StringType(), False),
        StructField("obj_type", StringType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content_sha256", StringType(), False),
    ]
)

# ------------------------------------------------------------------ graph
# GraphFrames-style encoding of the reference's nx.DiGraph
# (tools/entity_extraction.py:73; GraphML keys d0-d6).
NODES = StructType(
    [
        StructField("node_id", StringType(), False),
        StructField("node_type", StringType(), False),
        StructField("name", StringType(), False),
        StructField("attrs", MapType(StringType(), StringType()), True),
    ]
)

EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("relation", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
    ]
)

# entity linking: candidate alias pairs and canonical mapping
ALIAS_PAIRS = StructType(
    [
        StructField("a", StringType(), False),
        StructField("b", StringType(), False),
        StructField("score", DoubleType(), True),
    ]
)

CANONICAL_MAP = StructType(
    [
        StructField("node_id", StringType(), False),
        StructField("canonical_id", StringType(), False),
    ]
)

# ------------------------------------------------------------- relational
# 4-table normalized layer mirroring tools/entity_extraction_db.py:85-137
# (species → entities, distributions → per-file mentions,
#  numerical_traits → numeric facts, descriptions → raw text).
ENTITIES = StructType(
    [
        StructField("entity_id", LongType(), False),  # xxhash64 — no lastrowid
        StructField("name", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("repo", StringType(), True),
        StructField("first_path", StringType(), True),
        StructField("naming_year", IntegerType(), True),
        StructField("author", StringType(), True),
    ]
)

ENTITY_MENTIONS = StructType(
    [
        StructField("entity_id", LongType(), False),  # FK → ENTITIES.entity_id
        StructField("target", StringType(), False),  # referenced symbol/module
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("kind", StringType(), False),
    ]
)

NUMERICAL_FACTS = StructType(
    [
        StructField("entity_id", LongType(), False),
        StructField("fact_type", StringType(), False),  # loc|n_chars|size_mean|...
        StructField("value", DoubleType(), True),
        StructField("unit", StringType(), True),
    ]
)

DESCRIPTIONS = StructType(
    [
        StructField("entity_id", LongType(), False),
        StructField("description_type", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# ----------------------------------------------------------------- vector
EMBEDDINGS = StructType(
    [
        StructField("id", StringType(), False),
        StructField("kind", StringType(), False),  # entity|relation
        StructField("entity_type", StringType(), True),
        StructField("name", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

# ---------------------------------------------------------------- lineage
# Per-stage / per-partition checkpoint + metrics (maps the reference's
# interactions/processingTime ops tables, app.py:71-94, to the north
# rule's resumable-pipeline requirement).
LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_rows", LongType(), False),
        StructField("output_rows", LongType(), False),
        StructField("wall_ms", DoubleType(), False),
    ]
)
