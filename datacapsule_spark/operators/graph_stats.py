"""Distributed graph analytics beyond traversal: triangle counting.

Complements the engine's BFS (traverse.py) and connected components
(canonicalize.py) with the third classic distributed graph primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Global triangle count via degree-ordered wedge join
    (Schank-Wagner orientation) — 1-row DataFrame (n_triangles).

    Naive wedge enumeration joins on every shared vertex: a hub with
    degree d contributes d² wedges, which detonates on skewed graphs.
    Orienting every edge from its lower-degree endpoint to the higher
    (ties by id) makes each triangle countable at exactly one vertex
    — its lowest-degree corner — and caps per-vertex wedge fanout at
    the oriented out-degree, O(sqrt(E)) on any graph. Three shuffles:
    degree aggregation, the wedge self-join on the oriented source,
    and the closure probe against the canonical edge set.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # reused: degrees, orientation, closure
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .localCheckpoint(eager=False)  # both wedge-join sides
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t")),
    ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
    closed = wedges.join(
        und,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
    )
    return closed.groupBy().agg(F.count("*").alias("n_triangles"))
