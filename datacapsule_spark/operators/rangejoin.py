"""Range (interval) join — points joined to [lo, hi) intervals.

Two strategies, same semantics:

- broadcast: non-equi join against a broadcast interval table — right
  for dimension-sized interval sets (Spark executes it as
  BroadcastNestedLoopJoin; fine when one side is tiny).
- bucketed: the scale path when the interval table is too big to
  broadcast — intervals are exploded into fixed-width buckets they
  overlap, points get their bucket by arithmetic, and the join becomes
  an EQUI join on bucket_id + residual range filter. Cost is
  O(points + intervals × avg_span/step) shuffled by bucket — never the
  O(points × intervals) nested loop.

This is strategy (a) of SURVEY §7's custom-operator ladder: composition
of built-in ops, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_broadcast(
    points: DataFrame, intervals: DataFrame, value_col: str,
    lo_col: str = "lo", hi_col: str = "hi",
) -> DataFrame:
    """points ⨝ broadcast(intervals) on lo ≤ value < hi."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return points.join(F.broadcast(intervals), cond, "inner")


def range_join_bucketed(
    points: DataFrame, intervals: DataFrame, value_col: str,
    lo_col: str = "lo", hi_col: str = "hi", step: float = 100.0,
) -> DataFrame:
    """Equi-join on bucket id + residual filter (the shuffle-friendly
    formulation). `step` trades explode fan-out (wide intervals → more
    bucket rows) against bucket selectivity."""
    b_points = points.withColumn(
        "_bkt", F.floor(F.col(value_col) / F.lit(step)).cast("long")
    )
    b_intervals = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(step)).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge does
                # not reach into that bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / F.lit(step)
                ).cast("long"),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return (
        b_points.join(b_intervals, "_bkt", "inner")
        .where(cond)
        .drop("_bkt")
    )
