"""As-of (backward-looking temporal) join — an operator Spark lacks
natively, composed from union + window per SURVEY's custom-operator
strategy (a): no UDF, no range explosion, one shuffle on the `by` key.

Semantics (matches DuckDB ASOF LEFT JOIN with `l.ts >= r.ts`): every
left row picks the right row with the greatest ts ≤ left.ts within the
same `by` group; no match → nulls. Right must be unique per (by, ts) —
pre-aggregate otherwise (ties would be nondeterministic).

Plan shape at scale: both sides tagged and unioned, ONE shuffle on
(by), per-group sort by (ts, right-first) — `last(ignorenulls)` over a
running frame carries the most recent right value forward. This is the
classic log-enrichment join (events × slowly-changing dims) that would
otherwise need a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left + (most recent right value_cols as {col}{suffix}) per row."""
    left_cols = left.columns
    l = left.withColumn("_is_r", F.lit(0))
    for c in value_cols:
        l = l.withColumn(f"_rv_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *by,
        F.col(ts),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    for c in left_cols:
        if c not in set(by) | {ts}:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))

    # right rows sort BEFORE left rows at equal ts so an exact-ts match
    # is visible to the left row (inclusive backward semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_is_r") == 0).select(
        *left_cols, *[f"{c}{suffix}" for c in value_cols]
    )
