"""Data-contract expectations — declarative row checks evaluated in
ONE aggregation pass.

The screen a pipeline runs at every ingest boundary: a list of named
boolean column expressions ("price positive", "status in domain"),
each reduced to a violation count over the whole table in a single
partial+final hash aggregate — k rules cost one scan, not k scans,
and no rows are collected (the result is k rows regardless of table
size). A NULL predicate counts as a violation (strict semantics — the
opposite of SQL CHECK, which passes NULL; ingest gates want strict).

Use with operators.text.profile_table (the discovery screen) — profile
to learn the shape, expectations to enforce it from then on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows, passed).

    violation := NOT coalesce(predicate, false). The single agg's
    1x(k+1) result row is reshaped driver-side (k = rule count, not
    data)."""
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(f"__v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = [
        (name, row[f"__v{i}"] or 0, n, (row[f"__v{i}"] or 0) == 0)
        for i, (name, _) in enumerate(rules)
    ]
    return df.sparkSession.createDataFrame(
        out, "rule string, n_violations long, n_rows long, passed boolean"
    )
