"""Snapshot diff + key-skew report — the two screens a pipeline runs
between ingests.

table_diff answers "what changed between yesterday's snapshot and
today's?" without collecting either side: rows are reduced to
(key, md5-of-all-non-key-columns) and the two fingerprint tables are
full-outer-joined on key. One shuffle per side, on the key — the same
exchange a MERGE would pay — and the payload columns are pruned out
before the shuffle, so a 100 TB table diffs by moving only keys +
32-byte hashes. Output: one row per differing key with status
added / removed / changed (unchanged rows produce nothing, so the
result is proportional to the churn, not the table).

skew_report answers "which keys will straggle the next join/agg?":
per-key counts compared against the median key count, flagging keys
above `threshold` x median. Median-of-counts is computed on the
(small) per-key count table, broadcast back — two aggregations, no
driver loop. Exact percentile keeps a DuckDB oracle twin; at 100 TB
swap in approx_percentile (noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(
    df: DataFrame, key_cols: list[str], value_cols: list[str]
) -> DataFrame:
    """(keys..., row_hash) — md5 over the non-key columns, cast to
    string and joined on \\x01 with \\x02 as the NULL sentinel, so
    ('a b', 'c') != ('a', 'b c') and (NULL, 'a') != ('a', NULL).
    md5 (not xxhash64) keeps the hash reproducible in the DuckDB
    oracle (concat_ws(chr(1), coalesce(c::VARCHAR, chr(2)), ...));
    the hash cost is irrelevant next to the shuffle. value_cols is
    passed in (one order for BOTH sides) so snapshots whose columns
    were merely reordered compare by name, not position."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
        for c in value_cols
    ]
    return df.select(
        *key_cols, F.md5(F.concat_ws("\x01", *parts)).alias("row_hash")
    )


def table_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows added / removed / changed from `old` to `new`, keyed by
    `key_cols` (assumed unique per side, as a snapshot key is).

    Returns (keys..., status) with status in
    {'added', 'removed', 'changed'}; identical rows are absent.
    Plan shape: project-to-hash (column pruning reaches the scan) ->
    one exchange per side on the key -> sort-merge full outer join.
    No broadcast hint: both sides are full snapshots, same order of
    magnitude by assumption. Value columns are matched BY NAME (the
    fingerprint uses one fixed column order for both sides), so a
    snapshot whose schema was merely reordered diffs clean; a column
    present on only one side is a schema change and raises."""
    value_cols = sorted(c for c in old.columns if c not in key_cols)
    if not value_cols:
        raise ValueError("table_diff needs at least one non-key column")
    new_values = sorted(c for c in new.columns if c not in key_cols)
    if new_values != value_cols:
        raise ValueError(
            f"schema mismatch: old has {value_cols}, new has {new_values}"
        )
    o = _fingerprint(old, key_cols, value_cols).withColumnRenamed(
        "row_hash", "old_hash"
    )
    n = _fingerprint(new, key_cols, value_cols).withColumnRenamed(
        "row_hash", "new_hash"
    )
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.select(*key_cols, status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    threshold: float = 10.0,
) -> DataFrame:
    """Keys whose row count exceeds `threshold` x the median key count
    — the keys that will straggle the next shuffle on these columns.

    Returns (keys..., n_rows, median_count, skew_ratio) for flagged
    keys only. First aggregation is map-side-combined (count per key);
    the median runs over the per-key table (|distinct keys| rows, not
    |rows|) and its 1-row result is broadcast back. Exact
    percentile_approx(.., 1.0) == true median here and matches the
    DuckDB oracle; at 100 TB with billions of distinct keys, drop
    accuracy to the default approx and lose the oracle twin.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    med = counts.agg(
        F.percentile_approx("n_rows", 0.5, 2147483647).alias("median_count")
    )
    return (
        counts.join(F.broadcast(med))
        .withColumn(
            "skew_ratio",
            F.round(F.col("n_rows") / F.col("median_count"), 4),
        )
        .where(F.col("skew_ratio") > F.lit(threshold))
    )
