"""Skew-safe aggregation operators.

Spark's partial (map-side) aggregation already protects count/sum/min
style aggregates from hot keys; the aggregates that still funnel a hot
key's entire row stream through ONE reducer are the holistic ones —
collect_set/collect_list. At 100 TB a single viral key (one repo with
10^8 files, one entity mentioned everywhere) turns that reducer into
the job's straggler or an OOM.

salted_collect_set splits every key into n_salts sub-groups FIRST,
aggregates partial sets in parallel, then merges the n_salts partials
in a second, tiny aggregation — the classic two-stage salting shape,
packaged as an operator. The salt is a hash of the VALUE, which makes
the split deterministic (no rand(), layout-independent) and gives
early deduplication for free: identical values always land in the same
sub-group, so the partial sets are already value-disjoint across salts
and the merge is a plain flatten, no re-distinct.

The extraction pipeline's repo/lang salting (extract.py) is the
pipeline-specific instance of the same idea; this is the reusable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """collect_set(value) per key with the hot-key stream capped at
    ~1/n_salts per task. Output array is sorted (deterministic).

    Stage 1 shuffles on (keys..., salt) — a hot key spreads over
    n_salts reducers; stage 2 shuffles n_salts rows per key. Total
    extra cost: one small exchange. Values across salt buckets are
    disjoint by construction (salt = hash(value) % n_salts), so the
    merge needs no second distinct."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    partials = (
        df.groupBy(*key_cols, salt.alias("_salt"))
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return partials.groupBy(*key_cols).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias(out_col)
    )
