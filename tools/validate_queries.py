"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row-count + schema + order-insensitive value-hash.

Usage: python tools/validate_queries.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def norm_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash: sort columns by name, round floats,
    stringify, sort rows, md5."""
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    if df.empty:
        rows = []
    else:
        rows = sorted(
            df.astype(str).apply(lambda r: "\x01".join(r.values), axis=1).tolist()
        )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(names=None):
    import __spark_entry__ as e
    from datacapsule_spark.session import get_spark

    spark = get_spark("validate", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    names = names or sorted(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {str(ex)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif norm_hash(sdf) != norm_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
