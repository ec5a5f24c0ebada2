"""Deterministic 10x upsampling of a driver testdata dir — scale-holding
evidence for the declared queries beyond sf0.1.

Replica 0 is the original data byte-for-byte; replicas r>0 are key-offset
copies (one shared BIGINT stride, far above every original key range) with
cross-replica signal DECORRELATED so every workload scales linearly, the
way a genuinely larger corpus would — never quadratically through
replication artifacts:

- documents.text: every whitespace token gets an `r{r}` suffix (injective,
  keeps token/shingle counts per doc), so no cross-replica shingle, band,
  simhash block or fingerprint collides; within-replica duplicate structure
  is preserved exactly. n_chars recomputed (the originals hold
  n_chars == length(text)).
- documents.source: `-r{r}` suffix — `source` is a blocking key
  (dedup_ngram_jaccard_docs); verbatim replication would square that
  query's candidate volume instead of scaling it.
- embeddings.embedding: small seeded gaussian noise per replica — keeps
  the metric structure but avoids exact-tie neighbors that would make
  top-k rank order engine-dependent.
- c_name/s_name/p_name: `-r{r}` suffix (node labels stay unique).
- All other columns (dates, timestamps, prices, categorical dims,
  nation/region) are copied unchanged; FK key columns all shift by the
  same stride so referential integrity holds per replica and the cosupply
  graph becomes `mult` disjoint copies — linear edge growth.

Correctness at the new scale is still cross-engine checkable: the DuckDB
oracles recompute from the same parquet files (tools/validate_queries.py
logic with SF_DIR pointed here).

Usage: python bench/gen_scale.py [--src /root/testdata/sf0.1]
           [--out /root/testdata_scaled/sf1.0] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000  # > every original key (orderkey max ~150k at sf0.1)

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
NAME_COLS = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
    "documents": ["source"],
}
COPY_TABLES = ["nation", "region"]


def _suffix_tokens(text: str, r: int) -> str:
    return re.sub(r"(\S+)", rf"\g<1>r{r}", text)


def replicate(table: pa.Table, name: str, r: int) -> pa.Table:
    if r == 0:
        return table
    cols = {}
    for c in table.column_names:
        arr = table.column(c)
        if c in KEY_COLS.get(name, []):
            arr = pc.add(arr, pa.scalar(r * STRIDE, type=arr.type))
        elif c in NAME_COLS.get(name, []):
            arr = pc.binary_join_element_wise(
                pc.cast(arr, pa.string()), pa.scalar(f"-r{r}"), ""
            )
        elif name == "documents" and c == "text":
            arr = pa.array(
                [_suffix_tokens(t, r) for t in arr.to_pylist()], type=pa.string()
            )
        elif name == "embeddings" and c == "embedding":
            rng = np.random.default_rng(1000 + r)
            mat = np.stack(arr.to_pandas().to_numpy())
            mat = (mat + rng.normal(0.0, 0.02, mat.shape)).astype(np.float32)
            arr = pa.array(list(mat), type=arr.type)
        cols[c] = arr
    out = pa.table(cols, schema=table.schema)
    if name == "documents":
        n_chars = pc.cast(pc.utf8_length(out.column("text")), pa.int64())
        out = out.set_column(
            out.column_names.index("n_chars"), "n_chars", n_chars
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/testdata_scaled/sf1.0")
    ap.add_argument("--mult", type=int, default=10)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    for t in COPY_TABLES + list(KEY_COLS):
        src = pq.read_table(f"{a.src}/{t}.parquet")
        if t in COPY_TABLES:
            out = src
        else:
            out = pa.concat_tables(
                [replicate(src, t, r) for r in range(a.mult)]
            )
        pq.write_table(out, f"{a.out}/{t}.parquet")
        print(f"{t:12s} {src.num_rows:9d} -> {out.num_rows:9d}")
    open(f"{a.out}/_DONE", "w").close()


if __name__ == "__main__":
    main()
