"""Long-document variant of the testdata: same 5000 docs, ~20x tokens
each — the scale axis bench/gen_scale.py does NOT exercise (it
multiplies rows; this multiplies tokens per row). Per-doc text work
(shingles, fingerprints, every-position spans, repetition screens)
must stay linear in tokens; a superlinear per-doc defect is invisible
at 40-token docs and dominant at 800.

Doc i's text = concat over seg j in [0, mult) of the sf0.1 text of doc
(i + j) mod n, with every token of segment j suffixed `s{j}` — so no
segment duplicates another doc's text or another segment of the same
doc (no artificial near-dup/span blowup; within-segment natural
repetition is preserved). n_chars recomputed. All other tables copied
unchanged.

Usage: python bench/gen_longdocs.py [--src /root/testdata/sf0.1]
           [--out /root/testdata_scaled/sf0.1L] [--mult 20]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OTHER = [
    "nation", "region", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/testdata_scaled/sf0.1L")
    ap.add_argument("--mult", type=int, default=20)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    for t in OTHER:
        shutil.copyfile(f"{a.src}/{t}.parquet", f"{a.out}/{t}.parquet")

    d = pq.read_table(f"{a.src}/documents.parquet")
    texts = d.column("text").to_pylist()
    n = len(texts)
    tagged = [
        [re.sub(r"(\S+)", rf"\g<1>s{j}", t) for t in texts]
        for j in range(a.mult)
    ]
    long_texts = [
        " ".join(tagged[j][(i + j) % n] for j in range(a.mult))
        for i in range(n)
    ]
    out = d.set_column(
        d.column_names.index("text"), "text", pa.array(long_texts, pa.string())
    )
    n_chars = pc.cast(pc.utf8_length(out.column("text")), pa.int64())
    out = out.set_column(out.column_names.index("n_chars"), "n_chars", n_chars)
    pq.write_table(out, f"{a.out}/documents.parquet")
    old = sum(len(t) for t in texts)
    new = sum(len(t) for t in long_texts)
    print(f"docs {n}, chars {old} -> {new} ({new/old:.1f}x)")
    open(f"{a.out}/_DONE", "w").close()


if __name__ == "__main__":
    main()
