"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the `repos(repo, path, commit, lang, content)` table the north
rule specifies (BASELINE.json input_hint) — seed-fixed, no external
data. Two repos are "hot" (~40% of rows) to exercise the salted
repartitioning path; the symbol vocabulary plants alias variants
(HttpClient / http_client) to exercise entity linking.

Written with pyarrow directly (no Spark needed) so tests can
materialize fixtures cheaply.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

_WORDS = [
    "http", "client", "server", "parser", "token", "stream", "batch",
    "queue", "cache", "index", "shard", "merge", "split", "hash",
    "graph", "node", "edge", "vector", "query", "plan", "scan",
    "join", "sort", "filter", "window", "agg", "reduce", "map",
    "fetch", "store", "read", "write", "sync", "async", "retry",
    "config", "schema", "codec", "buffer", "worker",
]

_MODULES = [
    "os", "sys", "json", "math", "re", "collections", "itertools",
    "functools", "hashlib", "logging", "pathlib", "typing",
    "numpy", "pandas", "requests", "flask", "sqlalchemy",
    "java.util.List", "java.util.Map", "java.io.File",
    "lodash", "express", "react", "axios",
]

_AUTHORS = [
    "Alice Smith", "Bob Jones", "Carol White", "Dan Brown",
    "Eve Black", "Frank Green", "Grace Lee", "Hank Moore",
    "unknown", "n/a",  # sentinel values — must be filtered (P1)
]


def _camel(a: str, b: str) -> str:
    return a.capitalize() + b.capitalize()


def _snake(a: str, b: str) -> str:
    return f"{a}_{b}"


def symbol_vocab() -> list[str]:
    """~200 symbol names incl. planted alias variants."""
    rng = random.Random(SEED)
    pairs = set()
    while len(pairs) < 100:
        a, b = rng.choice(_WORDS), rng.choice(_WORDS)
        if a != b:
            pairs.add((a, b))
    vocab = []
    for a, b in sorted(pairs):
        vocab.append(_camel(a, b))
        vocab.append(_snake(a, b))  # alias variant of the same entity
    return vocab


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _gen_python(rng: random.Random, vocab: list[str]) -> str:
    target = rng.randint(20, 200)  # 20-200 lines (FIXTURES.md F1)
    lines = []
    author = rng.choice(_AUTHORS)
    if rng.random() < 0.7:
        extra = rng.choice(_AUTHORS)
        lines.append(f"# author: {author}, {extra}")
    else:
        lines.append(f"# author: {author}")
    year = rng.randint(1995, 2025) if rng.random() < 0.9 else "unk"
    lines.append(f"# year: {year}")
    if rng.random() < 0.5:
        lo = rng.randint(10, 80)
        lines.append(f"# size: {lo}-{lo + rng.randint(5, 40)}")
    for _ in range(rng.randint(1, 5)):
        mods = rng.sample(_MODULES[:17], rng.randint(1, 3))
        if rng.random() < 0.8:
            lines.append(f"import {', '.join(mods)}")
        else:
            lines.append(f"from {mods[0]} import thing")
    if rng.random() < 0.1:
        lines.append("import ???bad syntax!!!")  # X7 raw-text fallback
    while len(lines) < target - 2:
        r = rng.random()
        if r < 0.2:
            cls = rng.choice(vocab)
            lines.append(f"class {cls}:")
            lines.append("    pass")
        elif r < 0.7:
            fn = rng.choice(vocab)
            lines.append(f"def {fn}(x, y):")
            for _ in range(rng.randint(1, 4)):
                callee = rng.choice(vocab)
                lines.append(f"    z = {callee}(x)")
            lines.append("    return z")
        else:
            lines.append(f"VALUE_{rng.randint(0, 99)} = {rng.randint(0, 1000)}")
    return "\n".join(lines)


def _gen_javascript(rng: random.Random, vocab: list[str]) -> str:
    target = rng.randint(20, 200)
    lines = [f"// author: {rng.choice(_AUTHORS)}", f"// year: {rng.randint(1995, 2025)}"]
    for _ in range(rng.randint(1, 4)):
        mod = rng.choice(_MODULES[20:])
        if rng.random() < 0.5:
            lines.append(f"import {{ thing }} from '{mod}'")
        else:
            lines.append(f"const {mod} = require('{mod}')")
    while len(lines) < target - 2:
        r = rng.random()
        name = rng.choice(vocab)
        if r < 0.2:
            lines.append(f"class {name} {{")
            lines.append("}")
        elif r < 0.5:
            lines.append(f"function {name}(x) {{")
            lines.append(f"  return {rng.choice(vocab)}(x)")
            lines.append("}")
        elif r < 0.8:
            lines.append(f"const {name} = (x) => {rng.choice(vocab)}(x)")
        else:
            lines.append(f"// filler {rng.randint(0, 999)}")
    return "\n".join(lines)


def _gen_java(rng: random.Random, vocab: list[str]) -> str:
    target = rng.randint(20, 200)
    lines = [f"// author: {rng.choice(_AUTHORS)}", f"// year: {rng.randint(1995, 2025)}"]
    for _ in range(rng.randint(1, 3)):
        lines.append(f"import {rng.choice(_MODULES[17:20])};")
    cls = rng.choice(vocab)
    lines.append(f"public class {cls} {{")
    while len(lines) < target - 1:
        r = rng.random()
        if r < 0.6:
            fn = rng.choice(vocab)
            lines.append(f"    public int {fn}(int x) {{")
            lines.append(f"        return {rng.choice(vocab)}(x);")
            lines.append("    }")
        else:
            lines.append(f"    // filler {rng.randint(0, 999)}")
    lines.append("}")
    return "\n".join(lines)


_GEN = {"python": _gen_python, "javascript": _gen_javascript, "java": _gen_java}

HOT_REPOS = ("org0/repo0", "org1/repo1")


def generate_row(i: int, vocab: list[str], seed: int = SEED):
    """Row i of the corpus — pure function of (i, seed), so generation
    parallelizes over any partitioning of the id range (no shared
    per-repo counter; path uniqueness comes from the global index)."""
    rng = random.Random((seed << 20) ^ i)
    if rng.random() < 0.4:  # hot-repo skew (FIXTURES F1)
        repo = HOT_REPOS[i % 2]
    else:
        r = rng.randint(0, 160)
        repo = f"org{r % 7}/repo{r % 23}"
    u = rng.random()
    lang = "python" if u < 0.7 else ("javascript" if u < 0.85 else "java")
    ext = {"python": "py", "javascript": "js", "java": "java"}[lang]
    path = f"src/pkg{i % 13}/mod_{i}.{ext}"
    commit = _sha(f"{repo}:0")[:40]
    content = _GEN[lang](rng, vocab)
    return repo, path, commit, lang, content


ADVERSARIAL_MONOREPO = "org0/monorepo"
VIRAL_SYMBOL = "viral_spread"  # snake half; camel alias = ViralSpread

_VIRAL_SNIPPET = {
    "python": "\ndef uses_viral(x, y):\n    z = viral_spread(x)\n    return z",
    "javascript": "\nconst usesViral = (x) => viral_spread(x)",
}


def generate_row_adversarial(i: int, vocab: list[str], seed: int = SEED):
    """Adversarial-skew twin of generate_row (bench/skew_evidence.py,
    r04 VERDICT item 2): ~35% of ALL files land in ONE monorepo (vs
    the balanced generator's 2×20% hot repos) and ~50% of files gain a
    call to one viral symbol — the planted hot-partition and hot-key
    stresses SURVEY §4.2.3's salting story must absorb. Same pure
    function-of-(i, seed) contract, so generation parallelizes."""
    rng = random.Random((seed << 21) ^ i)
    if rng.random() < 0.35:
        repo = ADVERSARIAL_MONOREPO
    else:
        r = rng.randint(0, 160)
        repo = f"org{r % 7}/repo{r % 23}"
    u = rng.random()
    lang = "python" if u < 0.7 else ("javascript" if u < 0.85 else "java")
    ext = {"python": "py", "javascript": "js", "java": "java"}[lang]
    path = f"src/pkg{i % 13}/mod_{i}.{ext}"
    commit = _sha(f"{repo}:0")[:40]
    content = _GEN[lang](rng, vocab)
    if lang in _VIRAL_SNIPPET and rng.random() < 0.6:
        content += _VIRAL_SNIPPET[lang]
    return repo, path, commit, lang, content


def generate_rows(n_files: int, seed: int = SEED):
    """Yield (repo, path, commit, lang, content) deterministically."""
    vocab = symbol_vocab()
    for i in range(n_files):
        yield generate_row(i, vocab, seed)


def write_corpus(out_path: str, n_files: int, seed: int = SEED) -> str:
    """Materialize the repos table as parquet; returns the path."""
    cols = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for repo, path, commit, lang, content in generate_rows(n_files, seed):
        cols["repo"].append(repo)
        cols["path"].append(path)
        cols["commit"].append(commit)
        cols["lang"].append(lang)
        cols["content"].append(content)
    table = pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(table, out_path)
    return out_path


CORPUS_VERSION = 2  # bump when generator semantics change (invalidates cache)

SCALES = {"smoke": 500, "correctness": 5000, "bench": 50000, "scaling": 400000}


def write_corpus_spark(
    spark, out_dir: str, n_files: int, seed: int = SEED, n_partitions: int = 64,
    row_fn=generate_row,
) -> str:
    """Parallel corpus materialization: spark.range over file ids →
    mapInPandas(row_fn) → multi-file parquet directory. Many
    output files → the downstream scan parallelizes (a single 50 MB
    parquet file is one input split and serializes the read)."""
    import pandas as pd

    def gen(batches):
        vocab = symbol_vocab()
        for pdf in batches:
            rows = [row_fn(int(i), vocab, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    (
        spark.range(0, n_files, 1, n_partitions)
        .mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def ensure_adversarial_corpus(
    spark, n_files: int, base_dir: str = "/root/repo/data"
) -> str:
    """Idempotent materialization of the adversarial-skew corpus
    (generate_row_adversarial) at an arbitrary file count."""
    out = os.path.join(base_dir, f"repos_skew_{n_files}_v{CORPUS_VERSION}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write_corpus_spark(
            spark, out, n_files, n_partitions=max(64, n_files // 25000),
            row_fn=generate_row_adversarial,
        )
    return out


def ensure_corpus(
    scale: str = "smoke", base_dir: str = "/root/repo/data", spark=None
) -> str:
    """Idempotent materialization; scales per FIXTURES.md F1. Large
    scales require a SparkSession and produce a parquet directory."""
    n = SCALES[scale]
    if spark is not None:
        out = os.path.join(base_dir, f"repos_{scale}_v{CORPUS_VERSION}")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            write_corpus_spark(spark, out, n)
        return out
    if n > 100000:
        raise ValueError(f"corpus scale {scale} needs a SparkSession to generate")
    out = os.path.join(base_dir, f"repos_{scale}_v{CORPUS_VERSION}.parquet")
    if not os.path.exists(out):
        write_corpus(out, n)
    return out
