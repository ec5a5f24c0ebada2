"""Entity-linking tiers: exact normal form and MinHash-LSH candidates
(SURVEY J5), plus the full pipeline with LSH enabled."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_lsh_alias_pairs_finds_near_names(spark):
    from datacapsule_spark.linking import lsh_alias_pairs

    names = spark.createDataFrame(
        [
            ("sym:HttpClientFactory",),
            ("sym:http_client_factory",),   # same normal form
            ("sym:HttpClientFactry",),      # typo — near-dup, different norm
            ("sym:StreamBufferWriter",),
            ("sym:CompletelyDifferent",),
        ],
        "name string",
    )
    pairs = {
        (r["a"], r["b"]): r["score"]
        for r in lsh_alias_pairs(names, min_rescore=0.5).collect()
    }
    flat = set()
    for a, b in pairs:
        flat.add(frozenset([a, b]))
    assert frozenset(["sym:HttpClientFactory", "sym:http_client_factory"]) in flat
    assert frozenset(["sym:HttpClientFactory", "sym:HttpClientFactry"]) in flat
    assert not any("sym:CompletelyDifferent" in p for p in flat)
    # scores are exact 3-gram Jaccard in (0, 1]
    assert all(0 < s <= 1 for s in pairs.values())


def test_lsh_tfidf_cosine_rescore(spark):
    """score_fn='tfidf_cosine' (the north-star wording: MinHash-LSH
    blocking + TF-IDF cosine scoring): scores match a from-scratch
    Python computation of idf-weighted binary-gram cosine over the
    same dictionary, and the typo pair still links."""
    import math

    from datacapsule_spark.linking import lsh_alias_pairs, normalize_name  # noqa: F401

    raw = [
        "sym:HttpClientFactory",
        "sym:http_client_factory",
        "sym:HttpClientFactry",
        "sym:StreamBufferWriter",
        "sym:CompletelyDifferent",
    ]
    names = spark.createDataFrame([(n,) for n in raw], "name string")
    got = {
        frozenset([r["a"], r["b"]]): r["score"]
        for r in lsh_alias_pairs(
            names, min_rescore=0.3, score_fn="tfidf_cosine"
        ).collect()
    }
    assert frozenset(["sym:HttpClientFactory", "sym:HttpClientFactry"]) in got

    # pure-Python oracle over the same normalized-gram dictionary
    import re

    def norm(s):
        return re.sub(r"[^a-z0-9]", "", s.lower())

    def grams(s):
        g = norm(s)
        return {g[i : i + 3] for i in range(len(g) - 2)}

    dic = {n: grams(n) for n in raw if len(norm(n)) >= 3}
    n_names = len(dic)
    df = {}
    for gs in dic.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    idf = {g: math.log((n_names + 1) / (d + 1)) + 1 for g, d in df.items()}

    def cos(a, b):
        ga, gb = dic[a], dic[b]
        dot = sum(idf[g] ** 2 for g in ga & gb)
        na = math.sqrt(sum(idf[g] ** 2 for g in ga))
        nb = math.sqrt(sum(idf[g] ** 2 for g in gb))
        return dot / (na * nb)

    for pair, score in got.items():
        a, b = sorted(pair)
        assert score == pytest.approx(cos(a, b), abs=1e-9), pair
    # idf weighting: the shared-rare-grams typo pair outranks any
    # pair that would share only common affixes
    assert got[frozenset(["sym:HttpClientFactory", "sym:HttpClientFactry"])] > 0.5
    with pytest.raises(ValueError):
        lsh_alias_pairs(names, score_fn="dice")


def test_pipeline_with_lsh_merges_typos(spark, tmp_path):
    """Integration: use_lsh=True resolves near-miss aliases that the
    exact tier cannot (typo variants collapse to one canonical id)."""
    from datacapsule_spark.pipeline import run_pipeline

    content_a = "# year: 2000\ndef StreamBufferWriter(x):\n    return x\n" + "\n" * 18
    content_b = "# year: 2001\ny = StreamBufferWritter(1)\n" + "\n" * 18  # typo call
    repos = spark.createDataFrame(
        [
            ("o/r", "a.py", "c" * 40, "python", content_a),
            ("o/r", "b.py", "c" * 40, "python", content_b),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    out = run_pipeline(spark, repos, str(tmp_path / "lshwork"), use_lsh=True)
    syms = {
        r["obj"]
        for r in out["triples"].where(F.col("obj_type") == "symbol").collect()
    }
    # both surface forms map to ONE canonical symbol
    assert len(syms) == 1


def test_cosine_topk_batch(spark):
    from datacapsule_spark.vectorize import cosine_topk_batch, hash_embed_text

    items = spark.createDataFrame(
        [
            (f"e{i}", "entity", "t", f"n{i}", hash_embed_text(f"n{i}", 8).tolist())
            for i in range(30)
        ],
        "id string, kind string, entity_type string, name string, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(f"q{i}", hash_embed_text(f"n{i}", 8).tolist()) for i in range(3)],
        "query_id string, qvec array<float>",
    )
    out = cosine_topk_batch(items, queries, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["id"], r["sim"]))
    assert set(by_q) == {"q0", "q1", "q2"}
    for i in range(3):
        ranked = sorted(by_q[f"q{i}"], key=lambda t: -t[1])
        assert ranked[0][0] == f"e{i}"  # each query's own vector wins
        assert ranked[0][1] == pytest.approx(1.0)
        assert len(ranked) == 2
