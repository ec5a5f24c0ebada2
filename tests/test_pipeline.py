"""Pipeline integration: census invariants, relational pivots, resume."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from datacapsule_spark.lineage import StageTracker
from datacapsule_spark.materialize import node_type_histogram, relation_histogram
from datacapsule_spark.pipeline import run_pipeline


def _run(spark, smoke_repos, tmp_path, **kw):
    return run_pipeline(spark, smoke_repos, str(tmp_path / "work"), **kw)


def test_pipeline_census_and_relational(spark, smoke_repos, tmp_path):
    out = _run(spark, smoke_repos, tmp_path, use_lsh=False)
    nodes, edges = out["nodes"], out["edges"]
    # every edge endpoint exists in nodes (graph closure)
    ids = nodes.select("node_id")
    dangling = (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .join(ids, "node_id", "left_anti")
        .count()
    )
    assert dangling == 0
    # node ids unique
    assert nodes.count() == nodes.select("node_id").distinct().count()
    # census: exactly the 10 predicates, exactly the expected node types
    rels = {r["relation"] for r in relation_histogram(edges).collect()}
    assert rels == {
        "contains", "in_lang", "imports", "defines_function", "defines_class",
        "calls", "authored_by", "named_in", "has_loc", "has_size",
    }
    types = {r["node_type"] for r in node_type_histogram(nodes).collect()}
    assert types <= {
        "repo", "dir", "file", "lang", "module", "symbol",
        "author", "year", "metric", "raw",
    }
    # canonicalization merged planted alias variants: strictly fewer
    # distinct symbols than raw extraction produced
    raw_syms = (
        out["triples_raw"].where(F.col("obj_type") == "symbol")
        .select("obj").distinct().count()
    )
    canon_syms = (
        out["triples"].where(F.col("obj_type") == "symbol")
        .select("obj").distinct().count()
    )
    assert canon_syms < raw_syms
    # relational layer: entities 1:1 with files; facts all numeric
    assert out["entities"].count() == 500
    assert out["entities"].select("entity_id").distinct().count() == 500
    assert out["numerical_facts"].where(F.col("value").isNull()).count() == 0
    # sentinel authors filtered (P1)
    assert (
        out["entities"].where(F.col("author").isin("unknown", "n/a")).count() == 0
    )
    # entity_mentions FK joins to entities (distributions.species_id →
    # species.id shape, ADVICE r01): zero orphan mention rows
    orphans = (
        out["entity_mentions"]
        .join(out["entities"], "entity_id", "left_anti")
        .count()
    )
    assert orphans == 0
    assert "target" in out["entity_mentions"].columns


def test_pipeline_resume_identical_output(spark, smoke_repos, tmp_path):
    """Kill-after-stage-k resume: invalidate a mid-pipeline stage and
    re-run — outputs must be identical, no duplicate triples."""
    work = tmp_path / "work2"
    out1 = run_pipeline(spark, smoke_repos, str(work), use_lsh=False)
    t1 = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in out1["triples"].collect()
    )
    # simulate mid-pipeline kill: canonicalize and later stages lost
    tracker = StageTracker(spark, str(work))
    for stage in ["30_canonicalize", "40_canon_edges", "50_nodes"]:
        tracker.invalidate(stage)
    out2 = run_pipeline(spark, smoke_repos, str(work), use_lsh=False)
    t2 = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in out2["triples"].collect()
    )
    assert t1 == t2
    assert len(t2) == len(set(t2)), "resume must not duplicate triples"
    # lineage table recorded every stage
    stages = {r["stage"] for r in out2["lineage"].collect()}
    assert {"10_extract", "30_canonicalize", "40_canon_edges", "50_nodes"} <= stages


def test_pipeline_file_dedup(spark, smoke_repos, tmp_path):
    """dedup_files drops byte-identical contents pre-extraction."""
    from pyspark.sql import functions as F

    dup = smoke_repos.limit(10).select(
        F.concat(F.lit("dup/"), "repo").alias("repo"),
        "path", "commit", "lang", "content",
    )
    with_dups = smoke_repos.unionByName(dup)
    out = run_pipeline(
        spark, with_dups, str(tmp_path / "wd"), use_lsh=False, dedup_files=True
    )
    # the 10 duplicated contents collapse: exactly 500 distinct files
    n_files = (
        out["triples"].where(F.col("pred") == "has_loc").select("subj").distinct().count()
    )
    assert n_files == 500
    # keep = lexicographically first (repo, path): originals win over "dup/..."?
    # 'dup/org...' < 'org...' lexicographically, so the dup copies win —
    # semantics is deterministic min, not original-preference
    kept_dup = (
        out["triples"].where(F.col("repo").startswith("dup/")).count()
    )
    assert kept_dup > 0


def test_pipeline_near_dedup(spark, smoke_repos, tmp_path):
    """dedup_near drops MinHash-LSH near-duplicate files (one-token
    patches of vendored copies) that byte-hash dedup misses."""
    from pyspark.sql import functions as F

    near = smoke_repos.limit(10).select(
        F.concat(F.lit("vendored/"), "repo").alias("repo"),
        "path", "commit", "lang",
        # one appended token: different bytes, ~identical shingles
        F.concat("content", F.lit("\npatched = True\n")).alias("content"),
    )
    with_near = smoke_repos.unionByName(near)
    base = run_pipeline(
        spark, with_near, str(tmp_path / "wd_base"), use_lsh=False,
        dedup_files=True,  # byte-hash alone cannot drop the patched copies
    )
    n_files_base = (
        base["triples"].where(F.col("pred") == "has_loc")
        .select("subj").distinct().count()
    )
    assert n_files_base == 510

    out = run_pipeline(
        spark, with_near, str(tmp_path / "wd_near"), use_lsh=False,
        dedup_near=True,
    )
    n_files = (
        out["triples"].where(F.col("pred") == "has_loc")
        .select("subj").distinct().count()
    )
    assert n_files == 500  # each near-dup cluster keeps one member


def test_pipeline_skips_completed_stages(spark, smoke_repos, tmp_path, monkeypatch):
    work = tmp_path / "work3"
    run_pipeline(spark, smoke_repos, str(work), use_lsh=False)
    # second run must not re-extract: poison the extractor and rerun
    import datacapsule_spark.pipeline as P

    def boom(*a, **k):
        raise AssertionError("extract re-ran despite completed stage")

    monkeypatch.setattr(P, "extract_triples", boom)
    out = run_pipeline(spark, smoke_repos, str(work), use_lsh=False)
    assert out["triples"].count() > 0


def test_split_stream_canon_equals_full_dedup(spark, smoke_repos):
    """canonical_edges shuffles only the collision-prone stream — its
    output must equal the brute-force rewrite-everything-then-dedup,
    including the alias-collision case (a file referencing BOTH
    variants of a linked name) and the contains-chain duplicates."""
    from datacapsule_spark.canonicalize import apply_canonical, connected_components
    from datacapsule_spark.extract import extract_triples
    from datacapsule_spark.linking import alias_pairs
    from datacapsule_spark.materialize import canonical_edges, dedup_triples

    triples = extract_triples(smoke_repos.limit(120)).drop(
        "commit", "content_sha256"
    ).localCheckpoint(eager=True)
    names = (
        triples.where(F.col("obj_type") == "symbol")
        .select(F.col("obj").alias("name"))
        .distinct()
    )
    mapping = connected_components(
        alias_pairs(names, use_lsh=False), "a", "b"
    ).localCheckpoint(eager=True)
    assert mapping.count() > 0  # the corpus plants alias variants

    split = sorted(
        map(tuple, canonical_edges(triples, mapping).collect())
    )
    full = sorted(
        map(
            tuple,
            dedup_triples(
                apply_canonical(triples, mapping, ["subj", "obj"])
            ).collect(),
        )
    )
    assert split == full
    assert len(split) == len({(s, p, o) for s, p, o, *_ in split})


def test_iceberg_branch_is_code_not_prose(spark, tmp_path):
    """The iceberg=True paths exist as executable branches: with no
    catalog on the session (this sandbox) they must fail fast with
    actionable guidance; with a catalog they run writeTo/MERGE INTO
    (exercised on real clusters, skipped here)."""
    import pytest as _pytest

    from datacapsule_spark.materialize import iceberg_available, write_graph

    nodes = spark.createDataFrame(
        [("a", "repo", "a", None)],
        "node_id string, node_type string, name string, attrs map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "contains", "a", None, None)],
        "src string, relation string, dst string, repo string, path string",
    )
    if iceberg_available(spark):
        write_graph(nodes, edges, "local.kg_test", iceberg=True)
        assert spark.table("local.kg_test.nodes").count() == 1
        return
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_graph(nodes, edges, "local.kg_test", iceberg=True)
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        StageTracker(spark, str(tmp_path / "ice")).merge_lineage_iceberg(
            "local.kg_test.lineage"
        )


def test_stale_checkpoint_invalidated_on_changed_config(
    spark, smoke_repos, tmp_path, monkeypatch
):
    """ADVICE r01 (medium): a rerun with a toggled flag or a different
    run_id must RE-EXECUTE the affected stages, not silently return the
    stale boundary from the same work_dir."""
    import datacapsule_spark.pipeline as P

    work = str(tmp_path / "work4")
    run_pipeline(spark, smoke_repos, work, use_lsh=False)

    calls = {"link": 0}
    orig = P.alias_pairs

    def counting(*a, **k):
        calls["link"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(P, "alias_pairs", counting)
    # same config → resumes, linking NOT re-run
    run_pipeline(spark, smoke_repos, work, use_lsh=False)
    assert calls["link"] == 0
    # toggled use_lsh → 20_link (and downstream) re-execute
    run_pipeline(spark, smoke_repos, work, use_lsh=True)
    assert calls["link"] == 1
    # different run_id → everything re-executes (extract marker invalid)
    def boom(*a, **k):
        raise AssertionError("sentinel: extract re-ran")

    monkeypatch.setattr(P, "extract_triples", boom)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="sentinel"):
        run_pipeline(spark, smoke_repos, work, use_lsh=False, run_id="other")


def test_pipeline_quality_gate(spark, smoke_repos, tmp_path):
    """min_code_quality drops low-quality files before extraction; the
    gate is a pure filter (no extra Exchange on the scan side)."""
    from pyspark.sql import functions as F

    from datacapsule_spark.operators.code_quality import quality_gate
    from datacapsule_spark.plans.audit import explain_report

    junk = smoke_repos.limit(5).select(
        "repo",
        F.concat(F.lit("gen/"), "path").alias("path"),
        "commit", "lang",
        F.concat(F.lit("# @generated DO NOT EDIT\n"), "content").alias("content"),
    )
    with_junk = smoke_repos.unionByName(junk)
    out = run_pipeline(
        spark, with_junk, str(tmp_path / "wq"), use_lsh=False,
        min_code_quality=0.5,
    )
    gen_files = out["triples"].where(F.col("path").startswith("gen/")).count()
    assert gen_files == 0  # autogen files never reach extraction
    n_files = (
        out["triples"].where(F.col("pred") == "has_loc")
        .select("subj").distinct().count()
    )
    assert n_files == 500
    # plan shape: the gate adds zero exchanges over the bare scan
    r = explain_report(quality_gate(smoke_repos, 0.5))
    assert r.exchanges == 0, r.text


def test_incremental_ingest_equals_full_rebuild(spark, smoke_repos, tmp_path):
    """run_incremental(delta) over a base run must produce the same
    canonical graph as a from-scratch run over base ∪ delta, extract
    only the delta, and resume idempotently."""
    import datacapsule_spark.pipeline as P
    from datacapsule_spark.pipeline import run_incremental

    is_delta = (F.abs(F.xxhash64("repo", "path")) % 5) == 0
    base = smoke_repos.where(~is_delta)
    delta = smoke_repos.where(is_delta)
    assert 0 < delta.count() < smoke_repos.count()

    work = str(tmp_path / "inc")
    run_pipeline(spark, base, work, use_lsh=False)
    out_inc = run_incremental(spark, delta, work, use_lsh=False)

    full = run_pipeline(
        spark, smoke_repos, str(tmp_path / "full"), use_lsh=False
    )
    t_inc = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in out_inc["triples"].collect()
    )
    t_full = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in full["triples"].collect()
    )
    assert t_inc == t_full
    n_inc = {r["node_id"] for r in out_inc["nodes"].collect()}
    n_full = {r["node_id"] for r in full["nodes"].collect()}
    assert n_inc == n_full

    # resubmitting the SAME delta is a pure resume: nothing re-extracts
    import pytest as _pytest

    def boom(*a, **k):
        raise AssertionError("extraction re-ran on an unchanged delta set")

    orig = P.extract_triples
    P.extract_triples = boom
    try:
        again = run_incremental(spark, delta, work, use_lsh=False)
        assert again["triples"].count() == len(t_inc)
    finally:
        P.extract_triples = orig

    # without a base run, incremental refuses
    with _pytest.raises(RuntimeError):
        run_incremental(spark, delta, str(tmp_path / "nobase"), use_lsh=False)


def test_incremental_updated_file_supersedes(spark, smoke_repos, tmp_path):
    """A delta re-shipping an existing (repo, path) replaces that
    file's triples (newest wins) — no duplicate per-file rows; and two
    DIFFERENT in-memory deltas get distinct stage keys (content
    checksum, not schema-only identity)."""
    from pyspark.sql import functions as F

    from datacapsule_spark.pipeline import run_incremental

    work = str(tmp_path / "upd")
    run_pipeline(spark, smoke_repos, work, use_lsh=False)

    # delta 1: updated versions of 10 existing files (content changed)
    upd = (
        smoke_repos.limit(10)
        .select(
            "repo", "path", "commit", "lang",
            F.concat("content", F.lit("\nupdated_marker = 1\n")).alias("content"),
        )
        .localCheckpoint(eager=True)  # in-memory: schema-only signature
    )
    out1 = run_incremental(spark, upd, work, use_lsh=False)
    # per-file uniqueness invariant: exactly one has_loc triple per file
    dup_files = (
        out1["triples_raw"].where(F.col("pred") == "has_loc")
        .groupBy("subj").count().where(F.col("count") > 1).count()
    )
    assert dup_files == 0
    # the surviving triples for an updated file carry the NEW content's
    # sha256 (newest wins), not the base version's
    import hashlib

    first = upd.orderBy("repo", "path").first()
    want_sha = hashlib.sha256(first["content"].encode()).hexdigest()
    got_shas = {
        r["content_sha256"]
        for r in out1["triples_raw"]
        .where((F.col("repo") == first["repo"]) & (F.col("path") == first["path"]))
        .select("content_sha256")
        .distinct()
        .collect()
    }
    assert got_shas == {want_sha}

    # delta 2: in-memory, SAME schema, different rows — must not
    # collide with delta 1's stage key
    brand_new = (
        smoke_repos.limit(5)
        .select(
            F.concat(F.lit("late/"), "repo").alias("repo"),
            "path", "commit", "lang", "content",
        )
        .localCheckpoint(eager=True)
    )
    out2 = run_incremental(spark, brand_new, work, use_lsh=False)
    late = (
        out2["triples_raw"].where(F.col("repo").startswith("late/"))
        .select("path").distinct().count()
    )
    assert late == 5


def test_incremental_quality_gate_change_invalidates_downstream(
    spark, smoke_repos, tmp_path
):
    """Re-submitting an already-ingested delta with a DIFFERENT
    --min-code-quality must rebuild stages 20-70, not resume the stale
    boundaries built from the previously-gated triples (the downstream
    params hash now folds min_code_quality in)."""
    from pyspark.sql import functions as F

    from datacapsule_spark.pipeline import run_incremental

    small = smoke_repos.where(F.abs(F.xxhash64("repo", "path")) % 10 == 0)
    work = str(tmp_path / "qg")
    run_pipeline(spark, small, work, use_lsh=False)

    junk = small.limit(3).select(
        "repo",
        F.concat(F.lit("gen/"), "path").alias("path"),
        "commit", "lang",
        F.concat(F.lit("# @generated DO NOT EDIT\n"), "content").alias("content"),
    ).localCheckpoint(eager=True)

    gated = run_incremental(
        spark, junk, work, use_lsh=False, min_code_quality=0.5
    )
    assert (
        gated["triples"].where(F.col("path").startswith("gen/")).count() == 0
    )
    # same delta, gate removed: the autogen files must now flow all the
    # way through canonicalization into the FINAL triples — a stale
    # downstream resume would still show zero
    ungated = run_incremental(
        spark, junk, work, use_lsh=False, min_code_quality=None
    )
    assert (
        ungated["triples"].where(F.col("path").startswith("gen/")).count() > 0
    )
