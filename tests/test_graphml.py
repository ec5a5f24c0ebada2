"""GraphML reader (S3 parity): round-trip with the writer, and
ingestion of the reference's SHIPPED graph artifact with a census +
NetworkX-checked traversal (VERDICT r01 "What's missing" item 1)."""

from __future__ import annotations

import os

import pytest

REF_GRAPHML = "/root/reference/graph_data_new/graph_entity_relation_detailed.graphml"

# the reference's taxonomy ranks, react_tools.py:19-40
REF_HIERARCHY = {
    "界": 1, "门": 2, "纲": 3, "目": 4, "科": 5, "属": 6, "种": 7,
    "中文学名": 7, "自然分布地": 8, "生活习性": 8, "生物特征": 8,
    "经济性": 8, "保护信息": 8, "食性": 8, "繁殖特征": 8, "行为特征": 8,
    "体型": 8, "体色": 8, "体长": 8, "特殊特征": 8,
}


def test_graphml_roundtrip_write_read(spark, tmp_path):
    from datacapsule_spark.materialize import write_graphml
    from datacapsule_spark.sources.graphml import read_graphml

    nodes = spark.createDataFrame(
        [
            ("repo:a", "repo", "a", None),
            ("dir:a/b", "dir", "a/b", None),
            ("file:a/b/c.py", "file", "a/b/c.py", None),
        ],
        "node_id string, node_type string, name string, attrs map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("repo:a", "contains", "dir:a/b", None, None),
            ("dir:a/b", "contains", "file:a/b/c.py", None, None),
        ],
        "src string, relation string, dst string, repo string, path string",
    )
    path = str(tmp_path / "rt.graphml")
    write_graphml(nodes, edges, path)
    rn, re_ = read_graphml(spark, path)
    got_nodes = {(r["node_id"], r["node_type"], r["name"]) for r in rn.collect()}
    want_nodes = {(r["node_id"], r["node_type"], r["name"]) for r in nodes.collect()}
    assert got_nodes == want_nodes
    got_edges = {(r["src"], r["relation"], r["dst"]) for r in re_.collect()}
    want_edges = {(r["src"], r["relation"], r["dst"]) for r in edges.collect()}
    assert got_edges == want_edges


def test_graphml_size_guard(spark):
    from datacapsule_spark.sources.graphml import read_graphml

    if not os.path.exists(REF_GRAPHML):
        pytest.skip("reference graph artifact not present")
    with pytest.raises(ValueError, match="driver-side"):
        read_graphml(spark, REF_GRAPHML, max_bytes=1024)


@pytest.fixture(scope="module")
def ref_graph(spark):
    if not os.path.exists(REF_GRAPHML):
        pytest.skip("reference graph artifact not present")
    from datacapsule_spark.sources.graphml import read_graphml

    nodes, edges = read_graphml(spark, REF_GRAPHML)
    return nodes.cache(), edges.cache()


def test_reference_graph_census(ref_graph):
    nodes, edges = ref_graph
    # the reference's own artifact: 1291 nodes / 1837 edges
    # (react_tools.py:45-54 loads exactly this file)
    assert nodes.count() == 1291
    assert edges.count() == 1837
    types = {r["node_type"] for r in nodes.select("node_type").distinct().collect()}
    assert {"界", "门", "纲", "目", "科", "属", "种"} <= types
    # domain attrs (拉丁学名 etc.) survive into the attrs map
    from pyspark.sql import functions as F

    with_latin = nodes.where(F.col("attrs")["拉丁学名"].isNotNull()).count()
    assert with_latin > 0


def test_reference_traversal_matches_networkx(spark, ref_graph):
    """G1 over the INGESTED reference artifact: species → its family,
    answer checked against a NetworkX walk of the same file with the
    same rank-monotone semantics."""
    import networkx as nx

    from datacapsule_spark.traverse import find_nodes_by_node_type

    nodes, edges = ref_graph
    g = nx.read_graphml(REF_GRAPHML)
    start, target_type = "蒲氏黏盲鳗", "科"
    target_rank = REF_HIERARCHY[target_type]

    # NetworkX oracle: BFS over undirected neighbors, each hop moving
    # weakly toward the target rank relative to the current node
    def nx_expected():
        out, seen = set(), {start}
        frontier = [start]
        cur_ranks = {start: REF_HIERARCHY.get(g.nodes[start].get("node_type"), 99)}
        while frontier:
            nxt = []
            for u in frontier:
                ur = cur_ranks[u]
                for v in set(g.successors(u)) | set(g.predecessors(u)):
                    vt = g.nodes[v].get("node_type")
                    vr = REF_HIERARCHY.get(vt, 99)
                    lo, hi = sorted((target_rank, ur))
                    if not (lo <= vr <= hi):
                        continue
                    if vt == target_type:
                        out.add(v)
                    if v not in seen:
                        seen.add(v)
                        cur_ranks[v] = vr
                        nxt.append(v)
            frontier = nxt
        return out

    starts = spark.createDataFrame(
        [("q", start)], "query_id string, node_id string"
    )
    got = {
        r["node_id"]
        for r in find_nodes_by_node_type(
            nodes, edges, starts, target_type, hierarchy=REF_HIERARCHY
        ).collect()
    }
    expected = nx_expected()
    assert got == expected
    assert "盲鳗科" in got  # the species' actual family
