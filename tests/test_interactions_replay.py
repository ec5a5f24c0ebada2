"""Replay the reference's RECORDED interactions (.dbs/interactions.db,
the regression corpus its own evaluation uses as trainset, app.py:554)
through DatacapsuleAPI over the INGESTED reference graph — the
strongest reference-parity evidence available (VERDICT r01 item 5).

Of the 12 recorded questions, 5 are pure graph-tool sequences
(find_nodes_by_node_type / batch_find / nodes_count / attribute reads)
and replay exactly; the other 7 route through the remote embedding
model (get_unique_vector_query_results against a proprietary API),
which is driver-side LLM orchestration outside the engine per
SURVEY.md §2.9 — their graph steps are covered by the same tools
replayed here.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

REF_DB = "/root/reference/.dbs/interactions.db"
REF_GRAPHML = "/root/reference/graph_data_new/graph_entity_relation_detailed.graphml"

REF_HIERARCHY = {
    "界": 1, "门": 2, "纲": 3, "目": 4, "科": 5, "属": 6, "种": 7,
    "中文学名": 7, "自然分布地": 8, "生活习性": 8, "生物特征": 8,
    "经济性": 8, "保护信息": 8, "食性": 8, "繁殖特征": 8, "行为特征": 8,
    "体型": 8, "体色": 8, "体长": 8, "特殊特征": 8,
}


@pytest.fixture(scope="module")
def recorded():
    if not os.path.exists(REF_DB):
        pytest.skip("reference interactions.db not present")
    con = sqlite3.connect(REF_DB)
    rows = con.execute(
        "SELECT question, retrievmethod, modelResponse FROM interactions"
    ).fetchall()
    con.close()
    out = []
    for q, rm, resp in rows:
        try:
            steps = json.loads(rm)
        except (TypeError, ValueError):
            steps = []
        out.append({"question": q, "steps": steps, "response": resp})
    assert len(out) == 12
    return out


@pytest.fixture(scope="module")
def ref_api(spark):
    if not os.path.exists(REF_GRAPHML):
        pytest.skip("reference graph artifact not present")
    from datacapsule_spark.api import DatacapsuleAPI
    from datacapsule_spark.sources.graphml import read_graphml

    nodes, edges = read_graphml(spark, REF_GRAPHML)
    return DatacapsuleAPI(spark, nodes, edges, hierarchy=REF_HIERARCHY)


def _steps(recorded, i, method=None):
    steps = recorded[i]["steps"]
    if method:
        return [s for s in steps if s["method"] == method]
    return steps


def test_q0_species_count_in_class(ref_api, recorded):
    """'软骨鱼纲有多少种生物？' — recorded answer: 122 species."""
    step = _steps(recorded, 0, "find_nodes_by_node_type")[0]["args"]
    out = ref_api.find_nodes_by_node_type(
        step["start_node"], step["trget_node_type"]
    )
    assert out["nodes_count"] == 122
    assert "122" in recorded[0]["response"]


def test_q1_order_species_distributed_in_east_sea(ref_api, recorded):
    """'分布在东海的须鲨目有多少种生物？' — the recorded sequence:
    order → its 9 species → batch distributions → 5 in the East Sea."""
    s1 = _steps(recorded, 1, "find_nodes_by_node_type")[0]["args"]
    species = ref_api.find_nodes_by_node_type(
        s1["start_node"], s1["trget_node_type"]
    )["nodes"]
    s2 = _steps(recorded, 1, "batch_find_nodes_by_node_type")[0]["args"]
    # step 1's result must be exactly the batch the agent recorded
    assert sorted(species) == sorted(s2["start_nodes"])
    dists = ref_api.batch_find_nodes_by_node_type(
        s2["start_nodes"], s2["trget_node_type"]
    )
    in_east = {
        sp for sp, res in dists.items() if any("东海" in d for d in res["nodes"])
    }
    # the 5 species the recorded nodes_count step was invoked with
    s3 = _steps(recorded, 1, "nodes_count")[0]["args"]["nodes"]
    assert in_east == set(s3)
    assert len(in_east) == 5 and "5" in recorded[1]["response"]


def test_q2_species_order_membership(ref_api, recorded):
    """'皱皮刺鲨属于角鲨目吗？' — traversal up to 目 must return 角鲨目."""
    steps = _steps(recorded, 2, "find_nodes_by_node_type")
    up = [s for s in steps if s["args"]["trget_node_type"] == "目"][0]["args"]
    out = ref_api.find_nodes_by_node_type(up["start_node"], "目")
    assert out["nodes"] == ["角鲨目"]


def test_q7_same_order_species(ref_api, recorded):
    """'与尖吻蜻鲨同目的生物有多少种？' — up to the order, then down to
    its species (recorded finish: 11 including the start species)."""
    steps = _steps(recorded, 7, "find_nodes_by_node_type")
    order = ref_api.find_nodes_by_node_type(
        steps[0]["args"]["start_node"], steps[0]["args"]["trget_node_type"]
    )
    assert order["nodes"] == ["鼠鲨目"]
    species = ref_api.find_nodes_by_node_type(
        steps[1]["args"]["start_node"], steps[1]["args"]["trget_node_type"]
    )
    assert species["nodes_count"] == 11
    assert "尖吻蜻鲨" in species["nodes"]


def test_q9_species_habits(ref_api, recorded):
    """'公牛真鲨有哪些生活习性？' — the habit nodes the recorded answer
    translates (凶猛/胎生/350m) must all come back from the traversal."""
    step = _steps(recorded, 9, "find_nodes_by_node_type")[0]["args"]
    out = ref_api.find_nodes_by_node_type(
        step["start_node"], step["trget_node_type"]
    )
    text = " ".join(out["nodes"])
    assert out["nodes_count"] == 3
    for marker in ("凶猛", "胎生", "350"):
        assert marker in text


def test_agent_loop_answers_recorded_questions_from_text(ref_api, recorded):
    """X5 closed: the ReAct loop machinery + the deterministic
    RulePolicy reproduce every replayable recorded interaction from
    the QUESTION TEXT ALONE — no recorded tool sequence consulted."""
    from datacapsule_spark.agent import AgentLoop, RulePolicy

    loop = AgentLoop(ref_api, RulePolicy())

    out = loop.run(recorded[0]["question"])  # 软骨鱼纲有多少种生物？
    assert out["answer"] == 122 and "122" in recorded[0]["response"]
    assert [s["method"] for s in out["trajectory"]] == [
        "find_nodes_by_node_type"
    ]

    out = loop.run(recorded[1]["question"])  # 分布在东海的须鲨目…
    assert out["answer"] == 5 and "5" in recorded[1]["response"]
    assert [s["method"] for s in out["trajectory"]] == [
        "find_nodes_by_node_type",
        "batch_find_nodes_by_node_type",
    ]

    out = loop.run(recorded[2]["question"])  # 皱皮刺鲨属于角鲨目吗？
    assert out["answer"] is True

    out = loop.run(recorded[7]["question"])  # 与尖吻蜻鲨同目的生物有多少种？
    assert out["answer"] == 11

    out = loop.run(recorded[9]["question"])  # 公牛真鲨有哪些生活习性？
    text = " ".join(out["answer"])
    for marker in ("凶猛", "胎生", "350"):
        assert marker in text


def test_agent_loop_budget_and_unknown_question(ref_api):
    from datacapsule_spark.agent import AgentLoop, RulePolicy

    import pytest as _pytest

    loop = AgentLoop(ref_api, RulePolicy(), max_steps=0)
    out = loop.run("软骨鱼纲有多少种生物？")
    assert out.get("truncated") and out["answer"] is None
    with _pytest.raises(ValueError):
        AgentLoop(ref_api, RulePolicy()).run("what is the weather")
