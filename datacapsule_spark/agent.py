"""ReAct agent loop (X5): observe → decide → act over DatacapsuleAPI.

The reference drives this loop with an LLM (dspy.ReAct over the seven
tools, react_tools.py:183-210 / dspy_inference.py); the LLM stays at
the driver by design (SURVEY §2.9 — prompting is orchestration, not
engine). What IS engine is the loop machinery: tool dispatch,
trajectory accounting, step budget, finish protocol. AgentLoop
implements that with a pluggable policy:

    policy(question, trajectory) -> ("tool_name", kwargs)
                                  | ("finish", answer)

Any LLM policy drops in unchanged. RulePolicy is the shipped
deterministic instance: a pattern router that reproduces the
reference's RECORDED graph interactions (.dbs/interactions.db, the
trainset its own evaluation replays, app.py:554) from the QUESTION
TEXT ALONE — tested end-to-end over the ingested reference graph in
tests/test_interactions_replay.py (answers 122 / 5 / 角鲨目 / 11 /
habit set, matching the recorded responses).
"""

from __future__ import annotations

import re
from typing import Callable

Action = tuple[str, dict | object]


class AgentLoop:
    """Tool-dispatch loop with a step budget and full trajectory log."""

    def __init__(self, api, policy: Callable, max_steps: int = 8):
        self.api = api
        self.policy = policy
        self.max_steps = max_steps

    def run(self, question: str) -> dict:
        trajectory: list[dict] = []
        for _ in range(self.max_steps):
            kind, payload = self.policy(question, trajectory)
            if kind == "finish":
                return {"answer": payload, "trajectory": trajectory}
            observation = getattr(self.api, kind)(**payload)
            trajectory.append(
                {"method": kind, "args": payload, "observation": observation}
            )
        return {"answer": None, "trajectory": trajectory, "truncated": True}


class RulePolicy:
    """Deterministic question router for the marine-species KG question
    shapes in the reference's recorded corpus. Five patterns:

    1. "<taxon>有多少种生物"            → find species under taxon, count
    2. "分布在<region>的<taxon>有多少种生物" → species → batch
       distributions → count those containing region
    3. "<A>属于<B>吗"                   → traverse A up to B's rank,
       answer membership
    4. "与<A>同<rank>的生物有多少种"      → A up to rank, rank down to
       species, count
    5. "<A>有哪些<attribute>"            → traverse A to attribute nodes

    Each __call__ inspects the trajectory length to emit the next step
    — the same observe/act contract an LLM policy has.
    """

    RANKS = "界门纲目科属种"

    def __call__(self, question: str, traj: list[dict]) -> Action:
        q = question.strip().rstrip("？?")
        m = re.match(rf"^分布在(.+?)的(.+?[{self.RANKS}])有多少种生物$", q)
        if m:
            return self._distributed_count(m.group(1), m.group(2), traj)
        m = re.match(rf"^(.+?[{self.RANKS}])有多少种生物$", q)
        if m:
            return self._taxon_count(m.group(1), traj)
        m = re.match(r"^(.+?)属于(.+?)吗$", q)
        if m:
            return self._membership(m.group(1), m.group(2), traj)
        m = re.match(rf"^与(.+?)同([{self.RANKS}])的生物有多少种$", q)
        if m:
            return self._same_rank_count(m.group(1), m.group(2), traj)
        m = re.match(r"^(.+?)有哪些(.+)$", q)
        if m:
            return self._attribute(m.group(1), m.group(2), traj)
        raise ValueError(f"no rule matches question: {question!r}")

    # ------------------------------------------------------- patterns

    def _taxon_count(self, taxon: str, traj) -> Action:
        if not traj:
            return (
                "find_nodes_by_node_type",
                {"start_node": taxon, "node_type": "种"},
            )
        return ("finish", traj[-1]["observation"]["nodes_count"])

    def _distributed_count(self, region: str, taxon: str, traj) -> Action:
        if not traj:
            return (
                "find_nodes_by_node_type",
                {"start_node": taxon, "node_type": "种"},
            )
        if len(traj) == 1:
            species = traj[0]["observation"]["nodes"]
            return (
                "batch_find_nodes_by_node_type",
                {"start_nodes": species, "node_type": "自然分布地"},
            )
        dists = traj[1]["observation"]
        hits = [
            sp
            for sp, res in dists.items()
            if any(region in d for d in res["nodes"])
        ]
        return ("finish", len(hits))

    def _membership(self, a: str, b: str, traj) -> Action:
        rank = b[-1] if b and b[-1] in self.RANKS else "目"
        if not traj:
            return (
                "find_nodes_by_node_type",
                {"start_node": a, "node_type": rank},
            )
        return ("finish", b in traj[-1]["observation"]["nodes"])

    def _same_rank_count(self, a: str, rank: str, traj) -> Action:
        if not traj:
            return (
                "find_nodes_by_node_type",
                {"start_node": a, "node_type": rank},
            )
        if len(traj) == 1:
            holders = traj[0]["observation"]["nodes"]
            if len(holders) != 1:
                return ("finish", None)
            return (
                "find_nodes_by_node_type",
                {"start_node": holders[0], "node_type": "种"},
            )
        return ("finish", traj[-1]["observation"]["nodes_count"])

    def _attribute(self, a: str, attr: str, traj) -> Action:
        if not traj:
            return (
                "find_nodes_by_node_type",
                {"start_node": a, "node_type": attr},
            )
        return ("finish", traj[-1]["observation"]["nodes"])
