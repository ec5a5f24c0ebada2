"""Physical-plan audit: assert the plan properties that matter at 100 TB.

A correct result with a bad plan is a latent outage at scale — these
helpers turn "did Catalyst do what we expect" into testable assertions
(used in tests/test_plans.py and ad-hoc during development):

- filters reached the scan (PushedFilters non-empty),
- the scan is column-pruned (ReadSchema only carries what's used),
- small dims broadcast instead of shuffling (BroadcastHashJoin),
- top-k compiled to TakeOrderedAndProject (no global sort),
- no CartesianProduct snuck in.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    cartesian_products: int = 0
    nested_loop_joins: int = 0
    take_ordered: int = 0
    wholestage_codegen: int = 0
    exchanges: int = 0
    windows: int = 0

    def scan_columns(self) -> list[set[str]]:
        out = []
        for rs in self.read_schemas:
            out.append(set(re.findall(r"(\w+):", rs)))
        return out


def explain_report(df: DataFrame) -> PlanReport:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()

    def nodes(name: str) -> int:
        # count numbered detail entries only — the operator tree AND the
        # details section both carry the node name (would double-count)
        return len(re.findall(rf"^\(\d+\) {name}\b", text, re.M))

    return PlanReport(
        text=text,
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[(.*?)\]", text) if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: struct<(.*?)>", text),
        broadcast_joins=nodes("BroadcastHashJoin"),
        sort_merge_joins=nodes("SortMergeJoin"),
        shuffled_hash_joins=nodes("ShuffledHashJoin"),
        cartesian_products=nodes("CartesianProduct"),
        nested_loop_joins=nodes("BroadcastNestedLoopJoin"),
        take_ordered=nodes("TakeOrderedAndProject"),
        # formatted mode stars codegen'd operators ("* Filter (3)")
        wholestage_codegen=len(re.findall(r"^\s*[+:-]*\s*\* ", text, re.M)),
        exchanges=nodes("Exchange"),
        windows=nodes("Window"),
    )


def assert_plan(
    df: DataFrame,
    pushed_filters: bool | None = None,
    max_scan_columns: int | None = None,
    broadcast_joins_at_least: int | None = None,
    take_ordered: bool | None = None,
    no_cartesian: bool = True,
    max_exchanges: int | None = None,
) -> PlanReport:
    """Raise AssertionError (with the full plan text) when a property
    the caller depends on is missing."""
    r = explain_report(df)

    def fail(msg):
        raise AssertionError(f"{msg}\n--- plan ---\n{r.text}")

    if pushed_filters and not r.pushed_filters:
        fail("expected filters pushed to the scan, found none")
    if max_scan_columns is not None:
        for cols in r.scan_columns():
            if len(cols) > max_scan_columns:
                fail(
                    f"scan reads {len(cols)} columns ({sorted(cols)}), "
                    f"expected ≤ {max_scan_columns} — projection not pruned"
                )
    if broadcast_joins_at_least is not None and r.broadcast_joins < broadcast_joins_at_least:
        fail(
            f"expected ≥{broadcast_joins_at_least} broadcast joins, "
            f"got {r.broadcast_joins} (SMJ={r.sort_merge_joins})"
        )
    if take_ordered and not r.take_ordered:
        fail("expected top-k to compile to TakeOrderedAndProject")
    if no_cartesian and r.cartesian_products:
        fail("CartesianProduct in plan")
    if max_exchanges is not None and r.exchanges > max_exchanges:
        fail(f"{r.exchanges} exchanges > budget {max_exchanges}")
    return r
