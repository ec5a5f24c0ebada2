"""GraphFrames-style motif finding over an edge DataFrame (SURVEY §2.8
extension, beyond the reference — the declarative pattern-match API the
reference's imperative NetworkX walks approximate one query at a time).

Pattern grammar (a practical subset of GraphFrames' `find`):

    "(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)"

- a positive term binds vertex names and an optional edge name; a
  vertex name that repeats across terms unifies them (equi-join on the
  node id); `[]` is an anonymous edge (matched, not output); `()` is an
  anonymous vertex (fresh each time, never joined)
- an edge may carry a relation predicate `[e:contains]` / `[:contains]`
  — the term matches only edges whose relation column equals the value
  (filter pushed into the term's scan, BEFORE the join — the typed
  traversals of the reference, e.g. its 包含-only chains
  react_tools.py:121-129, are one such term each). The value runs to
  the closing bracket, so multi-byte relation names work
- a negated term `!(x)-[]->(y)` requires the ABSENCE of any x→y edge
  (left_anti join); `!(x)-[:rel]->(y)` the absence of an x→y edge with
  that relation; it must reference already-bound vertices and cannot
  name an edge
- a VARIABLE-LENGTH term `(a)-[*1..3]->(b)` (also `[*..3]`, `[*2]`
  exact, `[*2..4:rel]` typed) matches when a directed WALK of length
  in [lo, hi] exists from a to b, every edge satisfying the relation
  predicate — bounded typed reachability, the general form of the
  reference's hierarchy walks (react_tools.py:92-181 expand level by
  level under one relation). Walk semantics (nodes may repeat; the
  pair set is deduplicated per level), NOT Cypher's edge-distinct
  trails — at reachability granularity the two coincide, and walks
  avoid tracking per-path edge sets at scale. The upper bound is
  mandatory (an unbounded closure is a different operator —
  canonicalize.connected_components); lo >= 1. A var-length term
  cannot bind an edge name (there is no single edge to bind) but CAN
  be negated: `!(a)-[*1..3:rel]->(b)` = no such walk exists
- result: one column per named vertex (the node id) and one per named
  edge (the relation), one row per distinct binding — like GraphFrames,
  bindings are NOT required to be vertex-distinct; add `.where` filters
  for that

Execution is a chain of equi-joins over the edge table, one per
positive term — exactly the shape Catalyst optimizes (broadcast when a
side is small, SMJ otherwise, AQE re-plans at runtime). Each join keys
on the already-bound vertex columns, so a k-term path motif is k-1
shuffles of the (pruned) edge projection, never a cartesian unless the
pattern itself is disconnected (allowed, as in GraphFrames, but you
almost never want it).

Reference parity: react_tools.py's fixed traversals (find_nodes_by_
node_type etc., see traverse.py) are each ONE hard-coded motif; this
operator is the general form.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(
    r"^\s*(!?)\s*\((\w*)\)\s*-\s*\[(\w*)(?::([^\]]+))?\]\s*->\s*\((\w*)\)\s*$"
)
_VTERM = re.compile(
    r"^\s*(!?)\s*\((\w*)\)\s*-\s*\[\s*\*\s*(\d+)?\s*(\.\.)?\s*(\d+)?"
    r"\s*(?::([^\]]+))?\]\s*->\s*\((\w*)\)\s*$"
)


def _parse_varlen_bounds(t: str, n1, dots, n2) -> tuple[int, int]:
    if dots:
        lo = int(n1) if n1 else 1
        if not n2:
            raise ValueError(
                f"var-length term {t!r} needs an upper bound — an unbounded "
                f"closure is connected_components' job, not a motif join"
            )
        hi = int(n2)
    else:
        if not n1 or n2:
            raise ValueError(f"bad var-length bounds in {t!r}")
        lo = hi = int(n1)
    if lo < 1 or hi < lo:
        raise ValueError(f"bad var-length bounds in {t!r}: need 1 <= lo <= hi")
    return lo, hi


def _bounded_reach(
    edges: DataFrame, src: str, dst: str, lo: int, hi: int
) -> DataFrame:
    """Distinct (a, b) pairs connected by a directed walk of length in
    [lo, hi] over `edges` (already relation-filtered by the caller).
    One dedup'd join per level — per-level distinct keeps the frontier
    a PAIR SET (bounded by V²) instead of a walk multiset (which grows
    as paths multiply); lazy localCheckpoint per level truncates the
    lineage the same way the BFS machinery does (traverse.py)."""
    base = (
        edges.select(F.col(src).alias("_ra"), F.col(dst).alias("_rb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = base
    acc = base if lo <= 1 else None
    for depth in range(2, hi + 1):
        step = base.select(
            F.col("_ra").alias("_rb"), F.col("_rb").alias("_rc")
        )
        cur = (
            cur.join(step.hint("shuffle_hash"), "_rb")  # both path-scale
            .select(F.col("_ra"), F.col("_rc").alias("_rb"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        if depth >= lo:
            acc = cur if acc is None else acc.unionAll(cur)
    return acc.distinct() if hi > lo else acc


def find_motif(
    edges: DataFrame,
    pattern: str,
    src: str = "src",
    dst: str = "dst",
    relation: str = "relation",
) -> DataFrame:
    """Match `pattern` against edges(src, relation, dst); see module
    docstring for the grammar."""
    terms = [t for t in pattern.split(";") if t.strip()]
    if not terms:
        raise ValueError("empty motif pattern")
    parsed = []
    for t in terms:
        m = _TERM.match(t)
        if m:
            neg, a, e, pred, b = m.groups()
            if neg and e:
                raise ValueError(f"negated term {t!r} cannot bind an edge name")
            parsed.append(
                (bool(neg), a, e, pred.strip() if pred else None, b, None)
            )
            continue
        vm = _VTERM.match(t)
        if vm:
            neg, a, n1, dots, n2, pred, b = vm.groups()
            bounds = _parse_varlen_bounds(t, n1, dots, n2)
            parsed.append(
                (bool(neg), a, "", pred.strip() if pred else None, b, bounds)
            )
            continue
        raise ValueError(
            f"bad motif term {t!r} — expected '(a)-[e]->(b)', "
            f"'!(a)-[]->(b)' or '(a)-[*1..3]->(b)'"
        )

    pos = [p for p in parsed if not p[0]]
    negs = [p for p in parsed if p[0]]
    if not pos:
        raise ValueError("motif needs at least one positive term")

    vert_col: dict[str, str] = {}
    edge_col: dict[str, str] = {}
    result = None
    for i, (_, a, e, pred, b, bounds) in enumerate(pos):
        if e:
            if e in edge_col or e in vert_col:
                raise ValueError(f"duplicate name {e!r} in pattern")
            edge_col[e] = f"__rel{i}"
        term_src = edges
        if pred is not None:
            # relation predicate: filtered at the term's scan, so the
            # join sees only the typed slice (predicate pushdown keeps
            # this pre-shuffle); for var-length terms EVERY edge of the
            # walk must satisfy it (the closure runs over the slice)
            term_src = term_src.where(F.col(relation) == pred)
        if bounds is not None:
            lo, hi = bounds
            term_df = _bounded_reach(term_src, src, dst, lo, hi).select(
                F.col("_ra").alias(f"__src{i}"),
                F.col("_rb").alias(f"__dst{i}"),
            )
        else:
            cols = [
                F.col(src).alias(f"__src{i}"),
                F.col(dst).alias(f"__dst{i}"),
            ]
            if e:
                cols.append(F.col(relation).alias(f"__rel{i}"))
            term_df = term_src.select(*cols)  # pruned projection per term
        if a and a == b:
            # self-referential term, e.g. '(a)-[]->(a)' (self-loop) or
            # '(a)-[*1..3]->(a)' (cycle membership): the src==dst
            # equality must hold INSIDE the term — the name-unification
            # loop below only fires for names already bound by EARLIER
            # terms, so without this a first-binding self-term would
            # silently match every edge/walk
            term_df = term_df.where(
                F.col(f"__src{i}") == F.col(f"__dst{i}")
            )
        if result is None:
            result = term_df
        else:
            cond = None
            for name, col in ((a, f"__src{i}"), (b, f"__dst{i}")):
                if name and name in vert_col:
                    c = F.col(vert_col[name]) == F.col(col)
                    cond = c if cond is None else (cond & c)
            if cond is None:
                # disconnected pattern — legal, but a cross product
                result = result.crossJoin(term_df)
            else:
                result = result.join(term_df, cond)
        if a and a not in vert_col:
            if a in edge_col:
                raise ValueError(f"duplicate name {a!r} in pattern")
            vert_col[a] = f"__src{i}"
        if b and b not in vert_col:
            if b in edge_col:
                raise ValueError(f"duplicate name {b!r} in pattern")
            vert_col[b] = f"__dst{i}"

    for j, (_, a, _e, pred, b, bounds) in enumerate(negs):
        if a not in vert_col or b not in vert_col:
            raise ValueError(
                f"negated term !({a})-[]->({b}) must use vertices bound by "
                f"a positive term"
            )
        neg_src = edges
        if pred is not None:
            neg_src = neg_src.where(F.col(relation) == pred)
        if bounds is not None:
            ne = _bounded_reach(neg_src, src, dst, *bounds).select(
                F.col("_ra").alias(f"__na{j}"), F.col("_rb").alias(f"__nb{j}")
            )
        else:
            ne = neg_src.select(
                F.col(src).alias(f"__na{j}"), F.col(dst).alias(f"__nb{j}")
            )
        result = result.join(
            ne,
            (F.col(vert_col[a]) == F.col(f"__na{j}"))
            & (F.col(vert_col[b]) == F.col(f"__nb{j}")),
            "left_anti",
        )

    out = [F.col(c).alias(v) for v, c in vert_col.items()]
    out += [F.col(c).alias(e) for e, c in edge_col.items()]
    return result.select(*out)
