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
        if not m:
            raise ValueError(
                f"bad motif term {t!r} — expected '(a)-[e]->(b)' or '!(a)-[]->(b)'"
            )
        neg, a, e, pred, b = m.groups()
        if neg and e:
            raise ValueError(f"negated term {t!r} cannot bind an edge name")
        parsed.append((bool(neg), a, e, pred.strip() if pred else None, b))

    pos = [p for p in parsed if not p[0]]
    negs = [p for p in parsed if p[0]]
    if not pos:
        raise ValueError("motif needs at least one positive term")

    vert_col: dict[str, str] = {}
    edge_col: dict[str, str] = {}
    result = None
    for i, (_, a, e, pred, b) in enumerate(pos):
        if e:
            if e in edge_col or e in vert_col:
                raise ValueError(f"duplicate name {e!r} in pattern")
            edge_col[e] = f"__rel{i}"
        cols = [
            F.col(src).alias(f"__src{i}"),
            F.col(dst).alias(f"__dst{i}"),
        ]
        if e:
            cols.append(F.col(relation).alias(f"__rel{i}"))
        term_src = edges
        if pred is not None:
            # relation predicate: filtered at the term's scan, so the
            # join sees only the typed slice (predicate pushdown keeps
            # this pre-shuffle)
            term_src = term_src.where(F.col(relation) == pred)
        term_df = term_src.select(*cols)  # pruned projection per term
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

    for j, (_, a, _e, pred, b) in enumerate(negs):
        if a not in vert_col or b not in vert_col:
            raise ValueError(
                f"negated term !({a})-[]->({b}) must use vertices bound by "
                f"a positive term"
            )
        neg_src = edges
        if pred is not None:
            neg_src = neg_src.where(F.col(relation) == pred)
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
