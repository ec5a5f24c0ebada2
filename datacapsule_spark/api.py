"""Serving facade: the reference's agent-tool surface over Spark tables.

One class, same tool names and semantics as the reference's DSPy ReAct
toolset (dspy_inference.py:37-154) and NL2SQL envelope
(dspy_query_db.py:54-158), so a user of the reference can switch
engines and keep their call sites:

- find_nodes_by_node_type      (dspy_inference.py:37-62  → G1)
- batch_find_nodes_by_node_type(dspy_inference.py:64-78  → G2; the
  reference passes the whole list where one node was meant — bug not
  replicated, each start node is traversed independently)
- get_unique_vector_query_results (dspy_inference.py:80-123 → G7,
  filter-before-rank fix documented in SURVEY §2.8)
- get_node_attribute           (dspy_inference.py:125-133 → G3)
- get_adjacent_node_descriptions (dspy_inference.py:134-142 → G4)
- nodes_count                  (dspy_inference.py:144-154 → A1)
- query_database               (dspy_query_db.py:54-158 → S5; the LLM
  NL→SQL step stays at the driver — this engine executes the SQL with
  the same markdown-fence stripping and result envelope)
- format_results               (dspy_query_db.py:170-204 → A8 max-width
  table rendering of the envelope)
- save_interaction / load_interactions (app.py:253-275 saved-data JSON
  → S9, re-expressed as O(record) atomic per-id files, DataFrame-loadable)

The X5 ReAct loop itself is LLM orchestration, not engine code; these
are the engine entry points it calls.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .traverse import find_nodes_by_node_type as _bfs
from .traverse import get_adjacent_descriptions
from .vectorize import cosine_topk, hash_embed_text


class DatacapsuleAPI:
    """Query layer over a materialized warehouse (nodes/edges parquet
    from pipeline.run_pipeline + optional embeddings)."""

    def __init__(
        self,
        spark: SparkSession,
        nodes: DataFrame,
        edges: DataFrame,
        embeddings: DataFrame | None = None,
        hierarchy: dict[str, int] | None = None,
    ):
        self.spark = spark
        # serving caches the graph, mirroring the reference's in-RAM
        # load (react_tools.py:45-65) — but distributed, not driver-RAM
        self.nodes = nodes.cache()
        self.edges = edges.cache()
        self.embeddings = embeddings
        # node_type → rank map for traversal pruning; None = the code-KG
        # taxonomy. Pass the reference's NODE_HIERARCHY to serve an
        # ingested marine-species graph (tests/test_interactions_replay.py)
        self.hierarchy = hierarchy

    @classmethod
    def from_warehouse(cls, spark: SparkSession, base_dir: str) -> "DatacapsuleAPI":
        nodes = spark.read.parquet(f"{base_dir}/nodes")
        edges = spark.read.parquet(f"{base_dir}/edges")
        return cls(spark, nodes, edges)

    # ------------------------------------------------------ graph tools

    def find_nodes_by_node_type(self, start_node: str, node_type: str) -> dict:
        """Tool 1: nodes of `node_type` reachable from `start_node`."""
        starts = self.spark.createDataFrame(
            [("q", start_node)], "query_id string, node_id string"
        )
        hits = _bfs(self.nodes, self.edges, starts, node_type, hierarchy=self.hierarchy)
        names = sorted(r["node_id"] for r in hits.collect())
        return {"nodes_count": len(names), "nodes": names}

    def batch_find_nodes_by_node_type(
        self, start_nodes: list[str], node_type: str
    ) -> dict:
        """Tool 2: one traversal DAG for many starts (set-oriented)."""
        starts = self.spark.createDataFrame(
            [(s, s) for s in start_nodes], "query_id string, node_id string"
        )
        hits = _bfs(self.nodes, self.edges, starts, node_type, hierarchy=self.hierarchy)
        out: dict[str, list[str]] = {s: [] for s in start_nodes}
        for r in hits.collect():
            out[r["query_id"]].append(r["node_id"])
        return {s: {"nodes_count": len(v), "nodes": sorted(v)} for s, v in out.items()}

    def get_node_attribute(self, node_id: str) -> dict | None:
        """Tool 4: full attr dict of one node."""
        row = self.nodes.where(F.col("node_id") == node_id).first()
        if row is None:
            return None
        d = row.asDict()
        d["attrs"] = dict(d.get("attrs") or {})
        return d

    def get_adjacent_node_descriptions(self, names: list[str]) -> list[str]:
        """Tool 5: distinct 1-hop neighbor names for the given nodes."""
        df = self.spark.createDataFrame([(n,) for n in names], "node_id string")
        rows = get_adjacent_descriptions(self.nodes, self.edges, df).collect()
        seen: list[str] = []
        for r in rows:
            for d in r["descriptions"]:
                if d not in seen:
                    seen.append(d)
        return sorted(seen)

    def nodes_count(self, node_type: str | None = None) -> int:
        """Tool 6."""
        df = self.nodes
        if node_type is not None:
            df = df.where(F.col("node_type") == node_type)
        return df.count()

    # ----------------------------------------------------- vector tool

    def get_unique_vector_query_results(
        self,
        query_text: str,
        node_type: str | None = None,
        top_k: int = 1,
        better_than_threshold: float = 0.7,
    ) -> list[dict]:
        """Tool 3: embed the query, cosine-score, filter type+threshold
        BEFORE ranking (the reference truncates to k=100 first,
        react_tools.py:313-316 — deliberate fix), return top_k."""
        if self.embeddings is None:
            raise ValueError("no embeddings table attached")
        q = hash_embed_text(query_text, dim=len(self.embeddings.first()["embedding"]))
        rows = cosine_topk(
            self.embeddings, q, k=top_k, entity_type=node_type,
            threshold=better_than_threshold,
        ).collect()
        return [
            {"id": r["id"], "entity_type": r["entity_type"], "name": r["name"],
             "similarity": float(r["sim"])}
            for r in rows
        ]

    # -------------------------------------------------------- SQL tool

    def query_database(self, sql: str) -> dict:
        """S5/X4 contract: execute (possibly LLM-generated) SQL against
        the registered tables; same fence-strip (dspy_query_db.py:
        117-120) and result envelope (:141-158) as the reference."""
        cleaned = re.sub(r"```sql\s*", "", sql)
        cleaned = re.sub(r"```\s*$", "", cleaned.strip())
        try:
            df = self.spark.sql(cleaned)
            results = [r.asDict(recursive=True) for r in df.collect()]
            return {
                "success": True,
                "generated_sql": cleaned,
                "results": results,
                "row_count": len(results),
            }
        except Exception as e:  # noqa: BLE001 — envelope contract
            return {"success": False, "generated_sql": cleaned, "error": str(e)}

    # ------------------------------------------------- ops persistence

    @staticmethod
    def format_results(envelope: dict) -> str:
        """A8: max-width column-aligned rendering of a query_database
        envelope — same layout as the reference (dspy_query_db.py:
        170-204): per-column width = max(len(header), len(any value)),
        values ljust-padded, None → 'NULL', header + dashed separator."""
        if not envelope.get("success", False):
            return (
                f"query failed: {envelope.get('error')}\n"
                f"SQL: {envelope.get('generated_sql')}"
            )
        rows = envelope.get("results", [])
        out = [f"SQL: {envelope.get('generated_sql')}",
               f"{envelope.get('row_count', len(rows))} rows:"]
        if rows:
            cols = list(rows[0].keys())
            widths = {c: len(c) for c in cols}
            for row in rows:
                for c in cols:
                    v = "NULL" if row[c] is None else str(row[c])
                    widths[c] = max(widths[c], len(v))
            out.append(" | ".join(c.ljust(widths[c]) for c in cols))
            out.append("-+-".join("-" * widths[c] for c in cols))
            for row in rows:
                out.append(
                    " | ".join(
                        ("NULL" if row[c] is None else str(row[c])).ljust(widths[c])
                        for c in cols
                    )
                )
        return "\n".join(out)

    def save_interaction(self, record: dict, save_dir: str) -> bool:
        """S9: saved-data JSON sink. The reference appends to ONE
        saved_data.json array (read-all + rewrite-all per save,
        app.py:253-275 — O(store) a write); here each record is its own
        JSON file keyed by record id (duplicate id → False, mirroring
        save_to_db's 400, app.py:285-291), so saves are O(record),
        atomic, and the directory loads straight into a DataFrame."""
        import json
        import os

        os.makedirs(save_dir, exist_ok=True)
        if "id" in record and record["id"] is not None:  # 0 is a valid id
            rid = str(record["id"])
        else:
            # next free index: max existing rec-N + 1 (len() would
            # collide after deletes and count leftover .tmp files)
            taken = [
                int(f[4:-5])
                for f in os.listdir(save_dir)
                if f.startswith("rec-") and f.endswith(".json")
                and f[4:-5].isdigit()
            ]
            rid = f"rec-{max(taken, default=-1) + 1}"
        path = os.path.join(save_dir, f"{rid}.json")
        if os.path.exists(path):
            return False
        tmp = f"{path}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({**record, "id": rid}, f, ensure_ascii=False)
        os.rename(tmp, path)
        return True

    def load_interactions(self, save_dir: str) -> DataFrame:
        """Read every saved interaction back as a DataFrame (the ops
        table the reference keeps in sqlite — S7's JSON twin).
        *.json only: a crashed save's leftover .tmp is never loaded."""
        return self.spark.read.option("multiLine", "true").json(
            f"{save_dir}/*.json"
        )

    def register_tables(self, tables: dict[str, DataFrame]) -> None:
        """Expose DataFrames to query_database (SQL views), including
        the 4-table relational layer from materialize.build_relational."""
        for name, df in tables.items():
            df.createOrReplaceTempView(name)

    def describe_schema(self) -> dict[str, list[dict]]:
        """S8: enumerate registered tables + columns — the schema
        payload the reference feeds its NL→SQL prompt
        (dspy_query_db.py:70-95, sqlite_master + PRAGMA table_info)."""
        out: dict[str, list[dict]] = {}
        for t in self.spark.catalog.listTables():
            # temp views only — register_tables() is the NL2SQL surface;
            # permanent catalog tables are not part of the prompt payload
            if t.tableType != "TEMPORARY":
                continue
            out[t.name] = [
                {"name": c.name, "type": c.dataType}
                for c in self.spark.catalog.listColumns(t.name)
            ]
        return out
