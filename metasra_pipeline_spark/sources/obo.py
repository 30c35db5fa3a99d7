"""OBO flat-file ontology source (SURVEY.md §2.1 S4).

Parses the public OBO 1.2 format (``[Term]`` stanzas with id / name /
synonym / is_a / relationship / subset lines — the format the reference
consumes in ontology_graph.py:338-576; this is an independent
implementation of the published spec, not a port) into the engine's
lexicon-side tables:

- ``terms(term_id, name, ont)``
- ``synonyms(term_id, syn_str, syn_type)``
- ``edges(child_id, parent_id, rel)``  (is_a + relationship lines)

Offline job: ontologies are ≤10⁶ stanzas, parsed driver-side (or via
``spark.read.text`` + mapInPandas for very large files) and written as
parquet/Iceberg reference tables that runtime jobs broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_SYN_RE = re.compile(r'^"(.*)"\s+(\w+)?')


def parse_obo(text: str):
    """→ (terms, synonyms, edges) row lists."""
    terms, syns, edges = [], [], []
    cur: dict | None = None
    in_term = False

    def flush():
        if cur and not cur.get("is_obsolete") and cur.get("id"):
            tid = cur["id"]
            terms.append((tid, cur.get("name", ""), tid.split(":")[0]))
            for s, st in cur.get("syns", []):
                syns.append((tid, s, st or "RELATED"))
            for p, rel in cur.get("parents", []):
                edges.append((tid, p, rel))

    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("["):
            flush()
            in_term = line == "[Term]"
            cur = {"syns": [], "parents": []} if in_term else None
            continue
        if not in_term or not line or cur is None:
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        val = val.strip()
        # strip trailing comments ("! label")
        val = val.split(" ! ")[0].strip()
        if key == "id":
            cur["id"] = val
        elif key == "name":
            cur["name"] = val
        elif key == "synonym":
            m = _SYN_RE.match(val)
            if m:
                cur["syns"].append((m.group(1), m.group(2)))
        elif key == "is_a":
            cur["parents"].append((val, "is_a"))
        elif key == "relationship":
            parts = val.split()
            if len(parts) >= 2:
                cur["parents"].append((parts[1], parts[0]))
        elif key == "is_obsolete" and val.startswith("true"):
            cur["is_obsolete"] = True
    flush()
    return terms, syns, edges


def load_obo(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    with open(path, encoding="utf-8") as f:
        terms, syns, edges = parse_obo(f.read())
    return {
        "terms": spark.createDataFrame(
            terms or [("", "", "")],
            "term_id: string, name: string, ont: string"
        ).where("term_id != ''"),
        "synonyms": spark.createDataFrame(
            syns or [("", "", "")],
            "term_id: string, syn_str: string, syn_type: string"
        ).where("term_id != ''"),
        "edges": spark.createDataFrame(
            edges or [("", "", "")],
            "child_id: string, parent_id: string, rel: string"
        ).where("child_id != ''"),
    }


def ancestors_closure(edges: DataFrame, rels: tuple[str, ...] = ("is_a", "part_of"),
                      max_depth: int = 20) -> DataFrame:
    """Transitive closure over selected relationship types
    (ontology_graph.py:133-155's BFS, as iterative self-joins with
    per-round materialization)."""
    from pyspark.sql import functions as F
    e = (edges.where(F.col("rel").isin(*rels))
         .select(F.col("child_id").alias("term_id"),
                 F.col("parent_id").alias("anc_id")).distinct())
    closure = e
    for _ in range(max_depth):
        closure = closure.localCheckpoint(eager=True)
        hop = (closure.alias("c")
               .join(e.alias("e"), F.col("c.anc_id") == F.col("e.term_id"))
               .select(F.col("c.term_id"), F.col("e.anc_id")))
        grown = closure.unionByName(hop).distinct()
        if grown.count() == closure.count():
            break
        closure = grown
    return closure
