"""Ontology configuration slicing + synonym overlays (S4/§2.1).

The reference builds each lexicon from a *named configuration*
(map_sra_to_ontology/load_ontology.py:9-31 over
ontology_configurations.json): include ontology projects, filter to id
spaces, apply ENRICHED/remove synonym overlays
(ontology_graph.py:193-222), optionally restrict to the is_a-descendants
of subgraph roots with dangling edges pruned (ontology_graph.py:225-247),
and carry an exclude-terms blacklist into the mappable-graph wrapper
(nonmappable terms).  This module re-expresses that as DataFrame
transforms over the OBO tables produced by ``sources.obo``.

``P53_CONFIGS`` mirrors the configuration *values* the p_53 pipeline
loads (run_pipeline.py:163-179; data from the reference's public
ontology_configurations.json) for the nine configs it uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# configuration values for the ontologies p_53 matches against
# (ontology_configurations.json entries 1,2,4,5,7,8,9,13,18)
P53_CONFIGS: dict[str, dict] = {
    "1": {"id_spaces": ["CL"], "roots": ["CL:0000000"],
          "exclude_terms": ["CL:0000000", "CL:0000255", "CL:0000520",
                            "CL:0000193"]},
    "2": {"id_spaces": ["DOID"], "roots": ["DOID:4"], "exclude_terms": []},
    "4": {"id_spaces": ["CVCL"], "roots": None, "exclude_terms": []},
    "5": {"id_spaces": ["UBERON"], "roots": None, "exclude_terms": []},
    "7": {"id_spaces": ["UO"], "roots": None, "exclude_terms": []},
    "8": {"id_spaces": ["CHEBI"], "roots": None, "exclude_terms": []},
    "9": {"id_spaces": ["EFO", "EFO_CHEBI", "EFO_PATO", "EFO_DOID",
                        "EFO_CL", "EFO_UBERON", "EFO_BTO"],
          "roots": None, "exclude_terms": []},
    "13": {"id_spaces": ["EFO", "EFO_CL", "EFO_UBERON", "EFO_DOID",
                         "EFO_PATO"],
           "roots": ["EFO:0000322", "EFO:0000408", "EFO:0004318",
                     "EFO:0000483", "EFO:0000635", "EFO:0000324",
                     "EFO:0002694", "EFO:0000399", "EFO:0001799",
                     "EFO_PATO:0000047"],
           # the FULL exclude list from ontology_configurations.json
           # (round-2 encoded only a 4-term subset)
           "exclude_terms": [
               "EFO:0000324", "EFO:0000399", "EFO:0000436", "EFO:0000562",
               "EFO:0000635", "EFO:0000750", "EFO:0000808", "EFO:0000884",
               "EFO:0000950", "EFO:0001799", "EFO:0002770", "EFO:0002906",
               "EFO:0003143", "EFO:0003477", "EFO:0003642", "EFO:0004176",
               "EFO:0004181", "EFO:0004182", "EFO:0005316",
               "EFO_PATO:0000047", "EFO_PATO:0000460", "EFO_PATO:0000461",
               "EFO_UBERON:0000467"]},
    "18": {"id_spaces": ["CVCL"], "roots": None,
           "exclude_terms": ["CVCL:Z433"]},
}


def load_ontology_configurations(path: str) -> dict[str, dict]:
    """Parse the reference's public ``ontology_configurations.json``
    (loader semantics: load_ontology.py:9-31) into the P53_CONFIGS
    shape, making ALL 19 configurations expressible — not just the nine
    p_53 uses.  ``exclude_terms``/``subgraph_roots`` are stored as
    {id: label} dicts in the file; keys iterate as the id list."""
    import json
    with open(path, encoding="utf-8") as f:
        cfgs = json.load(f)
    out: dict[str, dict] = {}
    for name, c in cfgs.items():
        roots = (list(c.get("subgraph_roots", {}))
                 if c.get("restrict_to_specific_subgraph") else None)
        out[name] = {
            "id_spaces": list(c["id_spaces"]),
            "roots": roots or None,
            "exclude_terms": list(c.get("exclude_terms", {})),
        }
    return out


def apply_synonym_overlays(synonyms: DataFrame,
                           extra_syns: dict[str, list[str]] | None = None,
                           remove_syns: dict | None = None) -> DataFrame:
    """ENRICHED additions then removals, in the reference's order
    (ontology_graph.py:193-222) — a removal also strips an enriched
    synonym.  ``remove_syns`` entries are either the reference's
    ``{"exclude_synonyms": [...]}`` dicts or plain lists."""
    spark = synonyms.sparkSession
    out = synonyms
    if extra_syns:
        rows = [(t, s, "ENRICHED") for t, ss in extra_syns.items()
                for s in ss]
        out = out.unionByName(spark.createDataFrame(
            rows, "term_id: string, syn_str: string, syn_type: string"))
    if remove_syns:
        rows = []
        for t, spec in remove_syns.items():
            excl = spec["exclude_synonyms"] if isinstance(spec, dict) else spec
            rows.extend((t, s) for s in excl)
        if rows:
            rm = spark.createDataFrame(rows,
                                       "term_id: string, syn_str: string")
            out = out.join(F.broadcast(rm), on=["term_id", "syn_str"],
                           how="left_anti")
    return out.dropDuplicates(["term_id", "syn_str", "syn_type"])


def descendants_or_self(edges: DataFrame, roots: list[str],
                        max_depth: int = 30) -> DataFrame:
    """(term_id) = roots ∪ their recursive is_a descendants
    (ontology_graph.py:127-128 recursive_subterms via inv_is_a), as a
    seeded downward closure — frontier-only joins, one cut per hop."""
    spark = edges.sparkSession
    down = (edges.where(F.col("rel") == "is_a")
            .select(F.col("parent_id").alias("term_id"),
                    F.col("child_id").alias("sub_id")))
    keep = spark.createDataFrame([(r,) for r in roots], "term_id: string")
    frontier = keep
    for _ in range(max_depth):
        frontier = (frontier.join(down, on="term_id")
                    .select(F.col("sub_id").alias("term_id")).distinct()
                    .join(keep, on="term_id", how="left_anti")
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        keep = keep.unionByName(frontier).localCheckpoint(eager=True)
    return keep


def restrict_to_roots(tables: dict[str, DataFrame],
                      roots: list[str]) -> dict[str, DataFrame]:
    """Keep only the roots' descendant subgraph; prune dangling edges on
    BOTH endpoints (ontology_graph.py:225-247)."""
    keep = descendants_or_self(tables["edges"], roots)
    terms = tables["terms"].join(keep, on="term_id", how="left_semi")
    syns = tables["synonyms"].join(keep, on="term_id", how="left_semi")
    edges = (tables["edges"]
             .join(keep.withColumnRenamed("term_id", "child_id"),
                   on="child_id", how="left_semi")
             .join(keep.withColumnRenamed("term_id", "parent_id"),
                   on="parent_id", how="left_semi"))
    return {"terms": terms, "synonyms": syns, "edges": edges}


def load_ontology_config(tables: dict[str, DataFrame], config: dict,
                         extra_syns: dict | None = None,
                         remove_syns: dict | None = None) -> dict:
    """One named config → sliced (terms, synonyms, edges,
    nonmappable_terms).  ``config`` carries id_spaces / roots /
    exclude_terms (see P53_CONFIGS)."""
    pfx = F.split("term_id", ":").getItem(0)
    terms = tables["terms"].where(pfx.isin(*config["id_spaces"]))
    syns = tables["synonyms"].where(pfx.isin(*config["id_spaces"]))
    cpfx = F.split("child_id", ":").getItem(0)
    ppfx = F.split("parent_id", ":").getItem(0)
    edges = tables["edges"].where(cpfx.isin(*config["id_spaces"])
                                  & ppfx.isin(*config["id_spaces"]))
    syns = apply_synonym_overlays(syns, extra_syns, remove_syns)
    out = {"terms": terms, "synonyms": syns, "edges": edges}
    if config.get("roots"):
        out = restrict_to_roots(out, config["roots"])
    out["nonmappable_terms"] = list(config.get("exclude_terms", []))
    return out


def lexicon_raw_terms(sliced: dict, ont: str) -> list[dict]:
    """Sliced config tables → the raw ``terms`` entries RefData consumes
    (refdata.refdata_from_raw): [{id, ont, name, syns: [[str, type]]}].
    Driver-side collect is bounded: ontologies are ≤10⁶ terms and this is
    an offline lexicon-build step, not a runtime join."""
    syn_rows = (sliced["synonyms"]
                .groupBy("term_id")
                .agg(F.collect_list(F.array("syn_str", "syn_type"))
                     .alias("syns")))
    rows = (sliced["terms"].join(syn_rows, on="term_id", how="left")
            .select("term_id", "name", "syns").collect())
    return [{"id": r["term_id"], "ont": ont, "name": r["name"],
             "syns": [[s[0], s[1]] for s in (r["syns"] or [])]}
            for r in rows]
