"""Extraction / consolidation layer (A1–A6).

Replaces the reference's per-node reverse-Dijkstra extraction
(``Pipeline.extract_mapped_terms``, pipeline_components.py:132-230 +
text_reasoning_graph.py:465-516) with set-based reachability:

- a term is *emitted* iff reachable from a kv pair through surviving
  edges: a surviving match row, or an inference edge whose source is
  itself reachable (real-value sources are always reachable through their
  numeric token);
- a term is *consequent* iff every in-edge type is one of the five
  consequent inference types (pipeline_components.py:176-187) — i.e. no
  surviving match row and no non-consequent inference in-edge;
- terms acting as the property of a real-value row are excluded from the
  mapped-term output (configurable; mirrors the labeled-set ground truth —
  the reference computes this exclusion set at :191-204);
- output filtered to mappable ontologies (run_pipeline.py:82-88) and
  optionally closed over is_a/part_of ancestors (run_pipeline.py:98-103).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..refdata import RefData
from .inference import INF_COLS
from .stages import CONSEQUENT_ITYPES

#: static unroll depth for the inference closure; chains are bounded by
#: the number of inference stages in p_53 (≤ 6 hops)
_CLOSURE_DEPTH = 6


def reachable_terms(final_matches: DataFrame, inf_edges: DataFrame) -> DataFrame:
    """(doc_id, term_id) reachable from a kv pair.  Seed = surviving match
    targets; closure over inference edges (RV:* sources always live)."""
    seed = (final_matches
            .where(~F.col("target_id").startswith("NP:"))
            .select("doc_id", F.col("target_id").alias("term_id"))
            .distinct())
    rv_seeded = (inf_edges.where(F.col("src_id").startswith("RV:"))
                 .select("doc_id", F.col("dst_id").alias("term_id"))
                 .distinct())
    reach = seed.unionByName(rv_seeded).distinct()
    term_edges = inf_edges.where(~F.col("src_id").startswith("RV:"))
    for i in range(_CLOSURE_DEPTH):
        # materialize per round: reach appears twice per iteration, so an
        # unmaterialized loop doubles the plan every hop (2^depth blowup)
        reach = reach.localCheckpoint(eager=True)
        hop = (reach.join(term_edges.select("doc_id",
                                            F.col("src_id").alias("term_id"),
                                            "dst_id"),
                          on=["doc_id", "term_id"])
               .select("doc_id", F.col("dst_id").alias("term_id")))
        new_reach = reach.unionByName(hop).distinct()
        if i >= 2 and new_reach.count() == reach.count():
            reach = new_reach
            break
        reach = new_reach
    return reach


def consolidate(final_matches: DataFrame, inf_edges: DataFrame,
                real_values: DataFrame, ref: RefData,
                exclude_real_value_properties: bool = True,
                with_ancestors: bool = False) -> DataFrame:
    """→ mapped_terms(doc_id, term_id, consequent: boolean)."""
    reach = reachable_terms(final_matches, inf_edges)

    explicit_match = (final_matches
                      .where(~F.col("target_id").startswith("NP:"))
                      .select("doc_id", F.col("target_id").alias("term_id"))
                      .distinct())
    explicit_inf = (inf_edges
                    .where(~F.col("itype").isin(*CONSEQUENT_ITYPES))
                    .select("doc_id", F.col("dst_id").alias("term_id"))
                    .distinct())
    explicit = explicit_match.unionByName(explicit_inf).distinct() \
        .withColumn("_exp", F.lit(True))

    out = (reach.join(explicit, on=["doc_id", "term_id"], how="left")
           .select("doc_id", "term_id",
                   F.col("_exp").isNull().alias("consequent")))

    prefix = F.split("term_id", ":").getItem(0)
    out = out.where(prefix.isin(*ref.mappable_prefixes))
    if ref.nonmappable_terms:
        # MappableOntologyGraph blacklist (ontology_graph.py:158-182)
        out = out.where(~F.col("term_id").isin(*ref.nonmappable_terms))

    if exclude_real_value_properties:
        rv_props = (real_values
                    .select("doc_id",
                            F.col("property_id").alias("term_id"))
                    .distinct())
        out = out.join(rv_props, on=["doc_id", "term_id"], how="left_anti")

    if with_ancestors:
        out = add_ancestor_closure(out, ref)
    return out


def add_ancestor_closure(mapped: DataFrame, ref: RefData) -> DataFrame:
    """A5 superterm closure (run_pipeline.py:98-103): union of precomputed
    is_a/part_of ancestors, restricted to mappable terms; consequent flag
    for pure-ancestor additions inherits True only if no explicit row."""
    anc = (mapped.join(F.broadcast(ref.ancestors), on="term_id")
           .select("doc_id", F.col("anc_id").alias("term_id"),
                   F.col("consequent")))
    prefix = F.split("term_id", ":").getItem(0)
    anc = anc.where(prefix.isin(*ref.mappable_prefixes))
    return (mapped.unionByName(anc)
            .groupBy("doc_id", "term_id")
            .agg(F.min(F.col("consequent").cast("int")).cast("boolean")
                 .alias("consequent")))


def most_specific_terms(mapped: DataFrame, ref: RefData) -> DataFrame:
    """A6 (ontology_graph.py:251-290): drop terms having a descendant in
    the per-doc set — anti-join against (terms ⋈ ancestors)."""
    has_desc = (mapped.alias("m")
                .join(F.broadcast(ref.ancestors).alias("a"),
                      F.col("m.term_id") == F.col("a.term_id"))
                .select("doc_id", F.col("a.anc_id").alias("term_id"))
                .distinct())
    return mapped.join(has_desc, on=["doc_id", "term_id"], how="left_anti")
