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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..refdata import RefData
from .inference import INF_COLS
from .stages import CONSEQUENT_ITYPES

#: inference chains are bounded by the number of inference stages in
#: p_53 (≤ 6 hops); the path-squaring closure below covers depth 6
_CLOSURE_DEPTH = 6


def _compose(a: DataFrame, b: DataFrame) -> DataFrame:
    """Path composition: a(doc, src→dst) then b(doc, src→dst)."""
    return (a.join(b.select("doc_id", F.col("src_id").alias("dst_id"),
                            F.col("dst_id").alias("dst2")),
                   on=["doc_id", "dst_id"])
            .select("doc_id", "src_id", F.col("dst2").alias("dst_id")))


def _closure(term_edges: DataFrame, snap) -> DataFrame:
    """Transitive closure of the term→term inference edges by path
    squaring: C₂ = E ∪ E∘E, C₄ = C₂ ∪ C₂∘C₂, C₆ = C₄ ∪ C₄∘C₂ — depth 6
    in two driver-synchronized cuts and zero count() jobs, replacing
    the round-1 per-hop checkpoint+count loop (12 jobs) that dominated
    the pipeline's fixed overhead.  Edge sets are per-doc and tiny
    relative to the reach set, so squaring joins stay cheap at scale."""
    c2 = term_edges.unionByName(_compose(term_edges, term_edges)).distinct()
    c2 = snap.cut(c2, "closure2")
    c4 = c2.unionByName(_compose(c2, c2)).distinct()
    c4 = snap.cut(c4, "closure4")
    return c4.unionByName(_compose(c4, c2)).distinct()


def reachable_terms(final_matches: DataFrame, inf_edges: DataFrame,
                    snap=None) -> DataFrame:
    """(doc_id, term_id) reachable from a kv pair.  Seed = surviving match
    targets; closure over inference edges (RV:* sources always live).

    The closure is computed on the *edge set* (path squaring, depth ≤ 6 =
    the p_53 inference-stage bound) rather than by iterating the reach
    set — no convergence count() jobs, two lineage cuts total."""
    if snap is None:
        from ..ops import LocalSnapshotter
        snap = LocalSnapshotter()
    seeds = (final_matches
             .where(~F.col("target_id").startswith("NP:"))
             .select("doc_id", F.col("target_id").alias("term_id"))
             .unionByName(
                 inf_edges.where(F.col("src_id").startswith("RV:"))
                 .select("doc_id", F.col("dst_id").alias("term_id")))
             .distinct())
    term_edges = (inf_edges.where(~F.col("src_id").startswith("RV:"))
                  .select("doc_id", "src_id", "dst_id").distinct())
    closure = _closure(term_edges, snap)
    via = (seeds.join(closure.select("doc_id",
                                     F.col("src_id").alias("term_id"),
                                     "dst_id"),
                      on=["doc_id", "term_id"])
           .select("doc_id", F.col("dst_id").alias("term_id")))
    return seeds.unionByName(via).distinct()


def term_provenance(final_matches: DataFrame, inf_edges: DataFrame,
                    kv: DataFrame, max_depth: int = _CLOSURE_DEPTH
                    ) -> DataFrame:
    """A1 lineage: (doc_id, term_id, orig_key, orig_val, mapping_path).

    The flattened analogue of the reference's reverse-Dijkstra extraction
    (pipeline_components.py:132-230 + text_reasoning_graph.py:465-516):
    each term's provenance is the kv pair with the minimum-depth path —
    direct matches at depth 0 (token interval inside the kv's key or
    value span), inference-derived terms inherit their source term's kv
    at depth+1; ties break on (key_start, match start, key, value) the
    way the reference's min() breaks on its first-seen shortest path.
    ``mapping_path`` is a compact string rendering of the hop sequence.
    """
    m = final_matches.where(~F.col("target_id").startswith("NP:"))
    j = m.join(kv, on="doc_id")
    base_cols = [
        "doc_id", F.col("target_id").alias("term_id"),
        F.col("key").alias("orig_key"), F.col("value").alias("orig_val"),
        F.lit(0).alias("depth"), "key_start", "start",
    ]
    path0 = lambda side: F.array(  # noqa: E731
        F.concat(F.lit(f"kv[{side}]:"), F.col("key"), F.lit("="),
                 F.col("value")),
        F.concat(F.lit("tok:"), F.col("token")),
        F.concat(F.lit("match:"), F.col("match_target"),
                 F.lit(" edit="), F.col("edit_dist").cast("string")),
        F.concat(F.lit("term:"), F.col("target_id")))
    key_side = (j.where((F.col("start") >= F.col("key_start"))
                        & (F.col("end") <= F.col("key_end")))
                .select(*base_cols, path0("key").alias("mapping_path")))
    val_side = (j.where((F.col("start") >= F.col("val_start"))
                        & (F.col("end") <= F.col("val_end")))
                .select(*base_cols, path0("val").alias("mapping_path")))
    prov = key_side.unionByName(val_side)

    term_edges = (inf_edges.where(~F.col("src_id").startswith("RV:"))
                  .select("doc_id", F.col("src_id").alias("term_id"),
                          "dst_id", "itype").distinct())
    # RV:<property_id> sources: the implied term inherits the property
    # term's own provenance (the reference walks back through the
    # real-value node to the same kv)
    rv_edges = (inf_edges.where(F.col("src_id").startswith("RV:"))
                .select("doc_id",
                        F.expr("substring(src_id, 4)").alias("term_id"),
                        "dst_id", "itype").distinct())
    # rv_edges participate at EVERY depth: a property term reachable only
    # via other inference hops must still hand its provenance to terms it
    # implies through a real value (depth-1-only was a silent NULL source)
    all_edges = term_edges.unionByName(rv_edges)
    # materialize the base layer, the edge set and each frontier once:
    # without the cuts the union below re-evaluates frontier(d)'s whole
    # join chain per union branch — O(depth²) re-runs of the m ⋈ kv base
    # (measured 25.1 s → 4.4 s for this function at 1k docs / 32 cores).
    # An empty frontier ends the walk early (inference depth rarely
    # exceeds 2-3; the 6-hop bound is the p_53 worst case).
    # the two base checkpoints are independent — materialize them
    # concurrently (guide §2.6; FAIR scheduler is session default)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as _ex:
        _f_p = _ex.submit(lambda: prov.localCheckpoint(eager=True))
        _f_e = _ex.submit(lambda: all_edges.localCheckpoint(eager=True))
        prov, all_edges = _f_p.result(), _f_e.result()
    frontier = prov
    layers = [prov]
    for d in range(1, max_depth + 1):
        # lazy checkpoint + count: ONE driver-synchronized job per depth
        # materializes the frontier AND answers the empty-frontier
        # termination test (was eager checkpoint + isEmpty = two)
        frontier = (frontier.join(all_edges, on=["doc_id", "term_id"])
                    .select("doc_id", F.col("dst_id").alias("term_id"),
                            "orig_key", "orig_val",
                            F.lit(d).alias("depth"), "key_start", "start",
                            F.concat("mapping_path",
                                     F.array(F.concat(F.lit("inf:"),
                                                      F.col("itype"))),
                                     F.array(F.concat(F.lit("term:"),
                                                      F.col("dst_id"))))
                            .alias("mapping_path"))
                    .localCheckpoint(eager=False))
        if frontier.count() == 0:
            break
        layers.append(frontier)
    prov = layers[0]
    for f in layers[1:]:
        prov = prov.unionByName(f)

    w = Window.partitionBy("doc_id", "term_id").orderBy(
        "depth", "key_start", "start", "orig_key", "orig_val",
        "mapping_path")
    return (prov.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("doc_id", "term_id", "orig_key", "orig_val",
                    "mapping_path"))


def consolidate(final_matches: DataFrame, inf_edges: DataFrame,
                real_values: DataFrame, ref: RefData,
                exclude_real_value_properties: bool = True,
                with_ancestors: bool = False,
                with_provenance: bool = True,
                kv: DataFrame | None = None,
                snap=None) -> DataFrame:
    """→ mapped_terms(doc_id, term_id, consequent[, orig_key, orig_val,
    mapping_path])."""
    reach = reachable_terms(final_matches, inf_edges, snap=snap)

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
    if with_provenance and kv is not None:
        # left join: pure-ancestor additions have no own path (the
        # reference's superterm closure is a plain id-set union too,
        # run_pipeline.py:98-103)
        out = out.join(term_provenance(final_matches, inf_edges, kv),
                       on=["doc_id", "term_id"], how="left")
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
