"""The p_53 mapping pipeline as one declarative DataFrame plan.

Stage order is semantics, not an optimization, and follows
``run_pipeline.py:180-211`` exactly (see SURVEY.md §2).  Inference stages
act on *node existence* (all term nodes created so far, surviving P4's
node deletion), while the final consolidation resolves *reachability*
through surviving edges — mirroring the reference's
graph-mutation-then-extraction split.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest import documents_to_kv
from ..operators import consolidate as C
from ..operators import inference as I
from ..operators import precedence as P
from ..operators import stages as S
from ..refdata import RefData


@dataclass
class PipelineResult:
    kv: DataFrame
    tokens: DataFrame
    matches: DataFrame
    inf_edges: DataFrame
    real_values: DataFrame          # (doc_id, property_id, value, unit_id, consequent)
    mapped_terms: DataFrame         # (doc_id, term_id, consequent)


def _materialize(df: DataFrame, enabled: bool) -> DataFrame:
    """Cut lineage after the big fan-out phases.  localCheckpoint in local
    mode; on a cluster, set a checkpoint dir and swap to .checkpoint() —
    this is also the resume point (Iceberg snapshot per stage in prod)."""
    return df.localCheckpoint(eager=True) if enabled else df


def _targets(matches: DataFrame) -> DataFrame:
    return (matches.where(~F.col("target_id").startswith("NP:"))
            .select("doc_id", F.col("target_id").alias("term_id"))
            .distinct())


def _dsts(inf: DataFrame) -> DataFrame:
    return inf.select("doc_id", F.col("dst_id").alias("term_id")).distinct()


def cell_line_term_ids(ref: RefData) -> DataFrame:
    """CVCL ids ∪ their superterm-linked ids
    (pipeline_components.py:473-482)."""
    cvcl = (ref.lexicon.where(F.split("term_id", ":").getItem(0) == "CVCL")
            .select("term_id").distinct())
    linked = (cvcl.join(ref.linked_terms, on="term_id")
              .select(F.col("linked_id").alias("term_id")))
    return cvcl.unionByName(linked).distinct()


def run_mapping_pipeline(spark: SparkSession, documents: DataFrame,
                         ref: RefData, checkpoint: bool = True,
                         with_ancestors: bool = False) -> PipelineResult:
    # Partition ONCE by doc_id.  Every downstream per-doc window /
    # groupBy / self-join keys on (doc_id, …) — HashPartitioning(doc_id)
    # satisfies ClusteredDistribution of any superset key, so Catalyst
    # inserts no further exchanges for the per-doc stages; token-keyed
    # join-backs broadcast under AQE.  Net: ~one full-data shuffle for
    # the whole pipeline — the shape that survives 100 TB.
    kv = S.key_value_filter(documents_to_kv(documents), ref)   # F1
    kv = kv.repartition("doc_id")
    kv = _materialize(kv, checkpoint)

    tok = S.init_tokens(kv)                                    # F3
    tok = S.expand_all_tokens(tok, ref)                        # T1–T8 fused
    tok = _materialize(tok, checkpoint)

    m = S.exact_match(tok, ref)                                # J1
    tok = S.parse_time_with_unit(kv, tok, m, ref, spark)       # T10
    m = m.unionByName(S.two_char_match(tok, ref))              # J3
    tok = S.property_specific_synonyms(kv, tok, m, ref)        # T9
    tok = _materialize(tok, checkpoint)
    m = m.unionByName(S.fuzzy_match(tok, ref))                 # J2
    m = m.unionByName(S.noun_phrase_match(tok, ref))           # J4
    m = _materialize(m.dropDuplicates(S.MATCH_COLS), checkpoint)

    m = P.block_cell_line_matches(kv, m, ref.cell_line_keys,   # P4
                                  cell_line_term_ids(ref))
    m = _materialize(m, checkpoint)

    # node-existence term set is frozen after P4 (later stages delete
    # edges, not nodes) and grows with each inference stage's outputs
    node_terms = _materialize(_targets(m), checkpoint)
    inf = spark.createDataFrame([], schema="doc_id: string, src_id: string, "
                                           "dst_id: string, itype: string")

    def grow(nt, inf_acc, edges):
        """Fold one inference stage's edges into the node-term set and
        edge accumulator, materializing both — the alternative
        (self-referential union chains) doubles the logical plan per
        stage (2^k subtree copies by the last stage)."""
        inf_acc = _materialize(inf_acc.unionByName(edges), checkpoint)
        nt = _materialize(nt.unionByName(_dsts(edges)).distinct(),
                          checkpoint)
        return nt, inf_acc

    e1 = I.linked_terms_of_superterms(node_terms, ref)         # I1
    node_terms, inf = grow(node_terms, inf, e1)
    e2 = I.cell_line_to_implied_disease(node_terms, ref)       # I2
    node_terms, inf = grow(node_terms, inf, e2)

    m = P.remove_subinterval_matches(m, inf)                   # P3
    m = _materialize(m, checkpoint)

    e3 = I.custom_consequent_terms(node_terms, ref)            # I3
    node_terms, inf = grow(node_terms, inf, e3)
    e7 = I.term_artifact_combinations(tok, node_terms, ref)    # I7
    node_terms, inf = grow(node_terms, inf, e7)

    rv = I.extract_real_values(kv, tok, m, inf, ref)           # R1
    rv = rv.withColumn("consequent", F.lit(False))

    m = P.filter_matches_by_priority(m)                        # P2

    e5, rv_cvcl = I.infer_cell_line_terms(node_terms, ref)     # I5
    node_terms, inf = grow(node_terms, inf, e5)
    rv_all = rv.unionByName(
        rv_cvcl.select("doc_id", "property_id", "value", "unit_id")
        .withColumn("consequent", F.lit(True))
    ).dropDuplicates(["doc_id", "property_id", "value", "unit_id"])
    rv_all = _materialize(rv_all, checkpoint)

    e6 = I.implied_developmental_stage(rv_all)                 # I6
    inf = inf.unionByName(e6)
    e4 = I.consequent_cultured_cell(node_terms)                # I4
    inf = inf.unionByName(e4)

    m = P.prioritize_exact_over_fuzzy(m)                       # P1
    m = _materialize(m, checkpoint)
    inf = _materialize(inf, checkpoint)

    mapped = C.consolidate(m, inf, rv_all, ref,
                           with_ancestors=with_ancestors)
    return PipelineResult(kv=kv, tokens=tok, matches=m, inf_edges=inf,
                          real_values=rv_all, mapped_terms=mapped)
