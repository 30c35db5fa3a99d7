"""Precedence / pruning stages P1–P4 — the query-semantics heart.

Each takes the ``matches`` frame (and context frames) and returns the
pruned ``matches``.  Match-edge deletion in the reference graph becomes
row filtering; node deletion (P4) removes every row for the (doc, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- P1
def prioritize_exact_over_fuzzy(matches: DataFrame) -> DataFrame:
    """PrioritizeExactMatchOverFuzzyMatch (pipeline_components.py:549-601):
    group match edges by origin interval; if the group has any edit_dist=0
    edge, drop its edit_dist>0 edges.  Window min over (doc, start, end)."""
    w = Window.partitionBy("doc_id", "start", "end")
    has_exact = F.max(F.when(F.col("edit_dist") == 0, 1).otherwise(0)).over(w)
    return (matches.withColumn("_he", has_exact)
            .where((F.col("edit_dist") == 0) | (F.col("_he") == 0))
            .drop("_he"))


# ---------------------------------------------------------------- P2
_DIRECT = ("TERM_NAME", "EXACT_SYNONYM", "ENRICHED_SYNONYM")


def filter_matches_by_priority(matches: DataFrame) -> DataFrame:
    """FilterOntologyMatchesByPriority_Stage (pipeline_components.py:693-751):
    per token node and term id-space, a direct match (name / exact /
    enriched synonym) suppresses that token's inexact-synonym matches in
    the same id-space.  Custom (non-term) targets are untouched
    (:709-712 requires an OntologyTermNode target)."""
    is_term = ~F.col("target_id").startswith("NP:")
    id_space = F.split("target_id", ":").getItem(0)
    w = Window.partitionBy("doc_id", "token", "start", "end", "_space")
    direct = F.col("match_target").isin(*_DIRECT)
    out = (matches
           .withColumn("_space", F.when(is_term, id_space).otherwise(F.lit("_np")))
           .withColumn("_has_direct",
                       F.max(F.when(direct & is_term, 1).otherwise(0)).over(w))
           .where(~is_term | direct | (F.col("_has_direct") == 0))
           .drop("_space", "_has_direct"))
    return out


# ---------------------------------------------------------------- P3
def remove_subinterval_matches(matches: DataFrame,
                               inf_edges: DataFrame) -> DataFrame:
    """RemoveSubIntervalOfMatchedBlockAncestralLink_Stage
    (pipeline_components.py:1012-1085).

    A matched token whose interval is a strict sub-interval of another
    matched token's interval loses its matches — except targets that are
    also reachable from *every* covering matched superphrase through
    non-N-Gram/Delimiter derivations.  Flattened: derivations that are not
    N-Gram/Delimiter preserve the char interval, so "reachable from
    superphrase S" ≡ target matched from any token sharing S's interval,
    extended by the inference edges existing at this stage (linked terms,
    implied disease).  Known approximation: the reference also severs the
    sub-token's outgoing derivation edges; we prune match rows only.
    """
    cls = (matches.select("doc_id", "start", "end").distinct())
    # class-level target sets, extended by current inference closure
    cls_targets = (matches.select("doc_id", "start", "end", "target_id")
                   .distinct())
    ext = cls_targets
    for _ in range(2):  # closure depth 2 covers linked_super → implied chains
        hop = (ext.join(inf_edges.select("doc_id",
                                         F.col("src_id").alias("target_id"),
                                         "dst_id"),
                        on=["doc_id", "target_id"])
               .select("doc_id", "start", "end",
                       F.col("dst_id").alias("target_id")))
        ext = ext.unionByName(hop).distinct()

    a, b = cls.alias("a"), cls.alias("b")
    containment = (a.join(b, on="doc_id")
                   .where((F.col("a.start") >= F.col("b.start"))
                          & (F.col("a.end") <= F.col("b.end"))
                          & ~((F.col("a.start") == F.col("b.start"))
                              & (F.col("a.end") == F.col("b.end"))))
                   .select("doc_id",
                           F.col("a.start").alias("start"),
                           F.col("a.end").alias("end"),
                           F.col("b.start").alias("sup_start"),
                           F.col("b.end").alias("sup_end")))
    n_sup = (containment.groupBy("doc_id", "start", "end")
             .agg(F.countDistinct("sup_start", "sup_end").alias("n_sup")))
    # target kept iff present in ext() of every covering superphrase class
    kept = (containment
            .join(ext.select("doc_id",
                             F.col("start").alias("sup_start"),
                             F.col("end").alias("sup_end"),
                             "target_id"),
                  on=["doc_id", "sup_start", "sup_end"])
            .groupBy("doc_id", "start", "end", "target_id")
            .agg(F.countDistinct("sup_start", "sup_end").alias("n_cover"))
            .join(n_sup, on=["doc_id", "start", "end"])
            .where(F.col("n_cover") == F.col("n_sup"))
            .select("doc_id", "start", "end", "target_id",
                    F.lit(True).alias("_keep")))
    sub_cls = n_sup.select("doc_id", "start", "end",
                           F.lit(True).alias("_is_sub"))
    out = (matches
           .join(sub_cls, on=["doc_id", "start", "end"], how="left")
           .join(kept, on=["doc_id", "start", "end", "target_id"], how="left")
           .where(F.col("_is_sub").isNull() | F.col("_keep").isNotNull())
           .drop("_is_sub", "_keep"))
    return out


# ---------------------------------------------------------------- P4
def block_cell_line_matches(kv: DataFrame, matches: DataFrame,
                            ref_cell_line_keys: list[str],
                            cell_line_terms: DataFrame) -> DataFrame:
    """BlockCellLineNonCellLineKey_Stage (pipeline_components.py:464-546):
    delete cell-line term *nodes* matched under a value whose key did not
    map to a cell-line key term (EFO:0000322/324), unless the node is also
    reachable from some cell-line-typed kv pair in the doc.

    ``cell_line_terms`` = CVCL ids ∪ their superterm-linked ids (:473-482).
    """
    clk = F.col("target_id").isin(*ref_cell_line_keys)
    cellline_kv = (kv.join(matches, on="doc_id")
                   .where((F.col("start") >= F.col("key_start"))
                          & (F.col("end") <= F.col("key_end")) & clk)
                   .select("doc_id", "key_start", "key_end",
                           "val_start", "val_end")
                   .distinct())
    cl_matches = matches.join(
        F.broadcast(cell_line_terms.select(F.col("term_id").alias("target_id"))),
        on="target_id")
    # evidence from inside a cell-line kv (key or value side) protects
    protected = (cl_matches.join(cellline_kv, on="doc_id")
                 .where(((F.col("start") >= F.col("key_start"))
                         & (F.col("end") <= F.col("key_end")))
                        | ((F.col("start") >= F.col("val_start"))
                           & (F.col("end") <= F.col("val_end"))))
                 .select("doc_id", "target_id").distinct())
    # evidence from the value side of any kv (the trigger condition);
    # kv pairs that are cell-line-typed are excluded from triggering
    all_kv = kv.select("doc_id", "key_start", "val_start", "val_end")
    noncl_kv = all_kv.join(cellline_kv.select("doc_id", "key_start")
                           .withColumn("_cl", F.lit(True)),
                           on=["doc_id", "key_start"], how="left") \
                     .where(F.col("_cl").isNull())
    triggered = (cl_matches.join(noncl_kv, on="doc_id")
                 .where((F.col("start") >= F.col("val_start"))
                        & (F.col("end") <= F.col("val_end")))
                 .select("doc_id", "target_id").distinct())
    deleted = triggered.join(protected, on=["doc_id", "target_id"],
                             how="left_anti")
    return matches.join(deleted, on=["doc_id", "target_id"], how="left_anti")
