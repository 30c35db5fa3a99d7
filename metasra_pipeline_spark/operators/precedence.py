"""Precedence / pruning stages P1–P4 — the query-semantics heart.

Each takes the ``matches`` frame (and context frames) and returns the
pruned ``matches``.  Match-edge deletion in the reference graph becomes
row filtering; node deletion (P4) removes every row for the (doc, term).
"""

from __future__ import annotations

import pandas as pd
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
_P3_EXCLUDED_KINDS = frozenset({"N-Gram", "Delimiter"})

_M_SCHEMA = ("doc_id string, token string, start int, `end` int, "
             "target_id string, match_target string, edit_dist int")


def _p3_run_doc(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """The reference algorithm (pipeline_components.py:1012-1085) on one
    document's real text-mining graph.  Graph mutation is sequential per
    doc; the reference's iteration order over mapped token nodes is py2
    set/dict order (run-dependent) — we canonicalize to sorted order."""
    from collections import defaultdict

    fwd: dict = defaultdict(list)          # node -> [(child, kind)]
    match_rows = []                         # (tok_node, target_node, mt, ed)
    roots = set()
    for rel, s1, s2, s3, i1, i2, i3, i4 in zip(
            pdf["rel"], pdf["s1"], pdf["s2"], pdf["s3"],
            pdf["i1"], pdf["i2"], pdf["i3"], pdf["i4"]):
        if rel == "d":
            p = ("T", s1, int(i1), int(i2))
            c = ("T", s2, int(i3), int(i4))
            fwd[p].append((c, s3))
        elif rel == "m":
            t = ("T", s1, int(i1), int(i2))
            o = ("O", s2)
            fwd[t].append((o, "match"))
            match_rows.append((t, o, s3, int(i3)))
        elif rel == "i":
            fwd[("O", s1)].append((("O", s2), "inf"))
        elif rel == "r":
            roots.add(("T", s1, int(i1), int(i2)))

    deleted: set = set()                    # (parent, child, kind)

    def downstream(node, exclude=None):
        seen = {node}
        stack = [node]
        while stack:
            cur = stack.pop()
            for child, kind in fwd.get(cur, ()):
                if exclude and kind in exclude:
                    continue
                if (cur, child, kind) in deleted:
                    continue
                if child not in seen:
                    seen.add(child)
                    stack.append(child)
        return seen

    def is_superphrase(sup, sub):
        # strict sub-interval, 3 cases (pipeline_components.py:1014-1026)
        return ((sub[2] == sup[2] and sub[3] < sup[3])
                or (sub[2] > sup[2] and sub[3] == sup[3])
                or (sub[2] > sup[2] and sub[3] < sup[3]))

    mapped_t_nodes = sorted({t for t, _o, _mt, _ed in match_rows})
    for t in mapped_t_nodes:
        supers = [s for s in mapped_t_nodes if is_superphrase(s, t)]
        if not supers:
            continue
        reach_excl = {s: downstream(s, exclude=_P3_EXCLUDED_KINDS)
                      for s in supers}
        mapped_from_t = {c for c, kind in fwd.get(t, ())
                         if kind == "match" and (t, c, kind) not in deleted}
        keep = {m for m in mapped_from_t
                if all(m in reach_excl[s] for s in supers)}
        for child, kind in fwd.get(t, ()):
            if (t, child, kind) in deleted:
                continue
            if not (downstream(child) & keep):
                deleted.add((t, child, kind))

    # match rows survive iff their edge survived AND their source token is
    # still derivable from a kv root through surviving derivation edges
    # (the reference leaves severed subtrees in the graph; its extraction
    # later walks from the kv nodes, so unreachable ≡ deleted here)
    live = set(roots)
    stack = list(roots)
    while stack:
        cur = stack.pop()
        for child, kind in fwd.get(cur, ()):
            if (cur, child, kind) in deleted or child[0] != "T":
                continue
            if child not in live:
                live.add(child)
                stack.append(child)

    doc = pdf["doc_id"].iloc[0]
    out = [(doc, t[1], t[2], t[3], o[1], mt, ed)
           for t, o, mt, ed in match_rows
           if (t, o, "match") not in deleted and t in live]
    return pd.DataFrame(out, columns=["doc_id", "token", "start", "end",
                                      "target_id", "match_target",
                                      "edit_dist"])


def _p3_run_doc_safe(pdf: "pd.DataFrame",
                     fault_doc: str | None = None) -> "pd.DataFrame":
    """Per-document failure isolation around the exact P3 graph walk
    (reference skips-and-logs a bad sample, condor_run_pipeline.py:87-89;
    gather_mappings.py:37-44): an exception yields ONE marker row
    (match_target='__error__', token=the error text) instead of killing
    the job; the pipeline routes the doc to the _errors side table.
    ``fault_doc`` is the deterministic test fault hook
    (SPARK_GRAFT_FAULT_DOC, captured driver-side)."""
    doc = pdf["doc_id"].iloc[0]
    try:
        if fault_doc is not None and doc == fault_doc:
            raise ValueError("injected fault")
        return _p3_run_doc(pdf)
    except Exception as ex:  # noqa: BLE001 — isolation seam
        return pd.DataFrame(
            [(doc, f"{type(ex).__name__}: {ex}", 0, 0, "",
              "__error__", 0)],
            columns=["doc_id", "token", "start", "end", "target_id",
                     "match_target", "edit_dist"])


def remove_subinterval_matches(matches: DataFrame, deriv_edges: DataFrame,
                               inf_edges: DataFrame,
                               roots: DataFrame) -> DataFrame:
    """RemoveSubIntervalOfMatchedBlockAncestralLink_Stage — exact
    (pipeline_components.py:1012-1085).

    A matched token whose interval is a strict sub-interval of another
    matched token's interval has each of its out-edges severed unless the
    edge leads to a target reachable from *every* covering matched
    superphrase node through non-N-Gram/non-Delimiter derivations
    (:1051-1068); severing derivation edges kills the sub-token's whole
    derived subtree for later extraction.

    Spark plan: a native containment self-join finds the affected docs
    (whole-stage codegen, no Python); only those docs ship their token
    graph into a per-doc ``applyInPandas`` that runs the literal
    reference algorithm — bounded per-doc graphs, doc-partitioned, no
    cross-doc state, so the stage scales with executors.  Unaffected
    docs pass through untouched.
    """
    cls = matches.select("doc_id", "start", "end").distinct()
    a, b = cls.alias("a"), cls.alias("b")
    sub_docs = (a.join(b, on="doc_id")
                .where((F.col("a.start") >= F.col("b.start"))
                       & (F.col("a.end") <= F.col("b.end"))
                       & ~((F.col("a.start") == F.col("b.start"))
                           & (F.col("a.end") == F.col("b.end"))))
                .select("doc_id").distinct())

    passthrough = matches.join(sub_docs, on="doc_id", how="left_anti")
    nul_s = F.lit(None).cast("string")
    nul_i = F.lit(None).cast("int")
    g_m = (matches.join(sub_docs, on="doc_id", how="left_semi")
           .select("doc_id", F.lit("m").alias("rel"),
                   F.col("token").alias("s1"),
                   F.col("target_id").alias("s2"),
                   F.col("match_target").alias("s3"),
                   F.col("start").alias("i1"), F.col("end").alias("i2"),
                   F.col("edit_dist").alias("i3"), nul_i.alias("i4")))
    g_d = (deriv_edges.join(sub_docs, on="doc_id", how="left_semi")
           .select("doc_id", F.lit("d").alias("rel"),
                   F.col("ptoken").alias("s1"), F.col("token").alias("s2"),
                   F.col("kind").alias("s3"),
                   F.col("pstart").alias("i1"), F.col("pend").alias("i2"),
                   F.col("start").alias("i3"), F.col("end").alias("i4")))
    g_i = (inf_edges.join(sub_docs, on="doc_id", how="left_semi")
           .select("doc_id", F.lit("i").alias("rel"),
                   F.col("src_id").alias("s1"), F.col("dst_id").alias("s2"),
                   nul_s.alias("s3"), nul_i.alias("i1"), nul_i.alias("i2"),
                   nul_i.alias("i3"), nul_i.alias("i4")))
    g_r = (roots.join(sub_docs, on="doc_id", how="left_semi")
           .select("doc_id", F.lit("r").alias("rel"),
                   F.col("token").alias("s1"), nul_s.alias("s2"),
                   nul_s.alias("s3"),
                   F.col("start").alias("i1"), F.col("end").alias("i2"),
                   nul_i.alias("i3"), nul_i.alias("i4")))
    g = g_m.unionByName(g_d).unionByName(g_i).unionByName(g_r)
    import os
    fault_doc = os.environ.get("SPARK_GRAFT_FAULT_DOC")

    def _safe(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return _p3_run_doc_safe(pdf, fault_doc)

    pruned = g.groupBy("doc_id").applyInPandas(_safe, schema=_M_SCHEMA)
    return passthrough.unionByName(pruned)


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
