"""Exact P3 (RemoveSubIntervalOfMatchedBlockAncestralLink) golden test.

The fixture is built so the round-1 interval-class approximation and the
reference's graph algorithm (pipeline_components.py:1012-1085) DISAGREE,
pinning the exact semantics:

value "adult stem cells", lexicon:
  R = TERM_NAME  "adult stem cells"
  Y = EXACT_SYN  "stem cells"
  Z = TERM_NAME  "stem cell"
  W = EXACT_SYN  "adult stem cell"
inflection: cells → cell;  linked_terms (I1): R → Z

Reference trace:
- tokens: root "adult stem cells" (→R), variant v_root "adult stem cell"
  (→W, same interval as root), n-gram t "stem cells" (→Y), t's variant
  c "stem cell" (→Z, same interval as t).
- c: supers {root, v_root}; keep = {Z} ∩ reach(root)={...,Z via I1} ∩
  reach(v_root)={W} → ∅ → c's match edge severed (per-super-NODE
  intersection — class pooling would keep Z via the root class).
- t: keep = {Y} ∩ reach(root) = ∅ → t's match edge AND the derivation
  edge t→c are severed (subtree killed — the approximation never severed
  derivations).
- surviving matches: root→R, v_root→W; Z only via inference → consequent.

The approximation kept (c→Z) ⇒ Z consequent=False; exact semantics give
Z consequent=True.
"""

import pytest

from metasra_pipeline_spark.datagen import docs_from_kv
from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
from metasra_pipeline_spark.refdata import EMPTY_RAW, refdata_from_raw

R, Y, Z, W = ("UBERON:0000001", "UBERON:0000002",
              "UBERON:0000003", "UBERON:0000004")


@pytest.fixture(scope="module")
def p3_ref(spark):
    raw = dict(EMPTY_RAW)
    raw.update({
        "terms": [
            {"id": R, "ont": "UBERON", "name": "adult stem cells", "syns": []},
            {"id": Y, "ont": "UBERON", "name": "y-only-name",
             "syns": [["stem cells", "EXACT"]]},
            {"id": Z, "ont": "UBERON", "name": "stem cell", "syns": []},
            {"id": W, "ont": "UBERON", "name": "w-only-name",
             "syns": [["adult stem cell", "EXACT"]]},
        ],
        "exact_match_onts": ["UBERON"],
        "inflection_variants": {"cells": ["cell"]},
        "linked_terms": {R: [Z]},
        "mappable_prefixes": ["UBERON"],
    })
    return refdata_from_raw(spark, raw)


def test_p3_severs_subphrase_derivations(spark, p3_ref):
    docs = docs_from_kv(spark, [("p1", [("probe", "adult stem cells")])])
    res = run_mapping_pipeline(spark, docs, p3_ref)
    matches = {(r["token"], r["target_id"])
               for r in res.matches.collect()}
    # Y's match and the sub-token Z match are gone; R and W survive
    assert matches == {("adult stem cells", R), ("adult stem cell", W)}
    mapped = {(r["term_id"], r["consequent"])
              for r in res.mapped_terms.collect()}
    # Z is reachable only through the I1 inference edge → consequent=True
    # (the interval-class approximation yielded (Z, False) here)
    assert mapped == {(R, False), (W, False), (Z, True)}


def test_p3_keeps_target_reachable_from_all_supers(spark, p3_ref):
    # "stem cells" value alone: t="stem cells"→Y is the TOP interval
    # (no strict superphrase) — nothing is severed, Y survives, and the
    # variant chain keeps Z matched from c ("stem cell", same interval)
    docs = docs_from_kv(spark, [("p2", [("probe", "stem cells")])])
    res = run_mapping_pipeline(spark, docs, p3_ref)
    matches = {(r["token"], r["target_id"]) for r in res.matches.collect()}
    assert ("stem cells", Y) in matches
    assert ("stem cell", Z) in matches
    mapped = {(r["term_id"], r["consequent"]) for r in res.mapped_terms.collect()}
    assert (Y, False) in mapped and (Z, False) in mapped
