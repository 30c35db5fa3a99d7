"""T7 CellosaurusSynonyms + F2 ATCCKeyValueFilter operator tests.

Reference semantics: pipeline_components.py:356-358 (T7, base
Synonyms_Stage :323-353) and :1162-1192 (F2).
"""

from metasra_pipeline_spark.operators.stages import (
    atcc_key_value_filter,
    cellosaurus_synonyms,
)
from metasra_pipeline_spark.refdata import EMPTY_RAW, refdata_from_raw


def _ref(spark, **over):
    return refdata_from_raw(spark, {**EMPTY_RAW, **over})


def test_cellosaurus_synonyms_expands_set_members(spark):
    ref = _ref(spark, cvcl_syn_sets=[["hela", "hela cell", "hela-s3"],
                                     ["h9", "wa09"]])
    tok = spark.createDataFrame(
        [("D1", "hela", 0, 4), ("D1", "liver", 6, 11), ("D2", "wa09", 0, 4)],
        "doc_id: string, token: string, start: int, end: int")
    out, edges = cellosaurus_synonyms(tok, ref, with_edges=True)
    rows = {(r.doc_id, r.token, r.start, r.end) for r in out.collect()}
    # every other member of the matched set appears at the SAME interval
    assert ("D1", "hela cell", 0, 4) in rows
    assert ("D1", "hela-s3", 0, 4) in rows
    assert ("D2", "h9", 0, 4) in rows
    # non-member untouched; no cross-set leakage
    assert ("D1", "liver", 6, 11) in rows
    assert not any(t == "wa09" for d, t, *_ in rows if d == "D1")
    e = {(r.ptoken, r.token, r.kind) for r in edges.collect()}
    assert ("hela", "hela cell", "Cellosaurus synonym") in e


def test_cellosaurus_synonyms_dedup_false_defers_distinct(spark):
    ref = _ref(spark, cvcl_syn_sets=[["a", "b"]])
    tok = spark.createDataFrame(
        [("D1", "a", 0, 1), ("D1", "b", 0, 1)],
        "doc_id: string, token: string, start: int, end: int")
    lazy = cellosaurus_synonyms(tok, ref, dedup=False)
    # b derived from a collides with the existing b row — dedup=False
    # keeps the duplicate (callers fold it into their next cut)
    assert lazy.count() == 4
    assert cellosaurus_synonyms(tok, ref).count() == 2


def test_atcc_filter_keys_and_values(spark):
    ref = _ref(spark, cell_line_filter_keys=["catalog number"],
               cell_line_filter_values=["atcc"])
    kv = spark.createDataFrame(
        [("D1", "catalog number", "CRL-1573"),
         ("D1", "tissue", "liver"),
         ("D2", "provider", "atcc")],
        "doc_id: string, key: string, value: string")
    out = {(r.doc_id, r.key) for r in atcc_key_value_filter(kv, ref).collect()}
    assert out == {("D1", "tissue")}
    # toggles mirror the reference's perform_filter_* constructor flags
    keys_only = atcc_key_value_filter(kv, ref, perform_filter_values=False)
    assert {(r.doc_id, r.key) for r in keys_only.collect()} == {
        ("D1", "tissue"), ("D2", "provider")}
