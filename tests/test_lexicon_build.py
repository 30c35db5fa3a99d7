"""Offline lexicon builders (J5/J6/superterm) on mini ontologies."""

from metasra_pipeline_spark.sources.lexicon_build import (
    implications_table,
    linked_terms_table,
    superterm_linked_table,
    term_strings,
)


def _ont_a(spark):
    terms = spark.createDataFrame(
        [("EFO:1", "t cell", "EFO"), ("EFO:2", "brain", "EFO")],
        "term_id: string, name: string, ont: string")
    syns = spark.createDataFrame(
        [("EFO:1", "t lymphocyte", "EXACT")],
        "term_id: string, syn_str: string, syn_type: string")
    return terms, syns


def _ont_b(spark):
    terms = spark.createDataFrame(
        [("CL:1", "t cell", "CL"), ("CL:2", "t lymphocyte", "CL"),
         ("CL:3", "memory t cell", "CL"), ("CL:4", "brainzz", "CL")],
        "term_id: string, name: string, ont: string")
    syns = spark.createDataFrame(
        [], "term_id: string, syn_str: string, syn_type: string")
    return terms, syns


def test_linked_terms_same_string(spark):
    at, asy = _ont_a(spark)
    bt, bsy = _ont_b(spark)
    out = {(r["term_id"], r["linked_id"]) for r in linked_terms_table(
        term_strings(at, asy), term_strings(bt, bsy)).collect()}
    assert out == {("CL:1", "EFO:1"), ("CL:2", "EFO:1")}


def test_superterm_linked_includes_self(spark):
    anc = spark.createDataFrame([("CL:3", "CL:1", "is_a")],
                                "term_id: string, anc_id: string, rel: string")
    linked = spark.createDataFrame([("CL:1", "EFO:1")],
                                   "term_id: string, linked_id: string")
    out = {(r["term_id"], r["linked_id"])
           for r in superterm_linked_table(anc, linked).collect()}
    # CL:3 inherits its superterm's link; CL:1 keeps its own
    # (recursive_relationship includes the seed term)
    assert out == {("CL:3", "EFO:1"), ("CL:1", "EFO:1")}


def test_implication_mining_token_subset(spark):
    at, asy = _ont_a(spark)
    bt, bsy = _ont_b(spark)
    out = {(r["term_id"], r["implied_id"])
           for r in implications_table(at, asy, bt, bsy).collect()}
    # 'memory t cell' (absent from A) contains full-token phrase 't cell'
    # → CL:3 implies EFO:1; 'brainzz' ⊅ token 'brain' (substring only,
    # not a full token) → no implication; CL:1/CL:2 are present in A →
    # excluded by the b-in-a probe
    assert out == {("CL:3", "EFO:1")}
