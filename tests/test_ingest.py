"""Ingest + span-sequence invariant (BASELINE.json input_hint)."""

from metasra_pipeline_spark.datagen import docs_from_kv, synth_documents
from metasra_pipeline_spark.ingest import documents_to_kv, spans_roundtrip


def test_kv_intervals_match_reference_running_index(spark):
    # InitKeyValueTokens_Stage semantics (pipeline_components.py:238-261)
    docs = docs_from_kv(spark, [
        ("d1", [("tissue", "vastus lateralis muscle"), ("age", "48")]),
    ])
    rows = {r["key"]: r for r in documents_to_kv(docs).collect()}
    t = rows["tissue"]
    assert (t["key_start"], t["key_end"]) == (0, 6)
    assert (t["val_start"], t["val_end"]) == (6, 29)
    a = rows["age"]
    assert (a["key_start"], a["key_end"]) == (29, 32)
    assert (a["val_start"], a["val_end"]) == (32, 34)


def test_span_sequence_invariant(spark):
    docs = synth_documents(spark, 50, seed=42).select("doc_id", "spans")
    before = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]] for r in docs.collect()}
    # run ingest (read-only) then re-emit spans — must be byte-identical
    documents_to_kv(docs).count()
    after = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                           for s in r["spans"]]
             for r in spans_roundtrip(docs).collect()}
    assert before == after
    assert any(any(s[0] == "media" for s in v) for v in after.values())


def test_synth_documents_deterministic_across_parallelism(spark):
    a = synth_documents(spark, 40, seed=42, partitions=2).collect()
    b = synth_documents(spark, 40, seed=42, partitions=8).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted([r.asDict(True) for r in a], key=lambda d: d["doc_id"]) == \
        sorted([r.asDict(True) for r in b], key=lambda d: d["doc_id"])
