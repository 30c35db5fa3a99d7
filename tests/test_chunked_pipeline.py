"""run_chunked_pipeline ≡ run_mapping_pipeline (chunking is
semantics-preserving: every stage keys on doc_id, mirroring the
reference's per-chunk Condor jobs + gather_mappings.py:25-41 merge)."""

from metasra_pipeline_spark.datagen import synth_documents
from metasra_pipeline_spark.plans.pipeline import (
    run_chunked_pipeline,
    run_mapping_pipeline,
)


def test_chunked_equals_unchunked(spark, refdata):
    docs = (synth_documents(spark, 60, seed=11)
            .select("doc_id", "spans").localCheckpoint(eager=True))
    a = run_mapping_pipeline(spark, docs, refdata)
    b = run_chunked_pipeline(spark, docs, refdata, n_chunks=3)
    ma = {tuple(r) for r in
          a.mapped_terms.select("doc_id", "term_id", "consequent").collect()}
    mb = {tuple(r) for r in
          b.mapped_terms.select("doc_id", "term_id", "consequent").collect()}
    assert ma == mb and len(ma) > 0
    ra = {tuple(r) for r in
          a.real_values.select("doc_id", "property_id", "value").collect()}
    rb = {tuple(r) for r in
          b.real_values.select("doc_id", "property_id", "value").collect()}
    assert ra == rb


def test_chunked_single_chunk_passthrough(spark, refdata):
    docs = (synth_documents(spark, 20, seed=12)
            .select("doc_id", "spans").localCheckpoint(eager=True))
    res = run_chunked_pipeline(spark, docs, refdata, n_chunks=1)
    assert res.mapped_terms.count() > 0
