"""Per-document failure isolation: a poison doc must not kill the job —
it is excluded from every output frame and recorded in the ``errors``
side table (reference skip-and-log behavior,
create_metasra/condor_run_pipeline.py:87-89, gather_mappings.py:37-44).
"""

import pytest

from metasra_pipeline_spark.datagen import docs_from_kv
from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
from metasra_pipeline_spark.refdata import load_refdata

GOOD = [
    ("ok1", [("age", "48"), ("tissue", "liver")]),
    ("ok2", [("cell line", "MDA-MB-231"), ("passage", "3")]),
]


def _run(spark, docs_kv):
    ref = load_refdata(spark)
    return run_mapping_pipeline(spark, docs_from_kv(spark, docs_kv), ref)


def test_expand_fault_isolated(spark, monkeypatch):
    """A string that throws inside the expansion UDF: the job completes,
    the doc is excluded everywhere, the error row is queryable."""
    import metasra_pipeline_spark.operators.stages as S
    monkeypatch.setenv("SPARK_GRAFT_FAULT_TOKEN", "poisonxyz")
    S._udf_cache.clear()
    res = _run(spark, GOOD + [("bad1", [("tissue", "poisonxyz")])])
    errs = res.errors.collect()
    assert [(e["doc_id"], e["stage"]) for e in errs] == [("bad1", "expand")]
    assert "injected fault" in errs[0]["error"]
    for frame in (res.kv, res.tokens, res.matches, res.real_values,
                  res.mapped_terms):
        assert frame.where("doc_id = 'bad1'").count() == 0
    # healthy docs still fully processed
    assert res.mapped_terms.where("doc_id = 'ok1'").count() > 0
    assert res.kv.select("doc_id").distinct().count() == 2


def test_p3_fault_isolated(spark, monkeypatch):
    """A doc whose P3 graph walk throws: job completes, doc excluded,
    error row queryable.  The fault doc must actually ENTER the per-doc
    P3 path, so it needs overlapping matched intervals (a sub-interval
    of another matched token)."""
    monkeypatch.setenv("SPARK_GRAFT_FAULT_DOC", "bad2")
    # "vastus lateralis muscle" produces nested matched intervals
    res = _run(spark, GOOD
               + [("bad2", [("tissue", "vastus lateralis muscle")])])
    errs = res.errors.collect()
    assert [(e["doc_id"], e["stage"]) for e in errs] == [("bad2", "p3")]
    assert "injected fault" in errs[0]["error"]
    for frame in (res.kv, res.tokens, res.matches, res.real_values,
                  res.mapped_terms):
        assert frame.where("doc_id = 'bad2'").count() == 0
    assert res.mapped_terms.where("doc_id = 'ok1'").count() > 0


def test_clean_run_has_empty_errors(spark):
    res = _run(spark, GOOD)
    assert res.errors.count() == 0
    assert [f.name for f in res.errors.schema.fields] == [
        "doc_id", "stage", "error"]
