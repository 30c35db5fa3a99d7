"""Kill-and-rerun resume: committed stage snapshots are READ on re-run,
never recomputed (the round-1 resume path rebuilt everything from raw
documents; this proves the fixed contract).

Strategy: run the checkpointed pipeline to completion, wipe the
snapshots *after* a chosen stage (simulating a kill there), then re-run
with a POISONED documents frame.  If resume recomputed from documents,
the output would reflect the poisoned input; identical output proves the
surviving snapshots were read."""

import os
import shutil

import pytest

from metasra_pipeline_spark.datagen import docs_from_kv
from metasra_pipeline_spark.ops import DirSnapshotter, run_checkpointed_pipeline


@pytest.fixture()
def docs(spark):
    return docs_from_kv(spark, [
        ("r1", [("tissue", "vastus lateralis muscle"), ("age", "48")]),
        ("r2", [("cell line", "MDA-MB-231"), ("passage", "3")]),
        ("r3", [("gender", "female"), ("source_name", "Lymphoblastoid")]),
    ])


def _mapped_set(df):
    return {(r["doc_id"], r["term_id"], r["consequent"]) for r in df.collect()}


def _rv_set(df):
    return {(r["doc_id"], r["property_id"], r["value"], r["unit_id"])
            for r in df.collect()}


def test_kill_and_rerun_resumes_from_snapshots(spark, refdata, docs, tmp_path):
    wd = str(tmp_path / "wd")
    mapped1, rv1 = run_checkpointed_pipeline(spark, docs, refdata, wd)
    out1, rvs1 = _mapped_set(mapped1), _rv_set(rv1)
    assert out1, "pipeline produced terms"

    committed = set(os.listdir(wd))
    # every pipeline cut point must be a durable commit
    for stage in ("kv", "deriv_expand", "tok_final", "m_matched", "m_p4",
                  "m_p3", "m_final", "inf_edges", "real_values",
                  "node_terms0", "node_terms", "mapped_terms"):
        assert stage in committed, f"missing snapshot for {stage}"

    # simulate a kill right after the tok_final commit: wipe later stages
    survivors = {"kv", "deriv_expand", "tok_final"}
    for name in committed - survivors:
        shutil.rmtree(os.path.join(wd, name))

    # poisoned input: totally different doc — any recompute-from-documents
    # path would change kv and therefore the output
    poisoned = docs_from_kv(spark, [("zz", [("tissue", "liver")])])
    mapped2, rv2 = run_checkpointed_pipeline(spark, poisoned, refdata, wd)
    assert _mapped_set(mapped2) == out1
    assert _rv_set(rv2) == rvs1

    # fully-committed re-run: every stage resumes, zero computed
    snap = DirSnapshotter(spark, wd)
    from metasra_pipeline_spark.plans.pipeline import run_mapping_pipeline
    res = run_mapping_pipeline(spark, poisoned, refdata, snap=snap)
    assert _mapped_set(res.mapped_terms) == out1
    assert snap.stages_computed == []
    assert "kv" in snap.stages_resumed and "m_final" in snap.stages_resumed
