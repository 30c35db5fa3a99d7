"""Structured Streaming incremental ingest: availableNow drains new
files exactly once and resumes from checkpointed offsets."""

import os

from metasra_pipeline_spark.datagen import docs_from_kv
from metasra_pipeline_spark.streaming.ingest import (
    incremental_exact_matches,
    read_document_stream,
    run_available_now,
)


def test_incremental_ingest_available_now(spark, refdata, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    batch1 = docs_from_kv(spark, [
        ("s1", [("tissue", "liver")]),
    ])
    batch1.write.mode("append").parquet(in_dir)

    stream = incremental_exact_matches(
        read_document_stream(spark, in_dir), refdata)
    run_available_now(stream, out_dir, ck_dir)
    got1 = {(r["doc_id"], r["term_id"])
            for r in spark.read.parquet(out_dir).collect()}
    assert ("s1", "UBERON:0002107") in got1

    # second drop: only the new file is processed (exactly-once offsets)
    batch2 = docs_from_kv(spark, [
        ("s2", [("tissue", "brain")]),
    ])
    batch2.write.mode("append").parquet(in_dir)
    stream = incremental_exact_matches(
        read_document_stream(spark, in_dir), refdata)
    run_available_now(stream, out_dir, ck_dir)
    got2 = [ (r["doc_id"], r["term_id"])
             for r in spark.read.parquet(out_dir).collect() ]
    assert ("s2", "UBERON:0000955") in set(got2)
    # s1's liver match appears exactly once — batch1 not reprocessed
    assert got2.count(("s1", "UBERON:0002107")) == 1
