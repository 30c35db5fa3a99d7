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


def test_stateful_sessionize_across_restarts(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): gap-based
    sessions close only when a later event proves the gap elapsed, and
    the OPEN session's state survives a stream restart through the
    checkpoint — the second availableNow run closes a session whose
    first events arrived in the first run."""
    import datetime as dt
    import os

    from metasra_pipeline_spark.streaming.sessions import (
        run_sessionize_available_now,
        sessionize,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "user_id: bigint, ts: timestamp, event_id: bigint"
        ).write.mode("append").parquet(in_dir)

    def stream():
        schema = "user_id bigint, ts timestamp, event_id bigint"
        return sessionize(
            spark.readStream.schema(schema).parquet(in_dir),
            gap_minutes=30)

    # run 1: session A (2 events) closed by a 2h-later event that
    # OPENS session B (1 event, stays in state)
    write([(1, t0, 10), (1, t0 + dt.timedelta(seconds=10), 11),
           (1, t0 + dt.timedelta(hours=2), 12)])
    run_sessionize_available_now(stream(), out_dir, ck_dir)
    got1 = spark.read.parquet(out_dir).collect()
    assert [(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"]) for r in got1] == \
        [(1, t0, t0 + dt.timedelta(seconds=10), 2)]

    # run 2 (restart from checkpoint): an event within the gap EXTENDS
    # session B from state; a 5h-later event closes it with n=2
    write([(1, t0 + dt.timedelta(hours=2, seconds=20), 13),
           (1, t0 + dt.timedelta(hours=5), 14)])
    run_sessionize_available_now(stream(), out_dir, ck_dir)
    got2 = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"]) for r in spark.read.parquet(out_dir).collect()}
    assert (1, t0 + dt.timedelta(hours=2),
            t0 + dt.timedelta(hours=2, seconds=20), 2) in got2
    assert len(got2) == 2


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Built-in watermark + tumbling window: counts per event_type per
    10-minute window over a drained file stream."""
    import datetime as dt
    import os

    from metasra_pipeline_spark.streaming.sessions import (
        windowed_event_counts,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "user_id bigint, ts timestamp, event_type string"

    def drain():
        out = windowed_event_counts(
            spark.readStream.schema(schema).parquet(in_dir),
            window="10 minutes", watermark="5 minutes")
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    # run 1: events in window [0,10) and [10,20); watermark advances to
    # 11-5=6min at batch END, so nothing is finalized yet
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=m), "click") for m in (1, 2, 11)],
        "user_id: bigint, ts: timestamp, event_type: string"
    ).write.mode("append").parquet(in_dir)
    drain()

    # run 2: a minute-20 event pushes the watermark to 15min — past the
    # first window's end — finalizing exactly [0,10) with 2 events; the
    # later windows stay open (append mode emits only finalized windows)
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=20), "click")],
        "user_id: bigint, ts: timestamp, event_type: string"
    ).write.mode("append").parquet(in_dir)
    drain()
    rows = {(r["window_start"], r["event_type"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {(t0, "click", 2)}
