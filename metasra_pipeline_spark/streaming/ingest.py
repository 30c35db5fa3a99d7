"""Incremental ingest via Structured Streaming.

The reference and the north_rule are batch + snapshot-resume (SURVEY.md
§2.10) — no watermark/session-window semantics are required.  What a
production deployment does need is *incremental* processing of newly
landed document files; this module provides that as a
``readStream`` → stateless transform → ``writeStream`` pipeline with the
``availableNow`` trigger: each invocation drains whatever landed since
the last checkpointed offset and exits (the streaming-native equivalent
of the reference's chunked re-runs, with exactly-once sinks).

Stateless per-doc transforms only (kv extraction, exact lexicon match):
per-doc semantics need no cross-batch state.  Heavier stages (fuzzy
matching, clustering) run as the batch pipeline over the accumulated
table — the standard incremental-ETL + periodic-batch-consolidation
split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import DOC_SCHEMA
from ..ingest import documents_to_kv
from ..refdata import RefData


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of spans documents (parquet drops)."""
    return (spark.readStream.schema(DOC_SCHEMA)
            .parquet(input_dir))


def incremental_exact_matches(stream_docs: DataFrame,
                              ref: RefData) -> DataFrame:
    """Per-microbatch: spans → kv → key/value tokens (lowercased) →
    broadcast exact lexicon join.  All stateless & shuffle-free except
    the per-doc window in ingest (runs per microbatch)."""
    kv = documents_to_kv(stream_docs)
    keys = kv.select("doc_id", F.col("key").alias("token"))
    vals = kv.select("doc_id", F.col("value").alias("token"))
    toks = keys.unionByName(vals)
    toks = toks.unionByName(toks.withColumn("token", F.lower("token")))
    lex = ref.lexicon.where("exact_ok").select("string", "term_id",
                                               "match_target")
    return (toks.join(F.broadcast(lex), toks.token == lex.string)
            .select("doc_id", "token", "term_id", "match_target")
            .distinct())


def run_available_now(matches_stream: DataFrame, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain all available input once (exactly-once via checkpointed
    offsets), then stop — resumable incremental batches."""
    q = (matches_stream.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
