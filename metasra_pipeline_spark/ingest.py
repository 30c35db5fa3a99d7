"""Ingest: interleaved span documents → flattened kv_pairs side table.

Replays the reference's key/value decomposition and running char-interval
assignment (``InitKeyValueTokens_Stage``, pipeline_components.py:238-261):
per document, each kv pair gets the intervals
``key:[c, c+len(key))  value:[c+len(key), c+len(key)+len(value))`` with a
running cursor ``c`` in span order.

Non-destructive by construction: the ``documents`` table is only read;
media spans and span order are untouched (span-sequence invariant from
BASELINE.json input_hint).  The window running-sum shuffles once on
``doc_id`` — the same partitioning every downstream per-doc stage reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KV_COLS = ["doc_id", "key", "value", "key_start", "key_end",
           "val_start", "val_end"]


def documents_to_kv(documents: DataFrame) -> DataFrame:
    """(doc_id, spans) → (doc_id, key, value, key_start, key_end,
    val_start, val_end)."""
    sp = (
        documents
        .select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .where(F.col("span.kind") == F.lit("text"))
        .select(
            "doc_id", "pos",
            F.col("span.text").alias("payload"),
        )
    )
    sep_idx = F.instr("payload", ": ")
    parsed = sp.select(
        "doc_id", "pos",
        F.when(sep_idx > 0, F.substring("payload", F.lit(1), sep_idx - 1))
         .otherwise(F.col("payload")).alias("key"),
        F.when(sep_idx > 0,
               F.col("payload").substr(sep_idx + 2, F.length("payload")))
         .otherwise(F.lit("")).alias("value"),
    )
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    klen = F.length("key")
    vlen = F.length("value")
    return (
        parsed
        .withColumn("key_start",
                    F.coalesce(F.sum(klen + vlen).over(w), F.lit(0))
                     .cast("int"))
        .withColumn("key_end", (F.col("key_start") + klen).cast("int"))
        .withColumn("val_start", F.col("key_end"))
        .withColumn("val_end", (F.col("val_start") + vlen).cast("int"))
        .select(*KV_COLS)
    )


def spans_roundtrip(documents: DataFrame) -> DataFrame:
    """Identity projection of the spans table — used by the invariant test
    to assert the engine never rewrites (kind, text, media_ref, order)."""
    return documents.select("doc_id", "spans")
