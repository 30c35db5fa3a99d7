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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KV_COLS = ["doc_id", "key", "value", "key_start", "key_end",
           "val_start", "val_end"]


_KV_AGG = """
aggregate(
  transform(
    filter(spans, s -> s.kind = 'text'),
    s -> struct(
      CASE WHEN instr(s.text, ': ') > 0
           THEN substring(s.text, 1, instr(s.text, ': ') - 1)
           ELSE s.text END AS key,
      CASE WHEN instr(s.text, ': ') > 0
           THEN substring(s.text, instr(s.text, ': ') + 2,
                          length(s.text))
           ELSE '' END AS value)),
  struct(
    cast(array() as array<struct<key:string, value:string,
         key_start:int, key_end:int, val_start:int, val_end:int>>) AS acc,
    0 AS cur),
  (st, p) -> struct(
    array_append(st.acc, struct(
      p.key, p.value,
      st.cur AS key_start,
      cast(st.cur + length(p.key) AS int) AS key_end,
      cast(st.cur + length(p.key) AS int) AS val_start,
      cast(st.cur + length(p.key) + length(p.value) AS int) AS val_end))
      AS acc,
    cast(st.cur + length(p.key) + length(p.value) AS int) AS cur),
  st -> st.acc)
"""


def documents_to_kv(documents: DataFrame) -> DataFrame:
    """(doc_id, spans) → (doc_id, key, value, key_start, key_end,
    val_start, val_end).

    Entirely row-local: the running char cursor is folded inside the
    spans array with ``aggregate`` (whole-stage codegen), so ingest is
    zero-shuffle and usable unchanged on streaming DataFrames (window
    functions are not — streaming/ingest.py relies on this)."""
    return (documents
            .select("doc_id", F.explode(F.expr(_KV_AGG)).alias("kv"))
            .select("doc_id", "kv.key", "kv.value", "kv.key_start",
                    "kv.key_end", "kv.val_start", "kv.val_end"))


def spans_roundtrip(documents: DataFrame) -> DataFrame:
    """Identity projection of the spans table — used by the invariant test
    to assert the engine never rewrites (kind, text, media_ref, order)."""
    return documents.select("doc_id", "spans")
