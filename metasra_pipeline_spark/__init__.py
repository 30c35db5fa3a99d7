"""metasra_pipeline_spark — a PySpark-native record-linkage / metadata
normalization engine with the query and data-processing capabilities of
deweylab/MetaSRA-pipeline, re-architected Spark-first.

The reference (read-only at /root/reference) is a per-document, in-memory
Python object-graph interpreter (map_sra_to_ontology/pipeline_components.py).
This engine re-expresses the same semantics as declarative DataFrame plans:

- documents are rows of an Iceberg/parquet table
  ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``;
- the per-document TextReasoningGraph (text_reasoning_graph.py:307-316)
  flattens into long-format DataFrames (tokens / matches / inference edges);
- trie + BK-tree lookups (pipeline_components.py:771-791, 846-948) become
  broadcast hash joins and blocked similarity joins;
- cross-document entity resolution is blocking → pairwise scoring →
  large-star/small-star connected components.

No code is copied from the reference; file:line citations in docstrings
are for behavioral parity only.
"""

__version__ = "0.1.0"
