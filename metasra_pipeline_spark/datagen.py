"""Deterministic synthetic `documents` generator (input_hint shape).

Emits an Iceberg/parquet-style table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`` plus a
ground-truth ``(doc_id, entity_id)`` table for the entity-resolution F1
harness.  Documents replay the reference's sample shapes
(``/root/reference/example.json``, ``test/test_input.json``): each kv pair
renders as one text span ``"key: value"``; 0–3 opaque media spans are
interleaved and must survive the engine byte-identical and in order
(span-sequence invariant from BASELINE.json input_hint).

Generation is distributed (``spark.range`` → ``mapInPandas``) and seeded
per doc index, so output is identical at any partitioning/parallelism —
that property is load-bearing for the N-vs-4N scaling benchmark.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ])), False),
])

GEN_SCHEMA = T.StructType(
    DOC_SCHEMA.fields + [T.StructField("entity_id", T.StringType(), False)]
)

_TISSUES = ["vastus lateralis muscle", "liver", "brain", "heart", "lung",
            "kidney", "skin", "bone marrow", "breast"]
_CELL_LINES = ["MDA-MB-231", "HeLa", "H9", "H7"]
_CELL_TYPES = ["T cell", "monocyte", "fibroblast", "endothelial cells"]
_MARKERS = ["CD4+", "CD8+", "naive"]
_SURNAMES = ["cohort-alpha", "cohort-beta", "cohort-gamma", "cohort-delta",
             "cohort-epsilon", "cohort-zeta"]


_PROTOCOLS = ["total RNA paired-end", "poly-A selected", "ribo-depleted",
              "single cell SMART-seq", "bulk ATAC protocol", "ChIP input"]
_CONDITIONS = ["untreated control", "TNF stimulated 6h", "hypoxia chamber",
               "serum starved", "IFN gamma treated", "vehicle DMSO"]


def _entity_attrs(ent_idx: int) -> dict[str, str]:
    """Canonical attribute dict for entity ``ent_idx`` (pure function).

    Fields vary independently per entity (per-entity RNG, not modular
    cycling) so that distinct entities rarely collide into
    near-duplicates — mirrors real SRA submissions where distinct
    samples differ in several attributes, not just a serial number.
    """
    rng = random.Random(0xE5717 + ent_idx)
    kind = ent_idx % 3
    attrs: dict[str, str] = {}
    # a distinctive stable identifier — the realistic "strong" linkage signal
    attrs["subject id"] = f"{rng.choice(_SURNAMES)}-{ent_idx:06d}"
    if kind == 0:
        attrs["tissue"] = rng.choice(_TISSUES)
        attrs["sex"] = rng.choice(["female", "male"])
        attrs["age"] = str(rng.randrange(20, 80))
        attrs["protocol"] = rng.choice(_PROTOCOLS)
    elif kind == 1:
        attrs["cell line"] = rng.choice(_CELL_LINES)
        attrs["passage"] = str(rng.randrange(1, 25))
        attrs["condition"] = rng.choice(_CONDITIONS)
    else:
        attrs["cell type"] = rng.choice(_CELL_TYPES)
        attrs["marker"] = rng.choice(_MARKERS)
        attrs["age"] = f"{rng.randrange(1, 13)} Year old"
        attrs["condition"] = rng.choice(_CONDITIONS)
    return attrs


_KEY_RENAMES = {"tissue": "source_name", "sex": "gender",
                "cell line": "cell_line", "cell type": "cell_type"}


def _typo(s: str, rng: random.Random) -> str:
    if len(s) < 5:
        return s
    i = rng.randrange(1, len(s) - 2)
    return s[:i] + s[i + 1] + s[i] + s[i + 2:]


def _doc_for(doc_idx: int, n_entities: int, seed: int,
             dup_factor: int) -> tuple[str, list, str]:
    ent_idx = doc_idx % n_entities if dup_factor > 1 else doc_idx
    rng = random.Random((seed << 32) ^ doc_idx)
    attrs = dict(_entity_attrs(ent_idx))

    variant = rng.randrange(6)
    if variant == 1:  # key rename
        for old, new in _KEY_RENAMES.items():
            if old in attrs:
                attrs[new] = attrs.pop(old)
                break
    elif variant == 2:  # typo in a hand-typed value (identifiers are
        # machine-copied in practice and stay intact)
        cands = [k for k in sorted(attrs) if k != "subject id"]
        k = rng.choice(cands)
        attrs[k] = _typo(attrs[k], rng)
    elif variant == 3:  # drop a non-identifier attribute
        droppable = [k for k in sorted(attrs) if k != "subject id"]
        if droppable:
            attrs.pop(rng.choice(droppable))
    elif variant == 4:  # extra noise attribute
        attrs[f"note{rng.randrange(10)}"] = "not applicable"
    elif variant == 5:  # case change
        k = rng.choice(sorted(attrs))
        attrs[k] = attrs[k].upper() if rng.random() < 0.5 else attrs[k].lower()

    items = list(attrs.items())
    rng.shuffle(items)
    spans, off = [], 0
    for k, v in items:
        spans.append(("text", f"{k}: {v}", "", off))
        off += 1
        if rng.random() < 0.3:
            spans.append(("media", "",
                          f"media://img/{doc_idx:08d}_{off}.png", off))
            off += 1
    return f"DOC{doc_idx:08d}", spans, f"ENT{ent_idx:08d}"


def synth_documents(spark: SparkSession, n_docs: int, seed: int = 42,
                    dup_factor: int = 5,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator.

    Returns (doc_id, spans, entity_id); select away ``entity_id`` for the
    engine input, keep it as ground truth for the F1 harness.
    ``dup_factor`` ≈ mean cluster size.
    """
    n_entities = max(1, n_docs // dup_factor)
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc_for(int(i), n_entities, seed, dup_factor)
                    for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": [r[0] for r in rows],
                "spans": [[{"kind": k, "text": t, "media_ref": m, "offset": o}
                           for k, t, m, o in r[1]] for r in rows],
                "entity_id": [r[2] for r in rows],
            })

    return base.mapInPandas(gen, schema=GEN_SCHEMA)


def docs_from_kv(spark: SparkSession,
                 kv_docs: list[tuple[str, list[tuple[str, str]]]]) -> DataFrame:
    """Build a spans `documents` table from explicit (doc_id, [(k, v), ...])
    lists — the test-fixture path (ordered, like the reference's JSON input).
    """
    rows = []
    for doc_id, pairs in kv_docs:
        spans = [{"kind": "text", "text": f"{k}: {v}", "media_ref": "",
                  "offset": i} for i, (k, v) in enumerate(pairs)]
        rows.append({"doc_id": doc_id, "spans": spans})
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)
