"""Multimodal column operators: media spans as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The engine's `documents` table interleaves text and media spans
(BASELINE.json input_hint).  Media payloads are treated as opaque
references / binary columns with typed metadata — the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
real and tested; the actual decoders (image/audio libs are not in this
container) are stubbed behind ``decode_stub`` with a deterministic fake,
clearly marked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),   # image | audio | video | unknown
    T.StructField("content", T.BinaryType()),      # opaque payload (fake here)
    T.StructField("content_sha", T.StringType()),
    T.StructField("width", T.IntegerType()),       # image/video
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),    # video frame count
    T.StructField("duration_ms", T.IntegerType()),  # audio/video
])


def extract_media_spans(documents: DataFrame) -> DataFrame:
    """(doc_id, media_ref, ord) — media spans in order; non-destructive
    (the spans column itself is never rewritten)."""
    return (documents
            .select("doc_id", F.posexplode("spans").alias("ord", "span"))
            .where(F.col("span.kind") == "media")
            .select("doc_id", F.col("span.media_ref").alias("media_ref"),
                    "ord"))


def _infer_kind(ref: str) -> str:
    lower = ref.lower()
    if lower.endswith((".png", ".jpg", ".jpeg", ".webp")):
        return "image"
    if lower.endswith((".wav", ".mp3", ".flac")):
        return "audio"
    if lower.endswith((".mp4", ".webm", ".mkv")):
        return "video"
    return "unknown"


def _fake_decode(ref: str) -> dict:
    """Deterministic fake decoder.

    STUB: a production deployment replaces this with real fetch+decode
    (PIL / torchaudio / pyav).  The fake derives every field from the
    sha256 of the ref so results are stable across runs and partitions.
    """
    h = hashlib.sha256(ref.encode()).digest()
    kind = _infer_kind(ref)
    return {
        "media_kind": kind,
        "content": h,  # 32 opaque bytes standing in for the payload
        "content_sha": h.hex(),
        "width": 64 + h[0] if kind in ("image", "video") else None,
        "height": 64 + h[1] if kind in ("image", "video") else None,
        "n_frames": 1 + h[2] % 64 if kind == "video" else None,
        "duration_ms": 1000 + int.from_bytes(h[3:5], "big")
        if kind in ("audio", "video") else None,
    }


def decode_media(media: DataFrame, real_decoder=None) -> DataFrame:
    """mapInPandas decode: Arrow batches in, typed metadata + binary out.

    ``real_decoder(ref) -> dict`` may be injected; otherwise the
    deterministic stub runs.  Partitioning: inherits the upstream
    doc-keyed partitioning — decode is narrow, no shuffle.
    """
    decoder = real_decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(r) for r in pdf["media_ref"]]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "media_ref": pdf["media_ref"].values,
            })
            for field in ("media_kind", "content", "content_sha", "width",
                          "height", "n_frames", "duration_ms"):
                out[field] = [m[field] for m in metas]
            yield out

    return media.select("doc_id", "media_ref").mapInPandas(
        run, schema=MEDIA_META_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """(doc_id, media_ref, frame_idx) — every n-th frame of each video;
    pure native explode over a sequence, no Python."""
    return (decoded.where(F.col("media_kind") == "video")
            .select("doc_id", "media_ref",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_frames") - 1,
                        F.lit(every_n))).alias("frame_idx")))


def media_feature_stub(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """(doc_id, media_ref, feature array<float>) — deterministic fake
    embedding from the content hash; real feature extractors drop in at
    the same mapInPandas seam."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [b / 255.0 for b in bytes(c)[:dim]] if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "media_ref": pdf["media_ref"].values,
                                "feature": feats})

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])
    return decoded.select("doc_id", "media_ref", "content").mapInPandas(
        run, schema=schema)
