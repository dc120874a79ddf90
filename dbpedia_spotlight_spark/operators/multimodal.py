"""Multimodal column plumbing (driver mandate).

Image/audio/video payloads are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over mapInPandas. The decode step itself is
STUBBED (no codec libraries in this container): by default it raises
NotImplementedError, and with `fake=True` it produces a deterministic
fake decode derived from the md5 of the payload — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested either way.

The documents table's media spans (kind='media', media_ref='File:…')
attach to payloads via media_ref, mirroring the reference's opaque
handling of File: gallery fragments (WikiMarkupStripper passes them
through; SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_type string, payload binary, meta_width int,"
    " meta_height int"
)

DECODED_SCHEMA = (
    "media_ref string, width int, height int, n_frames int,"
    " features array<float>"
)


def _fake_decode(payload: bytes, n_features: int = 8):
    """Deterministic stand-in for a real codec: dimensions and a feature
    vector derived from the payload digest."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    n_frames = 1 + digest[2] % 8
    feats = [
        round(b / 255.0, 6)
        for b in hashlib.md5(digest).digest()[:n_features]
    ]
    return width, height, n_frames, feats


def decode_media(
    media: DataFrame, fake: bool = False, batch_features: int = 8
) -> DataFrame:
    """(media_ref, payload, ...) -> (media_ref, width, height, n_frames,
    features). Arrow-batched mapInPandas; one python call per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test double"
                )
            rows = {"media_ref": [], "width": [], "height": [],
                    "n_frames": [], "features": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                w, h, nf, feats = _fake_decode(
                    bytes(payload) if payload is not None else b"",
                    batch_features,
                )
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["features"].append(feats)
            yield pd.DataFrame(rows)

    return media.select("media_ref", "payload").mapInPandas(
        kernel, schema=DECODED_SCHEMA
    )


def resize_plan(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize metadata computation is pure column math (the pixel work
    would live in the decode kernel): scale preserving aspect ratio."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest("width", "height"),
    )
    return decoded.withColumn("scale", scale).withColumn(
        "out_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn(
        "out_height", F.ceil(F.col("height") * scale).cast("int")
    )


def sample_frames(decoded: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sampling plan: one output row per kept frame index —
    an explode of a sequence column, fully relational."""
    return decoded.select(
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_k)
            )
        ).alias("frame_idx"),
    )


def media_payloads_from_documents(
    documents: DataFrame, fake_payloads: bool = True
) -> DataFrame:
    """Extract media spans and synthesize deterministic fake payloads
    (md5-seeded bytes of the media_ref) — the container has no real blobs."""
    spans = documents.select(
        F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media").select(
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.text").alias("caption"),
    ).distinct()
    payload = (
        F.to_binary(F.md5(F.col("media_ref")), F.lit("hex"))
        if fake_payloads
        else F.lit(None).cast("binary")
    )
    return spans.withColumn("payload", payload).withColumn(
        "media_type", F.lit("image/jpeg")
    )
