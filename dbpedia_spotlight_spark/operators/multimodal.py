"""Multimodal column plumbing (driver mandate).

Image/audio/video payloads are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over mapInPandas.

Decode is REAL for the Netpbm family (PGM P2/P5, PPM P3/P6 — parsed
with plain bytes + numpy, no codec libraries needed): dimensions,
per-channel statistics features, and an actual nearest-neighbor pixel
resize with re-encode. Codec-dependent formats (JPEG/PNG/audio/video)
remain STUBBED: they raise NotImplementedError unless `fake=True`
selects the deterministic md5-derived test double — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is identical
either way.

The documents table's media spans (kind='media', media_ref='File:…')
attach to payloads via media_ref, mirroring the reference's opaque
handling of File: gallery fragments (WikiMarkupStripper passes them
through; SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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


_NETPBM_MAGICS = {b"P2": 1, b"P3": 3, b"P5": 1, b"P6": 3}


def parse_netpbm(data: bytes) -> np.ndarray:
    """Netpbm PGM/PPM parser (pure bytes + numpy) -> HxWxC uint8 array.

    Handles whitespace/#-comment headers, ASCII (P2/P3) and binary
    (P5/P6) rasters, maxval scaling to 0..255."""
    if len(data) < 2 or data[:2] not in _NETPBM_MAGICS:
        raise ValueError("not a supported netpbm payload")
    magic = data[:2]
    channels = _NETPBM_MAGICS[magic]

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    width, height, maxval = fields
    n = width * height * channels
    if magic in (b"P5", b"P6"):
        pos += 1  # exactly one whitespace byte before the raster
        if maxval < 256:
            px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
        else:
            px = np.frombuffer(
                data, dtype=">u2", count=n, offset=pos
            ).astype(np.uint32)
    else:
        px = np.array(data[pos:].split()[:n], dtype=np.uint32)
    if maxval != 255:
        px = (px.astype(np.uint32) * 255 // maxval)
    return px.astype(np.uint8).reshape(height, width, channels)


def encode_netpbm(px: np.ndarray) -> bytes:
    """HxWxC uint8 -> binary PGM (C=1) / PPM (C=3)."""
    h, w, c = px.shape
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def _netpbm_features(px: np.ndarray) -> list[float]:
    """8 deterministic image statistics (the feature-extraction stage)."""
    h, w, c = px.shape
    f = px.astype(np.float64)
    chan = [float(f[:, :, k].mean()) / 255.0 for k in range(c)]
    chan += [chan[-1]] * (3 - len(chan))
    return [
        round(x, 6)
        for x in (
            float(f.mean()) / 255.0,
            float(f.std()) / 255.0,
            *chan,
            round(w / h, 6),
            float(f.min()) / 255.0,
            float(f.max()) / 255.0,
        )
    ]


def decode_media(
    media: DataFrame, fake: bool = False, batch_features: int = 8
) -> DataFrame:
    """(media_ref, payload, ...) -> (media_ref, width, height, n_frames,
    features). Arrow-batched mapInPandas; one python call per batch.

    Netpbm payloads decode for real; other formats raise
    NotImplementedError unless fake=True selects the test double."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "width": [], "height": [],
                    "n_frames": [], "features": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    w, h, nf, feats = _fake_decode(raw, batch_features)
                elif raw[:2] in _NETPBM_MAGICS:
                    px = parse_netpbm(raw)
                    h, w = px.shape[0], px.shape[1]
                    nf = 1
                    feats = _netpbm_features(px)
                else:
                    raise NotImplementedError(
                        "only netpbm (PGM/PPM) decodes natively; other "
                        "formats need codec libraries not present in this "
                        "environment — pass fake=True for the "
                        "deterministic test double"
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


def resize_media(media: DataFrame, max_side: int = 64) -> DataFrame:
    """REAL pixel resize for netpbm payloads: nearest-neighbor downscale
    preserving aspect ratio, re-encoded as binary PGM/PPM.
    -> (media_ref, payload, width, height)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "payload": [], "width": [],
                    "height": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                px = parse_netpbm(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                scale = min(1.0, max_side / max(w, h))
                ow = max(1, int(round(w * scale)))
                oh = max(1, int(round(h * scale)))
                yi = (np.arange(oh) * (h / oh)).astype(int)
                xi = (np.arange(ow) * (w / ow)).astype(int)
                out = px[yi][:, xi]
                rows["media_ref"].append(ref)
                rows["payload"].append(encode_netpbm(out))
                rows["width"].append(ow)
                rows["height"].append(oh)
            yield pd.DataFrame(rows)

    return media.select("media_ref", "payload").mapInPandas(
        kernel,
        schema="media_ref string, payload binary, width int, height int",
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
