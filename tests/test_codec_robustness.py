"""Regression tests for the round-3 ADVICE robustness items: JPEG
fill-byte padding (B.1.1.2), JPEG non-divisible sampling factors, and
truncated-GIF error contracts. Pure python — no Spark session."""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.jpeg import encode_jpeg, parse_jpeg
from dbpedia_spotlight_spark.operators.multimodal import (
    encode_gif,
    parse_gif,
)


def _sample_image():
    rng = np.random.default_rng(11)
    # smooth gradient + noise so the stream has real entropy-coded data
    y, x = np.mgrid[0:24, 0:32]
    base = (4 * y + 3 * x) % 256
    return np.clip(
        base + rng.integers(-8, 8, size=base.shape), 0, 255
    ).astype(np.uint8)[:, :, None]  # HxWx1 grayscale


def test_jpeg_fill_bytes_before_markers_decode_identically():
    """Spec B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker byte; a conforming decoder skips them. Inject fills before
    SOF0 and before SOS and require bit-identical pixel output."""
    img = _sample_image()
    clean = encode_jpeg(img)
    ref = parse_jpeg(clean)
    for marker in (b"\xff\xc0", b"\xff\xda"):
        i = clean.find(marker)
        assert i > 0
        padded = clean[:i] + b"\xff\xff\xff" + clean[i:]
        got = parse_jpeg(padded)
        assert np.array_equal(got, ref)


def test_jpeg_nondivisible_sampling_factors_rejected():
    """h_max=3 with a 2-sampled component (3:2) cannot be upsampled by
    integer repeat — must fail with the clear unsupported-format error,
    not a numpy broadcast crash."""
    body = bytes(
        [8, 0, 8, 0, 8, 2,        # precision, h=8, w=8, ncomp=2
         1, 0x31, 0,              # comp 1: h=3, v=1, tq 0
         2, 0x21, 1]              # comp 2: h=2, v=1, tq 1
    )
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    data = b"\xff\xd8" + seg + b"\xff\xd9"
    with pytest.raises(ValueError, match="sampling factors"):
        parse_jpeg(data)


def test_jpeg_zero_sampling_factor_rejected():
    body = bytes([8, 0, 8, 0, 8, 1, 1, 0x01, 0])  # h=0, v=1
    seg = b"\xff\xc0" + (len(body) + 2).to_bytes(2, "big") + body
    data = b"\xff\xd8" + seg + b"\xff\xd9"
    with pytest.raises(ValueError, match="sampling factors"):
        parse_jpeg(data)


def test_truncated_gif_raises_valueerror_not_indexerror():
    """Every truncation point inside the block walk must surface the
    parser's ValueError contract (the Spark kernel turns that into a
    clean per-row error), never a bare IndexError."""
    img = ((np.arange(16 * 16, dtype=np.uint8).reshape(16, 16) % 7)
           * 30)[:, :, None]
    gif = encode_gif(img)
    full, n_frames = parse_gif(gif)
    assert n_frames >= 1
    # cut points: right after the screen descriptor, mid image
    # descriptor, mid LZW sub-blocks, and just before the trailer
    for cut in (13, 14, 20, len(gif) // 2, len(gif) - 2):
        with pytest.raises(ValueError):
            parse_gif(gif[:cut])
