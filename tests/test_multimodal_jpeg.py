"""Baseline JPEG codec (pure python Huffman + numpy DCT).

Oracle strategy: the DCT basis is pinned against an FFT-derived DCT-II
(a different computational path), the zigzag table against the spec's
known prefix plus structural invariants, and the codec against lossy
round-trip error bounds (constant images near-exact, smooth images at
high PSNR), exact decode-equality between restart/no-restart streams,
and subsampled/odd-size geometry checks.
"""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.jpeg import (
    _DCT_A,
    _ZIGZAG,
    encode_jpeg,
    parse_jpeg,
)


def _dct2_fft(x):
    """Orthonormal DCT-II via the even/odd-reordered FFT identity —
    independent of the basis-matrix construction under test."""
    n = len(x)
    v = np.concatenate([x[0::2], x[1::2][::-1]])
    f = np.fft.fft(v)
    k = np.arange(n)
    out = np.real(np.exp(-1j * np.pi * k / (2 * n)) * f)
    scale = np.full(n, np.sqrt(2.0 / n))
    scale[0] = np.sqrt(1.0 / n)
    return out * scale


def test_dct_basis_matches_fft_derivation():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.normal(size=8)
        assert np.allclose(_DCT_A @ x, _dct2_fft(x), atol=1e-12)


def test_dct_basis_orthonormal():
    assert np.allclose(_DCT_A @ _DCT_A.T, np.eye(8), atol=1e-12)


def test_zigzag_spec_prefix_and_structure():
    zz = list(_ZIGZAG)
    assert zz[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-3:] == [47, 55, 62][-3:] or zz[-1] == 63
    assert sorted(zz) == list(range(64))
    for a, b in zip(zz, zz[1:]):
        dr = abs(b // 8 - a // 8)
        dc = abs(b % 8 - a % 8)
        assert dr <= 1 and dc <= 1  # the walk moves to a neighbor


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_constant_image_near_exact():
    px = np.full((24, 16, 3), 130, dtype=np.uint8)
    out = parse_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - 130).max() <= 1


def test_gray_roundtrip_smooth():
    yy, xx = np.mgrid[0:40, 0:32]
    px = ((np.sin(yy / 7.0) + np.cos(xx / 9.0) + 2) / 4 * 255).astype(
        np.uint8
    )[:, :, None]
    out = parse_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert _psnr(out, px) > 40


def test_rgb_roundtrip_smooth_444():
    yy, xx = np.mgrid[0:33, 0:19]  # non-multiple-of-8 on purpose
    px = np.stack(
        [
            (yy * 3 % 256),
            (xx * 5 % 256),
            ((yy + xx) * 2 % 256),
        ],
        axis=2,
    ).astype(np.uint8)
    out = parse_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert _psnr(out, px) > 32


def test_rgb_roundtrip_420_subsampled():
    yy, xx = np.mgrid[0:30, 0:22]
    px = np.stack(
        [yy * 4 % 256, xx * 4 % 256, (yy + xx) % 256], axis=2
    ).astype(np.uint8)
    out = parse_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert out.shape == px.shape
    assert _psnr(out, px) > 26  # chroma is quartered, luma intact


def test_noise_image_bounded_error():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    out = parse_jpeg(encode_jpeg(px, quality=100))
    # quality 100 quantizes with all-ones tables: near-lossless
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_restart_markers_decode_identically():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = parse_jpeg(encode_jpeg(px, quality=80))
    with_rst = parse_jpeg(encode_jpeg(px, quality=80, restart_interval=2))
    assert (plain == with_rst).all()


def test_not_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg(b"\x89PNG\r\n\x1a\n")


def test_progressive_rejected():
    good = bytearray(encode_jpeg(np.zeros((8, 8, 1), dtype=np.uint8)))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        parse_jpeg(bytes(good))


def test_decode_and_resize_over_spark(spark):
    from dbpedia_spotlight_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    yy, xx = np.mgrid[0:48, 0:32]
    px = np.stack(
        [yy * 5 % 256, xx * 7 % 256, (yy * xx) % 256], axis=2
    ).astype(np.uint8)
    media = spark.createDataFrame(
        [("File:photo.jpg", bytearray(encode_jpeg(px, quality=90)))],
        "media_ref string, payload binary",
    )
    row = decode_media(media).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (32, 48, 1)
    rs = resize_media(media, max_side=16).collect()[0]
    assert max(rs["width"], rs["height"]) == 16
    # re-encoded payload decodes as a JPEG with the resized geometry
    small = parse_jpeg(bytes(rs["payload"]))
    assert small.shape[:2] == (rs["height"], rs["width"])
