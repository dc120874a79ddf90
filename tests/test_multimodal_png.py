"""Real PNG decode kernel (stdlib zlib inflate + numpy unfiltering).

Oracle strategy: the decode path is checked against PNG byte streams
built INDEPENDENTLY in this file (a hand-rolled chunk writer that
filters scanlines with its own arithmetic), against hand-computed pixel
values for each of the five filter types, and against the production
encoder round-trip for random images.
"""

import zlib

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.multimodal import (
    encode_png,
    parse_png,
)


def _chunk(ctype, body):
    return (
        len(body).to_bytes(4, "big") + ctype + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _png_bytes(w, h, color_type, scanlines, palette=None):
    """Hand-rolled PNG writer: scanlines are ALREADY-FILTERED byte rows
    (filter byte + data), so the test controls the exact wire bytes."""
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(
        b"IHDR",
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0]),
    )
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    out += _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
    out += _chunk(b"IEND", b"")
    return out


def test_filter_none_gray():
    # 2x3 gray, filter 0: wire bytes ARE the pixels
    rows = [b"\x00" + bytes([10, 20, 30]), b"\x00" + bytes([40, 50, 60])]
    px = parse_png(_png_bytes(3, 2, 0, rows))
    assert px.shape == (2, 3, 1)
    assert px.reshape(2, 3).tolist() == [[10, 20, 30], [40, 50, 60]]


def test_filter_sub_hand_computed():
    # Sub: out[i] = raw[i] + out[i-1]; deltas 200,100,50 wrap mod 256
    rows = [b"\x01" + bytes([200, 100, 50])]
    px = parse_png(_png_bytes(3, 1, 0, rows)).reshape(3)
    assert px.tolist() == [200, (200 + 100) % 256, (300 + 50) % 256]


def test_filter_up_hand_computed():
    rows = [b"\x00" + bytes([5, 10]), b"\x02" + bytes([250, 7])]
    px = parse_png(_png_bytes(2, 2, 0, rows)).reshape(2, 2)
    assert px.tolist() == [[5, 10], [(5 + 250) % 256, 17]]


def test_filter_average_hand_computed():
    # avg: out = raw + floor((left + up) / 2)
    rows = [b"\x00" + bytes([8, 4]), b"\x03" + bytes([10, 20])]
    px = parse_png(_png_bytes(2, 2, 0, rows)).reshape(2, 2)
    # row1: out[0] = 10 + (0+8)//2 = 14; out[1] = 20 + (14+4)//2 = 29
    assert px.tolist() == [[8, 4], [14, 29]]


def test_filter_paeth_hand_computed():
    # paeth predictor: nearest of left/up/upleft to left+up-upleft
    rows = [b"\x00" + bytes([100, 50]), b"\x04" + bytes([3, 7])]
    px = parse_png(_png_bytes(2, 2, 0, rows)).reshape(2, 2)
    # row1 px0: left=0, up=100, ul=0 -> p=100, pred=up=100 -> 103
    # row1 px1: left=103, up=50, ul=100 -> p=53; |53-103|=50,
    #   |53-50|=3, |53-100|=47 -> pred=up=50 -> 57
    assert px.tolist() == [[100, 50], [103, 57]]


def test_rgb_sub_uses_bpp_offset():
    # for RGB the Sub left-neighbor is 3 bytes back, per channel
    rows = [b"\x01" + bytes([10, 20, 30, 5, 6, 7])]
    px = parse_png(_png_bytes(2, 1, 2, rows)).reshape(2, 3)
    assert px.tolist() == [[10, 20, 30], [15, 26, 37]]


def test_palette_expansion():
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # red, green, blue
    rows = [b"\x00" + bytes([0, 2, 1])]
    px = parse_png(_png_bytes(3, 1, 3, rows, palette=pal))
    assert px.shape == (1, 3, 3)
    assert px[0].tolist() == [[255, 0, 0], [0, 0, 255], [0, 255, 0]]


def test_alpha_channels_dropped():
    # gray+alpha (type 4) and RGBA (type 6), filter 0
    ga = parse_png(_png_bytes(2, 1, 4, [b"\x00" + bytes([9, 255, 11, 0])]))
    assert ga.shape == (1, 2, 1) and ga.reshape(2).tolist() == [9, 11]
    rgba = parse_png(
        _png_bytes(1, 1, 6, [b"\x00" + bytes([1, 2, 3, 128])])
    )
    assert rgba.shape == (1, 1, 3) and rgba[0, 0].tolist() == [1, 2, 3]


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_every_filter(filter_type, channels):
    rng = np.random.default_rng(42 + filter_type)
    px = rng.integers(0, 256, (9, 7, channels), dtype=np.uint8)
    out = parse_png(encode_png(px, filter_type=filter_type))
    assert out.shape == px.shape
    assert (out == px).all()


def test_crc_mismatch_raises():
    good = encode_png(np.zeros((2, 2, 1), dtype=np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt an IHDR byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad))


def test_adam7_interlaced_roundtrip():
    # seven-pass deinterlace across shapes that exercise empty passes
    # (dims < pass offsets), ragged pass widths, and all five filters
    rng = np.random.default_rng(21)
    for h, w, c in [(1, 1, 1), (3, 5, 3), (7, 7, 1), (8, 8, 3),
                    (9, 13, 3), (16, 5, 1), (33, 17, 3)]:
        px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        for ft in range(5):
            enc = encode_png(px, filter_type=ft, interlace=True)
            assert np.array_equal(parse_png(enc), px), (h, w, c, ft)


def test_adam7_truncated_raises():
    px = np.zeros((9, 9, 1), dtype=np.uint8)
    enc = bytearray(encode_png(px, interlace=True))
    # corrupt: an IHDR claiming a larger image than the pass data holds
    body = (
        (64).to_bytes(4, "big") + (64).to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 1])
    )
    data = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", body)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        parse_png(data)


def test_decode_and_resize_over_spark(spark):
    from dbpedia_spotlight_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
    small = rng.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            ("File:big.png", bytearray(encode_png(big, filter_type=2))),
            ("File:small.png", bytearray(encode_png(small))),
        ],
        "media_ref string, payload binary",
    )
    dec = {
        r["media_ref"]: r
        for r in decode_media(media).collect()
    }
    assert dec["File:big.png"]["width"] == 32
    assert dec["File:big.png"]["height"] == 48
    assert dec["File:small.png"]["width"] == 6
    exp_mean = round(float(big.mean()) / 255.0, 6)
    assert dec["File:big.png"]["features"][0] == pytest.approx(
        exp_mean, abs=1e-6
    )

    rs = {
        r["media_ref"]: r for r in resize_media(media, max_side=16).collect()
    }
    assert (rs["File:big.png"]["width"], rs["File:big.png"]["height"]) == (
        11,
        16,
    )
    # small image is untouched (scale clamped to 1) and re-encoded PNG
    # decodes back to the identical pixels
    out_px = parse_png(bytes(rs["File:small.png"]["payload"]))
    assert (out_px == small).all()
