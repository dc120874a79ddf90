"""Real Netpbm decode / feature / resize over binary media columns."""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.multimodal import (
    decode_media,
    encode_netpbm,
    parse_netpbm,
    resize_media,
)


def _ppm(w, h, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return px, encode_netpbm(px)


def test_parse_roundtrip_binary_ppm():
    px, data = _ppm(7, 5)
    back = parse_netpbm(data)
    assert back.shape == (5, 7, 3)
    assert (back == px).all()


def test_parse_ascii_pgm_with_comments_and_maxval():
    data = b"P2\n# a comment\n3 2\n# another\n15\n0 5 10\n15 15 0\n"
    px = parse_netpbm(data)
    assert px.shape == (2, 3, 1)
    # maxval 15 scales to 0..255 (integer: v*255//15)
    assert px[0, 1, 0] == 5 * 255 // 15
    assert px[1, 0, 0] == 255


def test_parse_rejects_non_netpbm():
    with pytest.raises(ValueError):
        parse_netpbm(b"\x89PNG....")


def test_decode_media_real_netpbm(spark):
    px, data = _ppm(8, 4, seed=9)
    media = spark.createDataFrame(
        [("File:a.ppm", bytearray(data))], "media_ref string, payload binary"
    )
    row = decode_media(media).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (8, 4, 1)
    feats = row["features"]
    assert len(feats) == 8
    assert feats[0] == pytest.approx(px.mean() / 255.0, abs=1e-5)
    assert feats[5] == pytest.approx(8 / 4, abs=1e-5)  # aspect


def test_decode_media_unknown_payload_raises(spark):
    # every supported modality decodes for real now; an unknown magic
    # gets the clear ValueError contract (no stub / fake path remains)
    media = spark.createDataFrame(
        [("File:x.bin", bytearray(b"\x00\x01unknown-payload"))],
        "media_ref string, payload binary",
    )
    with pytest.raises(Exception, match="unsupported media payload"):
        decode_media(media).collect()


def test_resize_media_pixels(spark):
    px, data = _ppm(100, 50, seed=1)
    media = spark.createDataFrame(
        [("File:big.ppm", bytearray(data))], "media_ref string, payload binary"
    )
    row = resize_media(media, max_side=10).collect()[0]
    assert (row["width"], row["height"]) == (10, 5)
    out = parse_netpbm(bytes(row["payload"]))
    assert out.shape == (5, 10, 3)
    # nearest-neighbor expectation
    yi = (np.arange(5) * (50 / 5)).astype(int)
    xi = (np.arange(10) * (100 / 10)).astype(int)
    assert (out == px[yi][:, xi]).all()


def test_resize_media_never_upscales(spark):
    px, data = _ppm(6, 3)
    media = spark.createDataFrame(
        [("File:small.ppm", bytearray(data))],
        "media_ref string, payload binary",
    )
    row = resize_media(media, max_side=64).collect()[0]
    assert (row["width"], row["height"]) == (6, 3)
    assert (parse_netpbm(bytes(row["payload"])) == px).all()
