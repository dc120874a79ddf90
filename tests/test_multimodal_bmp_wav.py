"""Real BMP / PCM-WAV decode kernels (pure numpy, no codec libraries)."""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.multimodal import (
    _wav_features,
    encode_bmp,
    parse_bmp,
    parse_wav,
)


def _wav_bytes(rate, samples_i16, channels=1, bits=16, extra_chunk=False):
    """Hand-rolled RIFF writer (independent of parse_wav)."""
    if bits == 16:
        body = np.asarray(samples_i16, dtype="<i2").tobytes()
        block = 2 * channels
    else:
        body = (np.asarray(samples_i16) + 128).astype(np.uint8).tobytes()
        block = channels
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk:
        chunks += b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_bmp_roundtrip_24bit():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = parse_bmp(encode_bmp(px))
    assert out.shape == (5, 7, 3)
    assert (out == px).all()


def test_bmp_row_padding_and_bottom_up():
    # 3x2: row stride 2*3=6 -> padded to 8; bottom-up row order
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = encode_bmp(px)
    # stride is padded: file bigger than 54 + 2*9
    assert len(data) == 54 + 2 * 12
    assert (parse_bmp(data) == px).all()


def test_bmp_8bit_paletted():
    # hand-build an 8-bit BMP: 2x2, palette [black, red, green, blue]
    pal = b"".join(
        bytes([b, g, r, 0])
        for r, g, b in [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    )
    idx_rows = [bytes([0, 1, 0, 0]), bytes([2, 3, 0, 0])]  # padded to 4
    body = idx_rows[1] + idx_rows[0]  # bottom-up
    pixel_off = 14 + 40 + len(pal)
    hdr = (
        b"BM" + (pixel_off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + pixel_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    px = parse_bmp(hdr + pal + body)
    assert px.shape == (2, 2, 3)
    assert (px[0, 0] == [0, 0, 0]).all() and (px[0, 1] == [255, 0, 0]).all()
    assert (px[1, 0] == [0, 255, 0]).all() and (px[1, 1] == [0, 0, 255]).all()


def test_bmp_rejects_compressed_and_garbage():
    with pytest.raises(ValueError):
        parse_bmp(b"nonsense")
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    data[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        parse_bmp(bytes(data))


def test_wav_16bit_stereo_roundtrip():
    rate = 8000
    n = 64
    t = np.arange(n)
    left = (np.sin(2 * np.pi * t / 16) * 10000).astype("<i2")
    right = (np.cos(2 * np.pi * t / 16) * 10000).astype("<i2")
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    got_rate, samples = parse_wav(_wav_bytes(rate, inter, channels=2,
                                             extra_chunk=True))
    assert got_rate == rate and samples.shape == (n, 2)
    assert np.allclose(samples[:, 0], left / 32768.0)
    assert np.allclose(samples[:, 1], right / 32768.0)


def test_wav_8bit_mono_and_features():
    rate = 4000
    sig = np.array([0, 100, -100, 50, -50, 0, 0, 0], dtype=np.int16)
    got_rate, samples = parse_wav(_wav_bytes(rate, sig, bits=8))
    assert got_rate == rate and samples.shape == (8, 1)
    assert np.allclose(samples[:, 0], sig / 128.0)
    feats = _wav_features(got_rate, samples)
    assert feats[0] == pytest.approx(8 / 4000)       # duration
    assert feats[2] == pytest.approx(100 / 128, abs=1e-6)  # peak


def test_wav_rejects_non_pcm():
    data = bytearray(_wav_bytes(8000, np.zeros(4, dtype=np.int16)))
    data[20] = 3  # IEEE float tag
    with pytest.raises(ValueError):
        parse_wav(bytes(data))
    with pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxNOPE")


def test_decode_media_bmp_and_wav(spark):
    from dbpedia_spotlight_spark.operators.multimodal import decode_media

    px = np.full((4, 6, 3), 128, dtype=np.uint8)
    wav = _wav_bytes(8000, np.zeros(16, dtype=np.int16))
    media = spark.createDataFrame(
        [("b.bmp", bytearray(encode_bmp(px))), ("a.wav", bytearray(wav))],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in decode_media(media).collect()}
    assert (rows["b.bmp"]["width"], rows["b.bmp"]["height"]) == (6, 4)
    assert rows["b.bmp"]["n_frames"] == 1
    assert rows["a.wav"]["width"] == 8000      # sample rate
    assert rows["a.wav"]["height"] == 1        # channels
    assert rows["a.wav"]["n_frames"] == 16     # samples
    assert len(rows["a.wav"]["features"]) == 8


def test_resize_media_bmp(spark):
    from dbpedia_spotlight_spark.operators.multimodal import resize_media

    px = np.zeros((40, 80, 3), dtype=np.uint8)
    px[:, 40:] = 255  # right half white
    media = spark.createDataFrame(
        [("big.bmp", bytearray(encode_bmp(px)))],
        "media_ref string, payload binary",
    )
    r = resize_media(media, max_side=20).collect()[0]
    assert (r["width"], r["height"]) == (20, 10)
    out = parse_bmp(bytes(r["payload"]))
    assert out.shape == (10, 20, 3)
    assert (out[:, :10] == 0).all() and (out[:, 10:] == 255).all()
