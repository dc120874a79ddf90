"""Real GIF decode kernel (pure-python variable-width LZW + numpy).

Oracle strategy: hand-assembled GIF byte streams with hand-packed LZW
codes (independent of the production encoder), lossless encoder
round-trips for random palettes (exercising code-width growth and the
KwKwK case), interlace reordering, and multi-frame counting.
"""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    encode_gif,
    parse_gif,
)


def _pack_codes(codes, widths):
    """LSB-first bit packer (the test's own, independent of the
    production encoder)."""
    acc = nbits = 0
    out = bytearray()
    for code, width in zip(codes, widths):
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_hand_packed_stream():
    # min_code_size=2: clear=4, eoi=5, first dynamic code=6, width=3
    # stream: clear, 1, 2, 2, eoi -> pixels [1, 2, 2]
    data = _pack_codes([4, 1, 2, 2, 5], [3, 3, 3, 3, 3])
    assert _gif_lzw_decode(data, 2) == [1, 2, 2]


def test_lzw_uses_new_table_entry():
    # clear, 1, 2, 6, eoi: code 6 was defined by (1,2) -> expands to 1,2
    data = _pack_codes([4, 1, 2, 6, 5], [3, 3, 3, 3, 3])
    assert _gif_lzw_decode(data, 2) == [1, 2, 1, 2]


def test_lzw_kwkwk_case():
    # clear, 1, 7, eoi: 7 == next_code (KwKwK) -> prev + prev[0] = 1,1
    # (6 is assigned by reading the second code, so the next new code
    #  after that read is 7)
    data = _pack_codes([4, 1, 6, 5], [3, 3, 3, 3])
    assert _gif_lzw_decode(data, 2) == [1, 1, 1]


@pytest.mark.parametrize("n_colors", [2, 5, 17, 200])
def test_lzw_roundtrip_random(n_colors):
    rng = np.random.default_rng(n_colors)
    seq = rng.integers(0, n_colors, 5000).tolist()
    min_code = max(2, int(n_colors - 1).bit_length())
    assert _gif_lzw_decode(_gif_lzw_encode(seq, min_code), min_code) == seq


def test_lzw_roundtrip_crosses_4096_reset():
    # long low-entropy run forces the table toward 4096 and a mid-stream
    # clear/reset in the encoder
    seq = (list(range(200)) * 120)[:24000]
    assert _gif_lzw_decode(_gif_lzw_encode(seq, 8), 8) == seq


def test_gif_roundtrip_small_palette():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, (13, 9))
    px = pal[idx]
    out, nf = parse_gif(encode_gif(px))
    assert nf == 1
    assert out.shape == px.shape
    assert (out == px).all()


def test_gif_gray_input_expanded():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4, 1) * 20
    out, _ = parse_gif(encode_gif(px))
    assert out.shape == (3, 4, 3)
    assert (out == np.repeat(px, 3, axis=2)).all()


def _hand_gif(w, h, pal, lzw_body, min_code, extra_frames=0,
              interlaced=False, trailer=True):
    """Hand-rolled GIF writer, independent of encode_gif."""
    bits = max(1, (len(pal) - 1).bit_length())
    full = np.zeros((2 ** bits, 3), dtype=np.uint8)
    full[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0]) + full.tobytes()
    # a graphic-control extension that must be skipped
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    for k in range(1 + extra_frames):
        out += b"\x2c" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if (interlaced and k == 0) else 0x00])
        out += bytes([min_code])
        for i in range(0, len(lzw_body), 255):
            chunk = lzw_body[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    if trailer:
        out += b"\x3b"
    return bytes(out)


def test_hand_assembled_gif_with_extension_and_frames():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    # 2x2 pixels indices [1, 2, 2, 0]; after the third data code the
    # table reaches 8 entries so the last codes are 4 bits wide
    body = _pack_codes([4, 1, 2, 2, 0, 5], [3, 3, 3, 3, 4, 4])
    data = _hand_gif(2, 2, pal, body, 2, extra_frames=2)
    px, nf = parse_gif(data)
    assert nf == 3
    assert px[0, 0].tolist() == [0, 255, 0]
    assert px[0, 1].tolist() == [0, 0, 255]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [255, 0, 0]


def test_interlaced_row_order():
    # 1 column x 8 rows, indices 0..7; interlaced storage order is rows
    # 0,4,2,6,1,3,5,7 -> decoder must place stored row k at display row
    pal = np.stack([np.arange(8, dtype=np.uint8) * 30] * 3, axis=1)
    stored = [0, 4, 2, 6, 1, 3, 5, 7]
    body = _pack_codes([16] + stored + [17], [5] * 10)  # min_code 4
    data = _hand_gif(1, 8, pal, body, 4, interlaced=True)
    px, _ = parse_gif(data)
    # display row r shows index r (stored sequence realigned)
    assert px[:, 0, 0].tolist() == [r * 30 for r in range(8)]


def test_non_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"NOTGIF" + b"\x00" * 20)


def test_decode_media_gif_frames(spark):
    from dbpedia_spotlight_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    pal = np.array([[9, 9, 9], [200, 10, 30]], dtype=np.uint8)
    body = _pack_codes([4, 0, 1, 1, 0, 5], [3] * 6)
    anim = _hand_gif(2, 2, pal, body, 2, extra_frames=3)  # 4 frames
    media = spark.createDataFrame(
        [("File:anim.gif", bytearray(anim))],
        "media_ref string, payload binary",
    )
    dec = decode_media(media)
    row = dec.collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (2, 2, 4)
    # frame sampling over the REAL frame count
    kept = sorted(
        r["frame_idx"] for r in sample_frames(dec, every_k=2).collect()
    )
    assert kept == [0, 2]
