"""MP3 frame-header walk + MJPEG-in-AVI decode.

Oracle strategy: synthetic streams are built INDEPENDENTLY here with
hand-assembled headers (this file computes frame lengths from the spec
tables on its own), so the parser's framing arithmetic is checked
against a second implementation, not against itself. The AVI frames
round-trip through the production JPEG encoder at quality levels where
block-constant images reconstruct exactly.
"""

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.jpeg import encode_jpeg
from dbpedia_spotlight_spark.operators.multimodal import (
    parse_avi,
    parse_mp3,
)

# independent copy of the spec tables (ISO/IEC 11172-3) used to BUILD
# the fixtures — parse_mp3 must agree with framing derived from these
V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416,
         448]
V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]


def mp3_v1l3_frame(br_idx=9, sr_idx=0, pad=0, mono=False):
    rate = [44100, 48000, 32000][sr_idx]
    hdr = bytes([
        0xFF,
        0xFB,  # MPEG1, Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2) | (pad << 1),
        0xC0 if mono else 0x00,
    ])
    flen = 144 * V1_L3[br_idx] * 1000 // rate + pad
    return hdr + b"\x55" * (flen - 4)


def mp3_v2l3_frame(br_idx=5, sr_idx=0):
    rate = [22050, 24000, 16000][sr_idx]
    hdr = bytes([0xFF, 0xF3, (br_idx << 4) | (sr_idx << 2), 0x00])
    flen = 576 // 8 * V2_L3[br_idx] * 1000 // rate
    return hdr + b"\x00" * (flen - 4)


def mp3_v1l1_frame(br_idx=4, sr_idx=1, pad=0):
    rate = [44100, 48000, 32000][sr_idx]
    hdr = bytes([0xFF, 0xFF, (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                 0x00])
    flen = (12 * V1_L1[br_idx] * 1000 // rate + pad) * 4
    return hdr + b"\x00" * (flen - 4)


def id3v2(tag_size=32):
    size = bytes([(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
                  (tag_size >> 7) & 0x7F, tag_size & 0x7F])
    return b"ID3" + bytes([4, 0, 0]) + size + b"\xaa" * tag_size


def test_mp3_cbr_frame_walk():
    n = 25
    data = b"".join(mp3_v1l3_frame() for _ in range(n))
    info = parse_mp3(data)
    assert info["n_frames"] == n
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["n_samples"] == n * 1152
    assert info["duration"] == pytest.approx(n * 1152 / 44100)
    assert info["kbps_avg"] == 128 and not info["vbr"]


def test_mp3_id3v2_prefix_and_id3v1_trailer():
    body = b"".join(mp3_v1l3_frame(mono=True) for _ in range(7))
    data = id3v2(57) + body + b"TAG" + b"\x00" * 125
    info = parse_mp3(data)
    assert info["n_frames"] == 7 and info["channels"] == 1


def test_mp3_vbr_and_padding_bit():
    # padding adds exactly one byte to the frame length — a framing
    # error here desyncs every later frame, so the count is the oracle
    frames = [mp3_v1l3_frame(9, pad=1), mp3_v1l3_frame(13),
              mp3_v1l3_frame(11, pad=1), mp3_v1l3_frame(9)]
    info = parse_mp3(b"".join(frames))
    assert info["n_frames"] == 4
    assert info["vbr"] and info["kbps_max"] == 256 and info["kbps_min"] == 128
    assert info["kbps_avg"] == pytest.approx((128 + 256 + 192 + 128) / 4)


def test_mp3_mpeg2_layer3_576_samples():
    info = parse_mp3(b"".join(mp3_v2l3_frame() for _ in range(10)))
    assert info["sample_rate"] == 22050
    assert info["n_samples"] == 10 * 576
    assert info["kbps_avg"] == 40


def test_mp3_layer1_384_samples():
    info = parse_mp3(b"".join(mp3_v1l1_frame() for _ in range(6)))
    assert info["n_samples"] == 6 * 384
    assert info["sample_rate"] == 48000
    assert info["kbps_avg"] == 128


def test_mp3_junk_prefix_resync_and_errors():
    data = b"\x12\x34junk" + b"".join(mp3_v1l3_frame() for _ in range(3))
    assert parse_mp3(data)["n_frames"] == 3
    with pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3(b"\x00" * 64)
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 100)


def test_mp3_truncated_final_frame_keeps_parsed_prefix():
    data = b"".join(mp3_v1l3_frame() for _ in range(5))
    info = parse_mp3(data[:-40])  # clip into the last frame
    assert info["n_frames"] == 4


# ---------------------------------------------------------------------------
# MJPEG-in-AVI
# ---------------------------------------------------------------------------


def _chunk(cid, body):
    pad = b"\x00" if len(body) & 1 else b""
    return cid + len(body).to_bytes(4, "little") + body + pad


def make_avi(jpegs, micro_per_frame=40000, w=16, h=16):
    avih = (
        micro_per_frame.to_bytes(4, "little") + b"\x00" * 12
        + len(jpegs).to_bytes(4, "little") + b"\x00" * 12
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    movi = _chunk(
        b"LIST", b"movi" + b"".join(_chunk(b"00dc", j) for j in jpegs)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_mjpeg_frames_and_fps():
    # block-constant 8x8-aligned image -> JPEG reconstructs it exactly
    px = np.zeros((16, 24, 3), dtype=np.uint8)
    px[:8, :, 0] = 200
    px[8:, :, 2] = 90
    jpg = encode_jpeg(px)
    avi = make_avi([jpg] * 4, micro_per_frame=33333)
    first, n_frames, fps = parse_avi(avi)
    assert n_frames == 4
    assert first.shape == (16, 24, 3)
    assert fps == pytest.approx(1e6 / 33333)
    # the frame really went through the JPEG entropy decode
    assert int(first[2, 2, 0]) > 150 and int(first[12, 2, 2]) > 50


def test_avi_errors():
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    px = np.zeros((8, 8, 1), dtype=np.uint8)
    avi = make_avi([encode_jpeg(px)])
    with pytest.raises(ValueError, match="truncated RIFF"):
        parse_avi(avi[:-10] + b"")  # clip inside the movi list
    # non-JPEG frame payload
    bad = make_avi([b"\x00\x01\x02\x03"])
    with pytest.raises(ValueError, match="non-MJPEG"):
        parse_avi(bad)


def test_avi_decode_media_over_spark(spark):
    from dbpedia_spotlight_spark.operators.multimodal import decode_media

    px = np.full((8, 8, 1), 128, dtype=np.uint8)
    avi = make_avi([encode_jpeg(px)] * 5, micro_per_frame=100000, w=8, h=8)
    mp3 = b"".join(mp3_v1l3_frame() for _ in range(9))
    media = spark.createDataFrame(
        [("File:clip.avi", bytearray(avi)), ("File:song.mp3", bytearray(mp3))],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in decode_media(media).collect()}
    clip = rows["File:clip.avi"]
    assert (clip["width"], clip["height"], clip["n_frames"]) == (8, 8, 5)
    song = rows["File:song.mp3"]
    assert song["width"] == 44100 and song["n_frames"] == 9 * 1152
    assert song["features"][0] == pytest.approx(9 * 1152 / 44100, abs=1e-4)
