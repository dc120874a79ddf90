"""Property tests for the pure-python codecs: lossless round-trips
must be exact for arbitrary shapes/filters/palettes, and the lossy JPEG
pair must stay within quantization-implied error bounds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dbpedia_spotlight_spark.operators.jpeg import encode_jpeg, parse_jpeg
from dbpedia_spotlight_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    encode_bmp,
    encode_gif,
    encode_netpbm,
    encode_png,
    parse_bmp,
    parse_gif,
    parse_netpbm,
    parse_png,
)

dims = st.integers(min_value=1, max_value=23)


def _img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


@given(dims, dims, st.sampled_from([1, 3]), st.integers(0, 4),
       st.integers(0, 10**6))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_shape_any_filter(h, w, c, ft, seed):
    px = _img(h, w, c, seed)
    out = parse_png(encode_png(px, filter_type=ft))
    assert out.shape == px.shape and (out == px).all()


@given(st.lists(st.integers(0, 15), min_size=0, max_size=2000),
       st.integers(2, 8))
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip(seq, min_code):
    seq = [s % (1 << min_code) for s in seq]
    assert _gif_lzw_decode(_gif_lzw_encode(seq, min_code), min_code) == seq


@given(dims, dims, st.integers(1, 8), st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_any_shape(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    px = pal[rng.integers(0, n_colors, (h, w))]
    out, nf = parse_gif(encode_gif(px))
    assert nf == 1 and (out == px).all()


@given(dims, dims, st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_bmp_netpbm_roundtrip_any_shape(h, w, seed):
    px = _img(h, w, 3, seed)
    assert (parse_bmp(encode_bmp(px)) == px).all()
    assert (parse_netpbm(encode_netpbm(px)) == px).all()


@given(dims, dims, st.sampled_from([1, 3]), st.booleans(),
       st.integers(0, 10**6))
@settings(max_examples=25, deadline=None)
def test_jpeg_decodes_own_output_any_shape(h, w, c, subsample, seed):
    px = _img(h, w, c, seed)
    out = parse_jpeg(encode_jpeg(px, quality=90, subsample=subsample))
    # lossy: assert geometry + sane dynamic range, never a crash
    assert out.shape == (h, w, 3 if c == 3 else 1)
    assert out.dtype == np.uint8


@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 255))
@settings(max_examples=30, deadline=None)
def test_jpeg_constant_blocks_tight_error(h, w, v):
    px = np.full((h, w, 1), v, dtype=np.uint8)
    out = parse_jpeg(encode_jpeg(px, quality=95))
    assert np.abs(out.astype(int) - int(v)).max() <= 2
