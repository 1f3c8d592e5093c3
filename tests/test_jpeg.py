"""Baseline JPEG codec: exact roundtrips on quantization-aligned
uniform tiles, bounded loss on random content, subsampling/restart/
grayscale paths, loud rejection of progressive and malformed streams,
and a hypothesis sweep over geometries."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from turnover_odata_etl_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)
from turnover_odata_etl_spark.functions.multimodal import decode_image


def test_uniform_tile_exact_roundtrip():
    """Uniform 8x8-aligned tiles whose level-shifted value divides the
    quant step roundtrip EXACTLY — the property that makes a closed-
    form oracle possible for a lossy format. DC = 8*(v-128); q=16
    divides it whenever v-128 is even."""
    for v in (128, 130, 90, 254, 2):
        img = np.full((16, 24, 3), v, dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_baseline(img, quant_luma=16)), img
        ), v


def test_uniform_tile_exact_420():
    img = np.full((16, 16, 3), 132, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quant_luma=16, subsample=True))
    assert np.array_equal(out, img)


def test_multi_tile_checkerboard_exact():
    """Distinct uniform 8x8 tiles: DC prediction chains across blocks
    and components; still exact when every tile value is even-shifted."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    vals = [130, 90, 200, 64]
    for t, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = vals[t]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_baseline(img, quant_luma=16)), img
    )


def test_random_roundtrip_bounded_loss():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img, quant_luma=4))
    assert dec.shape == img.shape
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 4.0


def test_420_smooth_chroma_bounded_loss():
    """4:2:0 on constant-chroma content (R=G=B): subsampling loses
    nothing, so loss is luma-quant-only."""
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (33, 31), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    dec = decode_jpeg(encode_jpeg_baseline(img, quant_luma=4, subsample=True))
    assert dec.shape == img.shape
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 2.5


def test_grayscale_and_dispatch():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (17, 9), dtype=np.uint8)
    blob = encode_jpeg_baseline(g, quant_luma=2)
    dec = decode_image(blob)  # FFD8 magic routes to the JPEG decoder
    assert dec.shape == (17, 9, 3)
    assert np.mean(np.abs(dec[:, :, 0].astype(int) - g.astype(int))) < 1.5
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg_baseline(img, quant_luma=4))
    rst = decode_jpeg(
        encode_jpeg_baseline(img, quant_luma=4, restart_interval=2)
    )
    assert np.array_equal(plain, rst)


def test_progressive_rejected_loudly():
    img = np.full((8, 8, 3), 130, dtype=np.uint8)
    blob = bytearray(encode_jpeg_baseline(img))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(blob))


@pytest.mark.parametrize(
    "mangle",
    [
        lambda b: b[2:],  # missing SOI
        lambda b: b[: len(b) // 2],  # truncated entropy data
    ],
)
def test_malformed_raises(mangle):
    img = np.full((8, 8, 3), 130, dtype=np.uint8)
    blob = encode_jpeg_baseline(img)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(mangle(blob))


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**16),
    sub=st.booleans(),
)
def test_any_geometry_roundtrip(w, h, seed, sub):
    """Arbitrary (non-multiple-of-8/16) geometries: padding and crop
    agree, output shape matches input, loss stays bounded."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img, quant_luma=2, subsample=sub))
    assert dec.shape == img.shape
    # Compare BT.601 luma: chroma subsampling legitimately mixes the
    # Cb/Cr of adjacent random pixels (large per-channel shifts), but
    # Y is untouched by 4:2:0 and bounded only by luma quantization.
    w601 = np.array([0.299, 0.587, 0.114])
    luma_in = img.astype(float) @ w601
    luma_out = dec.astype(float) @ w601
    assert np.mean(np.abs(luma_in - luma_out)) < 4.0


def test_four_component_cmyk_rejected_loudly():
    """4-component (Adobe CMYK) frames must raise, not silently drop
    the K plane and feed C/M/Y through the YCbCr transform."""
    img = np.full((8, 8, 3), 130, dtype=np.uint8)
    blob = bytearray(encode_jpeg_baseline(img))
    idx = blob.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) — bump nc to 4
    assert blob[idx + 9] == 3
    blob[idx + 9] = 4
    with pytest.raises(ValueError, match="component"):
        decode_jpeg(bytes(blob))


def test_sampling_factor_above_two_rejected_loudly():
    """T.81 allows factors up to 4 but the integer upsampler only
    handles exact 1x/2x — a 3x factor must raise, not mis-upsample."""
    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    blob = bytearray(encode_jpeg_baseline(img, subsample=True))
    idx = blob.find(b"\xff\xc0")
    # SOF0 layout after marker+len: prec(1) h(2) w(2) nc(1) then per-comp cid(1) HV(1) Tq(1)
    base = idx + 4  # start of payload (skip marker 2 + length 2)
    assert blob[base + 5] == 3  # nc
    hv = base + 6 + 1  # first comp's HV byte
    assert blob[hv] == 0x22  # 2x2 luma under subsample=True
    blob[hv] = 0x32  # 3x2 — legal per spec, unsupported here
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(blob))
