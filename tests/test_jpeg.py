"""JPEG codec: exact roundtrips on quantization-aligned uniform
tiles, bounded loss on random content, subsampling (4:4:4 / 4:2:2 /
4:2:0) / restart / grayscale paths, FULL Huffman progressive (SOF2 —
spectral selection, successive approximation, restart markers)
pinned bit-identical to baseline, loud rejection of the remaining
corners (extended/arithmetic SOFs, promised-but-missing restarts,
malformed streams), and hypothesis sweeps over geometries, band
partitions, restart intervals, and SA on/off."""

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


def test_progressive_unsupported_corners_rejected_loudly():
    """Round 6 made SOF2 (full Huffman progressive — spectral
    selection, successive approximation, AND restart markers) a
    SUPPORTED layout; what stays loud: a DRI that PROMISES restarts a
    stream never delivers, and extended/arithmetic SOFs."""
    from turnover_odata_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((24, 24, 3), 130, dtype=np.uint8)
    # Inject a DRI (interval 2) before the first SOS of a stream that
    # carries NO RSTn markers: the decoder must fail loudly at the
    # missing marker, never silently desync.
    blob = bytearray(encode_jpeg_progressive(img))
    first_sos = blob.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"
    blob[first_sos:first_sos] = dri
    with pytest.raises(ValueError, match="RSTn|marker"):
        decode_jpeg(bytes(blob))

    # SOF1 (extended sequential) remains rejected.
    blob = bytearray(encode_jpeg_baseline(img))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(blob))


def test_progressive_restart_markers_do_not_change_pixels():
    """RSTn inside progressive scans (all four scan kinds): decode
    equals both the restart-free progressive stream and the baseline
    stream, for 4:4:4 / 4:2:0 / 4:2:2 and SA on/off."""
    from turnover_odata_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    for sub in (False, True, "422"):
        for sa in (False, True):
            img = rng.integers(0, 256, (28, 36, 3), dtype=np.uint8)
            base = decode_jpeg(
                encode_jpeg_baseline(img, quant_luma=4, subsample=sub)
            )
            rst = decode_jpeg(
                encode_jpeg_progressive(
                    img,
                    quant_luma=4,
                    subsample=sub,
                    successive=sa,
                    restart_interval=2,
                )
            )
            assert (base == rst).all(), (sub, sa)


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


def test_progressive_fill_bytes_before_interscan_markers():
    """T.81 §B.1.1.2 permits any number of 0xFF fill bytes before a
    marker. A foreign progressive stream padded with fill bytes before
    each inter-scan marker (DHT / SOS) must decode identically to the
    unpadded stream — previously the marker walk read marker=0xFF and
    fell through to a garbage segment length."""
    from turnover_odata_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(img, quant_luma=4, successive=True)
    want = decode_jpeg(data)

    # Pad every SOS after the first, and every DHT, with fill bytes.
    # Entropy-coded 0xFF bytes are stuffed as FF 00, so a raw FF FF /
    # FF C4 / FF DA sequence can only be a marker boundary.
    padded = bytearray()
    i = 0
    first_sos_seen = False
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data):
            m = data[i + 1]
            if m == 0xDA and not first_sos_seen:
                first_sos_seen = True
            elif m in (0xDA, 0xC4):
                padded.extend(b"\xff" * 3)
        padded.append(data[i])
        i += 1
    assert len(padded) > len(data)  # the padding actually landed
    got = decode_jpeg(bytes(padded))
    assert (got == want).all()


def test_progressive_exactness_domain_roundtrip():
    """Uniform 8×8-aligned tiles inside the codec's exactness domain
    roundtrip BIT-EXACTLY through the progressive pipeline too — the
    same property the closed-form oracle of the registered query
    relies on for the baseline stream."""
    from turnover_odata_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.zeros((16, 24, 3), dtype=np.uint8)
    for ty in range(2):
        for tx in range(3):
            v = 2 * ((ty * 13 + tx * 29) % 128)
            img[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8, :] = v
    dec = decode_jpeg(encode_jpeg_progressive(img, quant_luma=16))
    assert (dec == img).all()


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_progressive_equals_baseline_random(data):
    """Progressive is a LOSSLESS reorganization of the same quantized
    coefficients: decode(progressive) == decode(baseline) bit-exactly
    for ANY image, geometry (incl. non-multiples of 8/16), gray/color,
    4:4:4/4:2:0, quant step, band partition, and WITH or WITHOUT
    successive approximation — including flat and high-quant images
    whose AC bands are empty (long EOB runs through the decoder's
    EOBn path, with correction bits riding the runs in SA mode)."""
    from turnover_odata_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    successive = data.draw(st.booleans(), label="successive")
    ri = data.draw(st.sampled_from([0, 0, 1, 2, 5]), label="restart")
    h = data.draw(st.integers(1, 40), label="h")
    w = data.draw(st.integers(1, 40), label="w")
    gray = data.draw(st.booleans(), label="gray")
    sub = (
        False
        if gray
        else data.draw(st.sampled_from([False, True, "422"]), label="sub")
    )
    q = data.draw(st.sampled_from([1, 16, 64, 255]), label="quant")
    flat = data.draw(st.booleans(), label="flat")
    # random contiguous band partition of 1..63
    n_cuts = data.draw(st.integers(0, 3), label="n_cuts")
    cuts = sorted(
        set(
            data.draw(st.integers(1, 62), label=f"cut{i}")
            for i in range(n_cuts)
        )
    )
    edges = [1] + [c + 1 for c in cuts] + [64]
    bands = tuple(
        (a, b - 1) for a, b in zip(edges, edges[1:]) if a <= b - 1
    )
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    shape = (h, w) if gray else (h, w, 3)
    img = (
        np.full(shape, int(rng.integers(0, 256)), np.uint8)
        if flat
        else rng.integers(0, 256, shape, dtype=np.uint8)
    )
    base = decode_jpeg(encode_jpeg_baseline(img, quant_luma=q, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img,
            quant_luma=q,
            subsample=sub,
            bands=bands,
            successive=successive,
            restart_interval=ri,
        )
    )
    assert base.shape == prog.shape
    assert (base == prog).all()


@pytest.mark.parametrize("progressive", [False, True])
def test_stream_ending_in_fill_padding_raises_value_error(progressive):
    """A truncated stream ENDING in 0xFF fill bytes must hit the
    documented ValueError loud-failure contract, not IndexError —
    the fill-byte marker walk is bounds-checked (round-8 fix)."""
    img = np.full((8, 8, 3), 130, dtype=np.uint8)
    if progressive:
        from turnover_odata_etl_spark.functions.jpeg import (
            encode_jpeg_progressive,
        )

        blob = encode_jpeg_progressive(img)
    else:
        blob = encode_jpeg_baseline(img)
    # cut just after SOI and append pure fill padding
    mangled = blob[:2] + b"\xff" * 8
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(mangled)
