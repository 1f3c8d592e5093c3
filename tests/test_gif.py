"""GIF decode (round 7): LZW, interlace, compositing, hostile streams.

The decoder follows GIF89a Appendix F conventions (LSB-first
variable-width codes, CLEAR/EOI, width bump after the entry with code
2^width − 1 is defined, 4096 cap with deferred-clear tolerance). The
roundtrip tests share the repo's encoder; the uncompressed-stream test
is INDEPENDENT of it — the stream is hand-assembled from literal root
codes at fixed width per the spec, so a symmetric encoder+decoder
width bug cannot hide there.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from turnover_odata_etl_spark.functions.multimodal import (
    _decode_gif,
    _lzw_decode,
    decode_image,
    encode_gif,
)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_gif_roundtrip_random(data):
    """Any palette size 2..256, any geometry, sequential AND
    interlaced: decode(encode(img)) is bit-exact (GIF is lossless)."""
    n = data.draw(st.integers(2, 256), label="palette")
    h = data.draw(st.integers(1, 24), label="h")
    w = data.draw(st.integers(1, 24), label="w")
    seed = data.draw(st.integers(0, 2**31), label="seed")
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.integers(0, n, (h, w)).astype(np.uint8)
    for interlace in (False, True):
        dec = _decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert dec.shape == (h, w, 3)
        assert (dec == pal[idx]).all()


def test_gif_dictionary_cap_and_kwkwk():
    """Streams that cross the 4096-entry cap (mid-stream CLEAR) and
    maximally repetitive input (KwKwK chains) both roundtrip exact."""
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    noisy = rng.integers(0, 256, (200, 300)).astype(np.uint8)
    assert (decode_image(encode_gif(noisy, pal)) == pal[noisy]).all()
    uniform = np.zeros((64, 64), np.uint8)
    assert (_decode_gif(encode_gif(uniform, pal)) == pal[uniform]).all()


def test_gif_uncompressed_stream_hand_assembled():
    """Decoder vs an INDEPENDENT construction: the classic
    'uncompressed GIF' layout — min_code_size 8, every pixel emitted
    as its literal root code at a constant 9-bit width, CLEAR every
    128 pixels so the decoder's dictionary never reaches the 512
    bump boundary. Assembled by hand (LSB-first bit packing inline),
    no shared encoder code."""
    rng = np.random.default_rng(9)
    h, w = 20, 31
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)

    clear, width = 256, 9
    acc = accbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    for i, px in enumerate(idx.reshape(-1).tolist()):
        if i and i % 128 == 0:
            emit(clear)
        emit(px)
    emit(clear + 1)  # EOI
    if accbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x87, 0, 0)  # GCT, 256 entries
        + pal.tobytes()
        + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        + bytes([8])  # min code size
        + bytes(blocks)
        + b"\x3b"
    )
    assert (decode_image(gif) == pal[idx]).all()


def test_gif_first_frame_composited_onto_screen():
    """A frame smaller than the logical screen renders at its
    (left, top) offset over the background color — exercised by
    rewriting the image descriptor of a full-frame encode."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.ones((2, 3), np.uint8)
    gif = bytearray(encode_gif(idx, pal))
    # screen 5x4, frame offset (1, 2): patch screen dims + descriptor
    struct.pack_into("<HH", gif, 6, 5, 4)
    desc = gif.index(0x2C, 13)
    struct.pack_into("<HHHH", gif, desc + 1, 2, 1, 3, 2)
    dec = _decode_gif(bytes(gif))
    assert dec.shape == (4, 5, 3)
    assert (dec[1:3, 2:5] == pal[1]).all()  # the frame
    mask = np.ones((4, 5), bool)
    mask[1:3, 2:5] = False
    assert (dec[mask] == pal[0]).all()  # background fill


def test_gif_hostile_streams():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    good = encode_gif(idx, pal)

    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"GIF90a" + good[6:])
    # truncated pixel data: chop the data sub-blocks
    cut = bytearray(good)
    desc = cut.index(0x2C, 13)
    with pytest.raises(ValueError, match="unterminated|truncated"):
        _decode_gif(bytes(cut[: desc + 12]))
    # unknown block type
    bad = bytearray(good)
    bad[bad.index(0x2C, 13)] = 0x7F
    with pytest.raises(ValueError, match="unknown block"):
        _decode_gif(bytes(bad))
    # trailer with no image (header + full 4-entry GCT, then trailer)
    with pytest.raises(ValueError, match="trailer"):
        _decode_gif(good[: 13 + 12] + b"\x3b")
    # truncated global color table
    with pytest.raises(ValueError, match="truncated global color"):
        _decode_gif(good[: 13 + 6])
    # LZW: out-of-range code — craft a stream whose first code is 7
    # (beyond the root range 0..3 + clear/eoi for min_code 2)
    with pytest.raises(ValueError, match="first code|out of range"):
        _lzw_decode(bytes([0b00000111]), 2, 10)
    # invalid minimum code size
    with pytest.raises(ValueError, match="minimum code size"):
        _lzw_decode(b"\x00", 1, 1)


def test_gif_87a_magic_accepted():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.array([[0, 1, 0]], np.uint8)
    gif = b"GIF87a" + encode_gif(idx, pal)[6:]
    assert (decode_image(gif) == pal[idx]).all()


def test_exhaustive_short_streams_cover_end_on_bump_boundary():
    """Every 4-symbol sequence of length 1-7 roundtrips — exhaustive
    over a space that necessarily contains streams whose FINAL data
    code lands exactly on the decoder's width-bump boundary. GIF is
    structurally immune to the end-on-boundary EOI desync that bit
    TIFF-LZW (tests/test_tiff.py regression): LSB-first packing means
    a decoder that bumps before reading EOI takes its extra bit as
    the HIGH bit, and the encoder's zero padding makes that bit 0 —
    the EOI value is unchanged; a fully-padded stream simply ends and
    the decoder tolerates a missing EOI (deferred-clear convention)."""
    import itertools

    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_gif,
        encode_gif,
    )

    pal = np.array(
        [[10, 20, 30], [40, 50, 60], [70, 80, 90], [1, 2, 3]],
        dtype=np.uint8,
    )
    for length in range(1, 8):
        for seq in itertools.product(range(4), repeat=length):
            idx = np.array(seq, dtype=np.uint8).reshape(1, length)
            assert np.array_equal(
                _decode_gif(encode_gif(idx, pal)), pal[idx]
            ), seq
