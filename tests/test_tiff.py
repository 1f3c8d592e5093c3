"""TIFF codec tests (functions/tiff.py).

The TIFF-LZW early-change rule is the classic symmetric-bug trap: an
encoder/decoder pair that both bump the code width one code late
roundtrips perfectly and reads no real-world file. So besides
roundtrip fuzz, the module encoder's output is decoded by an
INDEPENDENT reference LZW decoder written here (bit-string based,
sharing no code with the module), across the 9→10 bit boundary — and
a short hand-assembled stream pins CLEAR / literal / KwKwK / EOI
handling bit by bit.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from turnover_odata_etl_spark.functions.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


# --- independent reference LZW decoder (test-local) ----------------


def _ref_lzw_decode(data: bytes) -> bytes:
    """Bit-string implementation straight from the TIFF 6.0 spec
    pseudocode — deliberately different machinery from the module."""
    bits = "".join(format(b, "08b") for b in data)
    pos = 0
    width = 9
    table: list[bytes] = []
    out = b""
    prev = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"?", b"?"]
        width = 9
        prev = None

    reset()
    while True:
        code = int(bits[pos : pos + width], 2)
        pos += width
        if code == 257:
            return out
        if code == 256:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            assert code == len(table), "reference: invalid code"
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def test_lzw_module_encoder_read_by_reference_decoder():
    rng = np.random.default_rng(5)
    for n in (0, 1, 700, 5000, 30000):
        for hi in (4, 256):  # low entropy (slow growth) and high (fast)
            d = bytes(rng.integers(0, hi, n).astype(np.uint8))
            assert _ref_lzw_decode(_lzw_encode(d)) == d
            assert _lzw_decode(_lzw_encode(d)) == d


def test_lzw_hand_assembled_stream():
    """CLEAR + literals + the KwKwK (code == table length) case +
    EOI, placed bit by bit. Sequence: A B A B A B A — the encoder
    would emit A, B, 258(AB), 260(ABA)... here we hand-feed
    256, 65, 66, 258, 260, 257:
      65 -> A            (table: 258=?)
      66 -> B            (table grows: 258 = A+B)
      258 -> AB          (table: 259 = B+A)
      260 -> KwKwK: prev(AB) + prev[0] = ABA (table: 260 = ABA)
      EOI
    decoded: A B AB ABA = 'ABABABA'
    """
    bits = "".join(format(c, "09b") for c in (256, 65, 66, 258, 260, 257))
    bits += "0" * ((-len(bits)) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_decode(data) == b"ABABABA"


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError):
        _lzw_decode(b"")  # no EOI
    # first code after clear must be a literal
    bits = "".join(format(c, "09b") for c in (256, 300, 257))
    bits += "0" * ((-len(bits)) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    with pytest.raises(ValueError):
        _lzw_decode(data)


def test_packbits_spec_vectors_and_roundtrip():
    # the Apple PackBits spec's canonical example
    src = bytes(
        [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
         0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
         0xAA, 0xAA, 0xAA, 0xAA]
    )
    enc = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
         0x00, 0x2A, 0x22, 0xF7, 0xAA]
    )
    assert _packbits_decode(enc) == src
    assert _packbits_decode(_packbits_encode(src)) == src
    rng = np.random.default_rng(9)
    for n in (0, 1, 129, 4000):
        d = bytes(rng.choice([0, 0, 0, 5, 9], n).astype(np.uint8))
        assert _packbits_decode(_packbits_encode(d)) == d


# --- container roundtrips ------------------------------------------


def _expect(img):
    return (
        np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img
    )


def test_roundtrip_matrix():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    rgb = rng.integers(0, 256, (23, 41, 3)).astype(np.uint8)
    smooth = (np.add.outer(np.arange(64), np.arange(80)) % 256).astype(
        np.uint8
    )
    for endian in ("<", ">"):
        for comp in ("none", "packbits", "lzw"):
            for pred in (1, 2):
                for img in (gray, rgb, smooth):
                    got = decode_tiff(
                        encode_tiff(
                            img, compression=comp, endian=endian,
                            predictor=pred, rows_per_strip=7,
                        )
                    )
                    assert np.array_equal(got, _expect(img))


def test_white_is_zero_and_palette():
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, (16, 17)).astype(np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(g, photometric=0)), _expect(g)
    )
    cmap = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (20, 33)).astype(np.uint8)
    got = decode_tiff(
        encode_tiff(idx, photometric=3, colormap=cmap, compression="lzw")
    )
    assert np.array_equal(got, cmap[idx])


def test_compression_effective_on_smooth_data():
    smooth = (np.add.outer(np.arange(64), np.arange(80)) % 256).astype(
        np.uint8
    )
    raw = len(encode_tiff(smooth, compression="none"))
    lzw = len(encode_tiff(smooth, compression="lzw", predictor=2))
    assert lzw < raw / 4


def test_loud_failures():
    g = np.zeros((4, 4), dtype=np.uint8)
    enc = bytearray(encode_tiff(g))
    with pytest.raises(ValueError, match="magic|TIFF"):
        decode_tiff(b"GIF8" + bytes(enc[4:]))
    # unsupported compression code in the IFD
    bad = bytearray(encode_tiff(g, compression="lzw"))
    # tag 259 value: find it via a decode of a hacked stream instead —
    # simplest loud-failure probes below:
    with pytest.raises(ValueError, match="bits"):
        # 8/16 are supported (round 8); an exotic depth still rejects
        decode_tiff(_hack_bits(encode_tiff(g), 12))
    with pytest.raises(ValueError, match="strip shorter"):
        # declaring 16-bit over an 8-bit payload is caught by the
        # strip-length check, not silently mis-parsed
        decode_tiff(_hack_bits(encode_tiff(g), 16))
    with pytest.raises(ValueError):
        decode_tiff(bytes(enc[: len(enc) // 2]))


def _hack_bits(data: bytes, new_bits: int) -> bytes:
    """Rewrite the (inline, count=1) BitsPerSample value of a
    little-endian single-gray-channel stream."""
    out = bytearray(data)
    (ifd_off,) = struct.unpack_from("<I", out, 4)
    (n,) = struct.unpack_from("<H", out, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", out, base)
        if tag == 258:
            struct.pack_into("<H", out, base + 8, new_bits)
    return bytes(out)


def test_lzw_final_code_on_width_boundary_regression():
    """Regression (found by the sf0.1 bench): when the FINAL data
    code's table append lands exactly on the 2^w - 1 early-change
    boundary, the decoder bumps before reading EOI — the encoder
    must model the decoder's table length (which grows on every data
    code, not just on encoder-dictionary registrations) or the
    MSB-first EOI is misread as wider garbage. This is the exact
    doc-1931 strip from the staged TIFF query."""
    did = 1931
    w, h = 10 + did % 13, 9 + did % 11
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    img = np.stack(
        [(did * 3 + x + 2 * y) % 256, (did * 5 + 2 * x + y) % 256,
         (did * 7 + x + y) % 256],
        axis=2,
    ).astype(np.uint8)
    strip = img[5:10].tobytes()  # the second rows_per_strip=5 strip
    assert _lzw_decode(_lzw_encode(strip)) == strip
    assert _ref_lzw_decode(_lzw_encode(strip)) == strip
    # and the whole container path
    got = decode_tiff(encode_tiff(img, compression="lzw", rows_per_strip=5))
    assert np.array_equal(got, img)


def test_lzw_boundary_length_sweep():
    """Systematic sweep across stream lengths straddling the 9->10
    bump region — every length, several entropies, both decoders."""
    for seed in range(8):
        r = np.random.default_rng(seed)
        for n in range(230, 300):
            for hi in (16, 256):
                d = bytes(r.integers(0, hi, n).astype(np.uint8))
                enc = _lzw_encode(d)
                assert _lzw_decode(enc) == d
                assert _ref_lzw_decode(enc) == d


@settings(max_examples=16, deadline=None)
@given(data=st.data())
def test_tiff_16bit_roundtrip_random(data):
    """16-bit gray/RGB samples (round 8): encode at 16 bits in either
    byte order × all compressions × both predictors, decode back —
    the uint8 result must equal the high-byte downscale of the
    source (the PNG-16 convention), including WhiteIsZero inversion
    and per-SAMPLE predictor-2 differencing (a per-byte predictor
    would corrupt every low-byte carry)."""
    import numpy as np

    from turnover_odata_etl_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    w = data.draw(st.integers(1, 17), label="w")
    h = data.draw(st.integers(1, 13), label="h")
    rgb = data.draw(st.booleans(), label="rgb")
    endian = data.draw(st.sampled_from(["<", ">"]), label="endian")
    comp = data.draw(
        st.sampled_from(["none", "lzw", "packbits"]), label="comp"
    )
    predictor = data.draw(st.sampled_from([1, 2]), label="predictor")
    white_zero = data.draw(st.booleans(), label="white_zero")
    rps = data.draw(st.integers(1, h), label="rows_per_strip")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))

    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    photometric = None
    if not rgb and white_zero:
        photometric = 0
    blob = encode_tiff(
        img,
        compression=comp,
        endian=endian,
        predictor=predictor,
        rows_per_strip=rps,
        photometric=photometric,
        bit_depth=16,
    )
    got = decode_tiff(blob)
    want8 = (img >> 8).astype(np.uint8)
    if not rgb:
        want8 = np.repeat(want8[:, :, None], 3, axis=2)
    assert got.shape == (h, w, 3)
    assert (got == want8).all()


def test_tiff_16bit_palette_rejected():
    import numpy as np

    from turnover_odata_etl_spark.functions.tiff import encode_tiff

    img = np.zeros((4, 4), dtype=np.uint16)
    cmap = np.zeros((256, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="16-bit palette"):
        encode_tiff(img, photometric=3, colormap=cmap, bit_depth=16)


def test_tiff_mixed_bits_rejected():
    """A file declaring mixed per-channel bit depths still fails
    loudly (the 16-bit support is uniform-depth only)."""
    import numpy as np

    from turnover_odata_etl_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    blob = bytearray(
        encode_tiff(np.zeros((2, 2, 3), dtype=np.uint8))
    )
    # find the BitsPerSample (258) IFD entry and corrupt one count
    import struct

    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        tag, vtype, count = struct.unpack_from("<HHI", blob, off)
        if tag == 258:
            voff = struct.unpack_from("<I", blob, off + 8)[0]
            struct.pack_into("<H", blob, voff, 16)  # [16, 8, 8]
            break
    with pytest.raises(ValueError, match="unsupported"):
        decode_tiff(bytes(blob))
