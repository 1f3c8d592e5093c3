"""FLAC codec tests (functions/flac.py).

Three independent lines of evidence, per the codec-testing pattern
established on GIF/JPEG/ADPCM:

1. Roundtrip fuzz: decode(encode(x, **opts)) == x bit-exactly for
   every encoder option that changes the stream layout (FLAC is
   lossless, so exact equality is the spec).
2. Hand-assembled streams: frames built bit-by-bit with plain int
   arithmetic (NOT the module's bit writer) decode to independently
   computed samples — this catches symmetric reader/writer bugs that
   roundtrip fuzz structurally cannot.
3. Known-answer vectors: the CRC-8 (poly 0x07) and CRC-16 (poly
   0x8005) tables are pinned to the published check values for
   "123456789" (0xF4 / 0xFEE8), so the frame-integrity layer is
   anchored outside this repo.
"""

from __future__ import annotations

import numpy as np
import pytest

from turnover_odata_etl_spark.functions.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _roundtrip(samples, **kw):
    enc = encode_flac(samples, sample_rate=kw.pop("sample_rate", 8000), **kw)
    dec, rate = decode_flac(enc)
    expect = np.asarray(samples, dtype=np.int64)
    if expect.ndim == 1:
        expect = expect[:, None]
    assert dec.shape == expect.shape
    assert np.array_equal(dec, expect)
    return enc


# --- known-answer anchors ------------------------------------------


def test_crc_known_vectors():
    assert _crc8(b"123456789") == 0xF4  # CRC-8 (SMBus), poly 0x07
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS, poly 0x8005


# --- roundtrip fuzz ------------------------------------------------


def _signals(rng):
    t = np.arange(2000)
    yield np.full(777, -1234, dtype=np.int16)  # constant
    yield np.arange(-600, 700, dtype=np.int16)  # ramp: order-2 exact
    yield (3000 * np.sin(t / 17) + 200 * np.sin(t / 3)).astype(np.int16)
    yield rng.integers(-32768, 32768, 1500).astype(np.int16)  # noise
    yield np.array([-32768, 32767] * 300, dtype=np.int16)  # extremes
    yield np.zeros(5, dtype=np.int16)  # shorter than any block


def test_roundtrip_mono_variants():
    rng = np.random.default_rng(7)
    for s in _signals(rng):
        for kw in (
            {},
            {"block_size": 192},
            {"block_size": 256, "partition_order": 3},
            {"coding_method": 1},
            {"lpc_order": 4},
            {"lpc_order": 8, "partition_order": 2},
            {"force_subframe": "verbatim"},
        ):
            _roundtrip(s, **kw)


def test_roundtrip_stereo_decorrelation_modes():
    rng = np.random.default_rng(11)
    t = np.arange(3000)
    left = (5000 * np.sin(t / 23)).astype(np.int64)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        # correlated channels (side small) and anti-correlated
        for right in (
            left + rng.integers(-4, 5, t.size),
            -left + rng.integers(-4, 5, t.size),
            rng.integers(-32768, 32768, t.size),
        ):
            st = np.stack([left, np.clip(right, -32768, 32767)], axis=1)
            _roundtrip(st.astype(np.int16), stereo_mode=mode,
                       block_size=512)


def test_roundtrip_multichannel_and_8bit():
    rng = np.random.default_rng(13)
    mc = rng.integers(-2000, 2000, (900, 5)).astype(np.int16)
    _roundtrip(mc, block_size=256)
    s8 = rng.integers(-128, 128, 700).astype(np.int16)
    _roundtrip(s8, bps=8)


def test_roundtrip_empty_and_single_sample():
    _roundtrip(np.zeros((0, 2), dtype=np.int16))
    _roundtrip(np.array([42], dtype=np.int16))


def test_stereo_decorrelation_actually_compresses():
    """Mid/side on near-identical channels must beat independent —
    proves the decorrelation path is live, not a relabeled copy."""
    rng = np.random.default_rng(17)
    t = np.arange(8000)
    left = (9000 * np.sin(t / 31)).astype(np.int64)
    right = left + rng.integers(-2, 3, t.size)
    st = np.stack([left, right], axis=1).astype(np.int16)
    n_ind = len(encode_flac(st, stereo_mode="independent"))
    n_ms = len(encode_flac(st, stereo_mode="mid_side"))
    assert n_ms < n_ind


def test_smooth_signal_compresses_below_raw():
    t = np.arange(20000)
    s = (6000 * np.sin(t / 29)).astype(np.int16)
    enc = encode_flac(s)
    assert len(enc) < s.size * 2 * 0.5  # ≥2x on a smooth signal


# --- hand-assembled streams (independent of the module's writer) ---


class _Bits:
    """Minimal MSB-first assembler: plain int arithmetic only."""

    def __init__(self):
        self.s = ""

    def put(self, val, n):
        if n:
            self.s += format(val & ((1 << n) - 1), f"0{n}b")

    def put_bytes(self, data):
        for b in data:
            self.put(b, 8)

    def align(self):
        self.s += "0" * ((-len(self.s)) % 8)

    def bytes(self):
        assert len(self.s) % 8 == 0
        return bytes(
            int(self.s[i : i + 8], 2) for i in range(0, len(self.s), 8)
        )


def _streaminfo(n_samples, n_channels=1, bps=16, rate=8000, md5=b"\x00" * 16,
                block=16):
    b = _Bits()
    b.put(block, 16)
    b.put(block, 16)
    b.put(0, 24)
    b.put(0, 24)
    b.put(rate, 20)
    b.put(n_channels - 1, 3)
    b.put(bps - 1, 5)
    b.put(n_samples, 36)
    b.put_bytes(md5)
    body = b.bytes()
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(header_tail_bits, body_bits, frame_number=0, blocksize_m1=None):
    """Assemble sync+header (with CRC-8) + subframe bits + CRC-16.
    ``blocksize_m1`` is the uncommon-blocksize byte, which per spec
    sits AFTER the coded number and BEFORE the CRC-8."""
    h = _Bits()
    h.put(0b11111111111110, 14)
    h.put(0, 1)  # reserved
    h.put(0, 1)  # fixed blocking
    for val, n in header_tail_bits:
        h.put(val, n)
    h.put(frame_number, 8)  # UTF-8 single byte (frame_number < 0x80)
    if blocksize_m1 is not None:
        h.put(blocksize_m1, 8)
    header = h.bytes()
    f = _Bits()
    f.put_bytes(header)
    f.put(_crc8(header), 8)
    for val, n in body_bits:
        f.put(val, n)
    f.align()
    frame_wo_crc = f.bytes()
    f.put(_crc16(frame_wo_crc), 16)
    return f.bytes()


def test_hand_assembled_constant_and_fixed_frames():
    """Mono 16-bit, blocksize 16 (uncommon 8-bit code), two frames:
    frame 0 CONSTANT -5, frame 1 FIXED order-1 with rice k=2
    residuals — every bit placed by hand."""
    header_tail = [
        (0b0110, 4),  # block size: uncommon, 8-bit at end of header
        (0b0100, 4),  # sample rate code: 8 kHz literal (parse path)
        (0b0000, 4),  # 1 channel
        (0b100, 3),  # 16-bit
        (0, 1),  # reserved
    ]
    # the 8-bit (blocksize-1) field sits after the coded number
    f0 = _frame(
        header_tail,
        [(0, 1), (0b000000, 6), (0, 1),  # constant, no wasted bits
         (-5 & 0xFFFF, 16)],
        frame_number=0,
        blocksize_m1=15,
    )
    # frame 1: FIXED order 1, warmup 100, residuals rice k=2
    samples = [100, 101, 103, 100, 104, 104, 102, 90, 91, 92, 93, 94,
               95, 96, 97, 98]
    residuals = [samples[i] - samples[i - 1] for i in range(1, 16)]
    body = [
        (0, 1), (0b001000 | 1, 6), (0, 1),  # fixed order 1
        (100, 16),  # warmup
        (0b00, 2),  # rice 4-bit method
        (0, 4),  # partition order 0
        (2, 4),  # rice parameter k=2
    ]
    for rv in residuals:
        u = (rv << 1) if rv >= 0 else ((-rv << 1) - 1)
        body.append((1, (u >> 2) + 1))  # unary quotient: zeros then 1
        body.append((u & 3, 2))
    f1 = _frame(header_tail, body, frame_number=1, blocksize_m1=15)
    stream = _streaminfo(32, block=16) + f0 + f1
    dec, rate = decode_flac(stream)
    assert rate == 8000
    expect = np.array([-5] * 16 + samples, dtype=np.int64)[:, None]
    assert np.array_equal(dec, expect)


def test_hand_assembled_wasted_bits_and_escape_partition():
    """One frame exercising the two paths the encoder rarely emits
    together: a CONSTANT subframe with 2 wasted bits (stored value is
    pre-shifted) and a VERBATIM-free escape: FIXED order 0 whose only
    partition is raw-escaped at 5 bits/sample."""
    header_tail = [
        (0b0110, 4), (0b0000, 4), (0b0001, 4),  # 2 channels independent
        (0b100, 3), (0, 1),
    ]
    vals = [5, -3, 0, 7, -8, 1, 2, -1]
    body = [
        # ch0: constant with wasted bits: flag=1, unary "01" => 2 wasted
        (0, 1), (0b000000, 6), (1, 1), (0b01, 2),
        (-24 >> 2 & 0x3FFF, 14),  # stored at 16-2=14 bits, value -6
        # ch1: fixed order 0, partition order 0, ESCAPE, 5 raw bits
        (0, 1), (0b001000, 6), (0, 1),
        (0b00, 2), (0, 4), (0b1111, 4), (5, 5),
    ] + [(v & 0x1F, 5) for v in vals]
    f0 = _frame(header_tail, body, frame_number=0, blocksize_m1=7)
    stream = _streaminfo(8, n_channels=2, block=8) + f0
    dec, _ = decode_flac(stream)
    assert np.array_equal(dec[:, 0], np.full(8, -24))
    assert np.array_equal(dec[:, 1], np.array(vals))


# --- loud failure --------------------------------------------------


def test_corruption_detected():
    s = (1000 * np.sin(np.arange(4000) / 13)).astype(np.int16)
    enc = bytearray(encode_flac(s))
    # flip one byte well inside the first frame's payload
    enc[len(enc) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_md5_mismatch_detected():
    s = np.arange(500, dtype=np.int16)
    enc = bytearray(encode_flac(s))
    # STREAMINFO MD5 sits at bytes 8+18 .. 8+34 of the stream
    enc[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))


def test_truncation_and_bad_magic():
    s = np.arange(300, dtype=np.int16)
    enc = encode_flac(s)
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) - 7])
    with pytest.raises(ValueError):
        decode_flac(b"OggS" + enc[4:])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([70000]), bps=16)
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(np.zeros((4, 3)), stereo_mode="mid_side")
    with pytest.raises(ValueError, match="bits-per-sample"):
        encode_flac(np.zeros(4), bps=13)
