"""FLAC (RFC 9639) codec subset in pure numpy + stdlib.

The lossless-COMPRESSION rung of the audio ladder (E87/E96/E97 gave
PCM, IMA ADPCM, and G.711 — compressed but lossy or merely companded;
reference scope: mkov516/turnover-odata-etl carries opaque payload
columns end-to-end, src/etl.py:201-209, and this repo's mandate adds
real multimodal decode on top). FLAC is the audio analogue of PNG:
an entropy-coded container whose decode must reproduce the input
bit-exactly, which makes every fuzz test an exact-equality test and
makes closed-form SQL oracles possible for the end-to-end query
(`plans/roundeight.m_flac_decode_features`).

Decoder (`decode_flac`): streaminfo + metadata-block walk, frame
sync/header parse (all block-size and sample-rate codes, 8/12/16/20/
24/32-bit sample sizes, UTF-8-coded frame/sample numbers, CRC-8
header check), subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
with wasted-bits support, rice-partitioned residuals (4-bit rice,
5-bit rice2, raw-escape partitions), all four channel assignments
(independent, left/side, right/side, mid/side), per-frame CRC-16
verification, and the STREAMINFO MD5 check over the reassembled PCM.
Corrupt or truncated streams raise ``ValueError`` loudly — same
contract as the JPEG/PNG/ADPCM paths.

Encoder (`encode_flac`): the test-vector generator — fixed blocking,
per-channel subframe choice (constant when flat, fixed order 0-4 by
exact rice-cost comparison, verbatim when entropy coding loses,
optional LPC with Levinson-Durbin quantized coefficients), rice
partition orders 0-8, raw-escape partitions when cheaper, all four
stereo decorrelation modes, and the STREAMINFO MD5. Any encoder
option changes only the SIZE of the stream, never the decoded
samples — the fuzz tests pin decode(encode(x, **any_opts)) == x.

Why hand-rolled bit IO is acceptable here: decode runs inside
``mapInPandas`` workers, one clip per call, batched by Arrow — the
per-symbol Python loop is the slow-but-correct reference tier
(exactly the JPEG posture, functions/jpeg.py). The bit reader keeps
a precomputed set-bit index so the rice unary scan is O(log n) per
symbol instead of a per-bit loop.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# --- CRCs (table-driven, MSB-first, init 0 — RFC 9639 §9.2/9.3) ----


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table[byte] = crc & mask
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]) ^ ((crc << 8) & 0xFFFF)
    return crc


# --- UTF-8-style coded numbers (RFC 9639 §9.1.1 — up to 36 bits) ---


def _utf8_capacity(nbytes: int) -> int:
    return 7 if nbytes == 1 else (7 - nbytes) + 6 * (nbytes - 1)


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < (1 << _utf8_capacity(nbytes)):
            shift = 6 * (nbytes - 1)
            lead_mask = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead_mask | (n >> shift)]
            for i in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError(f"coded number out of 36-bit range: {n}")


# --- bit-level IO --------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the whole stream. ``_ones`` (sorted
    positions of set bits) turns the rice unary scan into a binary
    search — the decoder's hot loop never walks bits one at a time."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._ones = np.flatnonzero(self._bits)
        self.pos = 0

    def read_bits(self, n: int) -> int:
        if self.pos + n > self._bits.size:
            raise ValueError("FLAC: truncated stream")
        if n == 0:
            return 0
        seg = self._bits[self.pos : self.pos + n]
        self.pos += n
        val = 0
        for b in seg:  # n <= 36 everywhere this is called
            val = (val << 1) | int(b)
        return val

    def read_signed(self, n: int) -> int:
        if n == 0:
            return 0
        val = self.read_bits(n)
        return val - (1 << n) if val >= (1 << (n - 1)) else val

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit (rice quotient)."""
        idx = int(np.searchsorted(self._ones, self.pos))
        if idx >= self._ones.size:
            raise ValueError("FLAC: truncated stream (unary run)")
        one_pos = int(self._ones[idx])
        q = one_pos - self.pos
        self.pos = one_pos + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    @property
    def byte_pos(self) -> int:
        return self.pos // 8


class _BitWriter:
    def __init__(self) -> None:
        self._chunks: list[tuple[int, int]] = []
        self._nbits = 0

    def write(self, val: int, n: int) -> None:
        if n:
            self._chunks.append((val & ((1 << n) - 1), n))
            self._nbits += n

    def write_signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1) if n else 0, n)

    def write_unary(self, q: int) -> None:
        # q zeros then a terminating 1
        self.write(1, q + 1)

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write(b, 8)

    def align(self) -> None:
        pad = (-self._nbits) % 8
        if pad:
            self.write(0, pad)

    def to_bytes(self) -> bytes:
        bits = np.zeros(self._nbits, dtype=np.uint8)
        pos = 0
        for val, n in self._chunks:
            for i in range(n - 1, -1, -1):
                bits[pos] = (val >> i) & 1
                pos += 1
        return np.packbits(bits).tobytes()


# --- shared tables -------------------------------------------------

_BLOCKSIZE_CODES = {
    192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011, 4096: 0b1100,
    8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_BLOCKSIZE_BY_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}
_SAMPLE_RATE_BY_CODE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BITS_BY_CODE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
                 0b111: 32}
_CODE_BY_BITS = {v: k for k, v in _BITS_BY_CODE.items()}

# Fixed-predictor coefficients: s_hat[i] = sum c_j * s[i-1-j].
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r.astype(np.int64) << 1,
                    ((-r.astype(np.int64)) << 1) - 1)


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded audio: channel-interleaved, little-endian,
    minimum whole bytes per sample (RFC 9639 §8.2)."""
    nbytes = (bps + 7) // 8
    flat = np.ascontiguousarray(samples.astype("<i4")).reshape(-1)
    as_bytes = flat.view(np.uint8).reshape(-1, 4)[:, :nbytes]
    return hashlib.md5(as_bytes.tobytes()).digest()


# --- decoder -------------------------------------------------------


def decode_flac(data: bytes):
    """Decode a FLAC stream → ``(samples, sample_rate)`` with samples
    ``(n_frames, n_channels) int32``. Verifies every frame's CRC-8 +
    CRC-16 and the STREAMINFO MD5 (when present and the stream
    declares its total length); any mismatch, unknown subframe type,
    or truncation raises ``ValueError``."""
    if data[:4] != b"fLaC":
        raise ValueError(f"not a FLAC stream (magic {data[:4]!r})")
    pos = 4
    streaminfo = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata block header")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC: truncated metadata block")
        pos += 4 + length
        if first:
            if btype != 0 or length != 34:
                raise ValueError("FLAC: first metadata block must be STREAMINFO")
            streaminfo = body
        first = False
    si = _BitReader(streaminfo)
    si.read_bits(16)  # min block size
    si.read_bits(16)  # max block size
    si.read_bits(24)  # min frame size
    si.read_bits(24)  # max frame size
    si_rate = si.read_bits(20)
    si_channels = si.read_bits(3) + 1
    si_bps = si.read_bits(5) + 1
    total_samples = si.read_bits(36)
    md5 = streaminfo[18:34]

    r = _BitReader(data[pos:])
    blocks: list[np.ndarray] = []
    got = 0
    frame_index = 0
    while r.byte_pos < len(r.data) and (
        total_samples == 0 or got < total_samples
    ):
        block = _decode_frame(r, si_rate, si_channels, si_bps, frame_index)
        blocks.append(block)
        got += block.shape[0]
        frame_index += 1
    if not blocks:
        samples = np.zeros((0, si_channels), dtype=np.int32)
    else:
        samples = np.concatenate(blocks, axis=0).astype(np.int32)
    if total_samples and samples.shape[0] != total_samples:
        raise ValueError(
            f"FLAC: stream ended at {samples.shape[0]} of "
            f"{total_samples} declared samples"
        )
    if total_samples and md5 != b"\x00" * 16:
        if _pcm_md5(samples, si_bps) != md5:
            raise ValueError("FLAC: MD5 mismatch — decoded audio corrupt")
    return samples, si_rate


def _read_coded_number(r: _BitReader) -> int:
    first = r.read_bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    while (first << nbytes) & 0x80:
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: invalid coded-number lead byte")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = r.read_bits(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded-number continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


def _decode_frame(
    r: _BitReader, si_rate: int, si_channels: int, si_bps: int,
    expected_index: int,
) -> np.ndarray:
    start = r.byte_pos
    if r.read_bits(14) != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    if r.read_bits(1) != 0:
        raise ValueError("FLAC: reserved bit set in frame header")
    variable_blocking = r.read_bits(1)
    bs_code = r.read_bits(4)
    rate_code = r.read_bits(4)
    ch_code = r.read_bits(4)
    size_code = r.read_bits(3)
    if r.read_bits(1) != 0:
        raise ValueError("FLAC: reserved bit set in frame header")
    number = _read_coded_number(r)
    if not variable_blocking and number != expected_index:
        raise ValueError(
            f"FLAC: frame number {number} != expected {expected_index}"
        )
    if bs_code == 0b0000:
        raise ValueError("FLAC: reserved block-size code")
    elif bs_code == 0b0110:
        blocksize = r.read_bits(8) + 1
    elif bs_code == 0b0111:
        blocksize = r.read_bits(16) + 1
    else:
        blocksize = _BLOCKSIZE_BY_CODE[bs_code]
    if rate_code == 0b0000:
        pass  # streaminfo
    elif rate_code == 0b1100:
        r.read_bits(8)
    elif rate_code in (0b1101, 0b1110):
        r.read_bits(16)
    elif rate_code == 0b1111:
        raise ValueError("FLAC: invalid sample-rate code")
    if size_code == 0b000:
        bps = si_bps
    elif size_code == 0b011:
        raise ValueError("FLAC: reserved sample-size code")
    else:
        bps = _BITS_BY_CODE[size_code]
    stored_crc8 = r.read_bits(8)
    header_bytes = r.data[start : r.byte_pos - 1]
    if _crc8(header_bytes) != stored_crc8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if ch_code <= 0b0111:
        n_channels = ch_code + 1
        side_channel = None
    elif ch_code == 0b1000:  # left/side
        n_channels, side_channel = 2, 1
    elif ch_code == 0b1001:  # right/side
        n_channels, side_channel = 2, 0
    elif ch_code == 0b1010:  # mid/side
        n_channels, side_channel = 2, 1
    else:
        raise ValueError("FLAC: reserved channel assignment")
    if n_channels != si_channels:
        raise ValueError("FLAC: frame channel count != STREAMINFO")

    chans = []
    for ch in range(n_channels):
        ch_bps = bps + (1 if ch == side_channel else 0)
        chans.append(_decode_subframe(r, blocksize, ch_bps))
    r.align()
    frame_bytes = r.data[start : r.byte_pos]
    stored_crc16 = r.read_bits(16)
    if _crc16(frame_bytes) != stored_crc16:
        raise ValueError("FLAC: frame CRC-16 mismatch")

    if ch_code <= 0b0111:
        return np.stack(chans, axis=1)
    a, b = chans[0].astype(np.int64), chans[1].astype(np.int64)
    if ch_code == 0b1000:  # left/side: L, S=L-R
        left, right = a, a - b
    elif ch_code == 0b1001:  # right/side: S=L-R, R
        left, right = a + b, b
    else:  # mid/side: M=(L+R)>>1, S=L-R
        t = (a << 1) | (b & 1)
        left, right = (t + b) >> 1, (t - b) >> 1
    return np.stack([left, right], axis=1)


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read_bits(1) != 0:
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read_bits(6)
    wasted = 0
    if r.read_bits(1):
        wasted = r.read_unary() + 1
    eff_bps = bps - wasted
    if stype == 0b000000:  # CONSTANT
        out = np.full(blocksize, r.read_signed(eff_bps), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        out = np.array(
            [r.read_signed(eff_bps) for _ in range(blocksize)], dtype=np.int64
        )
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype & 0b000111
        out = _decode_predicted(
            r, blocksize, eff_bps, order,
            coeffs=np.array(_FIXED_COEFFS[order], dtype=np.int64), shift=0,
        )
    elif stype >= 0b100000:  # LPC, order 1-32
        order = (stype & 0b011111) + 1
        warmup = [r.read_signed(eff_bps) for _ in range(order)]
        prec = r.read_bits(4)
        if prec == 0b1111:
            raise ValueError("FLAC: invalid LPC precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coeffs = np.array(
            [r.read_signed(prec) for _ in range(order)], dtype=np.int64
        )
        out = _decode_predicted(
            r, blocksize, eff_bps, order, coeffs, shift, warmup=warmup
        )
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype:#08b}")
    return out << wasted


def _decode_predicted(
    r: _BitReader, blocksize: int, bps: int, order: int,
    coeffs: np.ndarray, shift: int, warmup: list[int] | None = None,
) -> np.ndarray:
    if warmup is None:
        warmup = [r.read_signed(bps) for _ in range(order)]
    residual = _decode_residual(r, blocksize, order)
    out = np.empty(blocksize, dtype=np.int64)
    out[:order] = warmup
    c = [int(x) for x in coeffs]
    res = residual.tolist()
    o = out.tolist()  # python-int list: predictor sums never overflow
    for i in range(order, blocksize):
        pred = 0
        for j in range(order):
            pred += c[j] * o[i - 1 - j]
        o[i] = res[i - order] + (pred >> shift)
    return np.array(o, dtype=np.int64)


def _decode_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read_bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read_bits(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC: block size not divisible by partitions")
    per = blocksize >> porder
    if per <= order and porder > 0 or (porder == 0 and per < order):
        raise ValueError("FLAC: partition smaller than predictor order")
    out: list[int] = []
    for p in range(n_part):
        count = per - order if p == 0 else per
        if count < 0:
            raise ValueError("FLAC: negative first-partition size")
        param = r.read_bits(plen)
        if param == escape:
            nbits = r.read_bits(5)
            out.extend(r.read_signed(nbits) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | r.read_bits(param)
                out.append((u >> 1) ^ -(u & 1))
    return np.array(out, dtype=np.int64)


# --- encoder -------------------------------------------------------


def encode_flac(
    samples,
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    force_subframe: str | None = None,
    lpc_order: int = 0,
    coding_method: int = 0,
) -> bytes:
    """``(n, ch) int`` → FLAC bytes. Options steer which stream
    features the output exercises (the decoder must accept them all;
    decoded audio is identical regardless):

    - ``stereo_mode``: independent | left_side | right_side | mid_side
    - ``partition_order``: rice partition count = 2^p per subframe
      (clamped where the block is too small or not divisible)
    - ``force_subframe``: verbatim | fixed — skip cost comparison
    - ``lpc_order`` > 0: Levinson-Durbin LPC subframes (quantized
      coefficients, precision 12) instead of fixed predictors
    - ``coding_method``: 0 = 4-bit rice, 1 = 5-bit rice2
    """
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_channels = samples.shape
    if not 1 <= n_channels <= 8:
        raise ValueError("encode_flac: 1-8 channels")
    if bps not in _CODE_BY_BITS:
        raise ValueError(f"encode_flac: unsupported bits-per-sample {bps}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError(f"encode_flac: samples exceed {bps}-bit range")
    if stereo_mode != "independent" and n_channels != 2:
        raise ValueError("encode_flac: stereo modes need 2 channels")
    if coding_method not in (0, 1):
        raise ValueError("encode_flac: coding_method 0 or 1")

    frames = []
    for idx, off in enumerate(range(0, max(n, 1), block_size)):
        block = samples[off : off + block_size]
        if block.shape[0] == 0:
            break
        frames.append(
            _encode_frame(
                block, idx, sample_rate, bps, block_size, stereo_mode,
                partition_order, force_subframe, lpc_order, coding_method,
            )
        )

    si = _BitWriter()
    si.write(block_size if n else 16, 16)  # min block size (>=16 per spec)
    si.write(block_size if n else 16, 16)
    si.write(0, 24)  # min/max frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.write_bytes(_pcm_md5(samples, bps))
    si_bytes = si.to_bytes()
    header = (
        b"fLaC"
        + bytes([0x80 | 0x00])  # last-metadata-block, STREAMINFO
        + struct.pack(">I", len(si_bytes))[1:]
        + si_bytes
    )
    return header + b"".join(frames)


def _encode_frame(
    block: np.ndarray, index: int, sample_rate: int, bps: int,
    nominal_block: int, stereo_mode: str, partition_order: int,
    force_subframe: str | None, lpc_order: int, coding_method: int,
) -> bytes:
    blocksize, n_channels = block.shape
    ch_code = n_channels - 1
    side_channel = None
    chans: list[np.ndarray]
    if stereo_mode == "independent":
        chans = [block[:, c] for c in range(n_channels)]
    else:
        left, right = block[:, 0], block[:, 1]
        side = left - right
        if stereo_mode == "left_side":
            ch_code, side_channel, chans = 0b1000, 1, [left, side]
        elif stereo_mode == "right_side":
            ch_code, side_channel, chans = 0b1001, 0, [side, right]
        elif stereo_mode == "mid_side":
            mid = (left + right) >> 1
            ch_code, side_channel, chans = 0b1010, 1, [mid, side]
        else:
            raise ValueError(f"encode_flac: unknown stereo mode {stereo_mode}")

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocking
    bs_code = _BLOCKSIZE_CODES.get(blocksize)
    if bs_code is None:
        bs_code = 0b0111  # uncommon, 16-bit at end of header
    w.write(bs_code, 4)
    w.write(0b0000, 4)  # sample rate: from STREAMINFO
    w.write(ch_code, 4)
    w.write(_CODE_BY_BITS[bps], 3)
    w.write(0, 1)  # reserved
    w.write_bytes(_utf8_encode(index))
    if bs_code == 0b0111:
        w.write(blocksize - 1, 16)
    header_bytes = w.to_bytes()
    w.write(_crc8(header_bytes), 8)

    for ch, s in enumerate(chans):
        ch_bps = bps + (1 if ch == side_channel else 0)
        _encode_subframe(
            w, s, ch_bps, partition_order, force_subframe, lpc_order,
            coding_method,
        )
    w.align()
    frame_bytes = w.to_bytes()
    w.write(_crc16(frame_bytes), 16)
    return w.to_bytes()


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + u.size * (k + 1)


def _best_rice_k(u: np.ndarray, max_k: int) -> tuple[int, int]:
    """(k, bits) minimizing the exact rice length."""
    best_k, best = 0, _rice_cost(u, 0)
    for k in range(1, max_k + 1):
        c = _rice_cost(u, k)
        if c < best:
            best_k, best = k, c
        elif c > best * 2:  # cost is convex in k; stop early
            break
    return best_k, best


def _raw_bits_needed(res: np.ndarray) -> int:
    if res.size == 0 or (res.min() == 0 and res.max() == 0):
        return 0
    n = 1
    while not (-(1 << (n - 1)) <= res.min() and res.max() < (1 << (n - 1))):
        n += 1
    return n


def _encode_subframe(
    w: _BitWriter, s: np.ndarray, bps: int, partition_order: int,
    force_subframe: str | None, lpc_order: int, coding_method: int,
) -> None:
    blocksize = s.shape[0]
    if force_subframe == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)  # no wasted bits
        for v in s:
            w.write_signed(int(v), bps)
        return
    if np.all(s == s[0]) and force_subframe is None:
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)
        w.write_signed(int(s[0]), bps)
        return

    if lpc_order > 0 and blocksize > lpc_order:
        order, coeffs, shift = _lpc_fit(s, lpc_order)
        pred = _predict(s, coeffs, shift, order)
        residual = s[order:] - pred
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write_signed(int(v), bps)
        w.write(12 - 1, 4)  # precision 12
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(int(c), 12)
        _encode_residual(
            w, residual, blocksize, order, partition_order, coding_method
        )
        return

    # fixed predictor: exact-cost choice among orders 0..4 vs verbatim
    best = None
    for order in range(0, min(4, blocksize - 1) + 1):
        residual = np.diff(s, n=order) if order else s.copy()
        u = _zigzag(residual)
        k, bits = _best_rice_k(u, 30)
        total = order * bps + bits
        if best is None or total < best[3]:
            best = (order, residual, k, total)
    order, residual, _k, total = best
    if total >= blocksize * bps and force_subframe != "fixed":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in s:
            w.write_signed(int(v), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | order, 6)
    w.write(0, 1)
    for v in s[:order]:
        w.write_signed(int(v), bps)
    _encode_residual(
        w, residual, blocksize, order, partition_order, coding_method
    )


def _encode_residual(
    w: _BitWriter, residual: np.ndarray, blocksize: int, order: int,
    partition_order: int, coding_method: int,
) -> None:
    porder = partition_order
    while porder > 0 and (
        blocksize % (1 << porder) or (blocksize >> porder) <= order
    ):
        porder -= 1
    plen = 4 if coding_method == 0 else 5
    escape = (1 << plen) - 1
    max_k = escape - 1
    w.write(coding_method, 2)
    w.write(porder, 4)
    per = blocksize >> porder
    pos = 0
    for p in range(1 << porder):
        count = per - order if p == 0 else per
        part = residual[pos : pos + count]
        pos += count
        u = _zigzag(part)
        k, rice_bits = _best_rice_k(u, max_k)
        nraw = _raw_bits_needed(part)
        if 5 + nraw * count < plen + rice_bits:
            w.write(escape, plen)
            w.write(nraw, 5)
            for v in part:
                w.write_signed(int(v), nraw)
        else:
            w.write(k, plen)
            for uv in u:
                w.write_unary(int(uv) >> k)
                w.write(int(uv), k)


def _lpc_fit(s: np.ndarray, order: int) -> tuple[int, np.ndarray, int]:
    """Levinson-Durbin on the block's autocorrelation, quantized to
    12-bit coefficients with shift 10. Coefficient QUALITY affects
    only compression — the residual is computed exactly against the
    quantized coefficients, so decode is exact regardless."""
    x = s.astype(np.float64)
    ac = np.array(
        [np.dot(x[: len(x) - lag], x[lag:]) for lag in range(order + 1)]
    )
    if ac[0] == 0:
        lpc = np.zeros(order)
    else:
        err = ac[0]
        lpc = np.zeros(order)
        for i in range(order):
            # Levinson-Durbin recursion: acc = ac[i+1] - sum_j lpc[j]*ac[i-j]
            acc = ac[i + 1] - sum(lpc[j] * ac[i - j] for j in range(i))
            ref = acc / err if err else 0.0
            new = lpc.copy()
            new[i] = ref
            for j in range(i):
                new[j] = lpc[j] - ref * lpc[i - 1 - j]
            lpc = new
            err *= 1 - ref * ref
            if err <= 0:
                break
    shift = 10
    q = np.clip(np.round(lpc * (1 << shift)), -(1 << 11), (1 << 11) - 1)
    return order, q.astype(np.int64), shift


def _predict(
    s: np.ndarray, coeffs: np.ndarray, shift: int, order: int
) -> np.ndarray:
    """pred[i] = (sum_j coeffs[j] * s[i-1-j]) >> shift, for i>=order —
    int64 accumulation (12-bit coeffs × ≤25-bit samples × order ≤ 32
    stays under 2^48), vectorized per coefficient; numpy's >> on
    signed int64 is arithmetic, matching the decoder's floor shift."""
    acc = np.zeros(s.shape[0] - order, dtype=np.int64)
    sl = s.astype(np.int64)
    for j in range(order):
        acc += int(coeffs[j]) * sl[order - 1 - j : s.shape[0] - 1 - j]
    return acc >> shift
