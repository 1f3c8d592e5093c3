"""Baseline TIFF 6.0 codec in pure numpy + stdlib.

Completes the common-container image ladder (PPM/BMP → PNG → GIF →
JPEG; reference scope: mkov516/turnover-odata-etl carries opaque
payloads end-to-end, src/etl.py:201-209 — real decode is this repo's
multimodal mandate, SURVEY.md §2 E11). TIFF is the scientific/
scanning interchange format; its decode surface is an IFD tag walk
plus three strip codecs.

Decoder (`decode_tiff`): both byte orders ("II" little / "MM" big),
first-IFD single image, 8-bit gray (BlackIsZero AND the inverted
WhiteIsZero), 8-bit RGB/RGBA (alpha dropped), 8-bit palette
(16-bit ColorMap entries), 16-bit gray/RGB samples in either byte
order (high-byte downscale to the uint8 contract, per-sample
predictor-2 differencing — round 8), strip organization with any
RowsPerStrip,
compressions none (1) / TIFF-LZW (5) / PackBits (32773), and
horizontal-differencing predictor 2. Anything else (tiles, 1-bit,
CCITT fax, JPEG-in-TIFF, planar config 2) raises ``ValueError``
loudly — the same contract as the other codecs.

Encoder (`encode_tiff`): the test-vector generator — same variants,
either endian, choosable compression/predictor/rows-per-strip.

TIFF-LZW is NOT GIF-LZW: codes pack MSB-first (GIF is LSB-first),
and the code width bumps EARLY — when the next entry would be
2^w - 1, one code before GIF's bump point (the classic symmetric-bug
trap: a matched encoder/decoder pair that both bump late roundtrips
perfectly and reads no real-world file; the hand-assembled stream in
tests/test_tiff.py pins the early change independently).

Scale note: decode runs inside ``mapInPandas`` workers, one image
per call, Arrow-batched — same posture as jpeg.py/flac.py; the
module is shipped by value via ``cloudpickle.register_pickle_by_value``.
"""

from __future__ import annotations

import struct

import numpy as np

# --- TIFF-LZW (MSB-first, early code-width change) -----------------

_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW: stream ended without EOI")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code beyond table")
        out += entry
        prev = entry
        # EARLY change: width grows when the NEXT code to be added
        # would not fit, i.e. at table length 2^w - 1 (511/1023/2047).
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    out_bits: list[tuple[int, int]] = []

    def emit(code: int, width: int):
        out_bits.append((code, width))

    table: dict[bytes, int] = {}
    width = 9
    decoder_len = 258  # entries the DECODER's table will hold
    first_since_clear = True

    def reset():
        nonlocal table, width, decoder_len, first_since_clear
        table = {bytes([i]): i for i in range(256)}
        width = 9
        decoder_len = 258
        first_since_clear = True

    def emit_data(code: int):
        """Emit a data code and advance the DECODER's state model.

        Width sync is driven by the decoder's table length, not the
        encoder's dictionary: the decoder appends one entry on EVERY
        data code after the first since a clear — INCLUDING the final
        run code that registers nothing here — and bumps EARLY when
        its length hits 2^w - 1. Modeling only the encoder's
        registrations desyncs exactly when the last data code lands
        on the bump boundary: the decoder bumps before reading EOI,
        the encoder doesn't, and a 9-bit EOI is read as 10 garbage
        bits ("stream ended without EOI" — caught by the sf0.1 bench,
        doc 1931's second strip)."""
        nonlocal decoder_len, width, first_since_clear
        emit(code, width)
        if first_since_clear:
            first_since_clear = False
        else:
            decoder_len += 1
        if decoder_len == (1 << width) - 1 and width < 12:
            width += 1

    reset()
    emit(_CLEAR, width)
    run = b""
    for byte in data:
        nxt = run + bytes([byte])
        if nxt in table:
            run = nxt
            continue
        emit_data(table[run])
        # the entry the decoder just built is exactly `nxt`
        table[nxt] = decoder_len
        if decoder_len >= 4093:  # table nearly full: clear per spec
            emit(_CLEAR, width)
            reset()
        run = bytes([byte])
    if run:
        emit_data(table[run])
    emit(_EOI, width)
    # pack MSB-first
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- PackBits ------------------------------------------------------


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = struct.unpack_from("b", data, pos)[0]
        pos += 1
        if n >= 0:
            if pos + n + 1 > len(data):
                raise ValueError("PackBits: truncated literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n != -128:
            if pos >= len(data):
                raise ValueError("PackBits: truncated repeat run")
            out += bytes([data[pos]]) * (1 - n)
            pos += 1
        # n == -128: no-op per spec
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += struct.pack("b", 1 - run) + bytes([data[i]])
            i = j + 1
        else:
            # literal run: extend while the next byte does not start
            # a >=2 repeat (max 128 literals per header)
            k = i
            while k + 1 < n and k - i < 127:
                if k + 2 < n and data[k + 1] == data[k + 2]:
                    break
                k += 1
            out += struct.pack("b", k - i) + data[i : k + 1]
            i = k + 1
    return bytes(out)


# --- IFD machinery -------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_values(data: bytes, e: str, vtype: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        raise ValueError(f"TIFF: unsupported field type {vtype}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        buf = data[off : off + total]
        if len(buf) != total:
            raise ValueError("TIFF: value offset out of range")
    if vtype == 1:
        return list(buf)
    if vtype == 2:
        return [buf]
    if vtype == 3:
        return list(struct.unpack(e + f"{count}H", buf))
    if vtype == 4:
        return list(struct.unpack(e + f"{count}I", buf))
    pairs = struct.unpack(e + f"{2 * count}I", buf)
    return [(pairs[2 * i], pairs[2 * i + 1]) for i in range(count)]


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF → ``(H, W, 3) uint8`` RGB. See module docstring for the
    supported surface; everything else fails loudly."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"not a TIFF stream (magic {data[:2]!r})")
    try:
        magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
        if magic != 42:
            raise ValueError("TIFF: bad magic number")
        (n_entries,) = struct.unpack_from(e + "H", data, ifd_off)
        tags: dict[int, list] = {}
        for i in range(n_entries):
            tag, vtype, count = struct.unpack_from(
                e + "HHI", data, ifd_off + 2 + 12 * i
            )
            raw = data[ifd_off + 10 + 12 * i : ifd_off + 14 + 12 * i]
            tags[tag] = _read_values(data, e, vtype, count, raw)
    except struct.error as exc:  # loud-failure contract for truncation
        raise ValueError("TIFF: truncated stream") from exc

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF: required tag {tag} missing")
        return default

    width, height = one(256), one(257)
    if width == 0 or height == 0:
        raise ValueError("TIFF: zero-sized image")
    spp = one(277, default=1)
    bits = tags.get(258, [8] * spp)
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise ValueError(
            f"TIFF variant unsupported (bits={bits}); uniform 8- or "
            "16-bit only — wire a codec library for 1-bit/mixed"
        )
    bps = bits[0]
    compression = one(259, default=1)
    photometric = one(262)
    predictor = one(317, default=1)
    if one(284, default=1) != 1:
        raise ValueError("TIFF: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("TIFF: tiled organization unsupported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None or len(offsets) != len(counts):
        raise ValueError("TIFF: missing/mismatched strip tags")
    rows_per_strip = one(278, default=height)

    decode = {
        1: lambda b: b,
        5: _lzw_decode,
        32773: _packbits_decode,
    }.get(compression)
    if decode is None:
        raise ValueError(
            f"TIFF compression {compression} unsupported (1/5/32773 only)"
        )

    sample_dtype = np.uint8 if bps == 8 else np.dtype(e + "u2")
    row_bytes = width * spp * (bps // 8)
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = decode(data[off : off + cnt])
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        if len(strip) < n_rows * row_bytes:
            raise ValueError("TIFF: strip shorter than declared rows")
        arr = np.frombuffer(
            strip[: n_rows * row_bytes], dtype=sample_dtype
        ).reshape(n_rows, width, spp)
        if predictor == 2:
            # horizontal differencing undone by a MOD-2^bps prefix sum
            # over SAMPLES (the spec's predictor unit — for 16-bit the
            # differences are per 16-bit value in the file byte order,
            # not per byte; the native-width dtype keeps numpy's
            # accumulation wrapping)
            arr = np.cumsum(
                arr, axis=1,
                dtype=np.uint8 if bps == 8 else np.uint16,
            )
        elif predictor != 1:
            raise ValueError(f"TIFF predictor {predictor} unsupported")
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != height:
        raise ValueError("TIFF: strips do not cover the image height")
    if bps == 16:
        if photometric == 3:
            raise ValueError("TIFF: 16-bit palette unsupported")
        # high-byte downscale to the (H, W, 3) uint8 contract — the
        # same convention the PNG decoder uses for 16-bit samples
        img = (img >> 8).astype(np.uint8)

    if photometric in (0, 1):
        if spp != 1:
            raise ValueError("TIFF: gray photometric needs 1 sample")
        g = img[:, :, 0]
        if photometric == 0:  # WhiteIsZero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photometric == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB photometric needs >=3 samples")
        return img[:, :, :3].copy()
    if photometric == 3:
        cmap = tags.get(320)
        if spp != 1 or cmap is None or len(cmap) != 3 * 256:
            raise ValueError("TIFF: palette image missing 256-entry ColorMap")
        # ColorMap: 16-bit, all reds then greens then blues; nearest
        # 8-bit value (exact inverse of the *257 up-scaling, and
        # nearest for foreign <<8-scaled maps)
        cm = (
            (np.array(cmap, dtype=np.uint32) * 255 + 32767) // 65535
        ).astype(np.uint8)
        lut = np.stack([cm[:256], cm[256:512], cm[512:]], axis=1)
        return lut[img[:, :, 0]]
    raise ValueError(f"TIFF photometric {photometric} unsupported")


# --- encoder -------------------------------------------------------

_COMP_CODES = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    endian: str = "<",
    predictor: int = 1,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    colormap: np.ndarray | None = None,
    bit_depth: int = 8,
) -> bytes:
    """Encode ``(H, W) uint8`` gray / palette indices or
    ``(H, W, 3) uint8`` RGB as a single-IFD TIFF. ``photometric``
    overrides the inferred value (pass 0 for WhiteIsZero — the
    SAMPLES are then stored inverted so decode returns ``img``;
    pass 3 with ``colormap`` ``(256, 3) uint8`` for palette).
    ``bit_depth=16`` takes uint16 samples (gray or RGB, no palette)
    and stores them in ``endian`` byte order — the test-vector source
    for the decoder's 16-bit path."""
    if endian not in ("<", ">"):
        raise ValueError("encode_tiff: endian '<' or '>'")
    comp = _COMP_CODES.get(compression)
    if comp is None:
        raise ValueError(f"encode_tiff: unknown compression {compression}")
    if bit_depth not in (8, 16):
        raise ValueError("encode_tiff: bit_depth 8 or 16")
    img = np.asarray(
        img, dtype=np.uint8 if bit_depth == 8 else np.uint16
    )
    if img.ndim == 2:
        spp = 1
        if photometric is None:
            photometric = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        spp = 3
        if photometric is None:
            photometric = 2
    else:
        raise ValueError("encode_tiff: (H,W) or (H,W,3) samples")
    if bit_depth == 16 and photometric == 3:
        raise ValueError("encode_tiff: 16-bit palette unsupported")
    h, w = img.shape[:2]
    if rows_per_strip is None:
        rows_per_strip = h
    planes = img.reshape(h, w, spp)
    if photometric == 0:
        planes = (255 if bit_depth == 8 else 65535) - planes
    if photometric == 3 and (
        spp != 1 or colormap is None or colormap.shape != (256, 3)
    ):
        raise ValueError("encode_tiff: palette needs (H,W) + (256,3) map")

    encode = {1: lambda b: b, 5: _lzw_encode, 32773: _packbits_encode}[comp]
    sample_dtype = np.uint8 if bit_depth == 8 else np.dtype(endian + "u2")
    strips = []
    for y0 in range(0, h, rows_per_strip):
        part = planes[y0 : y0 + rows_per_strip]
        if predictor == 2:
            part = np.diff(
                part.astype(np.int32), axis=1,
                prepend=np.zeros((part.shape[0], 1, spp), dtype=np.int32),
            ).astype(np.uint8 if bit_depth == 8 else np.uint16)
        elif predictor != 1:
            raise ValueError("encode_tiff: predictor 1 or 2")
        strips.append(encode(part.astype(sample_dtype).tobytes()))

    e = endian
    entries: list[tuple[int, int, int, bytes]] = []  # tag,type,count,value
    extra = bytearray()
    header_size = 8
    # layout: header | IFD | extra values | strips — compute IFD size
    # first; tag count fixed below.

    def val_short(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def val_long(v):
        return struct.pack(e + "I", v)

    tag_list: list[tuple[int, int, int, object]] = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, [bit_depth] * spp),
        (259, 3, 1, comp),
        (262, 3, 1, photometric),
        (273, 4, len(strips), "STRIP_OFFSETS"),
        (277, 3, 1, spp),
        (278, 4, 1, rows_per_strip),
        (279, 4, len(strips), [len(s) for s in strips]),
    ]
    if predictor == 2:
        tag_list.append((317, 3, 1, predictor))
    if photometric == 3:
        tag_list.append((320, 3, 3 * 256, "COLORMAP"))
    tag_list.sort()

    ifd_size = 2 + 12 * len(tag_list) + 4
    values_off = header_size + ifd_size

    # first pass: compute extra-values area to learn strip offsets
    def packed(vtype, count, values):
        if vtype == 3:
            return struct.pack(e + f"{count}H", *values)
        return struct.pack(e + f"{count}I", *values)

    # reserve extra space
    reserved: dict[int, int] = {}
    cursor = values_off
    for tag, vtype, count, val in tag_list:
        size = _TYPE_SIZE[vtype] * count
        if size > 4:
            reserved[tag] = cursor
            cursor += size + (size & 1)
    strips_off = cursor
    strip_offsets = []
    so = strips_off
    for s in strips:
        strip_offsets.append(so)
        so += len(s) + (len(s) & 1)

    out = bytearray()
    out += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, 8)
    out += struct.pack(e + "H", len(tag_list))
    for tag, vtype, count, val in tag_list:
        if val == "STRIP_OFFSETS":
            values = strip_offsets
        elif val == "COLORMAP":
            cm16 = (colormap.astype(np.uint32) * 257).astype(np.uint32)
            values = (
                list(cm16[:, 0]) + list(cm16[:, 1]) + list(cm16[:, 2])
            )
        elif isinstance(val, list):
            values = val
        else:
            values = [val]
        size = _TYPE_SIZE[vtype] * count
        out += struct.pack(e + "HHI", tag, vtype, count)
        if size <= 4:
            out += packed(vtype, count, values).ljust(4, b"\x00")
        else:
            out += struct.pack(e + "I", reserved[tag])
    out += struct.pack(e + "I", 0)  # next IFD: none
    for tag, vtype, count, val in tag_list:
        if tag not in reserved:
            continue
        if val == "STRIP_OFFSETS":
            values = strip_offsets
        elif val == "COLORMAP":
            cm16 = (colormap.astype(np.uint32) * 257).astype(np.uint32)
            values = (
                list(cm16[:, 0]) + list(cm16[:, 1]) + list(cm16[:, 2])
            )
        elif isinstance(val, list):
            values = val
        else:
            values = [val]
        buf = packed(vtype, count, values)
        assert len(out) == reserved[tag], (len(out), reserved[tag])
        out += buf + (b"\x00" if len(buf) & 1 else b"")
    for s in strips:
        out += s + (b"\x00" if len(s) & 1 else b"")
    return bytes(out)
