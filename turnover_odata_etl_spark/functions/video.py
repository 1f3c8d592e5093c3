"""AVI/MJPEG video codec in pure numpy + stdlib.

The VIDEO rung of the multimodal ladder (SURVEY §2.12 E11): until
round 7 the frame-sample operator worked over synthetic frame bytes;
this module makes the container REAL. Motion-JPEG-in-AVI is the one
video format a pure-numpy stack can decode honestly — the container
is RIFF chunk walking (the WAV machinery's sibling) and every frame
is a baseline JPEG this repo already decodes (``functions/jpeg.py``).
Inter-frame codecs (H.264/VP9/AV1) are genuinely codec-library
territory and fail loudly at the handler check.

Decoder (`decode_avi_mjpeg`): RIFF/AVI chunk walk — ``hdrl`` LIST
(``avih`` main header for size/frame count, ``strl``/``strh`` stream
header for the fourcc + fps), ``movi`` LIST with ``00dc`` compressed
frames (both flat and ``rec `` -wrapped layouts), optional ``idx1``
skipped — then one JPEG decode per frame. Returns
``(frames, fps)`` with frames ``(n, H, W, 3) uint8``. Truncated or
non-MJPEG streams raise ``ValueError``.

Encoder (`encode_avi_mjpeg`): the test-vector generator — frames →
baseline JPEGs (quant/subsampling passthrough) in a spec-shaped AVI.
Frames in JPEG's quantization-aligned exactness domain roundtrip
EXACTLY, so the end-to-end query gets a closed-form SQL oracle —
same construction as ``m_jpeg_decode_features``.

Scale: decode runs inside ``mapInPandas`` workers, one clip per call,
Arrow-batched; ship with
``multimodal.register_codecs_by_value()`` + this module (or
``register_video_by_value`` below) — frame decode reaches
``jpeg.decode_jpeg`` through module globals, never a worker-side
import.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg as _frame_decode
from .jpeg import encode_jpeg_baseline as _frame_encode


def register_video_by_value() -> None:
    """Register video + jpeg for by-value cloudpickle shipping (see
    ``multimodal.register_codecs_by_value`` for why the referenced
    module must ship too)."""
    from pyspark import cloudpickle

    from . import jpeg as _jpeg_mod
    from . import video as _video_mod

    for _mod in (_video_mod, _jpeg_mod):
        cloudpickle.register_pickle_by_value(_mod)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a RIFF chunk
    run; LIST chunks yield as ('LIST:<type>', body_start, body_len)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + length > len(data):
            raise ValueError("AVI: truncated chunk")
        if fourcc == b"LIST":
            ltype = data[body : body + 4]
            yield (b"LIST:" + ltype, body + 4, length - 4)
        else:
            yield (fourcc, body, length)
        pos = body + length + (length & 1)


def decode_avi_mjpeg(data: bytes):
    """Decode an AVI/MJPEG stream → ``(frames, fps)`` with frames
    ``(n, H, W, 3) uint8``. Verifies the stream handler is MJPG (or
    the strf biCompression says so); anything else — and any
    truncation — raises ``ValueError``."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"not a RIFF/AVI stream (magic {data[:4]!r})")
    avih = None
    handler = None
    rate = scale = None
    frames: list[np.ndarray] = []

    def handle_movi(start: int, length: int) -> None:
        for cc, b, ln in _walk_chunks(data, start, start + length):
            if cc == b"LIST:rec ":
                handle_movi(b, ln)
            elif cc[:4].endswith(b"dc") or cc[:4].endswith(b"db"):
                frames.append(_frame_decode(data[b : b + ln]))

    for cc, body, length in _walk_chunks(data, 12, len(data)):
        if cc == b"LIST:hdrl":
            for c2, b2, l2 in _walk_chunks(data, body, body + length):
                if c2 == b"avih":
                    avih = struct.unpack_from("<14I", data, b2)
                elif c2 == b"LIST:strl":
                    for c3, b3, l3 in _walk_chunks(data, b2, b2 + l2):
                        if c3 == b"strh":
                            fcc_type = data[b3 : b3 + 4]
                            if fcc_type == b"vids":
                                handler = data[b3 + 4 : b3 + 8]
                                scale, rate = struct.unpack_from(
                                    "<II", data, b3 + 20
                                )
        elif cc == b"LIST:movi":
            handle_movi(body, length)
    if avih is None:
        raise ValueError("AVI: missing avih main header")
    if handler not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"AVI codec {handler!r} unsupported — MJPG only; H.264/VP9/"
            "AV1 need an external codec"
        )
    if not frames:
        raise ValueError("AVI: no video frames in movi list")
    n_declared = avih[4]
    if n_declared and n_declared != len(frames):
        raise ValueError(
            f"AVI: header declares {n_declared} frames, movi holds "
            f"{len(frames)}"
        )
    fps = (rate / scale) if (rate and scale) else 0.0
    return np.stack(frames, axis=0), fps


def encode_avi_mjpeg(
    frames, fps: int = 10, quant_luma: int = 16
) -> bytes:
    """``(n, H, W, 3) uint8`` → AVI bytes with one baseline JPEG per
    frame (``00dc`` chunks). Frame geometry must be constant."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi_mjpeg: frames (n, H, W, 3) uint8")
    n, h, w = frames.shape[:3]
    payloads = [
        _frame_encode(frames[i], quant_luma=quant_luma) for i in range(n)
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # us per frame
        0, 0, 0x10,  # max bytes/sec, padding, flags (AVIF_HASINDEX off)
        n, 0, 1, 0,  # total frames, initial frames, streams, buf size
        w, h, 0, 0,  # width, height, reserved
        0, 0,
    )
    # strh after the two fourccs: flags, priority, language, initial
    # frames, scale, rate, start, length, bufsize, quality, samplesize
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
