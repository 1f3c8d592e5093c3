"""AVI/MJPEG video codec tests (functions/video.py)."""

from __future__ import annotations

import numpy as np
import pytest

from turnover_odata_etl_spark.functions.video import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _tile_frame(seed: int, ty_n: int, tx_n: int) -> np.ndarray:
    """A frame in JPEG's quantization-aligned exactness domain."""
    img = np.zeros((ty_n * 8, tx_n * 8, 3), dtype=np.uint8)
    for ty in range(ty_n):
        for tx in range(tx_n):
            img[ty * 8 : (ty + 1) * 8, tx * 8 : (tx + 1) * 8, :] = 2 * (
                (seed * 7 + ty * 13 + tx * 29) % 128
            )
    return img


def test_roundtrip_exact_in_quant_domain():
    for n, ty_n, tx_n, fps in ((1, 2, 2, 5), (5, 2, 3, 12), (9, 3, 4, 30)):
        frames = np.stack([_tile_frame(s, ty_n, tx_n) for s in range(n)])
        dec, got_fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=fps))
        assert got_fps == float(fps)
        assert np.array_equal(dec, frames)


def test_frame_order_preserved():
    """Distinct per-frame content must come back in movi order — a
    shuffled reassembly would still pass a content-set check."""
    frames = np.stack([_tile_frame(s, 2, 2) for s in (3, 1, 4, 1, 5)])
    dec, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert np.array_equal(dec, frames)


def test_lossy_frames_decode_with_header_geometry():
    """Outside the exactness domain decode is lossy but structural
    invariants hold: frame count, geometry, dtype."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 16, 24, 3)).astype(np.uint8)
    dec, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert dec.shape == frames.shape and dec.dtype == np.uint8


def test_loud_failures():
    frames = np.stack([_tile_frame(0, 2, 2)])
    enc = encode_avi_mjpeg(frames)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE" + enc[12:])
    bad = bytearray(enc)
    bad[enc.index(b"MJPG")] = ord("X")
    with pytest.raises(ValueError, match="MJPG only"):
        decode_avi_mjpeg(bytes(bad))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(enc[: len(enc) // 2])
    # frame-count lie in the header
    lying = bytearray(enc)
    import struct

    avih_at = enc.index(b"avih") + 8
    struct.pack_into("<I", lying, avih_at + 16, 7)  # dwTotalFrames
    with pytest.raises(ValueError, match="declares"):
        decode_avi_mjpeg(bytes(lying))


def test_ships_into_worker_closures(spark):
    """The by-value registration pattern: decode must run in a worker
    without importing the package (frame decode reaches decode_jpeg
    through module globals)."""
    from turnover_odata_etl_spark.functions import video as video_mod

    video_mod.register_video_by_value()
    enc_fn, dec_fn = video_mod.encode_avi_mjpeg, video_mod.decode_avi_mjpeg

    def work(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for seed in pdf["seed"]:
                s = int(seed)
                img = np.zeros((16, 16, 3), dtype=np.uint8)
                img[:8, :8, :] = 2 * (s % 128)
                frames = np.stack([img, img])
                dec, fps = dec_fn(enc_fn(frames, fps=4))
                out.append((s, int(dec.sum()), float(fps)))
            yield pd.DataFrame(out, columns=["seed", "total", "fps"])

    df = spark.range(6).selectExpr("id as seed").mapInPandas(
        work, "seed long, total long, fps double"
    )
    rows = {r["seed"]: (r["total"], r["fps"]) for r in df.collect()}
    assert len(rows) == 6 and all(v[1] == 4.0 for v in rows.values())
