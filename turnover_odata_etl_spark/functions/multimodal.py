"""Multimodal column plumbing (SURVEY §2.12 E11).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partitioning — is real and tested; the
actual codec step is STUBBED (this container has no image/audio
libraries): ``decode_image`` raises NotImplementedError, and
``extract_binary_features`` computes deterministic features of the raw
bytes instead, so the pipeline shape is exercised end-to-end and is
SQL-oracle-checkable.

At scale: mapInPandas streams Arrow batches through one Python worker
per core; batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decode-heavy stages
should repartition first so batches are uniform, and keep binary
columns OUT of shuffle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(data: bytes) -> "object":
    """Real image decode — requires an imaging library not present in
    this environment. Kept as the documented extension point."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "wire it here — extract_binary_features demonstrates the "
        "Spark-side plumbing with deterministic byte features instead"
    )


def with_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Fixture adapter: pose the text column as an opaque binary
    payload + metadata struct, the shape a real multimodal table has
    (payload from object storage, metadata from the catalog)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
        ),
    )


def extract_binary_features(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic per-payload features via mapInPandas (stand-in
    for decode/resize/frame-sample): byte length, first byte, and a
    fake width/height derived from length. Every value is a pure
    function of the bytes, so a SQL oracle can verify the plumbing."""

    # self-contained closure: workers may not be able to import this
    # package (cloudpickle ships the function by value; pandas is
    # imported inside so no module-global references leak in)
    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "first_byte": payload.map(
                        lambda b: int(b[0]) if len(b) else None
                    ).astype("int64"),
                    "fake_width": payload.map(lambda b: len(b) % 256).astype("int64"),
                    "fake_height": payload.map(lambda b: len(b) // 256).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        features,
        "doc_id long, n_bytes long, first_byte long, fake_width long, fake_height long",
    )


def sample_frames(
    df: DataFrame, id_col: str, frame_bytes: int = 256, max_frames: int = 4
) -> DataFrame:
    """Frame sampling as 1→N mapInPandas: slice each opaque payload
    into fixed-size 'frames' (stand-in for video frame extraction /
    audio chunking) and emit one row per sampled frame with
    deterministic byte features — ceil(n/frame_bytes) frames, capped.
    The expansion happens inside the Arrow batch (no explode shuffle);
    a real decoder drops in where the slicing is."""

    fb, mf = frame_bytes, max_frames

    def frames(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, lens, firsts = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = min((n + fb - 1) // fb, mf)
                for fi in range(n_frames):
                    off = fi * fb
                    ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(off)
                    lens.append(min(fb, n - off))
                    firsts.append(int(payload[off]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_len": lens,
                    "first_byte": firsts,
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), "payload").mapInPandas(
        frames,
        "doc_id long, frame_idx long, frame_offset long, frame_len long, "
        "first_byte long",
    )
