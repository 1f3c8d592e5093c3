"""Fixture-encoding drift armor (VERDICT r03 item 4).

The driver has regenerated /root/testdata twice, and both times the
``events.ts`` parquet encoding changed and broke something:

* round 1-2 fixtures: ``timestamp[ns]`` (TIMESTAMP(NANOS)) — Spark's
  vectorized reader rejects it outright; read via the nanosAsLong
  legacy conf as epoch-nanos bigint.
* round 3 fixtures: ``timestamp[us], isAdjustedToUTC=false`` — Spark 4
  reads TIMESTAMP_NTZ, which ``withWatermark`` rejects
  (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).

These tests fabricate tiny events.parquet files in ALL THREE encodings
and assert both loader edges (batch ``tables.load_table`` and streaming
``streaming.windows.read_events_stream``) normalize each to session-UTC
``timestamp`` with bit-exact epoch values — so the next regeneration
can't silently kill a branch again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

# One instant with sub-millisecond precision so micro-truncation bugs
# (float division, ms-vs-us confusion) show up in the epoch value.
EPOCH_US = 1_704_164_645_123_456  # 2024-01-02T03:04:05.123456Z


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    """A minimal events.parquet with the fixture's column layout and a
    single known instant, in the requested arrow timestamp encoding."""
    ts_array = pa.array([EPOCH_US, EPOCH_US + 1], type=pa.timestamp("us", tz="UTC"))
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_array.cast(ts_type),
            "user_id": pa.array([10, 20], type=pa.int64()),
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


ENCODINGS = {
    "nanos": pa.timestamp("ns"),  # TIMESTAMP(NANOS) → bigint via nanosAsLong
    "us_ntz": pa.timestamp("us"),  # isAdjustedToUTC=false → TIMESTAMP_NTZ
    "us_utc": pa.timestamp("us", tz="UTC"),  # → TIMESTAMP (already right)
}


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_batch_loader_normalizes(spark, tmp_path, name):
    from turnover_odata_etl_spark.tables import load_table

    sf_dir = _write_events(str(tmp_path), ENCODINGS[name])
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", name
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("ts").collect()]
    assert got == [EPOCH_US, EPOCH_US + 1], name


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_stream_loader_normalizes_and_watermarks(spark, tmp_path, name):
    """The streaming edge must yield a watermark-able TIMESTAMP column
    and the same epoch values as the batch path."""
    from turnover_odata_etl_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_table,
    )

    sf_dir = _write_events(str(tmp_path), ENCODINGS[name])
    stream = read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp", name
    # withWatermark throws at analysis time on NTZ — exercise it plus a
    # full availableNow execution to pin the end-to-end epoch values.
    out = run_stream_to_table(
        stream.withWatermark("ts", "10 minutes").select(
            F.unix_micros("ts").alias("ts_us")
        ),
        spark,
        mode="append",
    )
    got = sorted(r[0] for r in out.collect())
    assert got == [EPOCH_US, EPOCH_US + 1], name


def test_current_fixture_ts_is_timestamp(spark, sf_dir):
    """Whatever encoding the driver ships today, both loader edges must
    deliver a plain TIMESTAMP ts on the real fixtures."""
    from turnover_odata_etl_spark.streaming.windows import read_events_stream
    from turnover_odata_etl_spark.tables import load_table

    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"
    assert dict(read_events_stream(spark, sf_dir).dtypes)["ts"] == "timestamp"
