"""Incremental OData stream reader tests (mock server).

The reference re-fetches the full entity on a cron
(.github/workflows/etl.yml:4-13); the stream reader replaces that with
a cursor high-water mark. These tests drive REAL Structured Streaming
runs (availableNow + checkpoint) against the in-process mock and
assert the two properties that make incremental ingestion correct:
batch 2 transfers ONLY rows past the committed cursor, and replay of a
committed (start, end] slice is exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from turnover_odata_etl_spark.sources.mock_server import MockOData
from turnover_odata_etl_spark.sources.odata_client import build_filter_cmp
from turnover_odata_etl_spark.sources.odata_source import (
    ODataDataSource,
    ODataStreamReader,
)

FIELDS = ["Seq", "Employee"]


def _rows(lo: int, hi: int) -> list[dict]:
    return [{"Seq": str(i), "Employee": f"emp_{i}"} for i in range(lo, hi + 1)]


@pytest.fixture()
def mock():
    m = MockOData(_rows(1, 6), FIELDS, version=2, page_size=4)
    m.start()
    yield m
    m.stop()


def _run_stream(spark, mock, out_dir: str, ckpt: str) -> None:
    spark.dataSource.register(ODataDataSource)
    stream = (
        spark.readStream.format("odata")
        .schema("Seq string, Employee string")
        .option("url", mock.base_url)
        .option("entity", "Emp")
        .option("incrementalField", "Seq")
        .option("cursorType", "numeric")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_is_incremental_across_runs(spark, mock, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _run_stream(spark, mock, out, ckpt)
    got = {r.Seq for r in spark.read.parquet(out).collect()}
    assert got == {str(i) for i in range(1, 7)}

    # new rows land on the server; run 2 from the SAME checkpoint must
    # transfer only them (cursor > 6 goes to the wire)
    mock.rows.extend(_rows(7, 9))
    n_requests_before = len(mock.requests)
    _run_stream(spark, mock, out, ckpt)
    got = sorted(int(r.Seq) for r in spark.read.parquet(out).collect())
    assert got == list(range(1, 10))
    wire = [r for r in mock.requests[n_requests_before:] if "%24filter" in r or "$filter" in r]
    assert wire, "run 2 sent no cursor filter — it re-fetched history"
    assert any("gt+6" in r or "gt%206" in r or "gt=6" in r for r in wire), wire


def test_stream_replay_between_offsets_is_exact(mock):
    reader = ODataStreamReader(
        StructType.fromDDL("Seq string, Employee string"),
        {
            "url": mock.base_url,
            "entity": "Emp",
            "incrementalfield": "Seq",
            "cursortype": "numeric",
        },
    )
    rows, end = reader.read(reader.initialOffset())
    assert end == {"cursor": "6"}
    assert len(list(rows)) == 6

    mock.rows.extend(_rows(7, 9))
    rows2, end2 = reader.read(end)
    assert end2 == {"cursor": "9"}
    assert [r[0] for r in rows2] == ["7", "8", "9"]

    # exact replay of the committed slice (failure recovery path)
    replay = list(reader.readBetweenOffsets(end, end2))
    assert [r[0] for r in replay] == ["7", "8", "9"]


def test_stream_empty_batch_keeps_cursor(mock):
    reader = ODataStreamReader(
        StructType.fromDDL("Seq string, Employee string"),
        {
            "url": mock.base_url,
            "entity": "Emp",
            "incrementalfield": "Seq",
            "cursortype": "numeric",
        },
    )
    _, end = reader.read(reader.initialOffset())
    rows, end2 = reader.read(end)  # nothing new on the server
    assert list(rows) == []
    assert end2 == end  # offset must not move on an empty batch


def test_numeric_cursor_renders_bare_literal():
    assert build_filter_cmp("Seq", "gt", "42", numeric=True) == "Seq gt 42"
    assert build_filter_cmp("TS", "le", "2024-01-01", numeric=False) == (
        "TS le '2024-01-01'"
    )
    with pytest.raises(ValueError):
        build_filter_cmp("Seq", "lt", "1")
    with pytest.raises(ValueError):
        build_filter_cmp("Seq", "gt", "not-a-number", numeric=True)


def test_string_cursor_iso_timestamps(mock):
    """String cursors (ISO timestamps) compare lexicographically —
    correct for zero-padded ISO-8601 — and render quoted into
    $filter."""
    mock.rows.clear()
    mock.rows.extend(
        [
            {"Seq": f"2024-01-0{i}T00:00:00", "Employee": f"e{i}"}
            for i in range(1, 6)
        ]
    )
    reader = ODataStreamReader(
        StructType.fromDDL("Seq string, Employee string"),
        {
            "url": mock.base_url,
            "entity": "Emp",
            "incrementalfield": "Seq",
            "cursortype": "string",
        },
    )
    rows, end = reader.read(reader.initialOffset())
    assert len(list(rows)) == 5
    assert end == {"cursor": "2024-01-05T00:00:00"}
    mock.rows.append({"Seq": "2024-01-06T00:00:00", "Employee": "e6"})
    rows2, end2 = reader.read(end)
    assert [r[1] for r in rows2] == ["e6"]
    assert end2 == {"cursor": "2024-01-06T00:00:00"}
    wire = [r for r in mock.requests if "gt+%272024-01-05" in r or "gt%20%272024-01-05" in r]
    assert wire, f"quoted string-cursor bound missing from wire: {mock.requests[-3:]}"


def test_cursor_lag_withholds_recent_rows_then_emits_late_arrivals(spark, mock):
    """cursorLag holds the offset back by the lag window so rows that
    commit late (cursor <= what a strict high-water mark would have
    sealed) are still picked up on a later trigger — the
    modified-timestamp-cursor correctness fix."""
    reader = ODataStreamReader(
        StructType.fromDDL("Seq string, Employee string"),
        {
            "url": mock.base_url,
            "entity": "Emp",
            "incrementalfield": "Seq",
            "cursortype": "numeric",
            "cursorlag": "2",
        },
    )
    # server has Seq 1..6; lag 2 seals only (..,4] and withholds 5,6
    rows, end = reader.read(reader.initialOffset())
    assert [r[0] for r in rows] == ["1", "2", "3", "4"]
    assert end == {"cursor": "4"}

    # a LATE row with cursor 5 commits after the first trigger; a
    # strict HWM (which would have sealed 6) would skip it forever
    mock.rows.append({"Seq": "5", "Employee": "late_5b"})
    mock.rows.extend(_rows(7, 8))
    rows2, end2 = reader.read(end)
    got = sorted((r[0], r[1]) for r in rows2)
    assert ("5", "late_5b") in got  # late arrival recovered
    assert [g[0] for g in got] == ["5", "5", "6"]  # 7,8 in lag window
    assert end2 == {"cursor": "6"}

    # replay of the committed slice is exact under the lag contract
    replay = sorted((r[0], r[1]) for r in reader.readBetweenOffsets(end, end2))
    assert replay == got


def test_cursor_lag_empty_window_keeps_cursor(spark, mock):
    """If everything fetched is inside the lag window the batch emits
    nothing and the offset stays put (never regresses below start)."""
    reader = ODataStreamReader(
        StructType.fromDDL("Seq string, Employee string"),
        {
            "url": mock.base_url,
            "entity": "Emp",
            "incrementalfield": "Seq",
            "cursortype": "numeric",
            "cursorlag": "100",
        },
    )
    rows, end = reader.read(reader.initialOffset())
    assert list(rows) == []
    assert end == {"cursor": ""}


def test_mock_filter_splits_outside_quoted_literals(mock):
    """An eq-pushdown value containing ' and ' must survive the mock's
    conjunction splitter (quote-aware scan, not a naive split)."""
    mock.rows.append({"Seq": "10", "Employee": "rock and roll"})
    code, body = mock.handle(
        "/Emp", {"$filter": ["Employee eq 'rock and roll' and Seq gt 6"]}
    )
    assert code == 200, body
    assert [r["Seq"] for r in body["d"]["results"]] == ["10"]
    # doubled-quote escape inside the literal still parses
    mock.rows.append({"Seq": "11", "Employee": "o'brien and sons"})
    code, body = mock.handle(
        "/Emp", {"$filter": ["Employee eq 'o''brien and sons'"]}
    )
    assert code == 200, body
    assert [r["Seq"] for r in body["d"]["results"]] == ["11"]
