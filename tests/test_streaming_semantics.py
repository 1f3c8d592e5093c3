"""Append-mode watermark semantics, pinned.

The oracle harness runs windowed streams in COMPLETE mode because
append mode withholds windows the watermark hasn't passed
(streaming/windows.py docstring). This module pins the underlying
semantics across checkpointed availableNow runs of a growing file
source — empirically, Spark 4's availableNow trigger runs a no-data
micro-batch after the data batches (noDataMicroBatches default on), so
the watermark advances within the SAME run and closed windows emit
before termination:

* run 1: max event 11:30 → watermark 11:20 → the 10:00 window (end
  11:00 <= 11:20) emits before the run stops; the 11:00 window stays
  open in state.
* run 2: the checkpoint recovers the watermark; a row at 10:50 is
  LATE (below 11:20) and must be DROPPED — not added to the
  already-finalized 10:00 window, and not re-emitting it; a row at
  12:40 advances the watermark to 12:30, so the 11:00 window (end
  12:00) now finalizes with only its run-1 row.
* run 3 (no new data): emits nothing — no phantom re-emission.

The sink is parquet (append): the memory sink cannot recover from a
checkpoint, which is itself part of the pinned surface — a
cross-run append pipeline needs a durable sink.

If Spark ever changed emission timing, late-row dropping, or
watermark recovery, append-mode pipelines would silently double- or
under-count — hence the pin. The still-withheld tail (the newest
window never emits until a later run) is exactly why the CORRECTNESS
harness uses complete mode for its oracles.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(h: int, m: int) -> datetime:
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)


def _run_append(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {(r.ws.hour, r.n) for r in spark.read.parquet(out).collect()}


def test_append_mode_emits_only_watermark_closed_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # run 1: watermark reaches 11:20 via the no-data flush batch →
    # the 10:00 window (2 rows, end 11:00) emits; 11:00 stays open.
    batch1 = [(_ts(10, 5), 1.0), (_ts(10, 45), 1.0), (_ts(11, 30), 1.0)]
    spark.createDataFrame(batch1, "ts timestamp, v double").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    emitted1 = _run_append(spark, src, ckpt, out)
    assert emitted1 == {(10, 2)}

    # run 2: late 10:50 row dropped (below the recovered watermark);
    # 12:40 advances the watermark to 12:30 → the 11:00 window
    # finalizes with ONLY its run-1 row (n=1: the late row neither
    # re-opens 10:00 nor lands in 11:00).
    batch2 = [(_ts(12, 40), 1.0), (_ts(10, 50), 1.0)]
    spark.createDataFrame(batch2, "ts timestamp, v double").coalesce(
        1
    ).write.mode("append").parquet(src)
    emitted2 = _run_append(spark, src, ckpt, out)
    assert emitted2 == {(10, 2), (11, 1)}

    # run 3: no new data → cumulative output unchanged
    emitted3 = _run_append(spark, src, ckpt, out)
    assert emitted3 == emitted2
