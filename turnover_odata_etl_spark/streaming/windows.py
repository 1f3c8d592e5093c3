"""Structured Streaming pipelines (SURVEY §2.12 E14).

The reference's streaming story is "cron re-run daily + full-row
drop_duplicates" (reference: .github/workflows/etl.yml:4-13,
src/etl.py:209). The Spark-idiomatic upgrade: incremental batch via
``trigger(availableNow=True)`` — the same code serves scheduled batch
and continuous streaming — with watermarks for late data and
windowed/stateful aggregation.

Harness notes: streams read the events parquet through the same
nanos→timestamp conversion as the batch loader; results land in a
memory sink so the driver's correctness gate can compare them against
SQL oracles. ``complete`` output mode is used for windowed
aggregations so the final batch emits every window (append mode would
withhold windows newer than the watermark when the stream ends —
exactly the kind of semantic detail the tests pin down).

At scale: these run against a real source (Kafka/files) with
checkpointed state; tumbling/sliding windows shuffle once per trigger
on (window, keys); session windows keep per-key state; watermark
bounds the state store size.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file stream (schema fixed up-front, as
    any production file stream requires). ``ts`` is normalized to
    session-UTC ``timestamp`` whatever the fixture encoding (nanos-as-
    long, TIMESTAMP_NTZ, or timestamp — see tables.normalize_event_ts);
    ``withWatermark`` requires TIMESTAMP, not NTZ."""
    from ..tables import normalize_event_ts

    # Runtime-settable; don't depend on which factory built the session
    # (the driver's gate uses a vanilla session without this conf).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ branch reinterprets wall-clock as session-local time — pin
    # UTC so a non-UTC caller session can't shift epochs (ADVICE r04).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # File-stream sources need a directory; pathGlobFilter narrows the
    # listing to the events table within the shared fixture dir.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def read_events_stream_split(
    spark: SparkSession, sf_dir: str, n_files: int = 2
) -> DataFrame:
    """The events fixture as a MULTI-BATCH file stream (round 16 —
    VERDICT r15 item 5): the single-file fixture is staged once as
    ``n_files`` row-sliced parquet files and streamed with
    ``maxFilesPerTrigger=1``, so an ``availableNow`` drain runs ≥ 2
    micro-batches and the event-time watermark genuinely ADVANCES
    mid-run — the stream audit observes it from progress events
    instead of a test asserting it. COMPLETE-mode consumers only:
    complete output re-emits all state at the final trigger, so the
    result is row-identical to the single-batch feed whatever the
    split (the windowed aggregations); emission-sensitive queries
    (append/update modes, applyInPandasWithState) keep the
    single-batch :func:`read_events_stream`.

    The staging is content-addressed by the fixture's (size, mtime):
    a driver fixture regeneration restages automatically; racing
    sessions write to a uuid temp dir and rename (first one wins,
    losers clean up)."""
    import os
    import shutil

    from ..tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    stamp = f"{st.st_size}-{int(st.st_mtime)}-{n_files}"
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    split_dir = os.path.join(
        "/tmp/spark_graft_layout", tag, f"events_split_{stamp}"
    )
    if not os.path.isdir(split_dir):
        tmp = f"{split_dir}.tmp-{uuid.uuid4().hex[:8]}"
        (
            spark.read.parquet(src)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, split_dir)
        except OSError:  # a racer staged it first — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
        # sweep SUPERSEDED stamps (review r16): each driver fixture
        # regeneration changes (size, mtime), and without this the
        # old full-corpus copies accumulate under /tmp forever
        parent = os.path.dirname(split_dir)
        keep = os.path.basename(split_dir)
        for name in os.listdir(parent):
            if (
                name.startswith("events_split_")
                and name != keep
                and not name.startswith(f"{keep}.tmp-")
            ):
                shutil.rmtree(
                    os.path.join(parent, name), ignore_errors=True
                )
    raw_schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    return normalize_event_ts(stream)


def run_stream_to_table(
    sdf: DataFrame, spark: SparkSession, mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink; return the materialized result as a batch frame.

    ORACLE-HARNESS ONLY. ``mode="complete"`` + the memory sink keep
    every window's state AND the full result in driver memory — exactly
    what you want for a correctness gate over a fixture, and exactly
    what you must not deploy: at production scale the driver OOMs on
    result size alone. The production pattern is append/update mode
    into a distributed sink — see ``streaming/incremental.py``
    (``run_incremental_upsert``: availableNow + foreachBatch merge into
    a keyed parquet state table) and SCALE.md §streaming."""
    name = f"st_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide
    overlapping windows)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with a gap timeout. A session spans
    [first_ts, last_ts + gap); an event exactly at the previous
    session's end starts a new session."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


def stream_stream_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join (click→purchase attribution shape):
    match each ``right_type`` event to same-user ``left_type`` events
    at most ``within`` earlier. Both sides carry watermarks and the
    join condition bounds event time in both directions — that's what
    lets Spark age out join state instead of buffering both streams
    forever (THE stream-stream-join scaling requirement)."""
    l = (
        events.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("l_event_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "10 minutes")
    )
    r = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "10 minutes")
    )
    return l.join(
        r,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        "user_id",
        "l_event_id",
        "r_event_id",
        F.unix_millis("l_ts").alias("l_ts_ms"),
        F.unix_millis("r_ts").alias("r_ts_ms"),
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2.12 E14/E15): per-user running (count, sum) state,
    emitting the updated totals after each micro-batch. The pattern for
    any accumulator Spark's built-in windows can't express; state lives
    in the checkpointed state store, one entry per key.

    With an availableNow replay over a single-file source this runs as
    exactly one batch, so the emitted rows are the final per-user
    totals (what the SQL oracle computes)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "sum_value": [round(total, 2)],
            }
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value double",
            stateStructType="count long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup on a business key — the incremental
    replacement for the reference's batch drop_duplicates. (In
    production pair with ``dropDuplicatesWithinWatermark`` so state
    ages out; here the key space is small.)"""
    return events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def stream_dedup_within_watermark(
    events: DataFrame, delay: str = "100 days"
) -> DataFrame:
    """The production form: dedup state is dropped once the watermark
    passes a key's event time, so state size is bounded by the
    watermark horizon instead of growing with key cardinality
    forever. With a horizon covering the whole fixture replay the
    result equals plain DISTINCT — which is exactly what the oracle
    checks; at real scale the horizon is hours and the state store
    stays flat."""
    return (
        events.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        # the op keeps whole rows (ts must survive for the watermark);
        # which row represents a key is arrival-order-dependent, so
        # only the key columns are deterministic output
        .select("user_id", "event_type")
    )


def stream_stream_left_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantically hardest join
    in Structured Streaming: matched pairs emit immediately, but an
    UNMATCHED left row can only emit (null-extended) once the
    watermark proves no future right row could still match it, i.e.
    after l_ts + within ages past the watermark. Both watermarks plus
    the two-sided time bound are mandatory here (Spark rejects outer
    stream-stream joins without them — unbounded state could never
    declare a left row unmatched)."""
    l = (
        events.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("l_event_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "10 minutes")
    )
    r = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "10 minutes")
    )
    return l.join(
        r,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        "user_id",
        "l_event_id",
        "r_event_id",
        F.unix_millis("l_ts").alias("l_ts_ms"),
        F.unix_millis("r_ts").alias("r_ts_ms"),
    )
