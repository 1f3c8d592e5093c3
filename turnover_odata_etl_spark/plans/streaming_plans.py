"""Structured Streaming queries (SURVEY §2.12 E14) — M4.

Each callable runs a real Structured Streaming query (file source →
availableNow → memory sink) and returns the materialized result, so
the driver's oracle comparison exercises genuine streaming execution,
not a batch re-expression. Oracles are the equivalent time-bucket /
gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.windows import (
    read_events_stream,
    read_events_stream_split,
    run_stream_to_table,
    session_windows,
    sliding_counts,
    stateful_user_totals,
    stream_dedup,
    stream_dedup_within_watermark,
    stream_stream_join,
    tumbling_counts,
)
from .registry import register


@register(
    "st_tumbling_window",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type, run as a real stream
    (watermark + availableNow + memory sink). Complete output mode so
    the final trigger emits every window — append would withhold
    windows newer than the closing watermark."""
    events = read_events_stream_split(spark, sf_dir)
    return run_stream_to_table(tumbling_counts(events), spark, mode="complete")


@register(
    "st_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT unnest([
               time_bucket(INTERVAL 30 MINUTE, ts),
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
             ]) AS window_start,
             event_id
      FROM events
    )
    SELECT epoch_ms(window_start) AS window_start_ms,
           CAST(count(*) AS BIGINT) AS n_events
    FROM starts
    GROUP BY 1
    """,
    tags=("streaming",),
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: every event lands in
    exactly two windows; the oracle unnests both window starts."""
    events = read_events_stream_split(spark, sf_dir)
    return run_stream_to_table(sliding_counts(events), spark, mode="complete")


@register(
    "st_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS session_end_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute gap) as a real stream; the
    oracle is the classic gaps-and-islands rewrite. Boundary semantics
    (event at exactly last_ts+gap starts a NEW session) are encoded in
    the oracle's strict `<` comparison."""
    events = read_events_stream_split(spark, sf_dir)
    return run_stream_to_table(session_windows(events), spark, mode="complete")


@register(
    "st_stateful_user_agg",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def st_stateful_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) totals held in the state store, emitted per
    micro-batch. Run as a single availableNow batch the emissions ARE
    the final totals, which the plain GROUP BY oracle checks."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_table(stateful_user_totals(events), spark, mode="update")


@register(
    "st_stream_stream_join",
    oracle="""
    SELECT l.user_id,
           l.event_id AS l_event_id,
           r.event_id AS r_event_id,
           epoch_ms(l.ts) AS l_ts_ms,
           epoch_ms(r.ts) AS r_ts_ms
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click'
     AND r.event_type = 'purchase'
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with two watermarked sides and a
    bidirectional time bound (click→purchase within 30 min). Inner
    join results emit as they match, so the availableNow replay yields
    exactly the batch-SQL join the oracle computes."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_table(stream_stream_join(events), spark, mode="append")


@register(
    "st_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming",),
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on a business key — the incremental
    replacement for the reference's daily batch drop_duplicates
    (src/etl.py:209 + etl.yml cron)."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_table(stream_dedup(events), spark, mode="append")


@register(
    "st_stream_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming",),
)
def st_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedup whose state store is
    bounded by the watermark horizon instead of growing forever —
    the form you actually deploy. Horizon covers the fixture replay,
    so the result equals DISTINCT (the oracle)."""
    events = read_events_stream(spark, sf_dir)
    return run_stream_to_table(
        stream_dedup_within_watermark(events), spark, mode="append"
    )


@register(
    "st_incremental_upsert",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM events e
    WHERE event_id = (SELECT max(event_id) FROM events e2
                      WHERE e2.user_id = e.user_id)
    """,
    tags=("streaming", "merge", "incremental"),
)
def st_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily cron (etl.yml:4-13) done incrementally:
    two scheduled availableNow runs over a growing file directory.
    Run 1 sees the first half of the events; new files then land; run
    2 processes ONLY the new files (the checkpoint remembers which
    are done) and foreachBatch-merges them into a keyed keep-latest
    state table. Final state == batch keep-latest over everything,
    which is what the oracle checks. At 100 TB per-run work is
    O(new data), not O(history) — the reference refetches history
    daily."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..streaming.incremental import run_incremental_upsert
    from ..tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/incr_upsert"
    shutil.rmtree(base, ignore_errors=True)
    src, state, ckpt = f"{base}/src", f"{base}/state", f"{base}/ckpt"

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    ev.filter(F.col("event_id") <= mid).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    # n_buckets sized to the fixture state (~1.5k keys): a bucket
    # should hold enough rows to fill real files — at production scale
    # this is "a few HDFS blocks per bucket", here it's 8 dirs.
    run_incremental_upsert(
        spark, src, state, ckpt, schema,
        key_cols=["user_id"], order_col="event_id", n_buckets=8,
    )
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(src)
    run_incremental_upsert(
        spark, src, state, ckpt, schema,
        key_cols=["user_id"], order_col="event_id", n_buckets=8,
    )
    from ..streaming.incremental import read_state

    return read_state(spark, state)


@register(
    "st_snapshot_merge",
    oracle="""
    WITH m AS (SELECT max(event_id) // 2 AS mid FROM events),
    h1 AS (SELECT user_id, event_id, event_type, value
           FROM events, m WHERE event_id <= mid),
    s1 AS (SELECT * FROM h1 e
           WHERE event_id = (SELECT max(event_id) FROM h1 e2
                             WHERE e2.user_id = e.user_id)),
    s2 AS (SELECT user_id, event_id, event_type, value FROM events e
           WHERE event_id = (SELECT max(event_id) FROM events e2
                             WHERE e2.user_id = e.user_id))
    SELECT CAST(1 AS BIGINT) AS snap, * FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS snap, * FROM s2
    """,
    tags=("streaming", "merge", "snapshot", "timetravel"),
)
def st_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-ISOLATED keep-latest merge with TIME TRAVEL — the
    storage capability VERDICT r06 item 3 named as the last thing a
    real 100 TB pipeline lacked here (``storage/snapshot.py``: write
    files → claim manifest via os.link CAS → advance pointer; the
    mini-Iceberg commit protocol the upsert/CDC family now runs on).

    Two MERGE commits land the events in halves (split at
    ``max(event_id) // 2`` — integer-exact in both engines); the
    result is the UNION of the snapshot-1 state read AFTER snapshot 2
    committed (time travel — the rows must be the keep-latest of the
    first half only, bit-stable against the later commit) and the
    current state (keep-latest over everything). A broken isolation
    story — commit 2 mutating commit 1's files, a reader seeing a
    half-merged state — breaks the snap=1 half of the hash.

    Scale: each commit rewrites only touched buckets and carries the
    rest forward by manifest reference (O(touched) commit cost);
    time-travel reads cost the same file-level pruning any snapshot
    read does. Crash/race behavior is pinned in
    ``tests/test_snapshot.py`` (crash injection both sides of the
    commit point, two-writer CAS interleaving)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..storage import SnapshotTable
    from ..tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/snapshot_merge"
    shutil.rmtree(base, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    max_id = ev.agg(F.max("event_id")).first()[0]
    mid = int(max_id) // 2 if max_id is not None else 0  # empty-safe
    table = SnapshotTable(
        spark, f"{base}/table", key_cols=["user_id"],
        order_col="event_id", n_buckets=8,
    )
    s1 = table.merge(ev.filter(F.col("event_id") <= mid))
    s2 = table.merge(ev.filter(F.col("event_id") > mid))
    v1 = table.read(snapshot_id=s1).withColumn(
        "snap", F.lit(1).cast("long")
    )
    v2 = table.read(snapshot_id=s2).withColumn(
        "snap", F.lit(2).cast("long")
    )
    return v1.unionByName(v2).select(
        "snap", "user_id", "event_id", "event_type", "value"
    )


@register(
    "st_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           round(e.value, 2) AS value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("streaming", "join"),
)
def st_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream inner-joins a static
    dimension (customer) that is broadcast per micro-batch — the
    standard streaming enrichment pattern. No watermark is needed
    (static side never ages), no state store is built (the join is
    stateless per batch), and at scale the dimension re-broadcasts per
    trigger, so a slowly-changing dim picks up updates between
    micro-batches for free — the property batch joins lack. Oracle is
    the equivalent batch join."""
    from pyspark.sql import functions as F

    from ..streaming.windows import read_events_stream, run_stream_to_table
    from ..tables import load_table

    events = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        events.join(
            F.broadcast(dim), events.user_id == dim.c_custkey, "inner"
        )
        .select(
            "event_id",
            "user_id",
            "c_mktsegment",
            F.round("value", 2).alias("value"),
        )
    )
    return run_stream_to_table(enriched, spark, mode="append")


@register(
    "st_incremental_agg",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "incremental", "agg"),
)
def st_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized aggregate: two scheduled availableNow
    runs over a growing directory (first half of events, then the
    rest) fold per-key (count, sum) DELTAS into a bucket-partitioned
    state table — run 2 processes only the new files (checkpoint) and
    touches only the buckets its keys hash into. Final state must
    equal the one-shot batch aggregate over everything, which is the
    oracle. The additive-algebra sibling of st_incremental_upsert:
    per-run cost is O(new data + touched buckets), never O(history) —
    the reference recomputes history daily."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..streaming.incremental import run_incremental_agg
    from ..tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/incr_agg"
    shutil.rmtree(base, ignore_errors=True)
    src, state, ckpt = f"{base}/src", f"{base}/state", f"{base}/ckpt"

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    ev.filter(F.col("event_id") <= mid).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    run_incremental_agg(
        spark, src, state, ckpt, schema,
        key_cols=["user_id"], agg_col="value", n_buckets=8,
    )
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(src)
    run_incremental_agg(
        spark, src, state, ckpt, schema,
        key_cols=["user_id"], agg_col="value", n_buckets=8,
    )
    # Zero-row source: no bucket ever gets written (the merge no-ops),
    # so read the declared state schema instead of failing inference.
    has_state = os.path.isdir(state) and any(
        e.startswith("__bucket=") for e in os.listdir(state)
    )
    state_df = (
        spark.read.parquet(state)
        if has_state
        else spark.createDataFrame(
            [], "user_id long, n long, total double, __bucket int"
        )
    )
    return state_df.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.round("total", 2).alias("sum_value"),
    )


@register(
    "st_stream_stream_left_join",
    oracle="""
    WITH l AS (
      SELECT user_id, event_id AS l_event_id, epoch_ms(ts) AS l_ts_ms
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, event_id AS r_event_id, epoch_ms(ts) AS r_ts_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.user_id, l.l_event_id, r.r_event_id, l.l_ts_ms, r.r_ts_ms
    FROM l LEFT JOIN r
      ON l.user_id = r.user_id
     AND r.r_ts_ms >= l.l_ts_ms
     AND r.r_ts_ms <= l.l_ts_ms + 30 * 60 * 1000
    """,
    tags=("streaming", "join", "outer"),
)
def st_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the hardest join semantics in
    Structured Streaming: matched click→purchase pairs emit
    immediately, but a click with no purchase can emit null-extended
    ONLY once the watermark proves no future purchase could match
    (wm past click + 30min window). Two empirical facts drive the
    harness shape, both measured here: (1) null emission lags the
    watermark crossing by a micro-batch, and (2) how many no-data
    batches an availableNow run appends is not guaranteed — so the
    run uses the SENTINEL FLUSH pattern every production pipeline
    uses to close out event time: stream from a private copy of the
    events, run once, append a far-future sentinel batch (one click +
    one purchase under reserved user ids, +2 h), run again. The
    sentinel drives the watermark past every real click's window, so
    the second run must emit every remaining unmatched click and the
    FULL batch left join is the oracle — no settled-region cutoff.
    Sentinel rows themselves are excluded from the comparison (the
    sentinel click is the one row that can never settle)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..streaming.windows import stream_stream_left_join
    from ..tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/ss_left_join"
    shutil.rmtree(base, ignore_errors=True)
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    max_ts = ev.agg(F.max("ts")).first()[0]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_stream_left_join(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    sentinel = spark.createDataFrame(
        [
            (-1, max_ts, -1, "click"),
            (-2, max_ts, -2, "purchase"),
        ],
        schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
    sentinel.coalesce(1).write.mode("append").parquet(src)
    run_once()

    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


@register(
    "st_incremental_cdc",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, round(value, 2) AS value
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("streaming", "incremental", "cdc"),
)
def st_incremental_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY with tombstones: the events changelog upserts per
    user, but an 'error' event is a DELETE MARKER — a key whose newest
    change is a delete must vanish from the state table (and a later
    upsert resurrects it). Two incremental availableNow runs fold the
    changelog halves into the bucket-partitioned state; deletes
    physically drop on the touched-bucket rewrite, no separate delete
    log. The oracle is keep-latest-then-drop-deleted over the whole
    changelog — identical by construction ONLY if delete ordering vs
    upserts is honored across run boundaries, which is what this
    gates."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..streaming.incremental import read_state, run_incremental_upsert
    from ..tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/incr_cdc"
    shutil.rmtree(base, ignore_errors=True)
    src, state, ckpt = f"{base}/src", f"{base}/state", f"{base}/ckpt"

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    ev.filter(F.col("event_id") <= mid).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    kw = dict(
        key_cols=["user_id"], order_col="event_id", n_buckets=8,
        tombstone_filter="event_type = 'error'",
    )
    run_incremental_upsert(spark, src, state, ckpt, schema, **kw)
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(src)
    run_incremental_upsert(spark, src, state, ckpt, schema, **kw)
    return read_state(spark, state).select(
        "user_id", "event_type", F.round("value", 2).alias("value")
    ).drop("event_id")


@register(
    "st_stream_scd2_enrich",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
    ), flagged AS (
      SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ms, event_id) AS prev
      FROM e
    ), changes AS (
      SELECT user_id, event_type, ms, event_id
      FROM flagged WHERE prev IS NULL OR prev <> event_type
    ), intervals AS (
      SELECT user_id, event_type AS state, ms AS valid_from_ms,
             coalesce(lead(ms) OVER (PARTITION BY user_id
                                     ORDER BY ms, event_id) - 1,
                      253402300799999) AS valid_to_ms
      FROM changes
    )
    SELECT ev.event_id, ev.user_id, epoch_ms(ev.ts) AS ts_ms,
           i.state AS state_at_event
    FROM events ev
    JOIN intervals i
      ON ev.user_id = i.user_id
     AND epoch_ms(ev.ts) BETWEEN i.valid_from_ms AND i.valid_to_ms
    """,
    tags=("streaming", "join", "scd2"),
)
def st_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (as-of) enrichment in a STREAM: every incoming event
    joins the SCD2 validity interval in force at its event time —
    'what state was this user in when they did X', the standard
    point-in-time dimension lookup done per micro-batch. The static
    side is the SCD2 interval table (built with the same
    change-compaction + lead() recipe as e4_scd2_intervals, here from
    the event history itself); the stream-static join carries the
    non-equi BETWEEN condition, which Spark supports on stream-static
    joins because the static side broadcasts per batch — no state
    store, and a dimension refresh lands automatically on the next
    trigger.

    At 100 TB the interval table is dimension-sized (one row per
    state CHANGE, not per event) and broadcast; a fact-sized interval
    table would switch to the batch range-join posture
    (e4_range_join) inside foreachBatch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..streaming.windows import read_events_stream, run_stream_to_table
    from ..tables import load_table

    hist = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    changes = hist.withColumn(
        "prev", F.lag("event_type").over(w)
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    nxt = F.lead("ms").over(w)
    intervals = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ms").alias("valid_from_ms"),
        F.coalesce(nxt - 1, F.lit(253402300799999)).alias("valid_to_ms"),
    )

    events = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    enriched = events.join(
        F.broadcast(intervals),
        (events.user_id == intervals.user_id)
        & (F.col("ts_ms") >= F.col("valid_from_ms"))
        & (F.col("ts_ms") <= F.col("valid_to_ms")),
        "inner",
    ).select(
        "event_id",
        events.user_id,
        "ts_ms",
        F.col("state").alias("state_at_event"),
    )
    return run_stream_to_table(enriched, spark, mode="append")
