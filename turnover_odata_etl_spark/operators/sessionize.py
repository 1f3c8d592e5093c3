"""Batch sessionization (gaps-and-islands).

The streaming engine gets sessions from ``session_window`` (see
streaming/windows.py); this is the batch/backfill equivalent the
reference's daily-cron shape would use: mark a session boundary where
the gap to the previous event exceeds ``gap_ms``, then prefix-sum the
boundary flags into a session id. Two window passes over ONE shuffle
(both windows share the same partitioning key), then a grouped
aggregation that reuses the same key — at 100 TB the whole operator is
a single hash-partition of the events by key.

Ties in the timestamp are broken by explicit ``order_cols`` so the
lag/prefix-sum order is a total order — without it the session split
is nondeterministic under shuffle and no oracle can match it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign ``session_id`` (1-based, per key) to each row of ``df``.

    Returns the input columns plus ``ms`` (epoch millis) and
    ``session_id``.
    """
    ms: Column = F.unix_millis(F.col(ts_col).cast("timestamp"))
    order = [ms.asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    new_session = F.when(ms - F.lag(ms).over(w) <= gap_ms, F.lit(0)).otherwise(
        F.lit(1)
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("ms", ms).withColumn(
        "session_id", F.sum(new_session).over(running).cast("long")
    )


def session_summary(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (key, session): event count, bounds, span."""
    s = sessionize(df, key_col, ts_col, gap_ms, order_cols)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
        (F.max("ms") - F.min("ms")).alias("span_ms"),
    )
