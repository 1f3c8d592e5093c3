"""Fixture-table loaders.

The driver generates a TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` at /root/testdata/sf* (TESTDATA.md).
Loading is a plain parquet scan — Catalyst handles column pruning and
predicate pushdown into the scan, so callers should just ``select``/
``filter`` on the returned DataFrame and let the optimizer prune.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame, column: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to session-UTC ``timestamp``.

    The driver has regenerated the fixtures with three different parquet
    encodings so far, so every branch stays live:

    * ``timestamp[ns]`` — rejected by Spark's vectorized reader; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as ``bigint``
      epoch-nanos. Truncate to micros with integer ``div`` (NOT ``/``:
      epoch-nanos ~1.7e18 exceeds double's 2^53 integer range, so float
      division corrupts the low bits). Matches DuckDB's nanos→micros
      truncation.
    * ``timestamp[us], isAdjustedToUTC=false`` — Spark 4 reads this as
      TIMESTAMP_NTZ, which ``withWatermark`` rejects. The session
      timezone is UTC (session.py), so a plain cast reinterprets the
      wall-clock as UTC — the same epoch values DuckDB produces.
    * ``timestamp[us/ms], isAdjustedToUTC=true`` — already ``timestamp``;
      pass through.
    """
    dtype = df.schema[column].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(
            column, F.timestamp_micros(F.expr(f"{column} div 1000"))
        )
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn(column, F.col(column).cast("timestamp"))
    return df


def _parse_size_bytes(s: str) -> int:
    """Parse Spark size-conf strings ('10MB', '10485760b', '-1')."""
    s = s.strip().lower()
    for suffix, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)])) * mult
    return int(s)


def broadcast_if_storage_small(slice_df: DataFrame, *base_dfs: DataFrame) -> DataFrame:
    """Size-GUARDED broadcast hint for join-derived dimension slices
    (VERDICT r04 item 4's "or gate on a size estimate" option).

    The problem split: a plain filtered scan gets an accurate
    Catalyst size estimate (file bytes × selectivity guess) and the
    static planner already broadcasts it when small — no hint needed.
    A dimension slice derived through a JOIN (supplier⋈nation,
    customer⋈nation⋈region) defeats static estimation — join-output
    sizeInBytes estimates explode multiplicatively — so the planner
    falls back to sort-merge and the fact side pays a shuffle write
    even though AQE converts the join back to broadcast at runtime.
    An unconditional ``F.broadcast`` fixes that but OOMs at 100 TB
    when the base dimension has grown cluster-sized.

    The guard hints iff the summed STORAGE size of the base scans the
    slice derives from is under the session's
    ``autoBroadcastJoinThreshold`` — scan stats are exact file sizes,
    and for FK dimension chains the join output is row-bounded by the
    largest input (each supplier matches ≤1 nation), so
    base-tables-broadcastable ⇒ slice-broadcastable. At 100 TB the
    base supplier/customer scan is TB-sized, the guard declines, and
    the join strategy is AQE's runtime call — the exact degradation
    the unconditional hint forecloses."""
    spark = slice_df.sparkSession
    threshold = _parse_size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    )
    if threshold <= 0:  # broadcast disabled session-wide: respect it
        return slice_df
    total = 0
    for df in base_dfs:
        total += int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    if total < threshold:
        return F.broadcast(slice_df)
    return slice_df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` ONLY when it has fewer input
    partitions than the cluster can use.

    The CPU-bound Python stages (codec decode, SimHash/MinHash
    hashing, GEMM scoring) inherit the scan's partitioning, and a
    small parquet table arrives as ONE partition — which serializes
    the whole stage on one core (the PNG decode query measured 6.4 s
    single-partition vs 0.98 s fanned out at sf0.1). The guard keeps
    this a no-op at real scale: a 100 TB scan already has thousands of
    partitions, and an unconditional ``repartition`` there would be a
    pointless full-corpus shuffle.

    Contract: call this on SCAN-PROJECTIONS (a read + select), which is
    what every current site passes. The partition probe builds a
    non-adaptive physical plan (driver-side planning only — nothing
    executes), which is exact for scans; on a frame containing joins or
    aggregates the probe would reflect the static shuffle-partition
    setting rather than AQE's runtime choice, so the answer would be
    meaningless there anyway."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # nanosAsLong is runtime-settable; set it here rather than relying
        # on whichever factory built the session (session.py sets it too,
        # but callers may bring their own). Harmless for non-nanos files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The TIMESTAMP_NTZ branch of normalize_event_ts reinterprets
        # the wall-clock as session-local time; a non-UTC caller session
        # would silently shift every epoch (ADVICE r04). Pin UTC at the
        # loader edge, same defensive posture as nanosAsLong.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
