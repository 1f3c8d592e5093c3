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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a stock session throws
        # PARQUET_TYPE_ILLEGAL at the scan. nanosAsLong is runtime-settable,
        # so set it here rather than relying on whichever factory built the
        # session (session.py sets it too, but callers may bring their own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as long via nanosAsLong; truncate to
        # micros (matches DuckDB's nanos→micros truncation). Integer
        # `div`, NOT `/`: epoch-nanos (~1.7e18) exceeds double's 2^53
        # integer range, so float division corrupts the low bits.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
