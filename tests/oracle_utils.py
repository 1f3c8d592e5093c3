"""Local replica of the driver's oracle comparison.

Mirrors the documented driver check: row count + column names (sorted)
+ order-insensitive value comparison. Locally we compare actual values
(with a small float tolerance and cell-level normalization) instead of
hashes so failures are debuggable.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, int):
        return int(v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_spark_vs_oracle(
    sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"
) -> None:
    spark_pd = sdf.toPandas()
    oracle_pd = con.sql(sql).df()
    assert sorted(spark_pd.columns) == sorted(oracle_pd.columns), (
        f"{name}: column mismatch spark={sorted(spark_pd.columns)} "
        f"oracle={sorted(oracle_pd.columns)}"
    )
    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row count mismatch spark={len(spark_pd)} oracle={len(oracle_pd)}"
    )
    s_rows = _normalize(spark_pd)
    o_rows = _normalize(oracle_pd)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
