"""As-of (temporal) join — a Spark-native implementation.

The reference's data model carries validity intervals (``Date From``/
``Date To`` columns — reference: src/etl.py:47-48), which implies
point-in-time lookups the reference never implements. Spark has no
built-in as-of join, so we provide one (SURVEY §2.12 E4).

Design (the 100 TB-safe one): instead of the naive
``join(l.ts >= r.ts) → argmax per left row`` — whose intermediate blows
up as |left| × |matching right| — we UNION the two sides, sort within
each key partition by (ts, side), and carry the most recent right row
forward with ``last(ignorenulls=True)`` over a running window. One
shuffle on the key, one sort, linear output. This is the classic
sort-merge as-of formulation (same shape Flink/kdb use), expressed
with DataFrame primitives so Catalyst/AQE still handle skew and
partition sizing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and equal key(s). Left rows keep (left-join
    semantics); unmatched right columns are NULL.

    ``tolerance_ms``: optionally reject matches older than the
    tolerance (match must satisfy ``left_ts - right_ts <= tolerance``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    ts_type = dict(left.dtypes)[left_ts]

    # The matched right row travels as ONE struct (ts + attributes), so
    # a single last(ignorenulls=True) carries the whole row atomically.
    # Carrying each column independently would backfill a NULL attribute
    # of the most recent right row from an OLDER right row — emitting a
    # "match" that mixes columns from different right records.
    right_struct = F.struct(
        F.col(right_ts).cast("timestamp").alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    right_struct_type = right.select(right_struct.alias("__asof_right")).schema[
        "__asof_right"
    ].dataType

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"),
        F.lit(None).cast(right_struct_type).alias("__asof_right"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast(ts_type).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        F.lit(None).cast(l_tagged.schema["__asof_left"].dataType).alias("__asof_left"),
        right_struct.alias("__asof_right"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal ts => <= semantics.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__asof_right", ignorenulls=True).over(w).alias("__c"),
    )

    out = carried.filter(F.col("__asof_side") == 1)
    if tolerance_ms is not None:
        in_tol = (
            F.unix_millis(F.col("__asof_ts").cast("timestamp"))
            - F.unix_millis(F.col("__c.__ts"))
        ) <= tolerance_ms
        matched = F.when(in_tol, F.col("__c"))
    else:
        matched = F.col("__c")
    out = out.select("*", matched.alias("__m"))

    return out.select(
        *[F.col(f"__asof_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
