"""Unit tests for the as-of join operator's edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-10T00:00:00")),
            (2, "k1", _ts("2024-01-05T00:00:00")),
            (3, "k1", _ts("2024-01-01T00:00:00")),  # before any right row
            (4, "k2", _ts("2024-01-10T00:00:00")),  # key with no right rows
            (5, "k1", _ts("2024-01-05T00:00:00")),  # exactly equal ts (tie)
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-03T00:00:00"), 30.0),
            ("k1", _ts("2024-01-05T00:00:00"), 50.0),
            ("k1", _ts("2024-01-08T00:00:00"), 80.0),
        ],
        "k string, rts timestamp, val double",
    )
    return left, right


def test_asof_basic_and_edges(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts").orderBy("id")
    rows = {r.id: r.val for r in out.collect()}
    assert rows[1] == 80.0  # latest right <= 01-10
    assert rows[2] == 50.0  # equal-ts row included (<= semantics)
    assert rows[3] is None  # left row before all right rows
    assert rows[4] is None  # key absent on right → left-join null
    assert rows[5] == 50.0  # tie at equal ts
    assert out.count() == left.count()  # left rows preserved exactly


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        tolerance_ms=2 * 24 * 3600 * 1000,
    )
    rows = {r.id: r.val for r in out.collect()}
    assert rows[1] == 80.0   # 2 days back → within tolerance
    assert rows[2] == 50.0   # same instant
    assert rows[3] is None


def test_asof_null_right_attribute_not_backfilled(spark):
    """The matched right row must be attached ATOMICALLY: when the most
    recent right row has a NULL attribute, that NULL must survive — not
    be backfilled from an older right row (per-column carry bug)."""
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-10T00:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-03T00:00:00"), 30.0, "old"),
            ("k1", _ts("2024-01-08T00:00:00"), None, "new"),
        ],
        "k string, rts timestamp, val double, tag string",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    row = out.collect()[0]
    assert row.tag == "new"
    assert row.val is None  # NOT 30.0 from the older row


def test_asof_preserves_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert out.columns == ["id", "k", "ts", "val"]


def test_approx_aggs_within_bounds(spark, sf_dir):
    """e13_approx_aggs emits exact values plus booleans asserting each
    sketch (HLL++ distinct, GK percentile) landed inside its error
    bound; every bound check must hold, and the exact counts must match
    an independent computation."""
    from turnover_odata_etl_spark.plans.relational import e13_approx_aggs
    from turnover_odata_etl_spark.tables import load_table

    rows = {r.l_returnflag: r for r in e13_approx_aggs(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert rows.keys() == exact.keys()
    for flag, ex in exact.items():
        r = rows[flag]
        assert r.exact_orders == ex.orders
        assert r.exact_parts == ex.parts
        assert r.hll_orders_ok and r.hll_parts_ok and r.approx_p50_ok
