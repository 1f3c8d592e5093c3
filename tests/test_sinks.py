"""Storage-layout operators: partition pruning + exchange-free
bucketed joins, asserted at the plan level and the result level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.sinks import (
    colocated_join,
    write_bucketed,
    write_partitioned,
)
from turnover_odata_etl_spark.tables import load_table

from .test_plan_shape import plan_str


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events").drop("ts")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = plan_str(back)
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "event_type" in pf[1].splitlines()[0]
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_partitioned_write_roundtrip_complete(spark, sf_dir, tmp_path):
    """Partitioning must not lose or duplicate rows across dirs."""
    path = str(tmp_path / "events_all")
    ev = load_table(spark, sf_dir, "events").drop("ts")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "t_orders_bkt", "o_custkey", 4
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer"), "t_customer_bkt", "c_custkey", 4
    )
    # Force a non-broadcast join so the exchange question is real.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "t_orders_bkt", "t_customer_bkt", "o_custkey", "c_custkey"
        )
        plan = plan_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_does_exchange(spark, sf_dir):
    """Control: the identical join over plain parquet DOES shuffle —
    proving the bucketing (not AQE luck) removed the exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        plan = plan_str(o.join(c, o.o_custkey == c.c_custkey))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_check_expectations_null_predicate_counts_as_violation(spark):
    """A rule whose predicate evaluates to NULL (e.g. comparison
    against a NULL cell) must count as a VIOLATION, not a pass — an
    unevaluable expectation is a failed expectation."""
    from pyspark.sql import functions as F

    from turnover_odata_etl_spark.operators.profile import check_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    report = {
        r.rule: r
        for r in check_expectations(
            df,
            [
                {"name": "v_positive", "predicate": "v > 0"},
                {"name": "id_small", "predicate": F.col("id") < 100},
            ],
        ).collect()
    }
    assert report["v_positive"].n_violations == 2  # NULL row + negative row
    assert not report["v_positive"].passed
    assert report["id_small"].n_violations == 0
    assert report["id_small"].passed
