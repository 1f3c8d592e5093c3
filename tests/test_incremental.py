"""Incremental availableNow runs: only-new-files processing across
restarts, and foreachBatch keep-latest upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.streaming.incremental import (
    run_incremental_append,
    run_incremental_upsert,
)
from turnover_odata_etl_spark.tables import load_table


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _batch(spark, sf_dir, id_offset=0):
    return load_table(spark, sf_dir, "events").select(
        (F.col("event_id") + id_offset).alias("event_id"),
        "user_id",
        "event_type",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )


def test_incremental_append_processes_only_new_files(spark, sf_dir, dirs):
    b1 = _batch(spark, sf_dir)
    n1 = b1.count()
    b1.coalesce(1).write.mode("append").parquet(dirs["src"])
    schema = spark.read.parquet(dirs["src"]).schema

    run_incremental_append(spark, dirs["src"], dirs["out"], dirs["ckpt"], schema)
    assert spark.read.parquet(dirs["out"]).count() == n1

    # second scheduled run with NO new data: nothing appended
    run_incremental_append(spark, dirs["src"], dirs["out"], dirs["ckpt"], schema)
    assert spark.read.parquet(dirs["out"]).count() == n1

    # new file arrives; third run appends exactly its rows
    b2 = _batch(spark, sf_dir, id_offset=10_000_000)
    n2 = b2.count()
    b2.coalesce(1).write.mode("append").parquet(dirs["src"])
    run_incremental_append(spark, dirs["src"], dirs["out"], dirs["ckpt"], schema)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == n1 + n2
    assert out.select("event_id").distinct().count() == n1 + n2


def test_incremental_upsert_keeps_latest_per_key(spark, sf_dir, dirs):
    b1 = _batch(spark, sf_dir)
    b1.coalesce(1).write.mode("append").parquet(dirs["src"])
    schema = spark.read.parquet(dirs["src"]).schema

    run_incremental_upsert(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema,
        key_cols=["user_id"], order_col="ms",
    )
    state1 = spark.read.parquet(dirs["state"])
    n_users = b1.select("user_id").distinct().count()
    assert state1.count() == n_users

    # a later batch for a subset of users must win; others unchanged
    updates = (
        b1.groupBy("user_id")
        .agg(F.max("ms").alias("ms"))
        .filter(F.col("user_id") % 2 == 0)
        .select(
            (F.col("user_id") + 20_000_000).alias("event_id"),
            "user_id",
            F.lit("update").alias("event_type"),
            F.lit(1.0).alias("value"),
            (F.col("ms") + 3_600_000).alias("ms"),
        )
    )
    updates.coalesce(1).write.mode("append").parquet(dirs["src"])
    run_incremental_upsert(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema,
        key_cols=["user_id"], order_col="ms",
    )
    state2 = spark.read.parquet(dirs["state"])
    assert state2.count() == n_users
    updated = state2.filter(F.col("event_type") == "update")
    assert updated.count() == updates.count()
    # every updated user carries the new timestamp
    assert updated.filter(F.col("user_id") % 2 != 0).count() == 0
