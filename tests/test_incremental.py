"""Incremental availableNow runs: only-new-files processing across
restarts, and foreachBatch keep-latest upsert."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.streaming.incremental import (
    read_state,
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
    state1 = read_state(spark, dirs["state"])
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
    state2 = read_state(spark, dirs["state"])
    assert state2.count() == n_users
    updated = state2.filter(F.col("event_type") == "update")
    assert updated.count() == updates.count()
    # every updated user carries the new timestamp
    assert updated.filter(F.col("user_id") % 2 != 0).count() == 0


def test_incremental_upsert_rewrites_only_touched_buckets(spark, sf_dir, dirs):
    """The partition-pruned merge contract, now manifest-level: a
    batch whose keys land in a subset of the buckets must carry every
    other bucket's data files forward BY REFERENCE (same path, same
    mtime — no rewrite) and replace only the touched bucket's files —
    per-batch IO is O(touched buckets), not O(state)."""
    import os

    from turnover_odata_etl_spark.storage import SnapshotTable

    b1 = _batch(spark, sf_dir)
    b1.coalesce(1).write.mode("append").parquet(dirs["src"])
    schema = spark.read.parquet(dirs["src"]).schema
    run_incremental_upsert(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema,
        key_cols=["user_id"], order_col="ms", n_buckets=8,
    )
    table = SnapshotTable.load(spark, dirs["state"])
    m1 = table._manifest(table.current_id())
    assert len({f["bucket"] for f in m1["files"]}) > 1  # keys spread

    def mtimes(files):
        return {
            f["path"]: os.stat(
                os.path.join(dirs["state"], f["path"])
            ).st_mtime_ns
            for f in files
        }

    before = mtimes(m1["files"])

    # single-user update batch → exactly one bucket touched
    one_user = read_state(spark, dirs["state"]).limit(1).collect()[0]
    upd = spark.createDataFrame(
        [(99_000_000, one_user.user_id, "update", 1.0, one_user.ms + 1)],
        schema=schema,
    )
    upd.coalesce(1).write.mode("append").parquet(dirs["src"])
    run_incremental_upsert(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema,
        key_cols=["user_id"], order_col="ms", n_buckets=8,
    )

    m2 = table._manifest(table.current_id())
    assert m2["snapshot_id"] == m1["snapshot_id"] + 1
    from pyspark.sql import functions as F

    touched = (
        spark.createDataFrame([(one_user.user_id,)], "user_id long")
        .select(F.pmod(F.hash("user_id"), F.lit(8)).alias("b"))
        .first()["b"]
    )
    carried = [f for f in m1["files"] if f["bucket"] != touched]
    after_paths = {f["path"] for f in m2["files"]}
    # untouched files: same path in the new manifest, file not rewritten
    for f in carried:
        assert f["path"] in after_paths
        assert (
            os.stat(
                os.path.join(dirs["state"], f["path"])
            ).st_mtime_ns
            == before[f["path"]]
        )
    # touched bucket: old files replaced in the manifest (but still on
    # disk for time travel)
    for f in m1["files"]:
        if f["bucket"] == touched:
            assert f["path"] not in after_paths
            assert os.path.exists(os.path.join(dirs["state"], f["path"]))
    # and the merge itself was correct
    row = (
        read_state(spark, dirs["state"])
        .filter(F.col("user_id") == one_user.user_id)
        .collect()
    )
    assert len(row) == 1 and row[0].event_type == "update"


def test_incremental_agg_additive_and_idempotent(spark, sf_dir, dirs):
    """The aggregate state after two incremental runs equals the
    one-shot batch aggregate; a third run with no new files is a
    no-op (checkpoint short-circuits — state bytes untouched)."""
    import os

    from turnover_odata_etl_spark.streaming.incremental import (
        run_incremental_agg,
    )

    ev = _batch(spark, sf_dir).select("event_id", "user_id", "value")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    ev.filter(F.col("event_id") <= mid).write.mode("overwrite").parquet(
        dirs["src"]
    )
    schema = spark.read.parquet(dirs["src"]).schema
    kw = dict(key_cols=["user_id"], agg_col="value", n_buckets=8)
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(dirs["src"])
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )

    got = {
        r.user_id: (r.n, round(r.total, 2))
        for r in spark.read.parquet(dirs["state"]).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want

    def mtimes():
        out = {}
        for root, _, files in os.walk(dirs["state"]):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = mtimes()
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    assert mtimes() == before  # empty batch: no bucket rewritten


def test_incremental_agg_survives_batch_redelivery(spark, sf_dir, dirs):
    """foreachBatch is at-least-once: a wiped checkpoint re-delivers
    batch 0 with the same data, and an additive merge would silently
    double-count. The _applied marker must make the re-delivery a
    no-op."""
    import shutil

    from turnover_odata_etl_spark.streaming.incremental import (
        run_incremental_agg,
    )

    ev = _batch(spark, sf_dir).select("event_id", "user_id", "value").limit(
        1000
    )
    ev.write.mode("overwrite").parquet(dirs["src"])
    schema = spark.read.parquet(dirs["src"]).schema
    kw = dict(key_cols=["user_id"], agg_col="value", n_buckets=8)
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    want = {
        r.user_id: (r.n, round(r.total, 2))
        for r in spark.read.parquet(dirs["state"]).collect()
    }
    # wipe the checkpoint: the rerun re-delivers the SAME batch id 0
    shutil.rmtree(dirs["ckpt"])
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    got = {
        r.user_id: (r.n, round(r.total, 2))
        for r in spark.read.parquet(dirs["state"]).collect()
    }
    assert got == want  # no double counting


def test_incremental_agg_checkpoint_wipe_plus_append_loses_nothing(
    spark, sf_dir, dirs
):
    """ADVICE r04: with a batch-id-keyed marker, wiping the checkpoint
    after appending files replans EVERYTHING as batch 0 — which matches
    the old marker and is skipped, permanently losing the appended
    files. The per-file marker set must instead fold in exactly the
    new files (and not double-count the old ones)."""
    import shutil

    from turnover_odata_etl_spark.streaming.incremental import (
        run_incremental_agg,
    )

    ev = _batch(spark, sf_dir).select("event_id", "user_id", "value")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    first, second = (
        ev.filter(F.col("event_id") <= mid),
        ev.filter(F.col("event_id") > mid),
    )
    first.write.mode("overwrite").parquet(dirs["src"])
    schema = spark.read.parquet(dirs["src"]).schema
    kw = dict(key_cols=["user_id"], agg_col="value", n_buckets=8)
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    # append new files, then wipe ONLY the checkpoint: the rerun
    # replans old+new files together as a fresh batch 0
    second.write.mode("append").parquet(dirs["src"])
    shutil.rmtree(dirs["ckpt"])
    run_incremental_agg(
        spark, dirs["src"], dirs["state"], dirs["ckpt"], schema, **kw
    )
    got = {
        r.user_id: (r.n, round(r.total, 2))
        for r in spark.read.parquet(dirs["state"]).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want  # appended files folded once, old files not twice


def test_apply_cdc_to_agg_equals_recompute(spark, tmp_path):
    """IVM correctness: folding the CDF feed into the base aggregate
    must BIT-equal a full recompute (decimal sums), including the
    group-moving-update case that additive folds cannot express."""
    import os

    from pyspark.sql import functions as F

    from turnover_odata_etl_spark.storage import SnapshotTable
    from turnover_odata_etl_spark.streaming.incremental import (
        agg_from_state,
        apply_cdc_to_agg,
    )

    t = SnapshotTable(
        spark, os.path.join(str(tmp_path), "t"),
        key_cols=["k"], order_col="ver", n_buckets=2,
    )

    def b(rows):
        return spark.createDataFrame(
            rows, "k long, grp string, val double, ver long"
        )

    t.merge(b([(1, "a", 1.5, 1), (2, "a", 2.0, 1), (3, "b", 3.25, 1)]))
    # k2 moves group a->b, k3 deleted, k4 inserted into a
    t.merge(
        b([(2, "b", 5.0, 2), (3, "b", 0.0, 2), (4, "a", 7.75, 2)]),
        tombstone_filter="val = 0.0",
    )
    base = agg_from_state(t.read(snapshot_id=1), ["grp"], "val")
    cdc = t.changes(1, 2, include_preimages=True)
    maintained = apply_cdc_to_agg(base, cdc, ["grp"], "val")
    recompute = agg_from_state(t.read(snapshot_id=2), ["grp"], "val")
    m = sorted(map(tuple, maintained.collect()))
    r = sorted(map(tuple, recompute.collect()))
    assert m == r
    assert m == [("a", 2, Decimal("9.250000")), ("b", 1, Decimal("5.000000"))]


def test_apply_cdc_to_agg_rejects_net_form(spark, tmp_path):
    import os

    import pytest

    from turnover_odata_etl_spark.storage import SnapshotTable
    from turnover_odata_etl_spark.streaming.incremental import (
        agg_from_state,
        apply_cdc_to_agg,
    )

    t = SnapshotTable(
        spark, os.path.join(str(tmp_path), "t"),
        key_cols=["k"], order_col="ver", n_buckets=2,
    )

    def b(rows):
        return spark.createDataFrame(
            rows, "k long, grp string, val double, ver long"
        )

    t.merge(b([(1, "a", 1.0, 1)]))
    t.merge(b([(1, "a", 2.0, 2)]))
    base = agg_from_state(t.read(snapshot_id=1), ["grp"], "val")
    net = t.changes(1, 2)  # net form: _change_type='update'
    with pytest.raises(Exception, match="include_preimages"):
        apply_cdc_to_agg(base, net, ["grp"], "val").collect()


def test_run_incremental_ivm_stream(spark, tmp_path):
    """Streaming CDC-driven materialized view: three micro-batches
    (one file each) of upserts + a tombstone delete; the maintained
    grain must equal a full recompute of the final state, zero-count
    groups must vanish, and a checkpoint-wipe replay (at-least-once
    redelivery at its worst) must be a NO-OP because the delta is
    state-based."""
    import os
    import shutil

    from pyspark.sql import types as T

    from turnover_odata_etl_spark.storage import SnapshotTable
    from turnover_odata_etl_spark.streaming.incremental import (
        agg_from_state,
        run_incremental_ivm,
    )

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    schema = T.StructType.fromDDL(
        "k long, grp string, val double, ver long"
    )

    def put(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, "stage")
        )
        part = [
            p for p in os.listdir(os.path.join(base, "stage"))
            if p.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(base, "stage", part), os.path.join(src, name)
        )

    def run():
        run_incremental_ivm(
            spark, src,
            table_dir=os.path.join(base, "table"),
            agg_dir=os.path.join(base, "agg"),
            checkpoint_dir=os.path.join(base, "ckpt"),
            schema=schema,
            key_cols=["k"], order_col="ver",
            group_cols=["grp"], value_col="val",
            n_buckets=2,
            tombstone_filter="val = -1.0",
            max_files_per_trigger=1,
        )

    put("f1.parquet", [(1, "a", 1.5, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)])
    put("f2.parquet", [(2, "b", 5.0, 2), (4, "a", 7.0, 2)])  # group move
    put("f3.parquet", [(3, "b", -1.0, 3), (2, "b", -1.0, 3)])  # deletes
    run()

    table = SnapshotTable.load(spark, os.path.join(base, "table"))
    view = SnapshotTable.load(spark, os.path.join(base, "agg"))
    got = sorted(
        map(tuple, view.read().drop("__ver").collect())
    )
    want = sorted(
        map(tuple, agg_from_state(table.read(), ["grp"], "val").collect())
    )
    assert got == want
    # group b lost both members (k2, k3 deleted) -> tombstoned away
    assert [g for g, *_ in got] == ["a"]

    # guarantee 1: redelivering the LAST batch (the real at-least-once
    # crash window) is a content no-op for table and view
    tbl = SnapshotTable.load(spark, os.path.join(base, "table"))
    prev = tbl.current_id()
    new_sid = tbl.merge(
        spark.read.parquet(os.path.join(src, "f3.parquet")),
        tombstone_filter="val = -1.0",
    )
    cdc = tbl.changes(prev, new_sid, include_preimages=True)
    assert cdc.count() == 0  # row-empty diff -> view fold is a no-op
    assert sorted(map(tuple, tbl.read().collect())) == sorted(
        map(tuple, table.read().collect())
    )

    # guarantee 2: full in-order replay (wiped checkpoint) CONVERGES —
    # intermediate commits resurrect-then-redelete aged-out tombstone
    # keys, but the final table and view are identical
    shutil.rmtree(os.path.join(base, "ckpt"))
    run()
    table2 = SnapshotTable.load(spark, os.path.join(base, "table"))
    view2 = SnapshotTable.load(spark, os.path.join(base, "agg"))
    assert sorted(map(tuple, view2.read().drop("__ver").collect())) == got
    assert sorted(map(tuple, table2.read().collect())) == sorted(
        map(tuple, table.read().collect())
    )


def test_run_incremental_ivm_heals_crash_between_merges(spark, tmp_path):
    """The REAL at-least-once window: a crash AFTER the base merge but
    BEFORE the agg merge. The redelivered batch re-merges identical
    base content — with the round-7 from-point (base current_id taken
    pre-merge) its CDF was row-empty and the batch's delta was lost
    forever (silent under-count). With the from-point derived from the
    view's own watermark, the redelivered fold spans the missed window
    and the view converges to the recompute."""
    import os

    from pyspark.sql import types as T

    from turnover_odata_etl_spark.storage import SnapshotTable
    from turnover_odata_etl_spark.streaming.incremental import (
        agg_from_state,
        run_incremental_ivm,
    )

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    schema = T.StructType.fromDDL(
        "k long, grp string, val double, ver long"
    )

    def put(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, "stage")
        )
        part = [
            p for p in os.listdir(os.path.join(base, "stage"))
            if p.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(base, "stage", part), os.path.join(src, name)
        )

    def run():
        run_incremental_ivm(
            spark, src,
            table_dir=os.path.join(base, "table"),
            agg_dir=os.path.join(base, "agg"),
            checkpoint_dir=os.path.join(base, "ckpt"),
            schema=schema,
            key_cols=["k"], order_col="ver",
            group_cols=["grp"], value_col="val",
            n_buckets=2,
            tombstone_filter="val = -1.0",
            max_files_per_trigger=1,
        )

    put("f1.parquet", [(1, "a", 1.5, 1), (2, "b", 2.0, 1)])
    run()  # completed fold: view reflects f1

    # crash simulation: the base merge of f2 commits, the agg merge
    # never runs (process died in between)
    f2_rows = [(3, "a", 4.0, 2), (4, "c", 6.0, 2)]
    tbl = SnapshotTable.load(spark, os.path.join(base, "table"))
    tbl.merge(spark.createDataFrame(f2_rows, schema))

    # redelivery: the stream now sees f2 for the first time and the
    # fold must pick up the missed window, not a row-empty diff
    put("f2.parquet", f2_rows)
    run()

    table = SnapshotTable.load(spark, os.path.join(base, "table"))
    view = SnapshotTable.load(spark, os.path.join(base, "agg"))
    got = sorted(map(tuple, view.read().drop("__ver").collect()))
    want = sorted(
        map(tuple, agg_from_state(table.read(), ["grp"], "val").collect())
    )
    assert got == want
    assert {g for g, *_ in got} == {"a", "b", "c"}
    # and the view's watermark has caught up to the base's current
    assert view.order_watermark() == table.current_id()


def test_run_incremental_ivm_commits_only_touched_buckets(spark, tmp_path):
    """O(touched groups) maintenance: a batch touching ONE group must
    add agg data files only in that group's bucket — untouched groups
    neither ride through the fold grain nor rewrite their buckets
    (the round-7 shape full-outer-joined the whole aggregate each
    trigger and rewrote every bucket)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from turnover_odata_etl_spark.storage import SnapshotTable
    from turnover_odata_etl_spark.streaming.incremental import (
        run_incremental_ivm,
    )

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    schema = T.StructType.fromDDL(
        "k long, grp string, val double, ver long"
    )
    n_buckets = 8
    groups = [f"g{i}" for i in range(10)]

    def put(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, "stage")
        )
        part = [
            p for p in os.listdir(os.path.join(base, "stage"))
            if p.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(base, "stage", part), os.path.join(src, name)
        )

    def run():
        run_incremental_ivm(
            spark, src,
            table_dir=os.path.join(base, "table"),
            agg_dir=os.path.join(base, "agg"),
            checkpoint_dir=os.path.join(base, "ckpt"),
            schema=schema,
            key_cols=["k"], order_col="ver",
            group_cols=["grp"], value_col="val",
            n_buckets=n_buckets,
        )

    put(
        "f1.parquet",
        [(i, groups[i], float(i), 1) for i in range(10)],
    )
    run()
    view = SnapshotTable.load(spark, os.path.join(base, "agg"))
    before = {f["path"] for f in view._manifest(view.current_id())["files"]}

    put("f2.parquet", [(100, "g3", 9.0, 2)])  # touches ONLY g3
    run()
    view2 = SnapshotTable.load(spark, os.path.join(base, "agg"))
    after = view2._manifest(view2.current_id())["files"]
    new_buckets = {
        f["bucket"] for f in after if f["path"] not in before
    }
    g3_bucket = (
        spark.createDataFrame([("g3",)], "grp string")
        .select(F.pmod(F.hash("grp"), F.lit(n_buckets)).alias("b"))
        .first()["b"]
    )
    assert new_buckets == {g3_bucket}
    # and the values are still right
    got = {
        r["grp"]: (r["n_rows"], float(r["sum_value"]))
        for r in view2.read().collect()
    }
    assert got["g3"] == (2, 12.0)
    assert got["g0"] == (1, 0.0)
