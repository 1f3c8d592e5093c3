"""Snapshot tags + orphan-file GC (round 14).

Tags are Iceberg's immutable named refs — the reproducibility handle
an ML pipeline stamps on the exact table state a training run
consumed; ``expire_snapshots`` respects them (the expire-respects-refs
rule), which with a non-contiguous kept set forces the multi-floor
delta-materialization path this file pins. ``remove_orphans`` is
Iceberg's remove_orphan_files action: unreferenced data files from
crashed writers and lost CAS racers, guarded by an age threshold so
an in-flight commit's freshly-promoted files are never swept.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tagtable")


def make_table(spark, tdir):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=2
    )


def batch(spark, lo, hi, ver):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("x"),
        F.lit(ver).cast("long").alias("ver"),
    )


def test_tag_pins_snapshot_through_expire(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 30, 1))
    t.create_tag("prod")
    t.delete_where("k >= 20")
    t.append(batch(spark, 100, 110, 3))
    removed = t.expire_snapshots(keep_last=1)
    # the tagged snapshot survived: exact pre-delete state readable
    assert t.read_tag("prod").count() == 30
    assert t.read().count() == 30  # 20 + 10
    assert set(t.snapshot_ids()) == {1, 3}
    # its data files were NOT swept
    for rel in removed:
        assert "data/" in rel
    t.drop_tag("prod")
    t.expire_snapshots(keep_last=1)
    assert t.snapshot_ids() == [3]


def test_expire_materializes_every_kept_run_start(spark, tdir):
    """Non-contiguous keeps (a tag in the middle) create several
    resolution run-starts; each kept delta whose parent dropped must
    materialize, or its chain breaks when ancestors unlink."""
    t = make_table(spark, tdir)
    for i in range(6):
        t.append(batch(spark, i * 10, (i + 1) * 10, i + 1))
    t.create_tag("mid", snapshot_id=3)
    t.expire_snapshots(keep_last=2)  # keep {3, 5, 6}; drop {1, 2, 4}
    assert set(t.snapshot_ids()) == {3, 5, 6}
    # fresh handle: resolution from disk alone, across both run-starts
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.read(3).count() == 30
    assert t2.read(5).count() == 50
    assert t2.read().count() == 60


def test_tag_validation(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 10, 1))
    with pytest.raises(ValueError, match="A-Za-z0-9"):
        t.create_tag("bad name")
    with pytest.raises(ValueError, match="no snapshot"):
        t.create_tag("ghost", snapshot_id=99)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="no tag"):
        t.drop_tag("ghost")
    with pytest.raises(ValueError, match="no tag"):
        t.read_tag("ghost")
    assert t.tags() == {"v1": 1}


def test_remove_orphans_sweeps_only_unreferenced_and_old(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 30, 1))
    t.delete_where("k < 3", mode="mor")  # a referenced dv sidecar
    old_orphan = os.path.join(tdir, "data", "aaaa-b0-9.parquet")
    fresh_orphan = os.path.join(tdir, "data", "bbbb-b0-9.parquet")
    for p in (old_orphan, fresh_orphan):
        with open(p, "wb") as fh:
            fh.write(b"junk")
    past = time.time() - 90000
    os.utime(old_orphan, (past, past))
    removed = t.remove_orphans(older_than_seconds=86400)
    assert removed == ["data/aaaa-b0-9.parquet"]
    assert os.path.exists(fresh_orphan)  # in-flight guard spared it
    assert t.read().count() == 27  # table + its dv intact
    # an aged branch file is still referenced — never an orphan
    b = t.create_branch("wap")
    b.append(batch(spark, 100, 110, 2))
    for f in os.listdir(os.path.join(tdir, "data")):
        p = os.path.join(tdir, "data", f)
        os.utime(p, (past, past))
    assert t.remove_orphans(older_than_seconds=86400) == [
        "data/bbbb-b0-9.parquet"
    ]
    assert b.read().count() == 37  # 27 live main rows + the branch 10
    b.drop()
