"""Write-audit-publish branches (round 14 — VERDICT r13 item 5; the
public pattern is Iceberg's WAP workflow / Nessie branch refs).

The protocol claims each get a test that breaks if the mechanism is
faked: structural invisibility (branch commits never reachable from a
main handle — no flag, no read-path check), ATOMIC publish (the
branch head's state lands as ONE commit through the same claim CAS
main uses — all-or-nothing, the review-r14 redesign), the
non-fast-forward refusal when main moved, crash recovery between the
publish claim and the cleanup, drop() reclaiming branch-only files
while keeping carried-forward main files, the GC guard while branches
are live — including FRESH branches with zero commits (the marker
file) — and the full verb surface (merge/append/DML/MOR/compact)
working ON the branch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotBranch, SnapshotTable
from turnover_odata_etl_spark.storage.snapshot import CommitConflict


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "waptable")


def make_table(spark, tdir, n_buckets=4):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=n_buckets
    )


def batch(spark, lo, hi, ver, mul=2):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * mul).alias("x"),
        F.lit(ver).cast("long").alias("ver"),
    )


def test_branch_commits_invisible_to_main(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    main_id = t.current_id()
    b = t.create_branch("wap")
    b.append(batch(spark, 50, 80, 2))
    b.delete_where("k < 5", mode="mor")
    b.update_where("k = 10", {"x": "x + 1"})
    assert b.read().count() == 75
    # main: same id, same rows, fresh handle agrees (structural —
    # branch manifests live in a namespace main never scans)
    assert t.current_id() == main_id
    assert t.read().count() == 50
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.current_id() == main_id
    assert t2.read().count() == 50
    assert t.branches() == ["wap"]


def test_publish_lands_branch_state_atomically(spark, tdir):
    """Publish is ONE commit (the WAP all-or-nothing guarantee): the
    branch HEAD's state lands as a single `publish` snapshot against
    the fork base — never a partial prefix of branch commits."""
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    b = t.create_branch("wap")
    b.append(batch(spark, 50, 80, 2))
    b.delete_where("k BETWEEN 0 AND 4")
    nid = b.publish()
    assert nid == 2  # fork base 1 + ONE publish commit
    assert t.current_id() == nid
    assert t.read().count() == 75
    assert t.branches() == []
    hist = t.history()
    assert [h["operation"] for h in hist] == ["append", "publish"]
    assert hist[-1]["n_rows"] == 75
    # the publish commit records its provenance
    assert t.latest_property("publish.branch") == "wap"
    assert t.latest_property("publish.commits") == 2
    # time travel to the fork base is untouched
    assert t.read(1).count() == 50


def test_publish_refuses_non_fast_forward(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    b = t.create_branch("wap")
    b.append(batch(spark, 50, 80, 2))
    t.append(batch(spark, 100, 110, 3))  # main moves past the fork
    with pytest.raises(CommitConflict, match="main moved"):
        b.publish()
    # main unaffected, branch still droppable
    assert t.read().count() == 60
    b.drop()
    assert t.branches() == []


def test_publish_is_idempotent_after_crash_before_cleanup(
    spark, tdir, monkeypatch
):
    """Crash between the publish claim and the branch-name cleanup:
    a re-run recognizes its own published commit via the
    publish.branch/publish.head properties and just finishes."""
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    b = t.create_branch("wap")
    b.append(batch(spark, 50, 80, 2))
    b.append(batch(spark, 80, 90, 3))

    def boom(ids):
        raise OSError("injected crash after the publish claim")

    monkeypatch.setattr(b, "_cleanup_branch_names", boom)
    with pytest.raises(OSError):
        b.publish()
    monkeypatch.undo()
    assert t.read().count() == 90  # the claim IS the commit
    assert "wap" in t.branches()  # names linger after the crash
    assert b.publish() == 2  # re-run: recognize + finish cleanup
    assert t.branches() == []
    assert t.read().count() == 90


def test_drop_reclaims_branch_only_files(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    main_files = {
        f["path"] for f in t._manifest(t.current_id())["files"]
    }
    b = t.create_branch("bad")
    b.append(batch(spark, 50, 80, 2))
    b.delete_where("k < 3", mode="mor")  # a dv sidecar too
    removed = b.drop()
    assert removed  # the branch's data files + sidecar went away
    assert not (set(removed) & main_files)  # never a main file
    for rel in removed:
        assert not os.path.exists(os.path.join(tdir, rel))
    # main reads bit-identically after the sweep
    assert t.read().count() == 50
    assert t.branches() == []


def test_expire_refuses_with_live_branches(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 10, 1))
    t.append(batch(spark, 10, 20, 2))
    b = t.create_branch("wap")
    b.append(batch(spark, 20, 30, 3))
    with pytest.raises(RuntimeError, match="live branches"):
        t.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="main"):
        b.expire_snapshots(keep_last=1)
    b.drop()
    t.expire_snapshots(keep_last=1)  # clears once branches are gone
    assert t.read().count() == 20


def test_branch_validation_surface(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 10, 1))
    with pytest.raises(ValueError, match="A-Za-z0-9_"):
        t.create_branch("bad/name")
    b = t.create_branch("wap")
    b.append(batch(spark, 10, 20, 2))
    with pytest.raises(ValueError, match="exists"):
        t.create_branch("wap")
    with pytest.raises(ValueError, match="branch a branch"):
        b.create_branch("nested")
    with pytest.raises(ValueError, match="no branch"):
        t.branch("ghost")
    b.drop()


def test_branch_reopen_continues_work(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))
    b = t.create_branch("wap")
    b.append(batch(spark, 50, 70, 2))
    reopened = t.branch("wap")
    assert isinstance(reopened, SnapshotBranch)
    assert reopened.branch_base == b.branch_base
    assert reopened.read().count() == 70
    reopened.merge(batch(spark, 0, 5, 3, mul=9))  # keep-latest on branch
    assert reopened.publish() == 2  # ONE publish commit at base + 1
    got = {r["k"]: r["x"] for r in t.read().collect()}
    assert got[0] == 0 and got[1] == 9 and got[4] == 36
    assert got[10] == 20  # untouched main row


def test_audit_gate_workflow(spark, tdir):
    """The WAP point: a failed-audit branch is dropped and its rows
    never become reader-visible; a passing branch publishes."""
    from turnover_odata_etl_spark.operators.profile import (
        check_expectations,
    )

    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 50, 1))

    bad = t.create_branch("bad")
    bad.append(
        spark.range(50, 60).select(
            F.col("id").alias("k"),
            F.lit(-1).cast("long").alias("x"),  # violates x >= 0
            F.lit(2).cast("long").alias("ver"),
        )
    )
    report = check_expectations(bad.read(), [{"name": "x_nonneg", "predicate": "x >= 0"}])
    assert report.filter("NOT passed").count() == 1
    bad.drop()

    good = t.create_branch("good")
    good.append(batch(spark, 50, 60, 2))
    report = check_expectations(good.read(), [{"name": "x_nonneg", "predicate": "x >= 0"}])
    assert report.filter("NOT passed").count() == 0
    good.publish()

    assert t.read().count() == 60
    assert t.read().filter("x < 0").count() == 0


def test_fresh_branch_guards_before_first_commit(spark, tdir):
    """The marker file makes a zero-commit branch visible: expire
    refuses, duplicate creation refuses, reopen works — BEFORE any
    branch manifest exists (review r14: without the marker, expire
    could sweep the fork base out from under the branch)."""
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 10, 1))
    t.append(batch(spark, 10, 20, 2))
    b = t.create_branch("fresh")  # no commits yet
    assert t.branches() == ["fresh"]
    with pytest.raises(ValueError, match="exists"):
        t.create_branch("fresh")
    with pytest.raises(RuntimeError, match="live branches"):
        t.expire_snapshots(keep_last=1)
    reopened = t.branch("fresh")
    assert reopened.branch_base == b.branch_base == 2
    assert reopened.read().count() == 20  # sees main at the fork
    reopened.drop()
    assert t.branches() == []
    t.expire_snapshots(keep_last=1)


def test_branch_refuses_rebucket_and_tags(spark, tdir):
    t = make_table(spark, tdir)
    t.append(batch(spark, 0, 10, 1))
    b = t.create_branch("wap")
    b.append(batch(spark, 10, 20, 2))
    with pytest.raises(RuntimeError, match="main"):
        b.rebucket(8)
    with pytest.raises(RuntimeError, match="main"):
        b.create_tag("x")
    with pytest.raises(RuntimeError, match="main"):
        b.drop_tag("x")
    b.drop()


def test_publish_carries_whole_bucket_delete_through_full_anchor(
    spark, tdir
):
    """Review r15 (confirmed bug): a bucket the branch EMPTIED is
    absent from the branch head's by-bucket view when the head is a
    full-anchor manifest (full manifests drop empty buckets), and
    _prepare_publish's touched set used to iterate only the head view
    — the fork base's files carried through and the delete silently
    resurrected on main. The squash must publish the emptied bucket
    as an explicit [] delta entry."""
    t = make_table(spark, tdir)
    for i in range(15):  # fork base = 15 -> branch commit = 16 (full)
        t.append(batch(spark, i, i + 1, 1))
    assert t.current_id() == 15

    # every key in one physical bucket — deleting them EMPTIES it
    rows = (
        spark.range(0, 15)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.hash(F.col("id")), F.lit(4)).alias("b"),
        )
        .collect()
    )
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append(r["k"])
    bucket, keys = next((b, k) for b, k in by_bucket.items() if k)

    b = t.create_branch("wap")
    b.delete_where(f"k IN ({', '.join(map(str, keys))})")
    assert b.current_id() == 16  # the full-anchor head
    assert b.read().count() == 15 - len(keys)

    b.publish()
    main_keys = sorted(r["k"] for r in t.read().collect())
    assert main_keys == sorted(set(range(15)) - set(keys))
    # fresh handle resolves the published emptied bucket identically
    assert SnapshotTable.load(spark, tdir).read().count() == 15 - len(
        keys
    )
