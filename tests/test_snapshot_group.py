"""SnapshotGroup (round 11, VERDICT r10 item 5): atomic multi-table
commits — crash injection on both sides of the group claim, the group
CAS race, foreign-commit detection, and the NeardupIndex integration
pins (one commit per wave per table, no duplicate rows on replay)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotGroup, SnapshotTable


@pytest.fixture()
def gdir(tmp_path):
    return str(tmp_path / "grp")


def mk(spark, gdir):
    a = SnapshotTable(
        spark, os.path.join(gdir, "a"),
        key_cols=["k"], order_col="ver", n_buckets=2,
    )
    b = SnapshotTable(
        spark, os.path.join(gdir, "b"),
        key_cols=["k"], order_col="ver", n_buckets=2,
    )
    return a, b, SnapshotGroup({"a": a, "b": b}, gdir)


def batch(spark, pairs):
    return spark.createDataFrame(
        [(k, ver) for k, ver in pairs], "k long, ver long"
    )


def test_group_append_all_commits_both_atomically(spark, gdir):
    a, b, g = mk(spark, gdir)
    out = g.append_all(
        {"a": batch(spark, [(1, 1), (2, 1)]), "b": batch(spark, [(9, 1)])}
    )
    assert out == {"a": 1, "b": 1}
    assert a.read().count() == 2 and b.read().count() == 1
    out2 = g.append_all(
        {"a": batch(spark, [(3, 2)]), "b": batch(spark, [(8, 2)])}
    )
    assert out2 == {"a": 2, "b": 2}
    # one commit per member per transaction — ids stay in lockstep
    assert a.current_id() == b.current_id() == 2


def test_group_empty_member_noops_at_current(spark, gdir):
    a, b, g = mk(spark, gdir)
    g.append_all(
        {"a": batch(spark, [(1, 1)]), "b": batch(spark, [(9, 1)])}
    )
    out = g.append_all(
        {"a": batch(spark, [(2, 2)]), "b": batch(spark, [])}
    )
    assert out == {"a": 2, "b": 1}


def test_group_crash_before_claim_leaves_nothing_visible(
    spark, gdir, monkeypatch
):
    """Both members prepared (staged files + temp manifests) but the
    txn link never happened: no member advances, cold handles see the
    old state, and the next commit proceeds cleanly."""
    import turnover_odata_etl_spark.storage.group as grp_mod

    a, b, g = mk(spark, gdir)
    g.append_all(
        {"a": batch(spark, [(1, 1)]), "b": batch(spark, [(9, 1)])}
    )

    real_link = grp_mod.os.link

    def boom(src, dst):
        if "/txns/" in dst.replace(os.sep, "/"):
            raise OSError("injected crash before group commit point")
        return real_link(src, dst)

    monkeypatch.setattr(grp_mod.os, "link", boom)
    with pytest.raises(OSError):
        g.append_all(
            {"a": batch(spark, [(2, 2)]), "b": batch(spark, [(8, 2)])}
        )
    monkeypatch.undo()

    a2, b2, g2 = mk(spark, gdir)
    assert a2.current_id() == 1 and b2.current_id() == 1
    assert a2.read().count() == 1 and b2.read().count() == 1
    out = g2.append_all(
        {"a": batch(spark, [(2, 2)]), "b": batch(spark, [(8, 2)])}
    )
    assert out == {"a": 2, "b": 2}


def test_group_crash_mid_rollforward_heals_on_recover(
    spark, gdir, monkeypatch
):
    """Crash AFTER the txn claim, with only member 'a' rolled forward:
    the commit IS durable; a cold group handle's recover() completes
    member 'b' — the torn window is never observable through the
    group."""
    import turnover_odata_etl_spark.storage.group as grp_mod

    a, b, g = mk(spark, gdir)
    g.append_all(
        {"a": batch(spark, [(1, 1)]), "b": batch(spark, [(9, 1)])}
    )

    real_link = grp_mod.os.link
    state = {"manifest_links": 0}

    def boom(src, dst):
        if "/manifests/" in dst.replace(os.sep, "/"):
            state["manifest_links"] += 1
            if state["manifest_links"] == 2:
                raise OSError("injected crash mid roll-forward")
        return real_link(src, dst)

    monkeypatch.setattr(grp_mod.os, "link", boom)
    with pytest.raises(OSError):
        g.append_all(
            {"a": batch(spark, [(2, 2)]), "b": batch(spark, [(8, 2)])}
        )
    monkeypatch.undo()

    # one member is ahead on disk — the torn state recover() heals
    a2, b2, g2 = mk(spark, gdir)
    g2.recover()
    assert a2.current_id() == 2 and b2.current_id() == 2
    assert sorted(r["k"] for r in a2.read().collect()) == [1, 2]
    assert sorted(r["k"] for r in b2.read().collect()) == [8, 9]


def test_group_cas_race_retries_on_new_state(spark, gdir, monkeypatch):
    """Two group writers race the SAME txn number: the loser must
    abort its prepared manifests and re-plan — both commits land, in
    some order, with consecutive member ids."""
    import turnover_odata_etl_spark.storage.group as grp_mod

    a, b, g1 = mk(spark, gdir)
    _, _, g2 = mk(spark, gdir)
    g1.append_all(
        {"a": batch(spark, [(1, 1)]), "b": batch(spark, [(9, 1)])}
    )

    real_link = grp_mod.os.link
    state = {"raced": False}

    def racing_link(src, dst):
        if "/txns/" in dst.replace(os.sep, "/") and not state["raced"]:
            state["raced"] = True
            g2.append_all(
                {"a": batch(spark, [(7, 2)]), "b": batch(spark, [(6, 2)])}
            )
        return real_link(src, dst)

    monkeypatch.setattr(grp_mod.os, "link", racing_link)
    out = g1.append_all(
        {"a": batch(spark, [(2, 2)]), "b": batch(spark, [(8, 2)])}
    )
    monkeypatch.undo()
    assert out == {"a": 3, "b": 3}  # lost txn-2, retried, claimed 3
    assert sorted(r["k"] for r in a.read().collect()) == [1, 2, 7]
    assert sorted(r["k"] for r in b.read().collect()) == [6, 8, 9]


def test_group_detects_foreign_member_commit(spark, gdir, monkeypatch):
    """A direct (non-group) commit that steals a member's manifest id
    between prepare and roll-forward must surface as a loud
    RuntimeError — never silent divergence."""
    import turnover_odata_etl_spark.storage.group as grp_mod

    a, b, g = mk(spark, gdir)
    g.append_all(
        {"a": batch(spark, [(1, 1)]), "b": batch(spark, [(9, 1)])}
    )

    real_link = grp_mod.os.link
    state = {"stolen": False}

    def stealing_link(src, dst):
        if "/txns/" in dst.replace(os.sep, "/") and not state["stolen"]:
            state["stolen"] = True
            a.append(batch(spark, [(99, 2)]))  # foreign direct commit
        return real_link(src, dst)

    monkeypatch.setattr(grp_mod.os, "link", stealing_link)
    with pytest.raises(RuntimeError, match="foreign"):
        g.append_all(
            {"a": batch(spark, [(2, 2)]), "b": batch(spark, [(8, 2)])}
        )


def test_group_txn_log_is_pruned(spark, gdir):
    _, _, g = mk(spark, gdir)
    for i in range(1, 8):
        g.append_all(
            {"a": batch(spark, [(i, i)]), "b": batch(spark, [(i, i)])}
        )
    names = sorted(os.listdir(g._txn_dir))
    ids = [int(n.split("-")[1].split(".")[0]) for n in names
           if n.startswith("txn-")]
    assert max(ids) == 7 and min(ids) > 3  # old records reclaimed
    # and the kept record is complete JSON (fsync'd before the link)
    with open(g._txn_path(7)) as fh:
        rec = json.load(fh)
    assert set(rec["members"]) == {"a", "b"}


def test_neardup_replayed_wave_appends_nothing(spark, tmp_path):
    """The round-11 armor-removal justification: a replayed
    already-committed wave must leave BOTH index tables byte-stable
    (same snapshot ids, same row counts — no duplicate rows), while
    still emitting the original pairs."""
    from turnover_odata_etl_spark.plans.roundnine import (
        NeardupIndex,
        neardup_wave,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far"
    df = spark.createDataFrame(
        [(0, base), (3, base + " away"), (1, base + " today")],
        "doc_id long, text string",
    )
    t = NeardupIndex(spark, str(tmp_path / "idx"), n_buckets=4)
    neardup_wave(t, df.filter("doc_id % 3 == 0"), "text", "doc_id",
                 0.6, 1).collect()
    w2 = sorted(
        tuple(r) for r in neardup_wave(
            t, df.filter("doc_id % 3 == 1"), "text", "doc_id", 0.6, 2
        ).collect()
    )
    ids = (t.bands.current_id(), t.sigs.current_id())
    counts = (t.bands.read().count(), t.sigs.read().count())
    # replay the committed wave: same pairs, zero new commits/rows
    w2r = sorted(
        tuple(r) for r in neardup_wave(
            t, df.filter("doc_id % 3 == 1"), "text", "doc_id", 0.6, 2
        ).collect()
    )
    assert w2r == w2
    assert (t.bands.current_id(), t.sigs.current_id()) == ids
    assert (t.bands.read().count(), t.sigs.read().count()) == counts
    # and a gap (skipping an uncommitted wave) is refused loudly
    with pytest.raises(ValueError, match="consecutive"):
        neardup_wave(t, df.limit(0), "text", "doc_id", 0.6, 9)
