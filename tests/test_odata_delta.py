"""OData V4 delta-link incremental sync (E104): wire tests over the
mock server's change-tracking surface + the snapshot-table sync driver
(`sources/odata_sync.py`). No parquet oracle exists for a wire
protocol — same class as S1-S6."""

from __future__ import annotations

import pytest

from turnover_odata_etl_spark.sources.mock_server import MockOData
from turnover_odata_etl_spark.sources.odata_client import (
    ODataClient,
    ODataError,
)
from turnover_odata_etl_spark.sources.odata_sync import (
    DELTA_LINK_PROP,
    read_synced,
    sync_entity,
)
from turnover_odata_etl_spark.storage import SnapshotTable

FIELDS = ["Id", "Name", "Dept"]


def wire_rows(n=5):
    return [
        {"Id": str(i), "Name": f"emp{i}", "Dept": "D" + str(i % 2)}
        for i in range(n)
    ]


@pytest.fixture()
def mock4():
    m = MockOData(wire_rows(), FIELDS, version=4, page_size=2)
    m.start()
    yield m
    m.stop()


def client_for(m):
    return ODataClient(base_url=m.base_url, service_path="")


def state(spark, tdir):
    return {
        r["Id"]: (r["Name"], r["Dept"])
        for r in read_synced(spark, tdir).collect()
    }


def server_state(m):
    return {r["Id"]: (r["Name"], r["Dept"]) for r in m.rows}


def test_tracked_read_returns_rows_and_link(mock4):
    c = client_for(mock4)
    rows, link = c.fetch_tracked("Emp")
    assert {r["Id"] for r in rows} == {str(i) for i in range(5)}
    assert "$deltatoken=0" in link  # no changes yet


def test_initial_sync_then_delta_sync(spark, mock4, tmp_path):
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sid1 = sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    assert state(spark, tdir) == server_state(mock4)
    t = SnapshotTable.load(spark, tdir)
    link1 = t.latest_property(DELTA_LINK_PROP)
    assert link1 and "$deltatoken=0" in link1

    # server-side churn: update, add, delete
    mock4.apply_upsert({"Id": "1", "Name": "emp1b", "Dept": "D9"})
    mock4.apply_upsert({"Id": "9", "Name": "emp9", "Dept": "D9"})
    mock4.apply_delete("0")
    sid2 = sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    assert sid2 == sid1 + 1
    assert state(spark, tdir) == server_state(mock4)
    assert "0" not in state(spark, tdir)  # @removed became a tombstone
    link2 = SnapshotTable.load(spark, tdir).latest_property(
        DELTA_LINK_PROP
    )
    assert "$deltatoken=3" in link2  # cursor advanced past 3 changes


def test_empty_delta_commits_nothing(spark, mock4, tmp_path):
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sid1 = sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    sid2 = sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    assert sid2 == sid1  # no commit, link unchanged, state stable
    assert state(spark, tdir) == server_state(mock4)


def test_delta_pagination(spark, mock4, tmp_path):
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    for i in range(10, 17):  # 7 changes > page_size=2 => paginated delta
        mock4.apply_upsert(
            {"Id": str(i), "Name": f"emp{i}", "Dept": "D3"}
        )
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    assert state(spark, tdir) == server_state(mock4)


def test_wire_order_applies_within_one_delta(spark, mock4, tmp_path):
    """upsert-then-delete nets to absent; delete-then-re-add to
    present — per-row __sync_seq preserves wire order through the
    keep-latest merge."""
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    mock4.apply_upsert({"Id": "7", "Name": "emp7", "Dept": "D7"})
    mock4.apply_delete("7")  # upsert then delete: net absent
    mock4.apply_delete("2")
    mock4.apply_upsert({"Id": "2", "Name": "emp2b", "Dept": "D5"})  # re-add
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    got = state(spark, tdir)
    assert got == server_state(mock4)
    assert "7" not in got
    assert got["2"] == ("emp2b", "D5")


def test_replayed_delta_is_idempotent(spark, mock4, tmp_path):
    """Crash window: the link and the data commit atomically, so a
    crash between fetch and commit replays from the OLD link — the
    keep-latest merge absorbs the duplicate application."""
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    t = SnapshotTable.load(spark, tdir)
    old_link = t.latest_property(DELTA_LINK_PROP)
    mock4.apply_upsert({"Id": "3", "Name": "emp3b", "Dept": "D4"})
    mock4.apply_delete("4")
    sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    want = state(spark, tdir)
    # replay the SAME window manually (as a post-crash retry would)
    from turnover_odata_etl_spark.sources.odata_sync import _to_df

    changes, _ = c.fetch_delta(old_link)
    t2 = SnapshotTable.load(spark, tdir)
    entries = [(x, "@removed" in x) for x in changes]
    seq = (t2.order_watermark() or 0) + 1
    t2.merge(
        _to_df(spark, entries, FIELDS, "Id", seq),
        tombstone_filter="__deleted",
    )
    assert state(spark, tdir) == want == server_state(mock4)


def test_v2_gateway_raises_loudly():
    m = MockOData(wire_rows(), FIELDS, version=2, page_size=2)
    m.start()
    try:
        c = client_for(m)
        with pytest.raises(ODataError, match="track-changes"):
            c.fetch_tracked("Emp")
    finally:
        m.stop()


@pytest.mark.parametrize("seed", [5, 19])
def test_random_churn_converges(spark, tmp_path, seed):
    """Protocol fuzz: random interleavings of server-side upserts and
    deletes across several sync cycles — after every sync the table
    must equal the server, the delta link must advance monotonically,
    and a final no-op sync must commit nothing. Catches interaction
    bugs the scripted tests can't enumerate (delete of a never-synced
    key, repeated churn of one key across windows, empty windows
    between busy ones)."""
    import random

    rng = random.Random(seed)
    m = MockOData(wire_rows(4), FIELDS, version=4, page_size=3)
    m.start()
    try:
        c = client_for(m)
        tdir = str(tmp_path / "emp")
        sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
        assert state(spark, tdir) == server_state(m)
        for cycle in range(4):
            for _ in range(rng.randint(0, 5)):
                key = str(rng.randint(0, 9))
                if rng.random() < 0.35:
                    m.apply_delete(key)  # may target an absent key
                else:
                    m.apply_upsert(
                        {
                            "Id": key,
                            "Name": f"n{m.change_seq}",
                            "Dept": f"D{rng.randint(0, 3)}",
                        }
                    )
            sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
            assert state(spark, tdir) == server_state(m), (
                f"seed={seed} cycle={cycle}"
            )
        t = SnapshotTable.load(spark, tdir)
        before = t.current_id()
        sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
        assert SnapshotTable.load(spark, tdir).current_id() == before
    finally:
        m.stop()


def test_force_full_rebootstraps_after_service_relocation(
    spark, mock4, tmp_path
):
    """ADVICE r08: the persisted delta link embeds the server's
    absolute URL; a relocated service makes fetch_delta fail on the
    stored cursor with no recovery path. force_full=True must
    rebootstrap atomically: fresh tracked read replaces the cursor
    AND the state in one commit — including net-deleting keys that
    vanished server-side while the cursor was broken — and time
    travel to pre-rebootstrap snapshots survives."""
    c = client_for(mock4)
    tdir = str(tmp_path / "emp")
    sid1 = sync_entity(spark, c, "Emp", tdir, "Id", FIELDS)
    pre = state(spark, tdir)
    old_link = SnapshotTable.load(spark, tdir).latest_property(
        DELTA_LINK_PROP
    )

    # "relocate" the service: new instance, same data evolved — the
    # old absolute link now points at a dead host:port.
    evolved = [r for r in mock4.rows if r["Id"] != "2"]  # 2 vanished
    evolved.append({"Id": "7", "Name": "emp7", "Dept": "D7"})
    mock4.stop()
    m2 = MockOData(evolved, FIELDS, version=4, page_size=2)
    m2.start()
    try:
        c2 = client_for(m2)
        with pytest.raises(Exception):
            sync_entity(spark, c2, "Emp", tdir, "Id", FIELDS)

        sid2 = sync_entity(
            spark, c2, "Emp", tdir, "Id", FIELDS, force_full=True
        )
        assert sid2 > sid1
        assert state(spark, tdir) == server_state(m2)
        assert "2" not in state(spark, tdir)  # ghost row net-deleted
        assert "7" in state(spark, tdir)
        t = SnapshotTable.load(spark, tdir)
        new_link = t.latest_property(DELTA_LINK_PROP)
        assert new_link != old_link and m2.base_url in new_link

        # pre-rebootstrap snapshot still time-travels
        old = {
            r["Id"]: (r["Name"], r["Dept"])
            for r in t.read(sid1)
            .drop("__sync_seq", "__deleted")
            .collect()
        }
        assert old == pre

        # the new cursor works: one more churn + plain delta sync
        m2.apply_upsert({"Id": "7", "Name": "emp7b", "Dept": "D8"})
        sync_entity(spark, c2, "Emp", tdir, "Id", FIELDS)
        assert state(spark, tdir) == server_state(m2)
    finally:
        m2.stop()
