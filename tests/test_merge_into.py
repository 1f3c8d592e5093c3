"""SnapshotTable.merge_into (round 12) — SQL MERGE INTO with the
canonical clause set: conditional UPDATE SET * / DELETE on match,
INSERT * on no-match; source cardinality rule; layout bucket prune;
COW + time travel. The conditional-DML verb next to the
unconditional keep-latest merge()."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "mtable")


def make_table(spark, tdir, n_buckets=4):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=n_buckets
    )


def batch(spark, triples):
    return spark.createDataFrame(
        [(k, v, ver) for k, v, ver in triples],
        "k long, v string, ver long",
    )


def rows(df):
    return sorted(
        (r["k"], r["v"], r["ver"])
        for r in df.select("k", "v", "ver").collect()
    )


def test_merge_into_update_and_insert(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    pre = t.current_id()
    sid = t.merge_into(batch(spark, [(2, "B", 2), (9, "new", 2)]))
    assert rows(t.read()) == [
        (1, "a", 1), (2, "B", 2), (3, "c", 1), (9, "new", 2),
    ]
    # time travel: pre-merge snapshot intact
    assert rows(t.read(snapshot_id=pre)) == [
        (1, "a", 1), (2, "b", 1), (3, "c", 1),
    ]
    m = t._manifest(sid)
    assert m["operation"] == "merge_into"
    assert m["properties"]["merge_into.when_matched"] == "update"


def test_merge_into_conditional_update_only_newer(spark, tdir):
    """matched_condition over t_/s_ prefixes: update only where the
    source is strictly newer; a NULL condition row is NOT updated
    (SQL semantics) and a losing source row simply vanishes."""
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 5), (2, "b", 5), (3, None, 5)]))
    t.merge_into(
        batch(spark, [(1, "A", 9), (2, "B", 3), (3, "C", 9)]),
        matched_condition="s_ver > t_ver AND t_v IS NOT NULL",
        when_not_matched="ignore",
    )
    assert rows(t.read()) == [(1, "A", 9), (2, "b", 5), (3, None, 5)]


def test_merge_into_delete_action(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(i, "x", i) for i in range(1, 7)]))
    t.merge_into(
        batch(spark, [(2, "x", 0), (4, "x", 0), (5, "x", 0)]),
        when_matched="delete",
        matched_condition="t_ver >= 4",
        when_not_matched="ignore",
    )
    # only matched rows with ver >= 4 deleted (2 survives its match)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 6]


def test_merge_into_insert_only_does_not_rewrite_matched(spark, tdir):
    """when_matched='ignore' + insert: a match alone must not force a
    bucket rewrite — untouched buckets' manifest entries carry by
    reference."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(16)]))
    base = t.current_id()
    before = {f["path"]: f for f in t._manifest(base)["files"]}
    # source: one existing key (match -> ignore), one new key
    sid = t.merge_into(
        batch(spark, [(3, "IGNORED", 2), (100, "new", 2)]),
        when_matched="ignore",
    )
    assert rows(t.read()) == sorted(
        [(i, "x", 1) for i in range(16)] + [(100, "new", 2)]
    )
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    # every bucket except the INSERT key's bucket is carried verbatim
    ins_bucket = t._with_bucket(
        batch(spark, [(100, "new", 2)])
    ).collect()[0]["__bucket"]
    for p, f in before.items():
        if f["bucket"] != ins_bucket:
            assert after[p] == f


def test_merge_into_prunes_to_source_buckets(spark, tdir, parquet_spy):
    """Layout prune (the delete_keys discipline): only the source
    keys' buckets' files are READ."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(64)]))
    base = t.current_id()
    by_path = {f["path"]: f["bucket"] for f in t._manifest(base)["files"]}

    src = batch(spark, [(7, "S", 2)])
    src_bucket = t._with_bucket(src).collect()[0]["__bucket"]

    parquet_spy.clear()
    t.merge_into(src)
    for p in [p for p in parquet_spy if p.endswith(".parquet")]:
        rel = next(k for k in by_path if p.endswith(k))
        assert by_path[rel] == src_bucket, f"non-source bucket read: {p}"


def test_merge_into_guards(spark, tdir):
    t = make_table(spark, tdir)
    with pytest.raises(ValueError, match="no commits"):
        t.merge_into(batch(spark, [(1, "a", 1)]))
    t.merge(batch(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="when_matched"):
        t.merge_into(batch(spark, [(1, "a", 1)]), when_matched="nope")
    with pytest.raises(ValueError, match="when_not_matched"):
        t.merge_into(
            batch(spark, [(1, "a", 1)]), when_not_matched="upsert"
        )
    with pytest.raises(ValueError, match="missing table columns"):
        t.merge_into(spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_into(batch(spark, [(5, "a", 1), (5, "b", 2)]))


def test_merge_into_noop_returns_current_without_commit(spark, tdir):
    t = make_table(spark, tdir)
    sid = t.merge(batch(spark, [(1, "a", 1)]))
    # matched but action=ignore, no inserts -> nothing fires
    assert (
        t.merge_into(
            batch(spark, [(1, "z", 9)]),
            when_matched="ignore",
            when_not_matched="ignore",
        )
        == sid
    )
    # conditional update that never fires -> no-op too
    assert (
        t.merge_into(
            batch(spark, [(1, "z", 0)]),
            matched_condition="s_ver > t_ver",
            when_not_matched="ignore",
        )
        == sid
    )
    assert t.snapshot_ids() == [sid]


def test_merge_into_null_safe_key_match(spark, tdir):
    t = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=2
    )
    t.merge(
        spark.createDataFrame(
            [(None, "null-key", 1), (1, "one", 1)],
            "k long, v string, ver long",
        )
    )
    t.merge_into(
        spark.createDataFrame(
            [(None, "NULLED", 2)], "k long, v string, ver long"
        )
    )
    got = {
        (r["k"], r["v"], r["ver"])
        for r in t.read().select("k", "v", "ver").collect()
    }
    assert got == {(None, "NULLED", 2), (1, "one", 1)}


def test_merge_into_updates_every_duplicate_target_row(spark, tdir):
    """Target duplicates (merge-on-read append replays) each receive
    the action — documented behavior."""
    t = make_table(spark, tdir)
    t.append(batch(spark, [(1, "a", 1), (1, "a", 1), (2, "b", 1)]))
    t.merge_into(batch(spark, [(1, "A", 2)]), when_not_matched="ignore")
    assert rows(t.read()) == [(1, "A", 2), (1, "A", 2), (2, "b", 1)]


def test_merge_into_source_type_alignment(spark, tdir):
    """An int-typed source against a long-keyed table must hash to
    the right buckets and match (the type-sensitive hash lesson)."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(20)]))
    src = spark.createDataFrame(
        [(7, "SEVEN", 2)], "k int, v string, ver int"
    )
    t.merge_into(src, when_not_matched="ignore")
    assert (7, "SEVEN", 2) in rows(t.read())


def test_merge_into_condition_on_table_with_prefixed_columns(spark, tmp_path):
    """Review r12: a table whose own columns are literally named
    s_<x>/t_<x> must not make the documented t_/s_ condition syntax
    ambiguous — the condition resolves against a view exposing ONLY
    the prefixed names."""
    t = SnapshotTable(
        spark, str(tmp_path / "pfx"),
        key_cols=["k"], order_col="ver", n_buckets=2,
    )
    df = spark.createDataFrame(
        [(1, 10, 99, 1), (2, 20, 99, 1)],
        "k long, s_value long, t_value long, ver long",
    )
    t.merge(df)
    src = spark.createDataFrame(
        [(1, 11, 0, 2), (2, 5, 0, 2)],
        "k long, s_value long, t_value long, ver long",
    )
    # condition references the TARGET's real s_value column via the
    # t_ prefix (t_s_value) and the SOURCE's via s_ (s_s_value)
    t.merge_into(
        src,
        matched_condition="s_s_value > t_s_value",
        when_not_matched="ignore",
    )
    got = {
        r["k"]: (r["s_value"], r["t_value"], r["ver"])
        for r in t.read().collect()
    }
    assert got == {1: (11, 0, 2), 2: (20, 99, 1)}
