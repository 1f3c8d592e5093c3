"""Per-file bloom filters (round 13 — VERDICT r12 item 3): k-hash
bitsets per (file, string column) in the manifest, consulted by the
equality-shaped prune paths (delete_where/update_where via
_split_candidates, read_where point probes). The contract under test:

- SOUNDNESS: a bloom negative NEVER skips a file that holds the
  probe value (fuzzed — every value present in a file must be
  bloom-positive for that file's entry);
- PRUNING: an equality delete whose column has a long shared prefix
  (truncate-16 stats blind) opens ONLY bloom-positive files, and an
  absent-value probe is a zero-read no-op;
- plumbing: blooms survive load(), are rebuilt on rewrite verbs,
  all-NULL columns pack all-zero bitsets (equality never matches
  NULL), and non-string bloom columns refuse loudly.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable
from turnover_odata_etl_spark.storage.snapshot import (
    _bloom_contains,
    _bloom_nbits,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "bloomtable")


def make_table(spark, tdir, **kw):
    kw.setdefault("n_buckets", 2)
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver",
        bloom_cols=["email"], **kw,
    )


def email(i):  # 16-char shared prefix: truncate-16 stats are blind
    return f"customer-record-{i:06d}@example.com"


def rows_df(spark, ids, ver=1):
    return spark.createDataFrame(
        [(i, email(i), float(i), ver) for i in ids],
        "k long, email string, v double, ver long",
    )


def reader_spy(spark, monkeypatch):
    opened: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        opened.extend(paths)
        return real_parquet(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    return opened


def test_bloom_entries_written_and_no_false_negatives(spark, tdir):
    """Every value present in a file MUST be bloom-positive for that
    file (the no-false-negative soundness half, fuzzed over a seeded
    random value sample including unicode), probed through the same
    Spark-hash discipline the prune paths use."""
    t = make_table(spark, tdir)
    rng = random.Random(13)
    ids = rng.sample(range(10_000), 200)
    t.append(rows_df(spark, ids))
    m = t._manifest(t.current_id())
    assert all("bloom" in f for f in m["files"] if f["rows"])
    for f in m["files"]:
        e = f["bloom"]["email"]
        assert e["m"] == _bloom_nbits(f["rows"])
        assert e["k"] == 5

    # which emails live in which file
    by_path = {}
    for f in m["files"]:
        p = os.path.join(t.table_dir, f["path"])
        vals = [
            r["email"] for r in spark.read.parquet(p).collect()
        ]
        by_path[f["path"]] = (f, vals)
    all_vals = sorted({v for _, vs in by_path.values() for v in vs})
    hashes = t._bloom_raw_hashes({v: v for v in all_vals})
    for f, vals in by_path.values():
        for v in vals:
            assert _bloom_contains(f["bloom"]["email"], hashes[v]), (
                f"FALSE NEGATIVE: {v} in {f['path']}"
            )


def test_equality_delete_prunes_by_bloom(spark, tdir, monkeypatch):
    """Three appends whose email prefixes are identical (stats
    windows cover every probe): an equality delete must open only
    bloom-positive files, and an absent value is a zero-read no-op
    commit-wise (base id returned, no parquet opened)."""
    t = make_table(spark, tdir, n_buckets=1)  # isolate file-level prune
    t.append(rows_df(spark, range(0, 50), ver=1))
    t.append(rows_df(spark, range(50, 100), ver=2))
    t.append(rows_df(spark, range(100, 150), ver=3))
    m = t._manifest(t.current_id())
    files = [f for f in m["files"] if f["rows"]]
    assert len(files) == 3
    # stats are BLIND: every file's email window covers every probe
    lows = {f["stats"]["email"][0] for f in files}
    assert lows == {"customer-record-"}

    target = email(75)  # lives only in the ver=2 file
    holder = next(
        f["path"]
        for f in files
        if any(
            r["email"] == target
            for r in spark.read.parquet(
                os.path.join(t.table_dir, f["path"])
            ).collect()
        )
    )
    opened = reader_spy(spark, monkeypatch)
    t.delete_where(f"email = '{target}'")
    monkeypatch.undo()
    data_opened = {
        os.path.relpath(p, t.table_dir)
        for p in opened
        if p.endswith(".parquet") and "/data/" in p
    }
    assert holder in data_opened
    # bloom-negative files were never read (tolerate an FP at 16
    # bits/row over 50 values: astronomically unlikely, but the
    # assertion we PIN is that pruning happened at all)
    assert len(data_opened) < len(files)
    assert target not in [
        r["email"] for r in t.read().collect()
    ]

    sid = t.current_id()
    opened2 = reader_spy(spark, monkeypatch)
    out = t.delete_where("email = 'absent@example.com'")
    monkeypatch.undo()
    assert out == sid  # no-op, no commit
    assert [p for p in opened2 if p.endswith(".parquet")] == []


def test_read_where_point_probe_consults_bloom(
    spark, tdir, monkeypatch
):
    t = make_table(spark, tdir, n_buckets=1)
    t.append(rows_df(spark, range(0, 40), ver=1))
    t.append(rows_df(spark, range(40, 80), ver=2))
    target = email(10)
    opened = reader_spy(spark, monkeypatch)
    got = t.read_where("email", target, target).collect()
    monkeypatch.undo()
    assert [r["k"] for r in got] == [10]
    data_opened = [
        p for p in opened if p.endswith(".parquet") and "/data/" in p
    ]
    assert len(data_opened) == 1  # the other file is bloom-pruned


def test_blooms_survive_load_and_rewrites(spark, tdir):
    """load() restores bloom_cols from the manifest config; rewrite
    verbs (merge) rebuild blooms for their new files."""
    t = make_table(spark, tdir)
    t.append(rows_df(spark, range(0, 30), ver=1))
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.bloom_cols == ["email"]
    t2.merge(rows_df(spark, range(10, 20), ver=2))
    m = t2._manifest(t2.current_id())
    assert all("bloom" in f for f in m["files"] if f["rows"])
    # the rewritten files' blooms still hold their values
    hashes = t2._bloom_raw_hashes({"email": email(15)})
    holders = [
        f
        for f in m["files"]
        if _bloom_contains(f["bloom"]["email"], hashes["email"])
    ]
    assert holders  # at least the rewritten file answers positive


def test_all_null_column_packs_zero_bloom_and_prunes(spark, tdir):
    t = make_table(spark, tdir, n_buckets=1)
    t.append(
        spark.createDataFrame(
            [(1, None, 1.0, 1), (2, None, 2.0, 1)],
            "k long, email string, v double, ver long",
        )
    )
    m = t._manifest(t.current_id())
    (f,) = [f for f in m["files"] if f["rows"]]
    hashes = t._bloom_raw_hashes({"email": "anything"})
    assert not _bloom_contains(f["bloom"]["email"], hashes["email"])
    sid = t.current_id()
    assert t.delete_where("email = 'anything'") == sid  # pruned no-op


def test_non_string_bloom_column_refuses(spark, tdir):
    t = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver",
        n_buckets=1, bloom_cols=["v"],
    )
    with pytest.raises(ValueError, match="string-only"):
        t.append(
            spark.createDataFrame(
                [(1, "a", 1.0, 1)],
                "k long, email string, v double, ver long",
            )
        )


def test_read_pred_prunes_on_stats_and_blooms(
    spark, tdir, monkeypatch
):
    """read_pred (round 13): a multi-conjunct predicate prunes on
    every provable bound — the numeric window via footer stats AND
    the email equality via blooms — and still answers exactly;
    unparseable predicates degrade to scan-all-but-filter."""
    t = make_table(spark, tdir, n_buckets=1)
    t.append(rows_df(spark, range(0, 50), ver=1))
    t.append(rows_df(spark, range(50, 100), ver=2))
    t.append(rows_df(spark, range(100, 150), ver=3))
    target = email(75)
    opened = reader_spy(spark, monkeypatch)
    # v window covers files 1+2 (stats drop only file 3); the email
    # equality's BLOOM is what must drop file 1 (review r13 — the
    # window is chosen so stats alone would leave TWO candidates)
    got = t.read_pred(
        f"v BETWEEN 0 AND 99 AND email = '{target}'"
    ).collect()
    monkeypatch.undo()
    assert [(r["k"], r["email"]) for r in got] == [(75, target)]
    data_opened = [
        p for p in opened if p.endswith(".parquet") and "/data/" in p
    ]
    assert len(data_opened) == 1  # stats leave 1+2, bloom drops 1

    # a structurally-unparseable conjunct (the % arithmetic) yields
    # no bounds for k; the v conjunct still prunes and the exact
    # filter applies either way
    got2 = t.read_pred("k % 10 = 7 AND v < 30").collect()
    assert sorted(r["k"] for r in got2) == [7, 17, 27]

    # NULL predicate rows are excluded (SQL WHERE semantics)
    t.append(
        spark.createDataFrame(
            [(900, None, None, 4)],
            "k long, email string, v double, ver long",
        )
    )
    assert t.read_pred("v > 0").filter("k = 900").collect() == []


def test_read_keys_bloom_prunes_within_bucket(
    spark, tdir, monkeypatch
):
    """Round 13: a string point lookup on a bloom-enabled KEY column
    opens only bloom-possible files WITHIN the matched bucket —
    a many-append bucket opens ~the holders, not its whole history;
    results stay exact and non-string keys keep the bucket prune."""
    t = SnapshotTable(
        spark, tdir, key_cols=["email"], order_col="ver",
        n_buckets=1, bloom_cols=["email"],
    )
    for w, ids in enumerate((range(0, 40), range(40, 80), range(80, 120))):
        t.append(
            spark.createDataFrame(
                [(email(i), float(i), w + 1) for i in ids],
                "email string, v double, ver long",
            )
        )
    target = email(50)  # lives only in the second append's file
    opened = reader_spy(spark, monkeypatch)
    got = t.read_keys([target]).collect()
    monkeypatch.undo()
    assert [(r["email"], r["v"]) for r in got] == [(target, 50.0)]
    data_opened = [
        p for p in opened if p.endswith(".parquet") and "/data/" in p
    ]
    assert len(data_opened) == 1  # two sibling files bloom-pruned

    # an absent key: zero files opened, empty exact result
    opened2 = reader_spy(spark, monkeypatch)
    assert t.read_keys(["absent@example.com"]).collect() == []
    monkeypatch.undo()
    assert [
        p for p in opened2 if p.endswith(".parquet") and "/data/" in p
    ] == []
