"""SnapshotTable.agg_stats (round 13 — VERDICT r12 item 2):
metadata-only count(*)/min/max/per-bucket-counts from manifest
entries, zero data files opened on the common path, exact-or-scan
(never wrong) when bounds weaken. The registered lifecycle query is
s_snapshot_agg_stats (plans/roundthirteen.py); these tests pin the
mechanism: the zero-read contract (reader spy), the truncation
fallback, pre-marker back-compat, and NULL/empty-file behavior."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "aggstats")


def make_table(spark, tdir, n_buckets=4):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver",
        n_buckets=n_buckets,
    )


def reader_spy(spark, monkeypatch):
    opened: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        opened.extend(paths)
        return real_parquet(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    return opened


def test_agg_stats_matches_full_read_and_opens_no_files(
    spark, tdir, monkeypatch
):
    """Numeric + short-string columns after an append/delete/merge
    lifecycle: the metadata answer equals the full-read aggregate
    and the manifest path opens ZERO data files."""
    t = make_table(spark, tdir)
    t.append(
        spark.createDataFrame(
            [(i, float(i * 10), f"s{i % 3}", 1) for i in range(1, 41)],
            "k long, v double, s string, ver long",
        )
    )
    t.delete_where("v BETWEEN 100 AND 250")
    t.merge(
        spark.createDataFrame(
            [(50, 777.5, "zz", 2), (3, -5.0, "aa", 2)],
            "k long, v double, s string, ver long",
        )
    )

    opened = reader_spy(spark, monkeypatch)
    got = t.agg_stats(["v", "s", "k"])
    monkeypatch.undo()
    assert opened == []  # the zero-data-files contract
    assert got["files_read"] == 0

    full = t.read()
    row = full.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lv"), F.max("v").alias("hv"),
        F.count("v").alias("nv"),
        F.min("s").alias("ls"), F.max("s").alias("hs"),
        F.count("s").alias("ns"),
        F.min("k").alias("lk"), F.max("k").alias("hk"),
        F.count("k").alias("nk"),
    ).first()
    assert got["n_rows"] == row["n"]
    assert got["columns"]["v"] == {
        "min": row["lv"], "max": row["hv"], "count": row["nv"]
    }
    assert got["columns"]["s"] == {
        "min": row["ls"], "max": row["hs"], "count": row["ns"]
    }
    assert got["columns"]["k"] == {
        "min": row["lk"], "max": row["hk"], "count": row["nk"]
    }
    # per-bucket counts sum to the total and match the layout
    assert sum(got["by_bucket"].values()) == got["n_rows"]


def test_agg_stats_truncated_strings_fall_back_exactly(
    spark, tdir, monkeypatch
):
    """A >16-code-point string bound is a truncation, not an attained
    value: agg_stats must read the deciding file(s) and still return
    the exact min/max — while a table of only short strings stays
    metadata-only."""
    t = make_table(spark, tdir, n_buckets=1)
    long_hi = "z" * 16 + "tail"  # truncation fires on the upper
    long_lo = "a" * 16 + "tail"  # and on the lower
    t.append(
        spark.createDataFrame(
            [(1, long_lo, 1), (2, "mid", 1), (3, long_hi, 1)],
            "k long, s string, ver long",
        )
    )
    got = t.agg_stats(["s"])
    assert got["files_read"] >= 1  # fallback fired
    assert got["columns"]["s"] == {
        "min": long_lo, "max": long_hi, "count": 3
    }

    # short strings: exact from metadata, no reads
    t2 = make_table(spark, os.path.join(tdir, "short"), n_buckets=1)
    t2.append(
        spark.createDataFrame(
            [(1, "aa", 1), (2, "zz", 1)], "k long, s string, ver long"
        )
    )
    opened = reader_spy(spark, monkeypatch)
    got2 = t2.agg_stats(["s"])
    monkeypatch.undo()
    assert opened == []
    assert got2["files_read"] == 0
    assert got2["columns"]["s"] == {"min": "aa", "max": "zz", "count": 2}


def test_agg_stats_premarker_entries_scan_string_uppers(spark, tdir):
    """Back-compat: a pre-r13 manifest entry (no ``sx`` key) only
    proves a sub-16-length string LOWER; the upper must be verified
    against data. Simulated by stripping the marker from the raw
    manifest."""
    t = make_table(spark, tdir, n_buckets=1)
    t.append(
        spark.createDataFrame(
            [(1, "aa", 1), (2, "zz", 1)], "k long, s string, ver long"
        )
    )
    sid = t.current_id()
    m = t._manifest(sid)
    for f in m["files"]:
        f.pop("sx", None)
    path = os.path.join(t._manifest_dir, f"manifest-{sid}.json")
    with open(path, "w") as fh:
        json.dump(m, fh)
    t._mcache.clear()
    t._bcache.clear()
    got = t.agg_stats(["s"])
    assert got["files_read"] >= 1  # upper re-verified against data
    assert got["columns"]["s"] == {"min": "aa", "max": "zz", "count": 2}


def test_agg_stats_null_and_empty_edges(spark, tdir):
    """An all-NULL column has no footer stats (fallback scan; SQL
    min/max ignore NULLs → None), a fully-deleted table answers
    n_rows=0 with None bounds, and unknown columns refuse loudly."""
    t = make_table(spark, tdir, n_buckets=2)
    t.append(
        spark.createDataFrame(
            [(1, None, 1), (2, None, 1)],
            "k long, v double, ver long",
        )
    )
    got = t.agg_stats(["v", "k"])
    assert got["columns"]["v"] == {"min": None, "max": None, "count": 0}
    assert got["columns"]["k"] == {"min": 1, "max": 2, "count": 2}
    assert got["n_rows"] == 2

    with pytest.raises(ValueError, match="unknown columns"):
        t.agg_stats(["nope"])

    t.delete_where("k >= 1")
    got2 = t.agg_stats(["v", "k"])
    assert got2["n_rows"] == 0
    assert got2["by_bucket"] == {}
    assert got2["columns"]["k"] == {"min": None, "max": None, "count": 0}


def test_agg_stats_time_travel_and_fallback_prunes(spark, tdir):
    """agg_stats at an older snapshot answers THAT anchor; and when
    one file's bounds are inexact, only files that could MOVE the
    answer are read (a truncated file strictly inside the exact
    bounds is never opened)."""
    t = make_table(spark, tdir, n_buckets=1)
    t.append(
        spark.createDataFrame(
            [(1, "aa", 1), (2, "zz", 1)], "k long, s string, ver long"
        )
    )
    sid1 = t.current_id()
    # second file: long strings strictly INSIDE [aa, zz]
    t.append(
        spark.createDataFrame(
            [(3, "m" * 20, 2), (4, "n" * 20, 2)],
            "k long, s string, ver long",
        )
    )
    got_old = t.agg_stats(["s"], snapshot_id=sid1)
    assert got_old["n_rows"] == 2
    assert got_old["columns"]["s"] == {"min": "aa", "max": "zz", "count": 2}

    got = t.agg_stats(["s"])
    assert got["n_rows"] == 4
    assert got["columns"]["s"] == {"min": "aa", "max": "zz", "count": 4}
    # the truncated file's stored bounds sit inside [aa, zz]:
    # lo "mmmm..." ≥ "aa" proves it can't lower the min, hi
    # "nnn...o" ≤ "zz" proves it can't raise the max → zero reads
    assert got["files_read"] == 0


def test_agg_stats_mixed_domain_stats_degrade_to_scan(spark, tdir):
    """Review r13: a column whose stored bounds mix domains across
    files (a retyping evolution) must drop every unprovable bound and
    answer from a full scan — never raise comparing str with int.
    Simulated by rewriting one file's stats to string bounds in the
    raw manifest."""
    t = make_table(spark, tdir, n_buckets=1)
    t.append(
        spark.createDataFrame(
            [(1, 10.0, 1), (2, 20.0, 1)], "k long, v double, ver long"
        )
    )
    t.append(
        spark.createDataFrame(
            [(3, 30.0, 2), (4, 40.0, 2)], "k long, v double, ver long"
        )
    )
    sid = t.current_id()
    m = t._manifest(sid)
    m["files"][0]["stats"]["v"] = ["aa", "zz"]  # foreign-domain bounds
    path = os.path.join(t._manifest_dir, f"manifest-{sid}.json")
    with open(path, "w") as fh:
        json.dump(m, fh)
    t._mcache.clear()
    t._bcache.clear()
    got = t.agg_stats(["v"])
    assert got["files_read"] == 2  # nothing provable — scan all
    assert got["columns"]["v"] == {"min": 10.0, "max": 40.0, "count": 4}


def test_files_metadata_table(spark, tdir):
    """SnapshotTable.files (round 13 — the per-file metadata view
    next to history()): every entry carries path/bucket/rows, stats
    with the exactness marker, null counts, and bloom coverage;
    results are deep copies (mutation-safe) and time-travel to the
    requested anchor."""
    t = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=2,
        bloom_cols=["s"],
    )
    t.append(
        spark.createDataFrame(
            [(1, "aa", 1.0, 1), (2, None, 2.0, 1)],
            "k long, s string, v double, ver long",
        )
    )
    sid1 = t.current_id()
    t.append(
        spark.createDataFrame(
            [(3, "zz", 3.0, 2)], "k long, s string, v double, ver long"
        )
    )
    fs = t.files()
    assert sum(f["rows"] for f in fs) == 3
    live = [f for f in fs if f["rows"]]
    assert all("stats" in f and "sx" in f for f in live)
    assert all(f.get("bloom_cols") == ["s"] for f in live)
    assert all("nulls" in f for f in live)
    assert len(t.files(snapshot_id=sid1)) < len(fs)

    # deep copies: mutating the view never corrupts the cached
    # manifest (the raw-manifest test-edit pattern stays explicit)
    fs[0]["stats"]["k"][0] = -999
    fs[0]["rows"] = 0
    fresh = t.files()
    assert fresh[0]["stats"]["k"][0] != -999 or fresh[0]["rows"] != 0
    assert sum(f["rows"] for f in t.files()) == 3

    with pytest.raises(ValueError, match="no commits"):
        SnapshotTable(
            spark, tdir + "_none", key_cols=["k"],
            order_col="ver", n_buckets=2,
        ).files()


def test_maintenance_plan_targets_fragmented_buckets(
    spark, tdir, monkeypatch
):
    """maintenance_plan flags only buckets over the file-count (or
    under the avg-rows) threshold, from metadata alone; feeding its
    keys to the bucket-scoped zorder rewrite clears the flag."""
    t = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=2,
    )
    # fragment bucket(s) with 6 tiny appends
    for w in range(6):
        t.append(
            spark.createDataFrame(
                [(i, float(i), w + 1) for i in range(w * 10, w * 10 + 10)],
                "k long, v double, ver long",
            )
        )
    opened = reader_spy(spark, monkeypatch)
    plan = t.maintenance_plan(max_files_per_bucket=4)
    monkeypatch.undo()
    assert opened == []  # metadata only
    assert plan  # six appends over two buckets: fragmented
    for b, info in plan.items():
        assert info["n_files"] > 4
        assert info["rows"] == sum(
            f["rows"] for f in t.files() if f["bucket"] == b
        )

    # the avg-rows knob flags small files even under the count cap
    assert t.maintenance_plan(
        max_files_per_bucket=100, min_avg_rows=1000
    )

    # acting on the plan clears it
    t.rewrite_zorder(
        ["v", "k"], rows_per_file=65536, buckets=sorted(plan)
    )
    assert t.maintenance_plan(max_files_per_bucket=4) == {}
