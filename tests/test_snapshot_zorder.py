"""Z-order layout (round 12, SURVEY E114): Morton encoding as pure
Catalyst expressions + SnapshotTable.rewrite_zorder — multi-column
file-level data skipping. Pins: encoding vs an independent Python
reference, row preservation + time travel, the BEFORE/AFTER prune
delta on BOTH columns (parquet-read spy), and the API guards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.functions.zorder import morton_code, quantize
from turnover_odata_etl_spark.storage import SnapshotTable


def py_morton(vals: list[int], bits: int = 16) -> int:
    z = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * len(vals) + i)
    return z


def test_morton_code_matches_python_reference(spark):
    rows = [
        (0, 0, 0), (1, 1, 0), (2, 0, 1), (3, 65535, 65535),
        (4, 12345, 54321), (5, 40000, 1), (6, 7, 8),
    ]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = {
        r["k"]: r["z"]
        for r in df.select(
            "k", morton_code([F.col("a"), F.col("b")]).alias("z")
        ).collect()
    }
    for k, a, b in rows:
        assert got[k] == py_morton([a, b]), (k, a, b)
    # three columns interleave too (16*3 = 48 bits)
    df3 = spark.createDataFrame([(1, 3, 5, 7)], "k long, a long, b long, c long")
    (r,) = df3.select(
        morton_code([F.col("a"), F.col("b"), F.col("c")]).alias("z")
    ).collect()
    assert r["z"] == py_morton([3, 5, 7])


def test_morton_code_is_codegen_only(spark):
    df = spark.range(10).select(
        morton_code([F.col("id"), F.col("id")]).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_morton_code_guards():
    with pytest.raises(ValueError, match="at least one"):
        morton_code([])
    with pytest.raises(ValueError, match="overflows"):
        morton_code([F.lit(0)] * 4, bits=16)


def test_quantize_grid_and_edges(spark):
    df = spark.createDataFrame(
        [(0, 0.0), (1, 50.0), (2, 100.0), (3, None), (4, -5.0), (5, 400.0)],
        "k long, v double",
    )
    got = {
        r["k"]: r["q"]
        for r in df.select(
            "k", quantize("v", 0.0, 100.0, bits=4).alias("q")
        ).collect()
    }
    # linear onto [0, 15], clamped, NULL -> 0
    assert got == {0: 0, 1: 7, 2: 15, 3: 0, 4: 0, 5: 15}
    # degenerate range -> constant 0 (clustering no-op, never an error)
    (r,) = df.limit(1).select(quantize("v", 5.0, 5.0).alias("q")).collect()
    assert r["q"] == 0


@pytest.fixture()
def zdir(tmp_path):
    return str(tmp_path / "ztable")


def _grid_table(spark, zdir, n=4096, side=64, n_buckets=2):
    """(k, x, y): a side×side grid appended in k order, so every file
    initially spans ~the full x AND y ranges (wide boxes — nothing
    prunes before the z-order rewrite)."""
    t = SnapshotTable(
        spark, zdir, key_cols=["k"], order_col="k", n_buckets=n_buckets
    )
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % side).cast("long").alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    for lo in range(0, n, n // 4):  # four appends
        t.append(df.filter((F.col("k") >= lo) & (F.col("k") < lo + n // 4)))
    return t


def _opened_counts(t, col, lo, hi, opened):
    opened.clear()
    n_rows = t.read_where(col, lo, hi).count()
    return n_rows, len([p for p in opened if p.endswith(".parquet")])


def test_rewrite_zorder_enables_multi_column_pruning(
    spark, zdir, parquet_spy
):
    t = _grid_table(spark, zdir)
    before_rows = sorted(
        (r["k"], r["x"], r["y"]) for r in t.read().collect()
    )
    pre_id = t.current_id()
    n_files_pre = len(t._manifest(pre_id)["files"])

    # BEFORE: id-ordered appends — x/y boxes are wall-to-wall, the
    # window read must open every file
    rows_x, opened = _opened_counts(t, "x", 0, 7, parquet_spy)
    assert rows_x == 4096 // 8
    assert opened == n_files_pre

    sid = t.rewrite_zorder(["x", "y"], rows_per_file=256)
    m = t._manifest(sid)
    assert m["operation"] == "zorder"
    assert m["properties"]["zorder.cols"] == "x,y"
    n_files = len(m["files"])
    assert n_files >= 12  # rows_per_file split the buckets' streams

    # rows preserved exactly; pre-rewrite snapshot time-travels
    assert sorted(
        (r["k"], r["x"], r["y"]) for r in t.read().collect()
    ) == before_rows
    assert len(t.read(snapshot_id=pre_id).collect()) == 4096

    # AFTER: a 1/8 window on EITHER column opens a strict subset —
    # each z-contiguous file's box is at most half the square per
    # axis, so at least the opposite half prunes
    for col in ("x", "y"):
        n_rows, opened = _opened_counts(t, col, 0, 7, parquet_spy)
        assert n_rows == 4096 // 8  # exactness survives the layout
        assert opened <= n_files * 3 // 4, (col, opened, n_files)


def test_rewrite_zorder_guards(spark, zdir):
    t = SnapshotTable(
        spark, zdir, key_cols=["k"], order_col="k", n_buckets=2
    )
    with pytest.raises(ValueError, match="no commits"):
        t.rewrite_zorder(["x"])
    t.append(
        spark.createDataFrame(
            [(1, 1, "a")], "k long, x long, s string"
        )
    )
    with pytest.raises(ValueError, match="unknown columns"):
        t.rewrite_zorder(["nope"])
    with pytest.raises(ValueError, match="numeric"):
        t.rewrite_zorder(["s"])
    with pytest.raises(ValueError, match="unknown columns"):
        t.rewrite_zorder([])


def test_rewrite_zorder_constant_column_is_noop_safe(spark, zdir):
    """A constant (degenerate-range) z-column contributes 0 bits but
    the rewrite still commits and preserves rows."""
    t = SnapshotTable(
        spark, zdir, key_cols=["k"], order_col="k", n_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [(i, 7, i % 3) for i in range(30)], "k long, c long, x long"
        )
    )
    t.rewrite_zorder(["c", "x"], rows_per_file=10)
    assert sorted(r["k"] for r in t.read().collect()) == list(range(30))


def test_rewrite_zorder_bucket_scoped_incremental(spark, zdir):
    """Round 13 (Delta's WHERE-scoped OPTIMIZE in bucket terms):
    ``buckets=`` rewrites only the named buckets — other buckets'
    file entries carry BY REFERENCE (identical dicts), rows are
    preserved globally, and unknown buckets refuse loudly."""
    t = SnapshotTable(
        spark, os.path.join(zdir, "scoped"), key_cols=["k"],
        order_col="ver", n_buckets=4,
    )
    t.append(
        spark.createDataFrame(
            [(i, float(i % 7), i * 3 % 11, 1) for i in range(200)],
            "k long, v double, w long, ver long",
        )
    )
    pre = t._manifest(t.current_id())
    pre_by_bucket = {}
    for f in pre["files"]:
        pre_by_bucket.setdefault(f["bucket"], []).append(f)
    before_rows = sorted(
        (r["k"], r["v"], r["w"]) for r in t.read().collect()
    )

    t.rewrite_zorder(["v", "w"], rows_per_file=16, buckets=[0, 2])
    m = t._manifest(t.current_id())
    by_bucket = {}
    for f in m["files"]:
        by_bucket.setdefault(f["bucket"], []).append(f)
    # untouched buckets: same entries, by reference
    for b in (1, 3):
        assert by_bucket[b] == pre_by_bucket[b]
    # scoped buckets: rewritten (new file names, finer granularity)
    for b in (0, 2):
        assert {f["path"] for f in by_bucket[b]} != {
            f["path"] for f in pre_by_bucket[b]
        }
    assert sorted(
        (r["k"], r["v"], r["w"]) for r in t.read().collect()
    ) == before_rows

    with pytest.raises(ValueError, match="unknown buckets"):
        t.rewrite_zorder(["v", "w"], buckets=[99])
    # scoping to an empty/absent bucket set is a no-op, no commit
    sid = t.current_id()
    assert t.rewrite_zorder(["v", "w"], buckets=[]) == sid
