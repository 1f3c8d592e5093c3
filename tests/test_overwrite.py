"""SnapshotTable.overwrite (round 13): whole-table replacement as
one commit — the maintenance verb under ivf_refresh (keys and
buckets both move, so the row-preserving rewrites can't carry it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable


@pytest.fixture()
def t(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "ow"), key_cols=["k"],
        order_col="ver", n_buckets=4,
    )
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}", 1) for i in range(20)],
            "k long, s string, ver long",
        )
    )
    return t


def rows(df):
    return sorted((r["k"], r["s"], r["ver"]) for r in df.collect())


def test_overwrite_replaces_contents_one_commit(spark, t):
    pre = t.current_id()
    new = spark.createDataFrame(
        [(i + 100, f"w{i}", 2) for i in range(5)],
        "k long, s string, ver long",
    )
    sid = t.overwrite(new, operation="test-overwrite")
    assert sid == pre + 1  # exactly one commit
    assert rows(t.read()) == rows(new)
    # time travel: the pre-overwrite contents stay readable
    assert len(rows(t.read(snapshot_id=pre))) == 20
    m = t._manifest(sid)
    assert m["operation"] == "test-overwrite"


def test_overwrite_moves_rows_across_buckets(spark, t):
    """The point of the verb: a transformed frame whose keys hash to
    different buckets lands correctly (keyed reads still work)."""
    new = t.read().select(
        (F.col("k") * 7 + 1).alias("k"), "s",
        (F.col("ver") + 1).alias("ver"),
    )
    t.overwrite(new)
    got = t.read_keys([8]).collect()  # k=1*7+1
    assert [(r["k"], r["s"]) for r in got] == [(8, "v1")]


def test_overwrite_validates_schema(spark, t):
    with pytest.raises(ValueError, match="missing"):
        t.overwrite(spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="extra"):
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 1, 9.0)],
                "k long, s string, ver long, boom double",
            )
        )


def test_overwrite_to_empty(spark, t):
    t.overwrite(spark.createDataFrame([], "k long, s string, ver long"))
    assert t.read().count() == 0
    assert t.agg_stats([])["n_rows"] == 0
