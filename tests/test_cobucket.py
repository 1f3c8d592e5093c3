"""join_cobucketed (round 13 — VERDICT r12 item 4): shuffle-free
co-bucketed snapshot⋈snapshot join. Pins: exact parity with the
plain DataFrame join (inner + left, NULL keys, duplicate keys,
evolved schemas, >2^53 keys), the zero-data-exchange plan shape
(no parquet scan node, single task-frame exchange), and the loud
validation surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.cobucket import (
    join_cobucketed,
    reconcile_cobucketed,
)
from turnover_odata_etl_spark.storage import SnapshotTable


@pytest.fixture()
def pair(spark, tmp_path):
    l = SnapshotTable(
        spark, str(tmp_path / "l"), key_cols=["k"], order_col="ver",
        n_buckets=4,
    )
    r = SnapshotTable(
        spark, str(tmp_path / "r"), key_cols=["k"], order_col="ver",
        n_buckets=4,
    )
    return l, r


def rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple(
            (v is None, str(type(v)), v if v is not None else 0)
            for v in t
        ),
    )


def test_parity_with_plain_join_inner_and_left(spark, pair):
    l, r = pair
    l.append(
        spark.createDataFrame(
            # duplicate key 2, NULL key, NULL payload
            [(1, "a", 1), (2, "b", 1), (2, "b2", 1), (None, "n", 1),
             (7, None, 1)],
            "k long, lv string, ver long",
        )
    )
    r.append(
        spark.createDataFrame(
            [(1, 10.0, 1), (2, 20.0, 1), (2, 21.0, 1), (None, 99.0, 1),
             (8, 80.0, 1)],
            "k long, rv double, ver long",
        )
    )
    for how in ("inner", "left"):
        got = join_cobucketed(l, r, ["k"], how=how)
        assert got.columns == ["k", "lv", "rv"]
        want = (
            l.read()
            .select("k", "lv")
            .join(r.read().select("k", "rv"), on="k", how=how)
        )
        assert rows(got, got.columns) == rows(want, got.columns), how


def test_plan_has_no_scan_and_no_data_exchange(spark, pair):
    l, r = pair
    l.append(
        spark.createDataFrame(
            [(i, f"v{i}", 1) for i in range(40)],
            "k long, lv string, ver long",
        )
    )
    r.append(
        spark.createDataFrame(
            [(i, float(i), 1) for i in range(0, 40, 2)],
            "k long, rv double, ver long",
        )
    )
    df = join_cobucketed(l, r, ["k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower()  # zero JVM-side data scans
    assert plan.count("Exchange") == 1  # only the task-frame round-robin
    # and it still answers correctly
    assert df.count() == 20

    # plain join for contrast: both sides exchange (or at best one
    # broadcasts) and the scans are in-plan — the cost the operator
    # removes
    plain = l.read().select("k", "lv").join(
        r.read().select("k", "rv"), "k"
    )
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in pplan.lower()


def test_big_int_keys_survive_exactly(spark, pair):
    """int64 keys beyond 2^53 would be corrupted by any float64
    round-trip; the arrow-native path must keep them exact."""
    l, r = pair
    big = 2**60 + 1
    l.append(
        spark.createDataFrame(
            [(big, "x", 1), (big + 1, "y", 1)],
            "k long, lv string, ver long",
        )
    )
    r.append(
        spark.createDataFrame(
            [(big, 1.5, 1)], "k long, rv double, ver long"
        )
    )
    got = join_cobucketed(l, r, ["k"]).collect()
    assert [(x["k"], x["lv"], x["rv"]) for x in got] == [
        (big, "x", 1.5)
    ]


def test_schema_evolution_missing_column_reads_null(spark, pair):
    l, r = pair
    l.append(
        spark.createDataFrame(
            [(1, "a", 1)], "k long, lv string, ver long"
        )
    )
    r.append(spark.createDataFrame([(1, 1)], "k long, ver long"))
    # additive evolution on the right: new column rv
    r.append(
        spark.createDataFrame(
            [(2, 2.0, 2)], "k long, rv double, ver long"
        )
    )
    got = join_cobucketed(l, r, ["k"], how="inner").collect()
    # key 1 lives in a pre-evolution file: rv reads as NULL
    assert [(x["k"], x["lv"], x["rv"]) for x in got] == [(1, "a", None)]


def test_projection_and_validation_surface(spark, pair, tmp_path):
    l, r = pair
    l.append(
        spark.createDataFrame(
            [(1, "a", "p", 1)], "k long, lv string, both string, ver long"
        )
    )
    r.append(
        spark.createDataFrame(
            [(1, 2.0, "q", 1)], "k long, rv double, both string, ver long"
        )
    )
    got = join_cobucketed(
        l, r, ["k"], left_cols=["lv"], right_cols=["rv"]
    )
    assert got.columns == ["k", "lv", "rv"]

    with pytest.raises(ValueError, match="collide"):
        join_cobucketed(l, r, ["k"])
    # payload naming a join key duplicates the output column set;
    # unknown payload names refuse with a clear error (review r13)
    with pytest.raises(ValueError, match="collide"):
        join_cobucketed(l, r, ["k"], left_cols=["lv"],
                        right_cols=["k", "rv"])
    with pytest.raises(ValueError, match="unknown payload"):
        join_cobucketed(l, r, ["k"], left_cols=["nope"],
                        right_cols=["rv"])
    with pytest.raises(ValueError, match="unsupported how"):
        join_cobucketed(l, r, ["k"], how="full")

    odd = SnapshotTable(
        spark, str(tmp_path / "odd"), key_cols=["k"],
        order_col="ver", n_buckets=8,
    )
    odd.append(spark.createDataFrame([(1, 1)], "k long, ver long"))
    with pytest.raises(ValueError, match="bucket counts"):
        join_cobucketed(l, odd, ["k"])

    strkey = SnapshotTable(
        spark, str(tmp_path / "strkey"), key_cols=["k"],
        order_col="ver", n_buckets=4,
    )
    strkey.append(
        spark.createDataFrame([("1", 1)], "k string, ver long")
    )
    with pytest.raises(ValueError, match="type"):
        join_cobucketed(l, strkey, ["k"], left_cols=["lv"],
                        right_cols=[])

    lay = SnapshotTable(
        spark, str(tmp_path / "lay"), key_cols=["k", "k2"],
        order_col="ver", n_buckets=4, bucket_cols=["k2"],
    )
    lay.append(
        spark.createDataFrame([(1, 2, 1)], "k long, k2 long, ver long")
    )
    with pytest.raises(ValueError, match="bucketed on exactly"):
        join_cobucketed(l, lay, ["k"], left_cols=["lv"],
                        right_cols=[])


def test_timestamp_payload_roundtrips(spark, pair):
    from datetime import datetime

    l, r = pair
    ts = datetime(2026, 8, 16, 12, 30, 0)
    l.append(
        spark.createDataFrame(
            [(1, ts, 1)], "k long, lts timestamp, ver long"
        )
    )
    r.append(
        spark.createDataFrame([(1, 5.0, 1)], "k long, rv double, ver long")
    )
    got = join_cobucketed(
        l, r, ["k"], left_cols=["lts"], right_cols=["rv"]
    ).collect()
    assert got[0]["lts"] == ts


# ---------------------------------------------------------- round 14


def seed_pair(spark, pair, n=100, overlap_from=50):
    l, r = pair
    l.append(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("lv"),
            F.lit(1).cast("long").alias("ver"),
        )
    )
    r.append(
        spark.range(overlap_from, overlap_from + n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("rv"),
            F.lit(1).cast("long").alias("ver"),
        )
    )
    return l, r


def test_full_outer_parity_with_plain_join(spark, pair):
    l, r = seed_pair(spark, pair)
    got = join_cobucketed(l, r, ["k"], how="full_outer")
    exp = (
        l.read().select("k", "lv")
        .join(r.read().select("k", "rv"), ["k"], "full_outer")
    )
    assert rows(got, ["k", "lv", "rv"]) == rows(exp, ["k", "lv", "rv"])
    # USING semantics: right-only rows still carry their key
    assert got.filter("k IS NULL").count() == 0


def test_max_task_rows_guard_refuses_oversized_buckets(spark, pair):
    """The per-task memory bound (r13 verdict nit): manifest row
    counts predict the violation BEFORE any worker reads data, and
    the error names the mitigation."""
    l, r = seed_pair(spark, pair)
    with pytest.raises(ValueError, match="rebucket"):
        join_cobucketed(l, r, ["k"], max_task_rows=10)
    # disabled guard still works
    assert join_cobucketed(l, r, ["k"], max_task_rows=None).count() == 50


def test_dv_entries_are_masked(spark, pair):
    """Merge-on-read deleted rows can never resurrect through the
    Arrow-side read: the task ships sidecar refs and masks positions
    before the join (round 14)."""
    l, r = seed_pair(spark, pair)
    l.delete_where("k BETWEEN 60 AND 69", mode="mor")
    r.delete_keys(
        spark.createDataFrame([(75,), (80,)], "k long"), mode="mor"
    )
    got = join_cobucketed(l, r, ["k"])
    exp = (
        l.read().select("k", "lv")
        .join(r.read().select("k", "rv"), ["k"])
    )
    assert rows(got, ["k", "lv", "rv"]) == rows(exp, ["k", "lv", "rv"])
    assert got.count() == 50 - 10 - 2


def test_suffixes_disambiguate_colliding_payloads(spark, pair):
    l, r = pair
    l.append(
        spark.createDataFrame([(1, 10, 1)], "k long, x long, ver long")
    )
    r.append(
        spark.createDataFrame([(1, 99, 1)], "k long, x long, ver long")
    )
    with pytest.raises(ValueError, match="collide"):
        join_cobucketed(l, r, ["k"])
    got = join_cobucketed(l, r, ["k"], suffixes=("_l", "_r")).collect()
    assert sorted(got[0].asDict().items()) == [
        ("k", 1), ("x_l", 10), ("x_r", 99),
    ]


def test_reconcile_reports_drift_only(spark, pair):
    """The shipped join_cobucketed consumer (r13 verdict item 6):
    keyed drift between two co-laid-out tables — matching rows drop,
    NULL payloads compare null-safely, the three statuses cover
    presence and value drift."""
    l, r = pair
    l.append(
        spark.createDataFrame(
            [(1, 10, 1), (2, None, 1), (3, 30, 1), (4, 40, 1)],
            "k long, lv long, ver long",
        )
    )
    r.append(
        spark.createDataFrame(
            # 1 matches, 2 matches null-safely, 3 differs, 5 right-only
            [(1, 10, 7), (2, None, 7), (3, 31, 7), (5, 50, 7)],
            "k long, lv long, ver long",
        )
    )
    got = sorted(
        (row["k"], row["status"])
        for row in reconcile_cobucketed(l, r, ["k"]).collect()
    )
    assert got == [
        (3, "differs"), (4, "left_only"), (5, "right_only"),
    ]
