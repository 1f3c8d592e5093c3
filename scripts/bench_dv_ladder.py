"""DV read-tax scale ladder (round 15 — VERDICT r14 item 7).

The merge-on-read read path costs ONE broadcast anti-join on the
native (file_name, row_index) pair; round 14 measured it only at
1-row deletes. This script measures what a 100-TB operator needs to
set ``maintenance_plan(max_delete_ratio)``: full-scan aggregate wall
against UN-COMPACTED position counts of 0 / 10^3 / 10^5 / 10^6 /
2.2x10^6 (the last crosses ``DV_BROADCAST_MAX`` = 2x10^6, where the
read drops the broadcast hint and lets AQE pick the join), the
per-rung MOR delete wall + dv sidecar bytes, and the post-``compact``
recovery wall.

Corpus: events at $SPARK_GRAFT_SF_DIR replicated 50x with shifted ids
(5M rows at sf0.1) — big enough that the rung deltas are join tax,
not noise. One JSON line per rung; paste the table into SCALE.md.

Run: cd /tmp && python /root/repo/scripts/bench_dv_ladder.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from turnover_odata_etl_spark.session import get_spark  # noqa: E402
from turnover_odata_etl_spark.storage import SnapshotTable  # noqa: E402
from turnover_odata_etl_spark.tables import load_table  # noqa: E402

REPLICAS = 50
RUNGS = [1_000, 100_000, 1_000_000, 2_200_000]  # cumulative positions
REPS = 3


def read_wall(t: SnapshotTable) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        t.read().agg(
            F.count(F.lit(1)), F.sum("value")
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def dv_bytes(table_dir: str) -> int:
    total = 0
    data = os.path.join(table_dir, "data")
    for name in os.listdir(data):
        if "dv-" in name:
            total += os.path.getsize(os.path.join(data, name))
    return total


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    base = "/tmp/spark_graft_bench/dv_ladder"
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).filter(F.col("event_id").isNotNull())
    span = ev.agg(F.max("event_id")).first()[0] + 1
    big = (
        ev.crossJoin(
            spark.range(REPLICAS).withColumnRenamed("id", "rep")
        )
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(span)).alias(
                "event_id"
            ),
            "event_type",
            "value",
        )
        .withColumn("__ver", F.lit(1).cast("long"))
    )
    table_dir = os.path.join(base, "events")
    t = SnapshotTable(
        spark, table_dir,
        key_cols=["event_id"], order_col="__ver", n_buckets=16,
    )
    t.append(big)
    n = t.read().count()
    print(json.dumps({"rows": n, "replicas": REPLICAS}), flush=True)

    out = [{"positions": 0, "read_s": read_wall(t), "delete_s": None,
            "dv_bytes": 0}]
    print(json.dumps(out[-1]), flush=True)

    done = 0
    for target in RUNGS:
        if target > n:
            break
        k = target - done
        # a contiguous id slab not yet deleted: [done, done + k)
        keys = spark.range(done, done + k).select(
            F.col("id").alias("event_id")
        )
        b0 = dv_bytes(table_dir)
        t0 = time.perf_counter()
        t.delete_keys(keys, mode="mor")
        d = round(time.perf_counter() - t0, 3)
        done = target
        rung = {
            "positions": done,
            "read_s": read_wall(t),
            "delete_s": d,
            "dv_bytes": dv_bytes(table_dir) - b0,
            "broadcast": done <= 2_000_000,
        }
        out.append(rung)
        print(json.dumps(rung), flush=True)

    t0 = time.perf_counter()
    t.compact(min_files=999)  # fold every dv into data files
    c = round(time.perf_counter() - t0, 3)
    rung = {
        "positions": "post-compact",
        "read_s": read_wall(t),
        "compact_s": c,
    }
    out.append(rung)
    print(json.dumps(rung), flush=True)
    print(json.dumps({"ladder": out}), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
