"""Repeatable bloom-prune measurement (round 13 — the SCALE.md
round-13 table's source): builds the s_snapshot_bloom_pruned_delete
construction (events + a 16-char-shared-prefix email column, three
appends) twice — without and with ``bloom_cols`` — and measures the
files opened + wall time of ONE email-equality delete through a
reader spy. Prefix stats are blind by construction, so the with/
without delta is pure bloom effect.

Usage: python scripts/bench_bloom_prune.py [sf_dir]
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


def build(spark, sf_dir, bloom: bool):
    base = f"/tmp/spark_graft_layout/ab/bloomprune_{int(bloom)}"
    shutil.rmtree(base, ignore_errors=True)
    t = SnapshotTable(
        spark, base, key_cols=["event_id"], order_col="__ver",
        n_buckets=8, bloom_cols=(["email"] if bloom else None),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value",
        F.concat(
            F.lit("customer-record-"),
            F.col("event_id").cast("string"),
            F.lit("@example.com"),
        ).alias("email"),
    )
    row = ev.agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx")
    ).first()
    mn, mx = row["mn"], row["mx"]
    span = max(1, (mx - mn + 1) // 3)
    for w in range(3):
        lo = mn + w * span
        hi = mx if w == 2 else mn + (w + 1) * span - 1
        t.append(
            ev.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
            ).withColumn("__ver", F.lit(w + 1))
        )
    return t, mn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for bloom in (False, True):
        t, mn = build(spark, sf_dir, bloom)
        n_files = len(
            [f for f in t._manifest(t.current_id())["files"] if f["rows"]]
        )
        opened: list[str] = []
        real = type(spark.read).parquet

        def spy(reader, *paths):
            opened.extend(paths)
            return real(reader, *paths)

        type(spark.read).parquet = spy
        t0 = time.perf_counter()
        t.delete_where(
            f"email = 'customer-record-{mn}@example.com'"
        )
        dt = round(time.perf_counter() - t0, 3)
        type(spark.read).parquet = real
        data = [
            p for p in opened if p.endswith(".parquet") and "/data/" in p
        ]
        print(
            json.dumps(
                {
                    "bloom": bloom,
                    "table_files": n_files,
                    "files_opened": len(data),
                    "delete_sec": dt,
                }
            )
        )


if __name__ == "__main__":
    main()
