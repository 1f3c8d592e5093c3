"""A/B: join_cobucketed vs the plain DataFrame join on the same two
co-bucketed SnapshotTables (round 13 — VERDICT r12 item 4's Done
criterion). Builds the s_join_cobucketed fixture pair (orders +
per-order heavy-line rollup) at the given sf dir, then times

  * A — ``join_cobucketed(t_orders, t_roll, ["o_orderkey"], "left")``
        (zero data exchanges; workers read both buckets' files);
  * B — ``t_orders.read().join(t_roll.read(), ..., "left")``
        (Catalyst plans the exchange/broadcast itself).

Both materialize via the noop sink, min-of-N reps. Also prints the
Exchange/scan counts of each plan. Results recorded in BASELINE.md
round 13.

Usage: python scripts/bench_cobucket_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from turnover_odata_etl_spark.operators.cobucket import (  # noqa: E402
    join_cobucketed,
)
from turnover_odata_etl_spark.session import get_spark  # noqa: E402
from turnover_odata_etl_spark.storage import SnapshotTable  # noqa: E402
from turnover_odata_etl_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/spark_graft_layout/ab/cobucket"
    shutil.rmtree(base, ignore_errors=True)
    t_orders = SnapshotTable(
        spark, os.path.join(base, "orders"),
        key_cols=["o_orderkey"], order_col="__ver", n_buckets=8,
    )
    t_roll = SnapshotTable(
        spark, os.path.join(base, "items_roll"),
        key_cols=["o_orderkey"], order_col="__ver", n_buckets=8,
    )
    orders = load_table(spark, sf_dir, "orders")
    items = load_table(spark, sf_dir, "lineitem")
    t_orders.append(
        orders.select(
            "o_orderkey", "o_orderpriority", F.lit(1).alias("__ver")
        )
    )
    t_roll.append(
        items.filter(F.col("l_quantity") >= 30)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .withColumn("__ver", F.lit(1))
    )

    def build_a():
        return join_cobucketed(
            t_orders, t_roll, ["o_orderkey"], how="left"
        )

    def build_b():
        return (
            t_orders.read()
            .select("o_orderkey", "o_orderpriority")
            .join(
                t_roll.read().select(
                    "o_orderkey", "revenue", "n_items"
                ),
                "o_orderkey",
                "left",
            )
        )

    # plan shapes
    for name, build in (("cobucket", build_a), ("plain", build_b)):
        plan = build()._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "plan": name,
                    "exchanges": plan.count("Exchange"),
                    "parquet_scans": plan.lower().count("scan parquet"),
                }
            )
        )

    def timed(build):
        best = float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    timed(build_b)  # warm-up (JIT, footer caches) outside the record
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "cobucket_sec": timed(build_a),
        "plain_join_sec": timed(build_b),
    }
    # the 100-TB regime proxy: neither side fits a broadcast, so the
    # plain join pays a real shuffle of both tables — the exchange
    # the SPJ removes. (At sf0.1 Catalyst broadcasts the rollup side,
    # which is exactly the right local plan; the comparison that
    # matters at scale is vs the shuffle join.)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = build_b()._jdf.queryExecution().executedPlan().toString()
        out["plain_shuffle_exchanges"] = plan.count("Exchange")
        out["plain_shuffle_join_sec"] = timed(build_b)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    n_a = build_a().count()
    n_b = build_b().count()
    out["rows_equal"] = bool(n_a == n_b)
    out["rows"] = n_a
    print(json.dumps(out))


if __name__ == "__main__":
    main()
