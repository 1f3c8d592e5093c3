"""Rebase-vs-replan A/B (round 15 — the measured half of the
optimistic-concurrency claim in SCALE.md).

One session, interleaved conditions: a MERGE whose claim loses a
deterministically-injected race against a disjoint-bucket winner is
timed (a) with the optimistic rebase (HEAD behavior — metadata
rebuild + re-claim) and (b) with `_rebase_commit` disabled (the
pre-round-15 behavior: full re-plan, i.e. a second prepare pass with
its staged-write Spark job). The delta is the per-lost-race saving a
high-commit-rate keyed-ingest deployment banks whenever writers shard
by key range.

Run: cd /tmp && python /root/repo/scripts/bench_rebase_ab.py
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
from turnover_odata_etl_spark.storage.snapshot import (  # noqa: E402
    CommitConflict,
)
from turnover_odata_etl_spark.tables import load_table  # noqa: E402

REPS = 3
N_BUCKETS = 8
REPLICAS = 20  # 2M rows — the loser's touched buckets carry real data


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    base = "/tmp/spark_graft_bench/rebase_ab"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ev0 = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull())
        .select(
            F.col("event_id").alias("k"),
            F.col("value").alias("v"),
            F.lit(1).cast("long").alias("ver"),
        )
    )
    mx = ev0.agg(F.max("k")).first()[0]
    if mx is None:
        raise SystemExit(
            f"bench_rebase_ab: no non-null event_ids in {sf_dir} — "
            "point SPARK_GRAFT_SF_DIR at a populated fixture dir"
        )
    span = mx + 1
    ev = (
        ev0.crossJoin(
            spark.range(REPLICAS).withColumnRenamed("id", "rep")
        )
        .select(
            (F.col("k") + F.col("rep") * F.lit(span)).alias("k"),
            "v",
            "ver",
        )
    )

    def bucket_expr(col):
        return F.pmod(F.hash(col), F.lit(N_BUCKETS))

    # loser batch: every bucket EXCEPT the winner's — the realistic
    # wide keyed-ingest batch whose re-plan re-stages millions of
    # rows; winner batch: bucket 1 only
    loser_df = ev.filter(bucket_expr(F.col("k")) != 1).withColumn(
        "ver", F.lit(2).cast("long")
    )
    winner_df = ev.filter(bucket_expr(F.col("k")) == 1).withColumn(
        "ver", F.lit(2).cast("long")
    )
    loser_df.persist().count()
    winner_df.persist().count()

    orig_claim = SnapshotTable._claim
    orig_rebase = SnapshotTable._rebase_commit

    def no_rebase(self, *a, **kw):
        raise CommitConflict("rebase disabled for the A/B")

    results = {"rebase": [], "replan": []}
    for rep in range(REPS):
        for cond in ("rebase", "replan"):  # interleaved
            tdir = os.path.join(base, f"{cond}{rep}")
            shutil.rmtree(tdir, ignore_errors=True)
            t1 = SnapshotTable(
                spark, tdir, key_cols=["k"], order_col="ver",
                n_buckets=N_BUCKETS,
            )
            t2 = SnapshotTable(
                spark, tdir, key_cols=["k"], order_col="ver",
                n_buckets=N_BUCKETS,
            )
            t1.merge(ev)
            armed = {"on": True}

            def racing(self, manifest, new_id, _t1=t1, _t2=t2,
                       _a=armed):
                if _a["on"] and self is _t1:
                    _a["on"] = False
                    _t2.merge(winner_df)
                return orig_claim(self, manifest, new_id)

            SnapshotTable._claim = racing
            SnapshotTable._rebase_commit = (
                orig_rebase if cond == "rebase" else no_rebase
            )
            try:
                t0 = time.perf_counter()
                t1.merge(loser_df)
                wall = time.perf_counter() - t0
            finally:
                SnapshotTable._claim = orig_claim
                SnapshotTable._rebase_commit = orig_rebase
            assert t1.current_id() == 3
            results[cond].append(round(wall, 3))
            shutil.rmtree(tdir, ignore_errors=True)

    out = {
        c: {"min": min(v), "all": v} for c, v in results.items()
    }
    out["saving_s"] = round(
        out["replan"]["min"] - out["rebase"]["min"], 3
    )
    print(json.dumps(out), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
