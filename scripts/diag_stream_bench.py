#!/usr/bin/env python
"""Diagnose the r02 driver-bench regression on st_tumbling_window.

Times the streaming query repeatedly under three conditions:
  A) as bench.py r02 ran it (clearCache after every rep, temp checkpoint)
  B) no clearCache between reps
  C) explicit pre-created checkpoint root (no clearCache)
Prints per-rep wall times so we can see warm-up vs steady-state.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turnover_odata_etl_spark.plans import registry  # noqa: E402
from turnover_odata_etl_spark.session import get_spark  # noqa: E402


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="diag-stream")
    specs = registry.all_specs()
    fn = specs["st_tumbling_window"].fn

    # warm-up (mirrors bench.py)
    materialize(specs["flagship_turnover"].fn(spark, sf_dir))
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    reps = 4
    for label, clear, ckpt in (
        ("A clearCache+tempckpt", True, None),
        ("B noclear+tempckpt", False, None),
        ("C noclear+fixedckpt", False, tempfile.mkdtemp(prefix="ckpt_")),
    ):
        if ckpt:
            spark.conf.set("spark.sql.streaming.checkpointLocation", ckpt)
        else:
            spark.conf.unset("spark.sql.streaming.checkpointLocation")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            if clear:
                spark.catalog.clearCache()
        print(f"{label}: {times} min={min(times)}", file=sys.stderr)


if __name__ == "__main__":
    main()
