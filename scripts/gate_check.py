"""Simulate the driver's correctness gate locally.

Builds a VANILLA SparkSession (deliberately NOT session.get_spark — the
driver's harness brings its own session, so every query must be
self-sufficient: round 1 failed 9 queries because events.parquet needs
spark.sql.legacy.parquet.nanosAsLong and only our factory set it), runs
the first N registered queries at sf0.01, and compares each against its
DuckDB oracle with the same row-count + sorted-column + value check the
driver applies.

Usage: python scripts/gate_check.py [N | name1,name2,...] [sf_dir]

The first argument is either a count (audit the first N registrations —
the driver's window is the first 50) or a comma-separated list of query
names (targeted re-verification, e.g. the registered codec queries
after a functions/{jpeg,multimodal}.py edit).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb
from pyspark.sql import SparkSession

from turnover_odata_etl_spark.plans import registry
from oracle_utils import compare_spark_vs_oracle

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sel = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gate_check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    all_specs = registry.all_specs()
    if sel.isdigit():
        specs = list(all_specs.items())[: int(sel)]
    else:
        names = [s for s in sel.split(",") if s]
        unknown = [s for s in names if s not in all_specs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        specs = [(s, all_specs[s]) for s in names]
    results: dict[str, dict] = {}
    failed = []

    # Driver t1 smoke: entry(spark) must run on the vanilla session and
    # return rows with a stable schema (the driver collects it).
    try:
        import __spark_entry__ as entry_mod

        edf = entry_mod.entry(spark)
        erows = edf.count()
        print(f"[ok] __entry_smoke__ ({erows} rows)", flush=True)
    except Exception as e:
        failed.append("__entry_smoke__")
        results["__entry_smoke__"] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
        traceback.print_exc(limit=3)
    for name, spec in specs:
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                cnt = sdf.count()
                results[name] = {"ok": True, "rows_only": True, "rows": cnt}
            else:
                compare_spark_vs_oracle(sdf, con, spec.oracle, name)
                results[name] = {"ok": True}
        except Exception as e:
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            failed.append(name)
            traceback.print_exc(limit=3)
        results[name]["sec"] = round(time.time() - t0, 2)
        status = "ok" if results[name]["ok"] else "FAIL"
        print(f"[{status}] {name} ({results[name]['sec']}s)", flush=True)

    print(json.dumps({"n": len(specs), "failed": failed}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
