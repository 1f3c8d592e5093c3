"""Same-fixture A/B for the three confounded r05 bench deltas
(VERDICT r05 "What's wrong" #2 / "Next round" #2).

The r05 driver bench crossed a fixture regeneration AND two deliberate
plan changes (the ensure_parallelism fan-out on CPU-bound inputs; the
forced-broadcast -> size-guarded-hint switch), so three apparent
regressions could not be attributed from the artifact alone:
d_embedding_neardup 0.62->1.32 s, s_knn_bruteforce 0.54->0.93 s, and
the streaming trio +25-31%. This script produces the determination on
the CURRENT (stamped) fixtures:

  * condition A — HEAD as-is, min-of-N (bench.py methodology);
  * condition B — ensure_parallelism patched to identity (the ONLY
    code delta vs r04 on these two queries' own path), min-of-N;
  * streaming — the bench streaming section run R times end-to-end
    (each min-of-N) to measure the spread the section shows with ZERO
    code change.

A-B isolates the fan-out repartition's fixture-scale cost; B vs the
r04 record (same code path) isolates regeneration+noise. Results are
recorded in BASELINE.md ("Round 6: bench determination").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turnover_odata_etl_spark import tables  # noqa: E402
from turnover_odata_etl_spark.operators import similarity  # noqa: E402
from turnover_odata_etl_spark.plans import llm, registry  # noqa: E402
from turnover_odata_etl_spark.session import get_spark  # noqa: E402

AB_QUERIES = ["d_embedding_neardup", "s_knn_bruteforce"]
STREAMING = ["st_tumbling_window", "st_session_window", "st_incremental_upsert"]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def min_of(spark, fn, sf_dir, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
    spark = get_spark(app_name="bench_ab")
    specs = registry.all_specs()

    # Warm-up identical to bench.py.
    materialize(specs["flagship_turnover"].fn(spark, sf_dir))
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict = {"fixtures": {}}
    for t in ("documents", "lineitem", "embeddings", "events"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        out["fixtures"][t] = {"bytes": st.st_size, "mtime": int(st.st_mtime)}

    # Condition A: HEAD as-is. Several rounds for spread.
    out["A"] = {
        n: [min_of(spark, specs[n].fn, sf_dir, reps) for _ in range(rounds)]
        for n in AB_QUERIES
    }

    # Condition B: ensure_parallelism -> identity at every import site.
    real = tables.ensure_parallelism
    ident = lambda df, min_partitions=None: df  # noqa: E731
    for mod in (tables, similarity, llm):
        mod.ensure_parallelism = ident
    try:
        out["B_no_fanout"] = {
            n: [
                min_of(spark, specs[n].fn, sf_dir, reps)
                for _ in range(rounds)
            ]
            for n in AB_QUERIES
        }
    finally:
        for mod in (tables, similarity, llm):
            mod.ensure_parallelism = real

    # Streaming: the bench section end-to-end, R times, zero code delta.
    ckpt_root = tempfile.mkdtemp(prefix="spark_graft_ab_ckpt_")
    spark.conf.set("spark.sql.streaming.checkpointLocation", ckpt_root)
    try:
        materialize(specs["st_tumbling_window"].fn(spark, sf_dir))  # warm-up
        out["streaming"] = {n: [] for n in STREAMING}
        for _ in range(rounds):
            for n in STREAMING:
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    materialize(specs[n].fn(spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                out["streaming"][n].append(round(best, 3))
    finally:
        spark.conf.unset("spark.sql.streaming.checkpointLocation")
        shutil.rmtree(ckpt_root, ignore_errors=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
