#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution notes: each query materializes via the noop sink (full
computation, no write cost, nothing collected to the driver). A
throwaway warm-up query first absorbs JVM/codegen startup so
per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from turnover_odata_etl_spark.plans import registry  # noqa: E402
from turnover_odata_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_turnover",
    "e1_pricing_summary",
    "e3_star_join_revenue",
    "e4_asof_join",
    "e5_window_running_sum",
    "e6_topk_per_group",
    "t_tfidf_topterms",
    "t_bpe_tokens",
    "d_minhash_lsh_neardup",
    "d_ngram_jaccard",
    "d_embedding_neardup",
    "s_knn_bruteforce",
    "s_knn_ivf",
    "st_tumbling_window",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")

    specs = registry.all_specs()
    # warm-up: JVM + codegen + parquet footer caches, plus the Python
    # worker pool (first mapInPandas otherwise pays daemon spawn +
    # Arrow init inside whichever query hits it first)
    materialize(specs["flagship_turnover"].fn(spark, sf_dir))
    spark.range(1000).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Repeat each query and keep the fastest run: single-shot timings
    # at this scale are dominated by JIT/GC/OS noise (observed ±2×
    # run-to-run on identical plans); min-of-N is the steady-state
    # number the plan actually costs.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            # Drop DataFrames persisted inside operators (e.g. the
            # minhash signature frame): each invocation builds a new
            # lineage, so leftover cache blocks from earlier reps only
            # eat storage memory and skew later timings.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
