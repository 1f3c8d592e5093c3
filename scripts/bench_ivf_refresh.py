"""Recall A/B for ivf_refresh (round 13 — VERDICT r12 item 5's Done
criterion): rebuild the s_knn_ivf_persistent index (three id-tercile
waves, frozen wave-1 16-cell codebook), measure recall@5 for the
first 20 queries with nprobe=4, then run ``ivf_refresh`` (whole-
corpus re-train + posting rebalance, one overwrite commit) and
measure again with the new codebook. Target: recover the measured
frozen-codebook gap (75/70/92% at sf0.001/0.01/0.1) toward the
whole-corpus k-means class. Results recorded in SCALE.md round 13.

Usage: python scripts/bench_ivf_refresh.py [sf_dir ...]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from turnover_odata_etl_spark.operators.similarity import (  # noqa: E402
    assign_to_centroids,
    cosine_topk,
    ivf_probe_cells,
    ivf_refresh,
    kmeans_assign,
    topk_from_cells,
)
from turnover_odata_etl_spark.plans.roundten import (  # noqa: E402
    _exact_order_stats,
)
from turnover_odata_etl_spark.session import get_spark  # noqa: E402
from turnover_odata_etl_spark.storage import SnapshotTable  # noqa: E402
from turnover_odata_etl_spark.tables import load_table  # noqa: E402


def recall(spark, index, cents, emb, k=5, nprobe=4):
    queries = emb.filter(F.col("vec_id") < 20)
    q = queries.select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding").alias("vec"),
    )
    probes = ivf_probe_cells(q, cents, nprobe=nprobe)
    pruned = index.read_matching(probes.select("cell"))
    approx = topk_from_cells(probes, pruned, k=k)
    exact = cosine_topk(queries, emb, "vec_id", "embedding", k=k)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    return round(100.0 * len(a & e) / len(e), 1)


def run(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/ab/ivf_refresh/{tag}"
    shutil.rmtree(base, ignore_errors=True)
    index = SnapshotTable(
        spark, os.path.join(base, "postings"),
        key_cols=["cell", "nid"], order_col="__ver", n_buckets=8,
        bucket_cols=["cell"],
    )
    vecs = emb.select(
        F.col("vec_id").cast("long").alias("nid"),
        F.col("embedding").alias("vec"),
    )
    n1 = math.ceil(n / 3.0)
    n2 = n1 + math.ceil((n - n1) / 2.0)
    cuts = _exact_order_stats(vecs, "nid", [n1, n2])
    cut1, cut2 = cuts[n1], cuts.get(n2, cuts[n1])
    w1 = vecs.filter(F.col("nid") <= cut1)
    _, cents0 = kmeans_assign(w1, 16)
    for lo, hi, ver in ((None, cut1, 1), (cut1, cut2, 2), (cut2, None, 3)):
        chunk = vecs
        if lo is not None:
            chunk = chunk.filter(F.col("nid") > lo)
        if hi is not None:
            chunk = chunk.filter(F.col("nid") <= hi)
        index.append(
            assign_to_centroids(chunk, cents0)
            .select("cell", "nid", "vec")
            .withColumn("__ver", F.lit(ver))
        )
    r_before = recall(spark, index, cents0, emb)
    t0 = time.perf_counter()
    cents = ivf_refresh(index, n_cells=16)
    refresh_sec = round(time.perf_counter() - t0, 3)
    r_after = recall(spark, index, cents, emb)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "recall_frozen_pct": r_before,
                "recall_refreshed_pct": r_after,
                "refresh_sec": refresh_sec,
            }
        )
    )


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        run(spark, d)


if __name__ == "__main__":
    main()
