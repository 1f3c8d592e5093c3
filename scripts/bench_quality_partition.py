#!/usr/bin/env python
"""A/B: train_quality_lr's persisted feature frame in SCAN layout vs
PRE-PARTITIONED on id (VERDICT r15 item 7 / BASELINE.md round 16).

Each step of the fit aggregates the broadcast-joined frame on id and
joins the margin back on id; with the cache laid out as
hashpartitioning(id) both reuse the cached layout instead of
re-exchanging the full frame. This measures the per-fit wall clock
for both layouts, INTERLEAVED in one session (the r13 adjudication
method — alternating reps cancel box-load drift), min-of-N.

Usage: python scripts/bench_quality_partition.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from turnover_odata_etl_spark.operators.quality import (  # noqa: E402
    _weights_frame,
    hashed_ngram_features,
    lexicon_weak_label,
)
from turnover_odata_etl_spark.session import get_spark  # noqa: E402
from turnover_odata_etl_spark.tables import load_table  # noqa: E402

LEX = ("table", "query", "join", "scan", "group")
STEPS = 24
D = 1024


def fit(spark, feats, labels, repart: bool) -> float:
    """One full fit, returning wall seconds. Mirrors
    train_quality_lr step-for-step with the cache layout as the only
    variable."""
    import math

    t0 = time.time()
    stats = labels.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    ).first()
    n, sy = int(stats["n"]), float(stats["sy"] or 0.0)
    w = [0.0] * (D + 1)
    w[D] = math.log((sy + 0.5) / (n - sy + 0.5))
    p0 = 1.0 / (1.0 + math.exp(-w[D]))
    s = feats.groupBy(F.col("id").alias("sid")).agg(
        F.sum("x").alias("s")
    )
    fl = (
        feats.join(labels, feats["id"] == labels["id"], "inner")
        .join(s, feats["id"] == s["sid"])
        .select(feats["id"].alias("id"), "j", "x", "y", "s")
    )
    if repart:
        fl = fl.repartition("id")
    fl = fl.persist()
    try:
        hess = {
            int(r["j"]): float(r["h"])
            for r in fl.groupBy("j")
            .agg((F.lit(0.25) * F.sum(F.col("x") * F.col("s"))).alias("h"))
            .collect()
        }
        for step in range(STEPS):
            if step == 0:
                resid = fl.select(
                    "id", "j", "x", (F.col("y") - F.lit(p0)).alias("r")
                )
            else:
                wf = F.broadcast(_weights_frame(spark, w))
                z = (
                    fl.join(wf, "j")
                    .groupBy(F.col("id").alias("zid"))
                    .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
                )
                p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                resid = fl.join(z, fl["id"] == z["zid"]).select(
                    "id", "j", "x", (F.col("y") - p).alias("r")
                )
            grad = (
                resid.groupBy("j")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
                .collect()
            )
            for row in grad:
                j = int(row["j"])
                w[j] += 1.8 * float(row["g"]) / (hess[j] + 1e-3)
    finally:
        fl.unpersist()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        lexicon_weak_label(docs, LEX, 0.18).alias("y"),
    )
    feats = hashed_ngram_features(docs, n_buckets=D)
    fit(spark, feats, labels, repart=True)  # warm-up (codegen, IO)
    times = {"scan_layout": [], "repartition_id": []}
    for _ in range(reps):  # interleaved — load drift cancels
        times["scan_layout"].append(fit(spark, feats, labels, False))
        times["repartition_id"].append(fit(spark, feats, labels, True))
    out = {
        k: {"min": round(min(v), 2), "all": [round(x, 2) for x in v]}
        for k, v in times.items()
    }
    import json

    print(json.dumps({"sf_dir": sf_dir, "steps": STEPS, **out}))


if __name__ == "__main__":
    main()
