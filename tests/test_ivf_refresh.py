"""ivf_refresh (round 13 — VERDICT r12 item 5): codebook re-train +
posting rebalance as one overwrite commit. Pins: rows preserved
(multiset of (nid, vec)), cells consistent with the returned
codebook, probe-pruned reads still work post-refresh, and recall
RECOVERS on a corpus whose wave-1 codebook was trained on a
non-representative first wave (the measured frozen-codebook gap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.similarity import (
    assign_to_centroids,
    cosine_topk,
    ivf_probe_cells,
    ivf_refresh,
    kmeans_assign,
    topk_from_cells,
)
from turnover_odata_etl_spark.storage import SnapshotTable


def _clustered_vectors(rng, n_per, dim=8):
    """Four well-separated axis clusters with small wobble — the
    geometry where a codebook trained on ONE cluster costs recall
    and a whole-corpus re-train recovers it."""
    vecs = []
    nid = 0
    for axis in range(4):
        for _ in range(n_per):
            v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
            v[axis] = 1.0
            vecs.append((nid, [float(x) for x in v], axis))
            nid += 1
    return vecs


@pytest.fixture()
def index_and_vecs(spark, tmp_path):
    import random

    rng = random.Random(13)
    vecs = _clustered_vectors(rng, 25)
    idx = SnapshotTable(
        spark, str(tmp_path / "ivf"), key_cols=["cell", "nid"],
        order_col="__ver", n_buckets=4, bucket_cols=["cell"],
    )
    all_df = spark.createDataFrame(
        [(n, v) for n, v, _ in vecs], "nid long, vec array<float>"
    )
    # wave 1 = ONLY cluster 0 (the non-representative first wave):
    # the frozen codebook splits cluster 0 into 4 cells and every
    # later cluster lands wherever
    w1 = spark.createDataFrame(
        [(n, v) for n, v, a in vecs if a == 0],
        "nid long, vec array<float>",
    )
    _, cents0 = kmeans_assign(w1, 4)
    for ver, axis in ((1, 0), (2, 1), (3, 2), (4, 3)):
        wave = spark.createDataFrame(
            [(n, v) for n, v, a in vecs if a == axis],
            "nid long, vec array<float>",
        )
        idx.append(
            assign_to_centroids(wave, cents0)
            .select("cell", "nid", "vec")
            .withColumn("__ver", F.lit(ver))
        )
    return idx, cents0, all_df


def _recall_at_k(spark, idx, cents, all_df, k=5, nprobe=1):
    q = all_df.filter(F.col("nid") < 12).select(
        F.col("nid").alias("query_id"), "vec"
    )
    probes = ivf_probe_cells(q, cents, nprobe=nprobe)
    pruned = idx.read_matching(probes.select("cell"))
    approx = topk_from_cells(probes, pruned, k=k)
    exact = cosine_topk(
        all_df.filter(F.col("nid") < 12).selectExpr(
            "nid as vec_id", "vec as embedding"
        ),
        all_df.selectExpr("nid as vec_id", "vec as embedding"),
        "vec_id", "embedding", k=k,
    )
    a = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    e = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    return len(a & e) / len(e)


def test_refresh_preserves_rows_and_reassigns_cells(
    spark, index_and_vecs
):
    idx, cents0, all_df = index_and_vecs
    before = sorted(
        (r["nid"], tuple(r["vec"])) for r in idx.read().collect()
    )
    pre_sid = idx.current_id()
    cents = ivf_refresh(idx, n_cells=4)
    assert cents is not None and cents.shape[0] == 4
    assert idx.current_id() == pre_sid + 1  # ONE maintenance commit
    after_rows = idx.read().collect()
    after = sorted((r["nid"], tuple(r["vec"])) for r in after_rows)
    assert after == before  # row multiset preserved

    # every stored cell equals the fresh argmax assignment
    want = {
        r["nid"]: r["cell"]
        for r in assign_to_centroids(
            idx.read().select("nid", "vec"), cents
        ).collect()
    }
    got = {r["nid"]: r["cell"] for r in after_rows}
    assert got == want

    m = idx._manifest(idx.current_id())
    assert m["operation"] == "ivf-refresh"
    assert m["properties"]["ivf.refresh.cells"] == "4"


def test_refresh_recovers_recall_and_probe_prune_survives(
    spark, index_and_vecs, monkeypatch
):
    idx, cents0, all_df = index_and_vecs
    r_before = _recall_at_k(spark, idx, cents0, all_df)
    cents = ivf_refresh(idx, n_cells=4)
    r_after = _recall_at_k(spark, idx, cents, all_df)
    # the wave-1 codebook was trained on one cluster: nprobe=1 search
    # misses heavily; the re-trained codebook gives one cell per true
    # cluster and recall goes (near-)perfect
    assert r_after >= r_before
    assert r_after >= 0.9

    # probe-pruned reads still open fewer files than the whole index
    q = all_df.filter(F.col("nid") < 4).select(
        F.col("nid").alias("query_id"), "vec"
    )
    probes = ivf_probe_cells(q, cents, nprobe=1)
    pruned = idx.read_matching(probes.select("cell"))
    all_files = {
        f["path"]
        for f in idx._manifest(idx.current_id())["files"]
        if f["rows"]
    }
    opened = set(pruned.inputFiles())
    assert 0 < len(opened) < len(all_files)


def test_refresh_empty_index_returns_none(spark, tmp_path):
    idx = SnapshotTable(
        spark, str(tmp_path / "empty"), key_cols=["cell", "nid"],
        order_col="__ver", n_buckets=4, bucket_cols=["cell"],
    )
    idx.append(
        spark.createDataFrame(
            [], "cell long, nid long, vec array<float>, __ver long"
        )
    )
    sid = idx.current_id()
    assert ivf_refresh(idx, n_cells=4) is None
    assert idx.current_id() == sid  # no commit on empty


def test_refresh_sample_fraction_trains_on_subset(
    spark, index_and_vecs
):
    """fit-on-a-sample: a 50% training sample still yields a
    4-centroid codebook and a full reassignment (rows preserved)."""
    idx, _, all_df = index_and_vecs
    n_before = idx.read().count()
    cents = ivf_refresh(idx, n_cells=4, sample_fraction=0.5)
    assert cents is not None
    assert idx.read().count() == n_before
