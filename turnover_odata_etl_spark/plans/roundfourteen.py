"""Round-14 STAGED queries — held for a cap ruling (the r13 verdict
froze the registry at 215; precedent is the roundeight→roundthirteen
lifecycle: stage with oracles + bench history + empty-sweep coverage,
register when a verdict rules).

``s_snapshot_dv_delete`` — merge-on-read deletion vectors (VERDICT
r13 item 2 / SURVEY E121, ``SnapshotTable.delete_where(mode="mor")``
/ ``delete_keys(mode="mor")``): the Iceberg v2 positional-delete /
Delta deletion-vector capability. A MOR delete writes O(matched
rows) of (file, position) pairs to ONE sidecar parquet and re-points
manifest entries — data files are NEVER rewritten; readers anti-join
the positions back out; compaction folds them into data files. The
lifecycle query bootstraps events as three id-sliced appends, runs a
predicate MOR delete (the value window) and a keyed MOR delete
(every seventh id — the GDPR batch shape), then returns the
surviving aggregate THREE ways: through the position-merging read
(label ``mor``), after ``compact()`` folds the vectors into data
files (label ``folded``), and as a ``contract`` row pinning that the
deletes rewrote ZERO data files while ``agg_stats``'s manifest-only
live-row count matches the oracle's survivor count exactly. Any
divergence between vector-merged reads, folded reads, metadata
counts, and the SQL answer hash-fails.

Mechanism deep-dives (chain folding, crash injection, GC
reachability, CDC across a dv flip, COW parity on every read path)
live in tests/test_snapshot_dv.py.

Activation checklist (mirror of roundthirteen's, executed at ruling):
1. move the specs into ``@register`` form (oracles are eager
   constants), import roundfourteen in ``plans/__init__``,
2. add them to the gate window for their first round,
3. move STAGED_R14 → ADDITIONS_R14 in bench.py,
4. remove the staged empty-sweep block (tests/test_empty_input.py),
5. grep ``'== 21[0-9]'`` across tests/ — registry-count pins live in
   test_roundeight/test_roundnine/test_roundthirteen,
6. plan-audit adjudications: the dv lifecycle's contract row is a
   1-row local frame (manifest metadata by design); the aggregate
   rows are two full-table aggregates over the small snapshot table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import QuerySpec
from .roundthirteen import _append_id_slices

DV_DELETE_ORACLE = """
    WITH survivors AS (
      SELECT event_type, value FROM events
      WHERE NOT ((value BETWEEN 100 AND 250) IS TRUE)
        AND (event_id IS NULL OR event_id % 7 <> 0)
    ), agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS s
      FROM survivors GROUP BY event_type
    ), c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_live FROM survivors
    )
    SELECT 'mor' AS label, event_type, n, s FROM agg
    UNION ALL
    SELECT 'folded', event_type, n, s FROM agg
    UNION ALL
    SELECT 'contract', NULL, CAST(0 AS BIGINT),
           CAST(n_live AS DOUBLE)
    FROM c
"""


def s_snapshot_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletion-vector lifecycle (SURVEY E121): three
    id-sliced appends, a predicate MOR delete, a keyed MOR delete,
    then the surviving per-type aggregate through the position-
    merging read (``mor``), again after ``compact()`` folds the
    vectors (``folded``), plus a ``contract`` row: n = data files
    REWRITTEN by the two deletes (must be 0 — the whole point), s =
    ``agg_stats``'s manifest-only live-row count (must equal the
    oracle's survivor count).

    Plan shape: the MOR deletes write O(matched positions); each
    read is one scan + one broadcast anti-join on the native
    ``(_metadata.file_name, _metadata.row_index)`` pair — no
    shuffle, no Python. At 100 TB this is the weekly GDPR batch
    deleting kilobytes instead of rewriting terabytes."""
    import os
    import shutil

    from ..storage import SnapshotTable

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/dv_delete"
    shutil.rmtree(base, ignore_errors=True)
    t = SnapshotTable(
        spark, os.path.join(base, "events"),
        key_cols=["event_id"], order_col="__ver", n_buckets=8,
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    row = ev.agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx")
    ).first()
    mn, mx = row["mn"], row["mx"]
    out_schema = (
        "label string, event_type string, n long, s double"
    )
    if mn is None:
        return spark.createDataFrame([], out_schema)
    _append_id_slices(t, ev, mn, mx)
    before = {f["path"] for f in t.files()}
    t.delete_where("value BETWEEN 100 AND 250", mode="mor")
    t.delete_keys(
        ev.filter(F.col("event_id") % 7 == 0).select("event_id"),
        mode="mor",
    )
    rewritten = len({f["path"] for f in t.files()} - before)
    n_live = t.agg_stats()["n_rows"]  # manifest-only live count

    def agg(label: str) -> DataFrame:
        return (
            t.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
            )
            .select(F.lit(label).alias("label"), "event_type", "n", "s")
        )

    mor = agg("mor")
    t.compact(min_files=999)  # fold: only dv-carrying buckets qualify
    folded = agg("folded")
    contract = spark.createDataFrame(
        [("contract", None, rewritten, float(n_live))], out_schema
    )
    return mor.unionByName(folded).unionByName(contract)


# Staged specs — same shape the registry holds, NOT registered (cap).
STAGED: dict[str, QuerySpec] = {
    "s_snapshot_dv_delete": QuerySpec(
        name="s_snapshot_dv_delete",
        fn=s_snapshot_dv_delete,
        oracle=DV_DELETE_ORACLE,
        tags=("storage", "snapshot", "delete", "dv"),
    ),
}
