"""OData V4 delta-link incremental sync → snapshot table (E104).

The connector's server-side CDC story. The order-column incremental
stream (E24, ``sources/odata_source.py``) needs a monotone column the
CLIENT can filter on; many real entity sets have none. OData V4's
change tracking (``Prefer: odata.track-changes``, §8.2.8.6 / §11.3 of
the protocol spec) moves the cursor to the SERVER: a tracked read ends
in a ``@odata.deltaLink``, and each follow-up on that link returns
only what changed — changed/added entities plus ``@removed``
tombstones — ending in a fresh link.

``sync_entity`` composes that with the round-7/8 storage layer:

- each sync is ONE snapshot commit (keep-latest merge on the entity
  key; ``@removed`` entries become tombstone rows the merge's
  ``tombstone_filter`` physically drops);
- the delta link itself is persisted as a COMMIT PROPERTY
  (``odata_delta_link`` — the same Iceberg-snapshot-summary mechanism
  the streaming IVM uses for its watermark), so the sync cursor has
  exactly the table's crash story: the link and the data it produced
  commit atomically, a crash between fetch and commit re-fetches from
  the OLD link and re-merges idempotently (keep-latest absorbs the
  replay);
- within one delta batch, entries apply in WIRE ORDER via a per-row
  ``__sync_seq`` (upsert-then-delete nets to delete, delete-then-re-add
  to upsert — the keep-latest window resolves each key to its last
  entry).

Scale: the initial tracked read is one sequential pager (a delta link
is a cursor over one coherent server snapshot — a partitioned scan
would mint one per partition); every later sync is O(changes) on the
wire and O(touched buckets) on disk. Rows land in wire form (strings),
matching the reference ETL's contract — typed coercion is a downstream
``transform`` concern (reference: src/etl.py:201-209).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..storage import SnapshotTable
from .odata_client import ODataClient

DELTA_LINK_PROP = "odata_delta_link"


def _to_df(
    spark: SparkSession,
    entries: list[tuple[dict, bool]],
    fields: list[str],
    key_field: str,
    seq_base: int,
):
    """Wire entries → merge batch: one row per entry, wire order
    preserved in ``__sync_seq``; deletions carry ``__deleted=True``
    and NULL non-key fields."""
    schema = T.StructType(
        [T.StructField(f, T.StringType(), True) for f in fields]
        + [
            T.StructField("__sync_seq", T.LongType(), False),
            T.StructField("__deleted", T.BooleanType(), False),
        ]
    )
    rows = []
    for i, (entry, deleted) in enumerate(entries):
        vals = [
            None
            if entry.get(f) is None
            else str(entry.get(f))
            for f in fields
        ]
        rows.append((*vals, seq_base + i, deleted))
    return spark.createDataFrame(rows, schema)


def sync_entity(
    spark: SparkSession,
    client: ODataClient,
    entity: str,
    table_dir: str,
    key_field: str,
    fields: list[str],
    n_buckets: int = 8,
    force_full: bool = False,
) -> int:
    """One sync cycle; returns the current snapshot id.

    First call (no stored link): full tracked read → commit snapshot 1
    with the delta link as a commit property. Later calls: follow the
    stored link, merge the ordered changes (tombstones for
    ``@removed``), persist the advanced link on the same commit. A
    row-empty delta commits nothing and keeps the stored link — the
    next sync replays an empty window, which is a no-op by
    construction.

    Recovery (ADVICE r08): the persisted link is the server's absolute
    URL, so a relocated/restarted service (or a server that expired
    the delta token) makes ``fetch_delta`` fail and no follow-up can
    succeed on the stored cursor. ``force_full=True`` rebootstraps:
    one fresh tracked read replaces BOTH the cursor and the state in a
    single atomic commit — fetched rows upsert, keys present in the
    table but absent from the fresh read net-delete (they vanished
    server-side while the cursor was broken; without the anti-join
    they would linger as ghost rows), and the new link lands as the
    same commit's property. Time travel to pre-rebootstrap snapshots
    is preserved; a crash mid-rebootstrap leaves the old link and
    state intact (the commit is the atom)."""
    table = SnapshotTable(
        spark, table_dir, key_cols=[key_field], order_col="__sync_seq",
        n_buckets=n_buckets,
    )
    link = None if force_full else table.latest_property(DELTA_LINK_PROP)
    if link is None:
        rows, new_link = client.fetch_tracked(
            entity, select=",".join(fields)
        )
        seq_base = (table.order_watermark() or 0) + 1
        batch = _to_df(
            spark, [(r, False) for r in rows], fields, key_field, seq_base
        )
        if table.current_id() is not None:
            # Rebootstrap of an existing table: net-delete the keys
            # the fresh read no longer contains. The fetched side is
            # already driver-resident (the pager runs on the driver),
            # but the TABLE side stays distributed — a left-anti join
            # against the fetched keys, never a collect of table keys.
            fetched_keys = spark.createDataFrame(
                [(str(r.get(key_field)),) for r in rows],
                T.StructType(
                    [T.StructField(key_field, T.StringType(), True)]
                ),
            )
            tomb_seq = seq_base + len(rows)
            tombstones = (
                table.read()
                .select(key_field)
                .join(fetched_keys, key_field, "left_anti")
                .select(
                    *[
                        F.col(key_field).alias(f)
                        if f == key_field
                        else F.lit(None).cast("string").alias(f)
                        for f in fields
                    ],
                    F.lit(tomb_seq).cast("long").alias("__sync_seq"),
                    F.lit(True).alias("__deleted"),
                )
            )
            batch = batch.unionByName(tombstones)
        return table.merge(
            batch,
            tombstone_filter="__deleted",
            properties={DELTA_LINK_PROP: new_link},
        )
    changes, new_link = client.fetch_delta(link)
    if not changes:
        return table.current_id()
    seq_base = (table.order_watermark() or 0) + 1
    entries = [
        (c, "@removed" in c or "@odata.removed" in c) for c in changes
    ]
    batch = _to_df(spark, entries, fields, key_field, seq_base)
    return table.merge(
        batch,
        tombstone_filter="__deleted",
        properties={DELTA_LINK_PROP: new_link},
    )


def read_synced(spark: SparkSession, table_dir: str):
    """Current synced state, sync bookkeeping columns dropped."""
    return (
        SnapshotTable.load(spark, table_dir)
        .read()
        .drop("__sync_seq", "__deleted")
    )
