"""Shuffle-free co-bucketed snapshot join (round 13 — VERDICT r12
item 4; the public capability is Spark's storage-partitioned join
for v2 sources, SPARK-37375): when two :class:`SnapshotTable`\\ s
share the layout hash (same ``n_buckets``, bucketed on the join
keys, same key types), every join key lives in the SAME bucket
ordinal on both sides — so the join can zip equal-bucket file groups
and never exchange either table.

Mechanism: one task per bucket, carried by an ``n_buckets``-row task
frame (bucket id + both sides' file lists — manifest METADATA, never
data). ``mapInArrow`` fans the tasks out; each worker reads its
bucket's files from BOTH tables through pyarrow (the split-local
read a storage-partitioned join does on a cluster: tasks read
co-located splits, the exchange never happens) and joins them with
Acero's hash join — Arrow end-to-end, so big int64 keys never round
through float64 and NULL handling is exact. The only Exchange in the
Catalyst plan is the round-robin of the task frame — ``n_buckets``
rows; the data path has zero exchanges and zero JVM-side scans
(plan-asserted in tests/test_cobucket.py).

Why not DataFrame ``join``: Catalyst has no way to learn that two
parquet path sets are co-partitioned (bucketed DataSource tables
need the session catalog + ``bucketBy`` writers; our snapshot layout
is manifest-defined), so ``left.read().join(right.read())`` always
exchanges BOTH sides — the dominant cost of every index-maintenance
join at scale. This operator is the (b)-tier escape hatch the brief
sanctions: built-ins can't express the semantics (partition-aligned
zip), so an Arrow-batch ``mapInArrow`` carries it, with the
relational work still vectorized (Acero).

SQL join semantics are preserved exactly: NULL join keys never match
(pyarrow's hash join follows SQL — verified in the test suite),
duplicate keys produce the full per-key cross product, and column
sets are validated disjoint up front (loud, not suffixed).

Reference parity: the plain-join equivalence is pinned by
tests/test_cobucket.py; the A/B vs ``read().join(read())`` at sf0.1
is recorded in BASELINE.md round 13.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _validate(left, right, keys: list[str]) -> tuple:
    if left.n_buckets != right.n_buckets:
        raise ValueError(
            f"join_cobucketed: bucket counts differ "
            f"({left.n_buckets} vs {right.n_buckets})"
        )
    if list(left.bucket_cols) != list(keys) or list(
        right.bucket_cols
    ) != list(keys):
        raise ValueError(
            "join_cobucketed: both tables must be bucketed on exactly "
            f"the join keys {keys} (left layout {left.bucket_cols}, "
            f"right layout {right.bucket_cols}) — a different layout "
            "means equal keys live in different bucket ordinals and "
            "the zip would silently drop matches"
        )
    lsid, rsid = left.current_id(), right.current_id()
    if lsid is None or rsid is None:
        raise ValueError("join_cobucketed: both tables need commits")
    lschema = left._schema_of(left._manifest(lsid))
    rschema = right._schema_of(right._manifest(rsid))
    for k in keys:
        lt, rt = lschema[k].dataType, rschema[k].dataType
        if lt != rt:
            raise ValueError(
                f"join_cobucketed: key {k!r} typed {lt.simpleString()} "
                f"on the left but {rt.simpleString()} on the right — "
                "Spark's layout hash is type-sensitive, the buckets "
                "cannot align"
            )
    return lsid, rsid, lschema, rschema


def join_cobucketed(
    left,
    right,
    keys: list[str],
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Join two co-bucketed snapshot tables on ``keys`` with ZERO
    data exchange (module docstring has the full story). ``how`` is
    ``inner`` or ``left``; ``left_cols``/``right_cols`` project each
    side's non-key payload (default: all non-key columns except the
    side's own ``order_col`` — version bookkeeping, not payload;
    pass it explicitly to carry it). Returns
    keys + left payload + right payload; overlapping payload names
    refuse loudly."""
    from pyspark.sql.pandas.types import to_arrow_schema

    if how not in ("inner", "left"):
        raise ValueError(f"join_cobucketed: unsupported how={how!r}")
    lsid, rsid, lschema, rschema = _validate(left, right, keys)
    lpay = (
        list(left_cols)
        if left_cols is not None
        else [
            f.name
            for f in lschema.fields
            if f.name not in keys and f.name != left.order_col
        ]
    )
    rpay = (
        list(right_cols)
        if right_cols is not None
        else [
            f.name
            for f in rschema.fields
            if f.name not in keys and f.name != right.order_col
        ]
    )
    unknown = [c for c in lpay if c not in lschema.names] + [
        c for c in rpay if c not in rschema.names
    ]
    if unknown:
        raise ValueError(
            f"join_cobucketed: unknown payload columns {unknown}"
        )
    overlap = (set(lpay) & set(rpay)) | (
        (set(lpay) | set(rpay)) & set(keys)
    )
    if overlap:
        raise ValueError(
            f"join_cobucketed: payload columns collide {sorted(overlap)}"
            " (with each other or with the join keys) — alias or drop"
            " before joining"
        )
    # all-nullable: a LEFT join NULLs the right payload regardless of
    # the stored fields' nullability, and nullable is the relaxed
    # superset everywhere else
    out_schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in (
                [lschema[k] for k in keys]
                + [lschema[c] for c in lpay]
                + [rschema[c] for c in rpay]
            )
        ]
    )

    lbb = left._by_bucket(lsid)
    rbb = right._by_bucket(rsid)
    tasks = []
    for b in range(left.n_buckets):
        lp = [
            os.path.join(left.table_dir, f["path"])
            for f in left._entries(lbb.get(b, []))
            if f["rows"]
        ]
        rp = [
            os.path.join(right.table_dir, f["path"])
            for f in right._entries(rbb.get(b, []))
            if f["rows"]
        ]
        if not lp:
            continue  # no probe rows in this bucket on either how
        if how == "inner" and not rp:
            continue
        tasks.append((b, json.dumps(lp), json.dumps(rp)))

    spark = left.spark
    if not tasks:
        return spark.createDataFrame([], out_schema)

    # Everything the workers need rides the closure BY VALUE (arrow
    # schemas pickle; imports are in-function — the worker-import
    # discipline).
    keys_l = list(keys)

    def _nullable(fields):  # evolved files read missing cols as NULL
        return T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in fields]
        )

    l_arrow = to_arrow_schema(
        _nullable([lschema[c] for c in keys_l + list(lpay)])
    )
    r_arrow = to_arrow_schema(
        _nullable([rschema[c] for c in keys_l + list(rpay)])
    )
    out_arrow = to_arrow_schema(out_schema)
    out_cols = keys_l + list(lpay) + list(rpay)
    join_type = "inner" if how == "inner" else "left outer"

    def run_tasks(batches):
        import json as _json

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        def load(paths, schema):
            tables = []
            for p in paths:
                tbl = _pq.read_table(p)
                cols = []
                for field in schema:
                    if field.name in tbl.column_names:
                        cols.append(
                            tbl.column(field.name).cast(field.type)
                        )
                    else:  # evolved schema: missing column reads NULL
                        cols.append(
                            _pa.nulls(len(tbl), type=field.type)
                        )
                tables.append(
                    _pa.Table.from_arrays(cols, schema=schema)
                )
            if not tables:
                return schema.empty_table()
            return _pa.concat_tables(tables)

        for batch in batches:
            lp_col = batch.column("lp")
            rp_col = batch.column("rp")
            for i in range(batch.num_rows):
                l = load(_json.loads(lp_col[i].as_py()), l_arrow)
                r = load(_json.loads(rp_col[i].as_py()), r_arrow)
                merged = l.join(
                    r, keys=keys_l, join_type=join_type
                ).select(out_cols)
                merged = merged.cast(out_arrow)
                for out in merged.to_batches():
                    if out.num_rows:
                        yield out

    task_df = spark.createDataFrame(
        tasks, "bucket int, lp string, rp string"
    ).repartition(len(tasks))
    return task_df.mapInArrow(run_tasks, schema=out_schema)
