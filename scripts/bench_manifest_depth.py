"""Measure snapshot-table METADATA cost at commit depth (VERDICT r07
item 5): each manifest is a full file list, so what does a long-lived
table actually pay at 10^4 commits?

Spark never touches this path — the commit metadata is stdlib JSON +
os.link — so the measurement is pure-Python and exact. We synthesize a
table directory with D committed manifests of F file entries each
(realistic entry shape incl. order stats) and time every metadata
operation a reader or writer performs, then print one JSON line for
SCALE.md.

What grows with commit depth D, and what doesn't:

- per-commit cost: O(F) — ONE manifest written, independent of D;
- reader open (current_id / latest_property / read-planning): one
  os.listdir of D names + ONE manifest parse, O(D) in the directory
  scan only (numbers below show how cheap that is even at 10^4);
- history(): parses ALL manifests, O(D * F) — the audit trail, not a
  hot path;
- expire_snapshots(keep_last=k): parses all, unlinks D-k manifests —
  the explicit bound; after it the directory scan is O(k).

Round 9 adds ``format 2`` (delta manifests): a commit writes only the
TOUCHED buckets' file lists (full manifest at the root, every 16th id,
and the GC floor). The width term drops out of the per-commit cost —
O(touched) instead of O(F) — which is what matters when F is 10^5-10^6
(a 100 TB table), where a full list would be a multi-MB JSON write per
micro-batch commit and depth x O(F) metadata storage. The cold read
pays a <=16-step resolution walk instead of one parse; both are
measured below.

Round 10 re-points the "real writer" section at the ``_commit_delta``
path ``_merge_once`` actually takes now: untouched buckets carried BY
REFERENCE through the structurally-shared ``_by_bucket`` view, so the
per-commit metadata cost is O(n_buckets + touched files) — flat in
TABLE size when width grows as more buckets (the [n_buckets] arg; a
bucket is the merge/commit granule, so "bigger table, same batch"
means more buckets, not fatter ones).

Run: python scripts/bench_manifest_depth.py [depth] [files_per_manifest] [format 1|2] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid


def build(table_dir: str, depth: int, n_files: int, n_buckets: int = 8) -> None:
    mdir = os.path.join(table_dir, "manifests")
    os.makedirs(mdir)
    files = [
        {
            "path": f"data/{uuid.uuid4().hex[:12]}-b{i % n_buckets}-0.parquet",
            "bucket": i % n_buckets,
            "rows": 12_345,
            "order_min": 1,
            "order_max": 999_999,
        }
        for i in range(n_files)
    ]
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": c, "type": "long", "nullable": True, "metadata": {}}
                for c in ("k", "grp", "val", "ver")
            ],
        }
    )
    for sid in range(1, depth + 1):
        manifest = {
            "snapshot_id": sid,
            "parent": sid - 1 or None,
            "operation": "merge",
            "key_cols": ["k"],
            "order_col": "ver",
            "n_buckets": n_buckets,
            "schema": schema,
            "files": files,
            "properties": {"reflects_base": sid},
        }
        with open(os.path.join(mdir, f"manifest-{sid}.json"), "w") as fh:
            json.dump(manifest, fh)
    with open(os.path.join(table_dir, "_current"), "w") as fh:
        fh.write(str(depth))


def build_v2(table_dir: str, depth: int, n_files: int,
             n_buckets: int = 8) -> None:
    """Delta-manifest chain in the round-9 on-disk form: each commit
    rewrites ONE bucket (n_files/8 entries), full manifests at sid 1
    and every FULL_MANIFEST_EVERY-th id — the steady-state shape of a
    keep-latest table under micro-batch merges."""
    from turnover_odata_etl_spark.storage.snapshot import (
        FULL_MANIFEST_EVERY,
    )

    mdir = os.path.join(table_dir, "manifests")
    os.makedirs(mdir)

    def entries(bucket: int, sid: int) -> list[dict]:
        per = max(1, n_files // n_buckets)
        return [
            {
                "path": f"data/{uuid.uuid4().hex[:12]}-b{bucket}-{i}.parquet",
                "bucket": bucket,
                "rows": 12_345,
                "order_min": 1,
                "order_max": sid,
            }
            for i in range(per)
        ]

    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": c, "type": "long", "nullable": True, "metadata": {}}
                for c in ("k", "grp", "val", "ver")
            ],
        }
    )
    state = {b: entries(b, 0) for b in range(n_buckets)}
    for sid in range(1, depth + 1):
        touched = sid % n_buckets
        state[touched] = entries(touched, sid)
        manifest = {
            "snapshot_id": sid,
            "parent": sid - 1 or None,
            "operation": "merge",
            "key_cols": ["k"],
            "order_col": "ver",
            "n_buckets": n_buckets,
            "schema": schema,
            "format": 2,
            "properties": {"reflects_base": sid},
        }
        if sid == 1 or sid % FULL_MANIFEST_EVERY == 0:
            manifest["full"] = True
            manifest["buckets"] = {str(b): fs for b, fs in state.items()}
        else:
            manifest["buckets"] = {str(touched): state[touched]}
        with open(os.path.join(mdir, f"manifest-{sid}.json"), "w") as fh:
            json.dump(manifest, fh)
    with open(os.path.join(table_dir, "_current"), "w") as fh:
        fh.write(str(depth))


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fmt = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    # imported here so the script also documents the public surface
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from turnover_odata_etl_spark.storage.snapshot import SnapshotTable

    base = tempfile.mkdtemp(prefix="manifest_depth_")
    table_dir = os.path.join(base, "t")
    try:
        t0 = time.perf_counter()
        (build if fmt == 1 else build_v2)(
            table_dir, depth, n_files, n_buckets
        )
        build_s = time.perf_counter() - t0

        t = SnapshotTable(
            None, table_dir, key_cols=["k"], order_col="ver",
            n_buckets=n_buckets,
        )
        mdir = os.path.join(table_dir, "manifests")
        one_manifest_bytes = os.path.getsize(
            os.path.join(mdir, f"manifest-{depth}.json")
        )
        # Steady-state DELTA size: the newest sid that is NOT a
        # periodic full anchor (sid 1 and multiples of
        # FULL_MANIFEST_EVERY are full; fmt 1 has no deltas at all).
        from turnover_odata_etl_spark.storage.snapshot import (
            FULL_MANIFEST_EVERY,
        )

        delta_sid = (
            next(
                (
                    s
                    for s in range(depth, 0, -1)
                    if s != 1 and s % FULL_MANIFEST_EVERY != 0
                ),
                None,
            )
            if fmt == 2
            else None  # fmt 1 has no deltas — a size here would be a
            # full manifest mislabeled (ADVICE r09)
        )
        delta_manifest_bytes = (
            None
            if delta_sid is None
            else os.path.getsize(
                os.path.join(mdir, f"manifest-{delta_sid}.json")
            )
        )
        dir_bytes = sum(
            os.path.getsize(os.path.join(mdir, n)) for n in os.listdir(mdir)
        )

        t0 = time.perf_counter()
        sid = t.current_id()
        current_id_s = time.perf_counter() - t0
        assert sid == depth

        t0 = time.perf_counter()
        m = t._manifest(sid)  # fmt 2: cold resolution walk, <=16 reads
        parse_one_s = time.perf_counter() - t0
        assert len(m["files"]) >= (n_files if fmt == 1 else n_buckets)

        t0 = time.perf_counter()
        assert t.latest_property("reflects_base") == depth
        latest_property_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        h = t.history()
        history_s = time.perf_counter() - t0
        assert len(h) == depth

        # REAL writer cost (fmt 2): the _commit_delta path
        # _merge_once takes since round 10 — untouched buckets carried
        # by reference through _by_bucket, so the in-memory pass is
        # O(n_buckets + touched files), not O(F). Measured with the
        # real code over 100 commits.
        real_commit_avg_s = None
        if fmt == 2:
            rdir = os.path.join(base, "real")
            rt = SnapshotTable(
                None, rdir, key_cols=["k"], order_col="ver",
                n_buckets=n_buckets,
            )
            per = max(1, n_files // n_buckets)

            def fentries(bucket, tag):
                return [
                    {
                        "path": f"data/{tag}-b{bucket}-{i}.parquet",
                        "bucket": bucket,
                        "rows": 1,
                        "order_min": 1,
                        "order_max": 1,
                    }
                    for i in range(per)
                ]

            state = {b: fentries(b, f"seed{b}") for b in range(n_buckets)}
            schema_json = json.loads(
                open(
                    os.path.join(
                        table_dir, "manifests", "manifest-1.json"
                    )
                ).read()
            )["schema"]
            rt._commit(
                schema_json,
                [],
                [f for fs in state.values() for f in fs],
                "merge",
                base_id=None,
            )
            from turnover_odata_etl_spark.storage.snapshot import (
                FULL_MANIFEST_EVERY as _FME,
            )

            n_real = 100
            # Warm the per-bucket view of the seed commit: a steady-
            # state writer holds its (structurally-shared) cache; the
            # one-time O(F) cold resolution is a reader-open cost
            # (parse_one_manifest_s above), not a per-commit cost.
            rt._by_bucket(rt.current_id())
            delta_times, anchor_times = [], []
            for i in range(n_real):
                touched = i % n_buckets
                new_entries = fentries(touched, f"c{i}")
                state[touched] = new_entries
                bid = rt.current_id()
                t0 = time.perf_counter()
                sid_new = rt._commit_delta(
                    schema_json, rt._by_bucket(bid),
                    {touched: new_entries}, "merge", base_id=bid,
                )
                dt = time.perf_counter() - t0
                (anchor_times if sid_new % _FME == 0
                 else delta_times).append(dt)
            real_commit_avg_s = (
                sum(delta_times) + sum(anchor_times)
            ) / n_real
            # The split that shows the round-10 claim: the DELTA hot
            # path is flat in table size, and since format 3 the full
            # anchor is too — it carries untouched buckets as segment
            # REFS (O(n_buckets) refs + only the since-touched
            # buckets' segment bytes), so nothing on the commit path
            # is O(F) anymore.
            real_delta_commit_avg_s = sum(delta_times) / len(delta_times)
            real_full_anchor_avg_s = (
                sum(anchor_times) / len(anchor_times)
                if anchor_times else None
            )

        t0 = time.perf_counter()
        t.expire_snapshots(keep_last=8)
        expire_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        sid2 = t.current_id()
        current_id_after_expire_s = time.perf_counter() - t0
        assert sid2 == depth

        print(
            json.dumps(
                {
                    "depth": depth,
                    "format": fmt,
                    "files_per_manifest": n_files,
                    "manifest_bytes": one_manifest_bytes,
                    "delta_manifest_bytes": delta_manifest_bytes,
                    "dir_bytes_total": dir_bytes,
                    "per_commit_write_s": round(build_s / depth, 6),
                    "current_id_s": round(current_id_s, 4),
                    "parse_one_manifest_s": round(parse_one_s, 5),
                    "latest_property_s": round(latest_property_s, 4),
                    "history_s": round(history_s, 3),
                    "expire_to_8_s": round(expire_s, 3),
                    "real_commit_avg_s": None
                    if real_commit_avg_s is None
                    else round(real_commit_avg_s, 6),
                    "real_delta_commit_avg_s": None
                    if fmt != 2
                    else round(real_delta_commit_avg_s, 6),
                    "real_full_anchor_avg_s": None
                    if fmt != 2 or real_full_anchor_avg_s is None
                    else round(real_full_anchor_avg_s, 6),
                    "current_id_after_expire_s": round(
                        current_id_after_expire_s, 5
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
