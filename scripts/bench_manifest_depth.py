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

Run: python scripts/bench_manifest_depth.py [depth] [files_per_manifest]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid


def build(table_dir: str, depth: int, n_files: int) -> None:
    mdir = os.path.join(table_dir, "manifests")
    os.makedirs(mdir)
    files = [
        {
            "path": f"data/{uuid.uuid4().hex[:12]}-b{i % 8}-0.parquet",
            "bucket": i % 8,
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
            "n_buckets": 8,
            "schema": schema,
            "files": files,
            "properties": {"reflects_base": sid},
        }
        with open(os.path.join(mdir, f"manifest-{sid}.json"), "w") as fh:
            json.dump(manifest, fh)
    with open(os.path.join(table_dir, "_current"), "w") as fh:
        fh.write(str(depth))


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    # imported here so the script also documents the public surface
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from turnover_odata_etl_spark.storage.snapshot import SnapshotTable

    base = tempfile.mkdtemp(prefix="manifest_depth_")
    table_dir = os.path.join(base, "t")
    try:
        t0 = time.perf_counter()
        build(table_dir, depth, n_files)
        build_s = time.perf_counter() - t0

        t = SnapshotTable(
            None, table_dir, key_cols=["k"], order_col="ver", n_buckets=8
        )
        one_manifest_bytes = os.path.getsize(
            os.path.join(table_dir, "manifests", f"manifest-{depth}.json")
        )

        t0 = time.perf_counter()
        sid = t.current_id()
        current_id_s = time.perf_counter() - t0
        assert sid == depth

        t0 = time.perf_counter()
        m = t._manifest(sid)
        parse_one_s = time.perf_counter() - t0
        assert len(m["files"]) == n_files

        t0 = time.perf_counter()
        assert t.latest_property("reflects_base") == depth
        latest_property_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        h = t.history()
        history_s = time.perf_counter() - t0
        assert len(h) == depth

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
                    "files_per_manifest": n_files,
                    "manifest_bytes": one_manifest_bytes,
                    "dir_bytes_total": one_manifest_bytes * depth,
                    "per_commit_write_s": round(build_s / depth, 6),
                    "current_id_s": round(current_id_s, 4),
                    "parse_one_manifest_s": round(parse_one_s, 5),
                    "latest_property_s": round(latest_property_s, 4),
                    "history_s": round(history_s, 3),
                    "expire_to_8_s": round(expire_s, 3),
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
