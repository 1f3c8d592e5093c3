#!/usr/bin/env python3
"""Staleness ledger: latest driver CORRECTNESS round per registered query.

Unions every ``CORRECTNESS_r*.json`` artifact in the repo root and prints,
per round, the queries whose LATEST driver row is from that round — the
input for each round's gate-window rotation (stalest greens first). Also
flags registered queries with no driver row at all (new registrations that
must be gated immediately) and artifact rows for names no longer
registered (renames/removals to reconcile).

Usage: python scripts/staleness.py   (from anywhere; repo root inferred)
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    from turnover_odata_etl_spark.plans import registry

    registered = set(registry.all_specs())

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            artifact = json.load(fh)
        for name, row in artifact.items():
            if isinstance(row, dict):
                latest[name] = max(rnd, latest.get(name, 0))

    by_round = collections.defaultdict(list)
    for name in registered & set(latest):
        by_round[latest[name]].append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        print(f"round {rnd}: {len(names)} queries")
        for name in names:
            print(f"  {name}")

    never = sorted(registered - set(latest))
    if never:
        print(f"NEVER driver-audited ({len(never)}) — gate immediately:")
        for name in never:
            print(f"  {name}")

    orphans = sorted(set(latest) - registered)
    if orphans:
        print(f"artifact rows with no current registration ({len(orphans)}):")
        for name in orphans:
            print(f"  {name}")


if __name__ == "__main__":
    main()
