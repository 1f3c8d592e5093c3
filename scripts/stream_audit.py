#!/usr/bin/env python
"""Streaming-topology audit — the streaming counterpart of
``plan_audit.py``.

``plan_audit.py`` skips the 13 streaming queries because their
``queries()`` callables run a real availableNow stream and return a
memory-sink batch frame whose plan says nothing about the streaming
topology. This script captures the topology the honest way: a
``StreamingQueryListener`` records every progress event while each
registered streaming query runs, and the audit reports what the
ENGINE said it executed —

- state operators (aggregation / dedup / symmetric hash join /
  session window) with their final state row counts;
- whether an event-time watermark was active (late-data bound =
  bounded state — the difference between a stream that runs forever
  and one that OOMs);
- sources and sink as reported by the progress event;
- number of micro-batches to drain the fixture.

Queries built on ``foreachBatch`` (the incremental upsert/agg/CDC
family) legitimately report no state operators — their state lives in
the keyed parquet table the batch function merges into, not in the
state store; the audit prints their progress-event counts so that
posture is visible rather than invisible.

Usage:
    cd /tmp && python /root/repo/scripts/stream_audit.py [sf_dir] [--write-md]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_md = "--write-md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from pyspark.sql.streaming import StreamingQueryListener

    from turnover_odata_etl_spark.plans import registry
    from turnover_odata_etl_spark.session import get_spark

    spark = get_spark(app_name="stream-audit")
    spark.sparkContext.setLogLevel("ERROR")

    progresses: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())

    results, errors = [], {}
    for name, spec in registry.all_specs().items():
        if "streaming" not in spec.tags:
            continue
        progresses.clear()
        try:
            spec.fn(spark, sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — audit boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        # Listener events arrive asynchronously on the Py4J callback
        # thread. Waiting for the FIRST event plus a fixed grace races
        # slow deliveries: a late batch event would undercount this
        # query AND (after the next iteration's clear) leak into the
        # next query's row as a phantom stream. Instead wait until the
        # event count is STABLE — no growth across three consecutive
        # 0.5 s checks — before reading.
        import time

        deadline = time.time() + 20
        stable = 0
        seen = -1
        while stable < 3 and time.time() < deadline:
            time.sleep(0.5)
            n = len(progresses)
            # Growth resets the streak to ZERO (not 1): three
            # consecutive EQUAL samples are required after the last
            # arrival, or a late event needs only two quiet checks.
            stable = stable + 1 if n == seen and n > 0 else 0
            seen = n

        # One registered query may run several streams (warm-up-free
        # here: each fn starts fresh); aggregate by stream id, keep the
        # LAST progress per stream (final state counts).
        last_by_id: dict[str, dict] = {}
        for p in progresses:
            last_by_id[p["id"]] = p
        ops: dict[str, int] = {}
        watermarked = False
        # Progress events across ALL streams this query ran (availableNow
        # emits ~one per micro-batch per stream) — a total, not a
        # per-stream drain depth.
        n_events = len(progresses)
        sinks, sources = set(), set()
        for p in last_by_id.values():
            for op in p.get("stateOperators", []):
                key = op.get("operatorName", "unknown")
                ops[key] = ops.get(key, 0) + int(op.get("numRowsTotal", 0))
            wm = p.get("eventTime", {}).get("watermark")
            if wm and not wm.startswith("1970-01-01T00:00:00"):
                watermarked = True
            sinks.add(p.get("sink", {}).get("description", "?").split("[")[0])
            for s in p.get("sources", []):
                sources.add(s.get("description", "?").split("[")[0])
        facts = {
            "name": name,
            "streams": len(last_by_id),
            "progress_events": n_events,
            "state_operators": ops,
            "watermarked": watermarked,
            "sources": sorted(sources),
            "sinks": sorted(sinks),
        }
        results.append(facts)
        print(json.dumps(facts), flush=True)

    summary = {
        "audited": len(results),
        "errors": errors,
        "stateful": sum(1 for r in results if r["state_operators"]),
        "watermarked": sum(1 for r in results if r["watermarked"]),
    }
    print(json.dumps({"summary": summary}), flush=True)

    if write_md:
        lines = [
            "# Streaming-topology audit (generated by scripts/stream_audit.py)",
            "",
            f"Scale factor dir: `{sf_dir}`. Facts below are what the engine's",
            "progress events reported while each registered streaming query",
            "drained the fixture under `availableNow` — not docstring claims.",
            "`foreachBatch` queries (incremental upsert/agg/CDC) report no",
            "state-store operators by design: their state is the keyed parquet",
            "table the batch function merges into.",
            "",
            "`watermark = yes` means the event-time watermark ADVANCED during",
            "the run (requires ≥2 micro-batches). Since round 16 the windowed",
            "aggregations drain a two-file split feed one file per trigger",
            "(`read_events_stream_split`, complete mode — result-identical to",
            "the single-batch feed), so their watermark advancement is",
            "OBSERVED here rather than asserted in tests; `—` rows either",
            "declare no watermark or are emission-sensitive single-batch",
            "queries (late-data semantics stay pinned in",
            "tests/test_streaming_semantics.py).",
            "",
            "| query | streams | progress events | state operators (rows) | watermark | sink |",
            "|---|---|---|---|---|---|",
        ]
        for r in results:
            ops = (
                "; ".join(f"{k} ({v})" for k, v in r["state_operators"].items())
                or "—"
            )
            lines.append(
                f"| {r['name']} | {r['streams']} | {r['progress_events']} | "
                f"{ops} | {'yes' if r['watermarked'] else '—'} | "
                f"{', '.join(r['sinks'])} |"
            )
        if errors:
            lines.append("")
            lines.append(f"Errors: {errors}")
        md_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "STREAMS.md",
        )
        with open(md_path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {md_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
