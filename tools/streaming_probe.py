"""Streaming state/throughput probe (VERDICT r4 #8).

The sf1 probe (tools/make_sf1_probe.py) measured every *batch*
family's data term on 10× data; the streaming set was only ever timed
at sf0.1, so the claim "state stays watermark-bounded at scale" was
design, not measurement. This tool replays each streaming family at a
given sf dir with the engine's own ProgressRecorder listener attached
(streaming/monitor.py) and reports, per query:

- wall seconds (end-to-end availableNow drain, min of --reps),
- total input rows across micro-batches and rows/sec throughput,
- per-state-operator peak numRowsTotal (the state-store size the
  RocksDB/HDFSBackedStateStore must hold) and summed numRowsUpdated.

The verdict's question is answered by the numRowsTotal column: a
watermark-bounded operator's peak state must scale with LIVE keys
(keys within the watermark horizon), not with total history. On the
probe's 10× events table (10 disjoint key-shifted copies, same time
span) live keys per window grow ~10× while history grows 10× too —
so bounded-state operators show ≤10× state at 10× input, and a leak
(state ∝ processed history ≫ live keys) would show a super-10× or
monotonically-growing numRowsTotal.

Usage:
  python tools/streaming_probe.py [sf_dir] [--reps N] [--only a,b,c]
Prints one JSON line per query plus a trailing summary JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata06_spark.session import get_spark
from bigdata06_spark.streaming.monitor import ProgressRecorder

# The streaming families with stateful operators (aggregation /
# session / dedup / join / flatMapGroupsWithState / transformWithState
# state stores). stream_static_join is stateless — included as the
# zero-state control row.
STREAMING_QUERIES = [
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_counts",
    "stream_dedup_within_watermark",
    "stream_watermark_append",
    "stream_stateful_running",
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_stream_full_join",
    "stream_transform_with_state",
    "stream_tws_list_state",
    "stream_tws_map_state",
    "stream_static_join",
]


def probe_one(spark, name: str, fn, sf_dir: str, reps: int) -> dict:
    best = None
    for _ in range(reps):
        rec = ProgressRecorder()
        spark.streams.addListener(rec)
        try:
            t0 = time.time()
            out = fn(spark, sf_dir)
            n_out = out.count()
            wall = time.time() - t0
            # the listener bus delivers progress events ASYNC — a fast
            # run can terminate before its events arrive; wait (outside
            # the timed window) until the event count stops growing
            deadline = time.time() + 10
            last = -1
            while time.time() < deadline:
                n = len(rec.progress)
                if n == last and n > 0:
                    break
                last = n
                time.sleep(0.2)
        finally:
            spark.streams.removeListener(rec)
        input_rows = sum(p["numInputRows"] for p in rec.progress)
        state: dict[str, dict] = {}
        for p in rec.progress:
            for op in p.get("stateOperators", []):
                s = state.setdefault(
                    op.get("operatorName") or "state",
                    {"peak_rows_total": 0, "rows_updated": 0},
                )
                s["peak_rows_total"] = max(
                    s["peak_rows_total"], op.get("numRowsTotal") or 0
                )
                s["rows_updated"] += op.get("numRowsUpdated") or 0
        row = {
            "query": name,
            "wall_s": round(wall, 2),
            "batches": len(rec.progress),
            "input_rows": input_rows,
            "rows_per_s": round(input_rows / wall) if wall > 0 else None,
            "out_rows": n_out,
            "state": state,
        }
        if best is None or row["wall_s"] < best["wall_s"]:
            best = row
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 1
    only: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else 2
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    from bigdata06_spark.queries import load_all_queries

    specs = load_all_queries()
    spark = get_spark("streaming_probe")
    spark.range(1000).count()  # JVM warm

    results = []
    for name in STREAMING_QUERIES:
        if only and name not in only:
            continue
        row = probe_one(spark, name, specs[name].fn, sf_dir, reps)
        results.append(row)
        print(json.dumps(row), flush=True)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total_wall_s": round(sum(r["wall_s"] for r in results), 2),
                "total_input_rows": sum(r["input_rows"] for r in results),
                "peak_state_rows": max(
                    (s["peak_rows_total"] for r in results for s in r["state"].values()),
                    default=0,
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
