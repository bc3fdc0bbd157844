"""Streaming observability: a StreamingQueryListener that records
per-micro-batch progress (rows, per-source offsets, state-store
metrics, observed-metrics payloads) — the production monitoring seam
for every streaming pipeline in this engine.

Why a listener (not log scraping): progress events carry the engine's
OWN accounting — numInputRows per source, stateOperators'
numRowsTotal/numRowsUpdated (the watermark-bounded state the 100 TB
designs rely on — a leak shows up HERE first, as monotonically
growing numRowsTotal), and any `df.observe(...)` metrics attached to
the streaming plan (`observedMetrics`, the only in-stream DQ metrics
path — see `dq_observed_metrics` for the batch twin). The listener
API is push-based and driver-side; nothing here touches executors.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Records every query-progress event as a plain dict. Attach with
    `spark.streams.addListener(rec)`, detach with `removeListener`.

    Fields kept per batch: query id/name, batchId, numInputRows,
    per-source numInputRows, per-state-operator
    (numRowsTotal, numRowsUpdated), and observedMetrics. The raw
    progress JSON is retained under "raw" for anything else."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "id": p.get("id"),
                "name": p.get("name"),
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows", 0),
                "sources": [
                    {
                        "description": s.get("description"),
                        "numInputRows": s.get("numInputRows", 0),
                    }
                    for s in p.get("sources", [])
                ],
                "stateOperators": [
                    {
                        "operatorName": s.get("operatorName"),
                        "numRowsTotal": s.get("numRowsTotal"),
                        "numRowsUpdated": s.get("numRowsUpdated"),
                    }
                    for s in p.get("stateOperators", [])
                ],
                "observedMetrics": p.get("observedMetrics", {}),
                "raw": p,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # ------------------------------------------------- convenience
    def total_input_rows(self) -> int:
        return sum(p["numInputRows"] for p in self.progress)

    def max_state_rows(self) -> int:
        return max(
            (
                s["numRowsTotal"] or 0
                for p in self.progress
                for s in p["stateOperators"]
            ),
            default=0,
        )
