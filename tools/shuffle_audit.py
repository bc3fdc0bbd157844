"""Measured shuffle audit: run each bench headline query and record its
ACTUAL shuffle traffic (bytes/records read+written) from the Spark UI
REST API, per query — the "measure, don't guess" companion to the
plan-shape tests. Writes SHUFFLES.md.

Method: each query runs inside its own job group; its job ids map to
stage ids, and /api/v1/applications/<app>/stages/<id> carries the
executor-aggregated shuffle metrics. Sums are end-to-end per query
(every stage of every job the query triggered, AQE included, which
plan-level inspection can't see).

Usage: python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from bigdata06_spark.queries import load_all_queries  # noqa: E402
from bigdata06_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    try:
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        if e.code == 404:
            # SKIPPED stages (AQE exchange reuse) are listed in a
            # job's stageIds but have no attempts — the REST endpoint
            # 404s; they ran no tasks, so zero contribution is exact
            return []
        raise


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    specs = load_all_queries()
    spark = get_spark("shuffle_audit", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    spark.range(1000).count()
    ui = sc.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; shuffle audit needs the REST API")
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    rows = []
    for name in HEADLINE:
        sc.setJobGroup(name, name, interruptOnCancel=False)
        specs[name].fn(spark, sf_dir).count()
        sc.setJobGroup("idle", "idle")
        jobs = [j for j in _api(base, "/jobs") if j.get("jobGroup") == name]
        stage_ids = sorted({sid for j in jobs for sid in j.get("stageIds", [])})
        sw = sr = recs = 0
        n_shuffle_stages = 0
        for sid in stage_ids:
            for attempt in _api(base, f"/stages/{sid}"):
                w = attempt.get("shuffleWriteBytes", 0)
                r = attempt.get("shuffleReadBytes", 0)
                sw += w
                sr += r
                recs += attempt.get("shuffleWriteRecords", 0)
                if w > 0:
                    n_shuffle_stages += 1
        rows.append((name, n_shuffle_stages, sw, sr, recs))
        print(f"# {name}: {n_shuffle_stages} shuffle stages, "
              f"write={_fmt_bytes(sw)}, read={_fmt_bytes(sr)}, records={recs}")

    out = ["# SHUFFLES — measured shuffle traffic (bench headline set)", "",
           f"Scale factor dir: `{sf_dir}` · local[{sc.defaultParallelism}] · "
           "executor-aggregated stage metrics from the UI REST API; one job "
           "group per query, all jobs/stages (AQE included) summed.", "",
           "| query | shuffle-writing stages | shuffle write | shuffle read | shuffle records |",
           "|---|---|---|---|---|"]
    for name, ns, sw, sr, recs in rows:
        out.append(f"| {name} | {ns} | {_fmt_bytes(sw)} | {_fmt_bytes(sr)} | {recs} |")
    out.append("")
    out.append("Reading: shuffle volume is the unit of cost at 100 TB. Rows with "
               "kilobyte-scale traffic are pre-aggregated or broadcast-joined "
               "before their exchange (the SCALE.md budget); anything whose "
               "shuffle grows super-linearly with SF is a candidate-density or "
               "skew problem, not a constant to tune.")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLES.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
