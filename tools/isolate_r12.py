"""Per-query isolation harness for the round-12 optimization pass
(guide §1.3/§1.4): time ONE registered query with the noop sink so the
measurement is the computation, not the sink or driver-side row pull,
and dump `.explain("formatted")` for the plan evidence committed under
plans/r12/.

Usage:
  python tools/isolate_r12.py <query> [<query> ...] [--sf SF_DIR]
      [--reps N] [--plan-out DIR] [--suffix before|after]

Timing methodology matches bench.py (min-of-N, build+execute per rep)
except the action is the noop sink instead of count(); bench.py itself
keeps count() so round-over-round numbers stay comparable. Jobs are
labeled with setJobDescription (guide §1.2).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata06_spark.queries import load_all_queries  # noqa: E402
from bigdata06_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-out", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default=None)
    args = ap.parse_args()

    spark = get_spark("isolate_r12")
    spark.range(1000).count()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    specs = load_all_queries()

    for name in args.queries:
        if name not in specs:
            print(f"?? {name}: not registered", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        best = None
        for _ in range(max(1, args.reps)):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s (noop, min of {args.reps})", flush=True)
        if args.plan_out:
            os.makedirs(args.plan_out, exist_ok=True)
            suffix = f"_{args.suffix}" if args.suffix else ""
            path = os.path.join(args.plan_out, f"{name}{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan_of(specs[name].fn(spark, args.sf)))
            print(f"  plan -> {path}", flush=True)


if __name__ == "__main__":
    main()
