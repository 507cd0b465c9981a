"""Round-12 optimization profiler: isolated per-query timing + plan capture.

Mirrors bench.py methodology exactly (sf0.001 warm-up for codegen cache,
then best-of-N noop-sink runs at the target SF) so numbers are comparable
with BENCH_r11/driver runs, but for a hand-picked query subset so a
change can be measured without paying the full 114-query battery.

Usage:
    python tools/profile_r13.py [--sf DIR] [--reps N] [--plans SUFFIX] q1 q2 ...

With --plans SUFFIX each query's .explain("formatted") is written to
plans/r13/<query>_<SUFFIX>.txt (the judge-facing before/after evidence).
Prints one JSON line {"queries": {...}, "total": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.pipeline.graph import invalidate_graph_memo
from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="write plans/r13/<q>_<SUFFIX>.txt per query")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile-r13")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    warm = warm_dir if os.path.isdir(warm_dir) else args.sf

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    times: dict[str, float] = {}
    for name in args.queries:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            print(f"!! {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"!! {name}: warmup failed: {e}", file=sys.stderr)
        if args.plans:
            df = fn(spark, args.sf)
            with open(os.path.join(
                    plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = float("inf")
        for i in range(args.reps):
            # match bench.py round-13 methodology: no graph-memo reuse
            # across timed runs (VERDICT r12 #1)
            invalidate_graph_memo()
            spark.sparkContext.setJobDescription(f"timed:{name}#{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        print(f"{times[name]:8.3f}  {name}", file=sys.stderr)

    print(json.dumps({"queries": times,
                      "total": round(sum(times.values()), 3),
                      "sf": args.sf, "reps": args.reps}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
