"""Same-session 1x-vs-Nx stress ratios (VERDICT r10 directive #4).

Absolute stress timings drift +/-40% with host heat across days, so a
scale ratio is only evidence when both points come from the SAME
session (SCALE.md round-10 note; memory rule c). This driver builds
the 1x and Nx corpora once, then times each query best-of-two on both
and prints the ratio — the number SCALE.md rows quote.

Usage: python tools/stress_ratio.py [replicas] [sf_dir] query [query ...]
"""

from __future__ import annotations

import shutil
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark
from tools.stress_pipeline import STRESS_QUERIES, build_stress_dir


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    queries = sys.argv[3:]
    unknown = set(queries) - set(STRESS_QUERIES)
    if unknown:
        print(f"unknown stress queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("stress-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = build_stress_dir(spark, sf_dir, 1)
    big_dir = build_stress_dir(spark, sf_dir, replicas)
    try:
        print(f"{'query':32s} {'1x(s)':>8s} {replicas:>6d}x(s) {'ratio':>7s}")
        for name in queries:
            t = {}
            for label, d in (("base", base_dir), ("big", big_dir)):
                times = []
                for _ in range(2):
                    t0 = time.time()
                    SPARK_QUERIES[name](spark, d).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    times.append(time.time() - t0)
                t[label] = min(times)
            print(
                f"{name:32s} {t['base']:8.2f} {t['big']:8.2f} "
                f"{t['big'] / t['base']:7.2f}"
            )
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)
        shutil.rmtree(big_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
