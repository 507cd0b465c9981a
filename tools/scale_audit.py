"""Scale review of every registered query in one command.

Builds the physical plan of every registry query and prints
its shuffle/scan/python-stage profile plus the heuristic red flags from
``eventsourcing_spark.plans.audit`` (cartesian products, row-at-a-time
python, corpus-sized single-partition windows). A query may declare a
written cardinality bound via ``@query(..., bounded_window="...")`` to
whitelist a provably small global window; the bound is printed alongside.
Exit code 1 if any query trips a flag — CI-able.

Usage:  python tools/scale_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.plans import (
    audit,
    formatted_plan,
    plan_stats,
    single_partition_census,
)
from eventsourcing_spark.queries import BOUNDED_WINDOW, GENERATE_BROADCAST_OK
from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    census_total = {"aggregate_fed": 0, "aggregate_fed_growing_grain": 0,
                    "limit_bounded": 0, "literal": 0,
                    "python_fed": 0, "documented_bounded": 0,
                    "unbounded": 0}
    print(f"{'query':40s} {'exch':>4s} {'scan':>4s} {'bhj':>3s} {'py':>3s}  flags")
    for name in sorted(SPARK_QUERIES):
        try:
            df = SPARK_QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            flagged += 1
            print(f"{name:40s} PLAN ERROR: {exc}")
            continue
        s = plan_stats(plan)
        for k, v in single_partition_census(
            plan, documented=name in BOUNDED_WINDOW
        ).items():
            census_total[k] += v
        npy = sum(
            s.get(k, 0)
            for k in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
        )
        warnings = audit(
            df,
            allow_global_window=name in BOUNDED_WINDOW,
            allow_generate_broadcast=name in GENERATE_BROADCAST_OK,
        )
        if warnings:
            flagged += 1
        flags = "; ".join(warnings) if warnings else ""
        if not flags and name in BOUNDED_WINDOW:
            flags = f"[bounded window: {BOUNDED_WINDOW[name]}]"
        if not warnings and name in GENERATE_BROADCAST_OK:
            flags = (flags + " " if flags else "") + (
                f"[generate-broadcast ok: {GENERATE_BROADCAST_OK[name]}]"
            )
        print(
            f"{name:40s} {s['Exchange']:4d} {s['scans']:4d} "
            f"{s['BroadcastHashJoin']:3d} {npy:3d}  {flags}"
        )
    print(
        f"\nSinglePartition exchange census: "
        f"{sum(census_total.values())} total — "
        + ", ".join(f"{v} {k}" for k, v in census_total.items())
    )
    print(f"{flagged} flagged / {len(SPARK_QUERIES)} queries")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
