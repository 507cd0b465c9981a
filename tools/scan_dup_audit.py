"""Round-12 audit: repeated parquet scans of the same table in one plan.

A query whose physical plan scans the same parquet file N times pays N
full corpus passes at 100 TB for one logical pass of work — the
shared-subtree-re-derivation disease (each consumer of an unmaterialized
frame replans its whole lineage). Prints per-query scan multiplicity,
worst first; only queries with a table scanned >= the threshold.

Usage: python tools/scan_dup_audit.py [sf_dir] [min_scans]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.plans import formatted_plan
from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("scan-dup-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in SPARK_QUERIES.items():
        try:
            p = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"!! {name}: {str(e)[:100]}", file=sys.stderr)
            continue
        scans = re.findall(
            r"Location: InMemoryFileIndex \[[^\]]*?([a-z_0-9]+\.parquet)", p
        )
        c = Counter(scans)
        worst = max(c.values(), default=0)
        if worst >= min_scans:
            rows.append((worst, sum(c.values()), name, dict(c)))
    rows.sort(reverse=True)
    for worst, total, name, c in rows:
        print(f"{name:40s} worst={worst:2d} total={total:2d} {c}")
    print(f"{len(rows)} queries with a table scanned >= {min_scans}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
