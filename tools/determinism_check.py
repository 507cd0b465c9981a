"""Partition-count independence check for every registered query.

Runs the whole registry twice — spark.sql.shuffle.partitions=32 then 4,
with different input-split settings — and compares the results with the
same order-insensitive logic as the correctness gate. Any query whose
output depends on physical parallelism (nondeterministic tie-breaks,
first()/collect_list without ordering, float reduction order) fails
here even though a single-config oracle run can't see it.

Usage:  python tools/determinism_check.py [sf_dir]
Exit 1 on any mismatch — CI-able.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import compare  # noqa: E402

CONFIGS = [
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": "134217728"},
    {"spark.sql.shuffle.partitions": "4",
     "spark.sql.files.maxPartitionBytes": "1048576"},
]


def session(conf: dict):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("determinism-check")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
    )
    for k, v in conf.items():
        b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from eventsourcing_spark.registry import SPARK_QUERIES

    names = sorted(only or SPARK_QUERIES)
    results: dict[str, list] = {}
    for ci, conf in enumerate(CONFIGS):
        spark = session(conf)
        for name in names:
            t0 = time.time()
            try:
                pdf = SPARK_QUERIES[name](spark, sf_dir).toPandas()
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                pdf = e
            results.setdefault(name, []).append(pdf)
            if ci == 0:
                n = "ERR" if isinstance(pdf, Exception) else len(pdf)
                print(f"ran   {name} ({time.time() - t0:.1f}s, {n} rows)",
                      flush=True)
        spark.stop()

    failures = 0
    for name in names:
        a, b = results[name]
        if isinstance(a, Exception) or isinstance(b, Exception):
            failures += 1
            print(f"FAIL  {name}: error {a if isinstance(a, Exception) else b}")
            continue
        problems = compare(name, a, b)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
    print(f"\n{failures} parallelism-dependent / {len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
