"""Driver-environment smoke check.

Round 1 lost its entire bench line and 6 correctness entries to a
session-config difference: the driver harness runs ``queries()`` under
*its own* default SparkSession (no UTC pin, no legacy parquet flags,
Spark 4's TIMESTAMP_NTZ parquet inference active), while the local test
session pre-set those. This tool reproduces the driver environment as
closely as possible — a pristine ``SparkSession.builder`` with zero
engine configs — and:

1. plan-builds every ``queries()`` entry (catches AnalysisException —
   the exact round-1 failure class — without paying execution cost);
2. fully executes a rotating sample (+ any names given on argv) so
   runtime-only failures (UDF pickling, python-worker imports) surface;
3. runs ``entry(spark)`` end-to-end.

Usage::

    python tools/driver_smoke.py [--exec-all] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

# Fixed sample that exercises every runtime family: pandas-UDF folds,
# LSH/minhash md5 paths, window-heavy, asof union trick, sketches,
# graph fixpoint, retrieval, sampling, multimodal-ish binary handling.
EXEC_SAMPLE = [
    "a1_fold_balance",
    "sessionize_events",
    "asof_prior_error",
    "range_click_attribution",
    "funnel_conversion",
    "rolling_7d_value",
    "scd2_intervals",
    "dedup_lsh_clusters",
    "ann_ivf_topk",
    "knn_topk_dot",
    "sketch_hll_distinct",
    "pagerank_neardup",
    "curation_pipeline",
    "stratified_sample",
    "tpch_q1_pricing_summary",
    "x_ulid_roundtrip",
]


def main() -> int:
    from pyspark.sql import SparkSession

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    exec_all = "--exec-all" in sys.argv

    # Pristine session: exactly what the driver harness does.
    spark = SparkSession.builder.master("local[8]").appName("driver-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    failures: list[str] = []

    t0 = time.time()
    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry: {n} rows ({time.time() - t0:.1f}s)")
    if n <= 0:
        failures.append("entry")

    qs = entrymod.queries()
    exec_set = set(EXEC_SAMPLE) | set(argv) if not exec_all else set(qs)
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, SF)
            if name in exec_set:
                df.write.format("noop").mode("overwrite").save()
                print(f"exec  {name} ({time.time() - t0:.1f}s)")
            else:
                _ = df.schema  # plan-build only
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"\n{len(failures)} failures / {len(qs)} queries (pristine session)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
