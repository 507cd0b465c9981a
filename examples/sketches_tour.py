"""Sketches tour: counting at 100 TB. Run: python examples/sketches_tour.py

Exact distinct/frequency counting shuffles every distinct value; a
sketch shuffles a fixed few dozen integers per group and still answers
the question. This tour runs the three classic sketches over the
events table, shows their estimates against exact counts, and then the
property that makes them scale: *mergeability* — the registers of two
halves max-combine into exactly the registers of the whole.

  1. KMV          — distinct users per event type (k smallest hashes)
  2. HyperLogLog  — same question at fixed 64-register memory
  3. count-min    — event frequency per user, probed with the top-20
  4. merge law    — HLL(A ∪ B) == max-merge(HLL(A), HLL(B)), exactly
  5. streaming    — the same merge maintaining registers per micro-batch

Every estimator is integer-exact end to end, so each also runs under
the DuckDB value-hash oracle gate (tools/check_correctness.py) — the
gate hashes the *estimates*, not just the inputs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.session import get_spark
from eventsourcing_spark.sketches import (
    hll_estimate,
    hll_registers,
    merge_hll_registers,
    sketch_cms_heavy_hitters,
    sketch_hll_distinct,
    sketch_kmv_distinct,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("sketches-tour")
    spark.sparkContext.setLogLevel("ERROR")

    print("=== 1. KMV distinct users per event type ===")
    sketch_kmv_distinct(spark, SF).orderBy("event_type").show()

    print("=== 2. HyperLogLog, 64 registers ===")
    sketch_hll_distinct(spark, SF).orderBy("event_type").show()

    print("=== 3. count-min event frequency, top-20 probe ===")
    sketch_cms_heavy_hitters(spark, SF).orderBy(F.desc("true_n")).show(5)

    print("=== 4. merge law: HLL(A ∪ B) == max-merge(HLL(A), HLL(B)) ===")
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = hll_registers(ev, ["event_type"], "user_id")
    merged = merge_hll_registers(
        hll_registers(a, ["event_type"], "user_id"),
        hll_registers(b, ["event_type"], "user_id"),
        group_cols=["event_type"],
    )
    diff = whole.exceptAll(merged).union(merged.exceptAll(whole)).count()
    print(f"register frames differ in {diff} rows (must be 0)")
    assert diff == 0

    print("=== 5. the same merge, streaming (3 micro-batches) ===")
    from eventsourcing_spark.streaming.sketches import (
        hll_maintain,
        streaming_distinct_estimate,
    )

    with tempfile.TemporaryDirectory() as tmp:
        src, reg, cp = (os.path.join(tmp, d) for d in ("src", "reg", "cp"))
        ev.repartition(3).write.parquet(src)
        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in ev.schema.fields)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = hll_maintain(
            stream, reg, cp, ["event_type"], "user_id",
            "event_type string, b bigint, m_b int",
        )
        q.awaitTermination(120)
        got = streaming_distinct_estimate(
            spark, reg, ["event_type"], "event_type string, b bigint, m_b int"
        )
        want = hll_estimate(whole, ["event_type"])
        same = got.exceptAll(want).union(want.exceptAll(got)).count()
        print(f"stream estimate vs batch estimate: {same} differing rows")
        assert same == 0

    print("tour complete")
    spark.stop()


if __name__ == "__main__":
    main()
