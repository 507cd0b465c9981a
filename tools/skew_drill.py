"""Skew-adversarial stress drill (VERDICT r10 directive #5).

The uniform stress replication gives every key the same multiplicity;
real 100 TB joins are Zipfian. This drill builds the SAME 20x corpus
twice in one session — uniform, and with one byte-identical text owning
~20% of all documents (so one value of every content-derived join key
dominates) — times the heaviest keyed joins on both, and inspects the
AQE-final executed plans for skew-split evidence
(``AQEShuffleRead ... skewed`` / ``OptimizeSkewedJoin``).

The interesting outcomes per query:
* join time roughly flat uniform→skew + ``skewed`` in the plan — AQE's
  skew-join split absorbed it;
* flat WITHOUT plan evidence — the operator's own bucket-occupancy
  caps / broadcast shape make it structurally skew-immune (record as
  such);
* a blow-up — the operator needs salting; fix before recording.

Usage: python tools/skew_drill.py [replicas] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark
from tools.stress_pipeline import build_stress_dir

DRILL_QUERIES = (
    "dedup_components",
    "label_propagation_communities",
    "langid_ngram_classify",
    "contamination_overlap",
)


def _skew_evidence(df) -> str:
    """AQE plan markers for skew handling. A ``.write`` goes through its
    OWN QueryExecution, so the evidence pass executes the dataframe's
    own plan (collect) and then reads the AQE-final tree."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    marks = []
    if "skewed=true" in plan or "isSkew=true" in plan:
        marks.append("AQE-skew-split")
    n_aqe = plan.count("AQEShuffleRead")
    if n_aqe:
        marks.append(f"AQEShuffleRead x{n_aqe}")
    if "isFinalPlan=true" in plan:
        marks.append("final-plan")
    return ",".join(marks) or "none"


def main() -> int:
    # --events: skew the EVENTS axis (one user_id owning ~20% of all
    # events — the aggregation-skew drill for user-keyed stats) instead
    # of the default content skew (one text owning ~20% of documents).
    args = [a for a in sys.argv[1:] if a != "--events"]
    on_events = "--events" in sys.argv[1:]
    replicas = int(args[0]) if len(args) > 0 else 20
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    queries = tuple(args[2:]) or DRILL_QUERIES
    spark = get_spark("skew-drill")
    spark.sparkContext.setLogLevel("ERROR")
    uni = build_stress_dir(spark, sf_dir, replicas)
    skw = build_stress_dir(
        spark,
        sf_dir,
        replicas,
        skew_fraction=0.0 if on_events else 0.2,
        event_skew_fraction=0.2 if on_events else 0.0,
    )
    try:
        print(
            f"{'query':32s} {'uniform(s)':>10s} {'skewed(s)':>10s} "
            f"{'ratio':>6s}  plan-evidence"
        )
        for name in queries:
            t = {}
            ev = ""
            for label, d in (("uni", uni), ("skw", skw)):
                times = []
                for _ in range(2):
                    # time the BUILDER too: the fixpoint queries
                    # (components, LPA) run their join rounds inside the
                    # builder via localCheckpoint, not in the final write
                    t0 = time.time()
                    q = SPARK_QUERIES[name](spark, d)
                    q.write.format("noop").mode("overwrite").save()
                    times.append(time.time() - t0)
                t[label] = min(times)
                if label == "skw":
                    ev = _skew_evidence(q)
            print(
                f"{name:32s} {t['uni']:10.2f} {t['skw']:10.2f} "
                f"{t['skw'] / t['uni']:6.2f}  {ev}"
            )
    finally:
        shutil.rmtree(uni, ignore_errors=True)
        shutil.rmtree(skw, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
