"""Isolated cold-session probe for bench queries (VERDICT r08 #1).

Runs each named query in its OWN fresh Spark session / JVM subprocess
using exactly bench.py's per-query methodology (untimed sf0.001
warm-up to compile codegen classes, then best-of-2 timed at the target
sf, noop sink). This isolates a query's intrinsic cost from battery
position, session aging, and shared-frame warm-up, so an in-battery
time can be adjudicated against an ordering-independent number::

    python tools/cold_probe.py [sf_dir] name [name ...]
    python tools/cold_probe.py --samples 3 name ...   # median-of-N, for
                                                      # baseline sampling

Prints one JSON line per query: {"query": ..., "cold_sec": ...,
"samples": [...]} — "cold_sec" is the median across samples (each
sample a separate subprocess).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD_SRC = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark

name = {name!r}
sf_dir = {sf_dir!r}
spark = get_spark("cold-probe")
spark.sparkContext.setLogLevel("ERROR")
fn = SPARK_QUERIES[name]
warm = "/root/testdata/sf0.001"
warm = warm if os.path.isdir(warm) else sf_dir
try:
    fn(spark, warm).write.format("noop").mode("overwrite").save()
except Exception:
    pass
best = float("inf")
for _ in range(2):
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
print("COLD_PROBE_RESULT " + json.dumps({{"query": name, "sec": round(best, 3)}}))
spark.stop()
"""


def probe_once(repo: str, name: str, sf_dir: str) -> float:
    src = _CHILD_SRC.format(repo=repo, name=name, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COLD_PROBE_RESULT "):
            return json.loads(line[len("COLD_PROBE_RESULT "):])["sec"]
    raise RuntimeError(
        f"{name}: no probe result\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> int:
    args = sys.argv[1:]
    samples = 1
    if args and args[0] == "--samples":
        samples = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    if not args:
        print(__doc__)
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args:
        vals = [probe_once(repo, name, sf_dir) for _ in range(samples)]
        print(
            json.dumps(
                {
                    "query": name,
                    "cold_sec": round(statistics.median(vals), 3),
                    "samples": vals,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
