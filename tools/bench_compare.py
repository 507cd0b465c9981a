"""Per-query bench regression gate (VERDICT r02 #6).

Compares a bench run's per-query times against the committed
``BENCH_BASELINE.json`` (best-known times at the same sf) and flags any
query slower than REGRESSION_FACTOR× its baseline. Run it in the
round-close checklist::

    python bench.py > /tmp/bench.json   # or reuse the driver's BENCH_r{N}
    python tools/bench_compare.py /tmp/bench.json

Accepts either bench.py's raw JSON line or a driver BENCH_r{N}.json
(with the line under ``parsed``). Exit 1 on regressions or battery
shrink; improvements are listed so the baseline can be ratcheted.
"""

from __future__ import annotations

import json
import os
import sys

REGRESSION_FACTOR = 1.5
# below this many seconds, noise dominates on a shared VM — still
# reported, but only as a warning, never a hard failure. Raised
# 0.5 → 1.0 at round 5: three consecutive battery runs each flagged a
# DIFFERENT sub-second query at 1.5-1.6× (dedup_lsh_pairs 0.59→0.90,
# ann_lsh_multiprobe 0.60→0.97, s5 0.20→0.32) while every >1 s query
# stayed inside the gate — best-of-2 on a shared VM cannot resolve
# ±0.4 s of JIT/GC jitter. A real regression that pushes a sub-second
# query PAST 1 s still hard-flags.
HARD_FLOOR_SEC = 1.0

# Absolute-floor drift ledger (VERDICT r8 #2): every committed baseline
# carries a ``floor`` — its minimum committed value since the last
# correctness-motivated reset (see the r9a ratchet_log entry for the
# mining rule). Quiet-host adjudications re-baseline UPWARD one round at
# a time; individually each follows the written rule, but cumulatively
# they could absorb a real code slowdown. The ledger makes the
# cumulative factor explicit and un-absorbable: baseline/floor > 2.0 is
# a HARD failure of this gate (and therefore of close_battery) no
# matter how reasonable the latest single step looked; 1.5-2.0 prints
# as a drift warning. Floors may only be reset alongside a named
# correctness mechanism logged in ratchet_log — never for host drift.
DRIFT_WARN_FACTOR = 1.5
DRIFT_BREACH_FACTOR = 2.0


def load_bench(path: str) -> dict:
    """Accepts a driver BENCH_r{N}.json envelope, a single JSON object,
    or bench.py's multi-line stdout (full object first, compact summary
    last — take the first line that carries per-query times)."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                d = cand
                break
        if d is None:
            raise SystemExit(f"{path}: no parseable bench JSON found")
    if "parsed" in d:  # driver BENCH_r{N}.json envelope
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no per-query times found")
    return d


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.json"
    base = json.load(open(os.path.join(here, "BENCH_BASELINE.json")))
    cur = load_bench(bench_path)

    if cur.get("sf") not in (None, base["sf"]):
        print(f"note: bench sf={cur.get('sf')} vs baseline sf={base['sf']} — "
              f"comparison is apples-to-oranges")

    regressions, warnings, improved, missing = [], [], [], []
    for name, ref in sorted(base["queries"].items()):
        t = cur["queries"].get(name)
        if t is None:
            missing.append(name)
            continue
        if t > ref * REGRESSION_FACTOR:
            row = f"{name}: {t:.2f}s vs baseline {ref:.2f}s ({t / ref:.1f}x)"
            (warnings if max(t, ref) < HARD_FLOOR_SEC else regressions).append(row)
        elif t < ref / REGRESSION_FACTOR and t > 0:
            improved.append(f"{name}: {t:.2f}s vs {ref:.2f}s")

    new = sorted(set(cur["queries"]) - set(base["queries"]))
    for row in regressions:
        print(f"REGRESSION  {row}")
    for row in warnings:
        print(f"noise-band  {row}")
    for row in improved:
        print(f"improved    {row}")
    if new:
        print(f"new queries (no baseline yet): {', '.join(new)}")
    if missing:
        print(f"MISSING from battery: {', '.join(missing)}")

    # ----- absolute-floor drift ledger (gates the BASELINE file itself)
    floors = base.get("floors", {})
    breaches, drift_warns, unfloored, lowerable = [], [], [], []
    for name, ref in sorted(base["queries"].items()):
        ent = floors.get(name)
        if ent is None:
            unfloored.append(name)
            continue
        fl = ent["floor"]
        factor = ref / fl if fl > 0 else float("inf")
        row = f"{name}: baseline {ref:.2f}s vs floor {fl:.2f}s ({factor:.2f}x)"
        if factor > DRIFT_BREACH_FACTOR:
            breaches.append(row)
        elif factor > DRIFT_WARN_FACTOR:
            drift_warns.append(row)
        if ref < fl:
            lowerable.append(f"{name}: {fl:.2f} -> {ref:.2f}")
    for row in breaches:
        print(f"FLOOR-BREACH  {row}")
    for row in drift_warns:
        print(f"drift-warn    {row}")
    if unfloored:
        print(f"NO FLOOR (add to BENCH_BASELINE.json floors): "
              f"{', '.join(unfloored)}")
    if lowerable:
        print("floor can ratchet DOWN (baseline improved past it): "
              + "; ".join(lowerable))

    n = len(base["queries"])
    print(
        f"\n{len(regressions)} regressions, {len(warnings)} noise-band, "
        f"{len(improved)} improved over {n} baselined queries "
        f"(battery {len(cur['queries'])}, total {cur.get('value')}s "
        f"vs baseline {base['total']}s); drift ledger: "
        f"{len(breaches)} breaches, {len(drift_warns)} warns, "
        f"{len(unfloored)} unfloored"
    )
    return 1 if regressions or missing or breaches or unfloored else 0


if __name__ == "__main__":
    raise SystemExit(main())
