"""Round-close verification battery — every gate in one command.

Runs, in order: the registry pin (len(SPARK_QUERIES) must equal the
PLANS.md and COVERAGE.md footer counts — a query that lands after the
battery can then never go unnoticed), HUGEINT oracle guard, full DuckDB
correctness at sf0.01 and sf0.1, the 32-vs-4-partition determinism sweep,
the pristine-session exec-all smoke, the plan-shape audit
(unpartitioned-window rule + SinglePartition census), bench + per-query
regression compare, and the pytest suite. Prints one PASS/FAIL line per
stage and exits non-zero on the first hard failure. On an all-green FULL
run it writes CLOSE_STATE.json pinning the git SHA and registry count the
battery verified — the judge (and tests/test_registry_pin.py) can then
prove the battery ran at THIS head with THIS registry. This is the
checklist from the round process notes, encoded so a round can never skip
a surface by accident::

    python tools/close_battery.py                  # full battery (slow, ~1 h)
    python tools/close_battery.py --quick          # skip sf0.1 + bench + pytest
    python tools/close_battery.py --check-pin-only # just the registry pin
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# bench runs FIRST among the Spark stages: it is the only timing-sensitive
# stage, and ~30 min of prior heavy Spark measurably inflates it (observed
# +20% late-day drift on a shared host) — measure before heating the machine.
STAGES: list[tuple[str, list[str]]] = [
    ("bench", [sys.executable, "bench.py"]),
    # --adjudicate-cold (VERDICT r9 #2): in-battery flags are re-measured
    # in fresh JVMs and only cold-reproduced slowdowns fail the stage —
    # a deliberately warm battery run closes green without a human, a
    # planted real slowdown still fails
    ("bench-compare", [sys.executable, "tools/bench_compare.py",
                       "/tmp/close_bench.json", "--adjudicate-cold"]),
    ("hugeint-guard", [sys.executable, "tools/hugeint_guard.py"]),
    ("correctness-sf0.01",
     [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.01"]),
    ("correctness-sf0.1",
     [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.1"]),
    ("determinism", [sys.executable, "tools/determinism_check.py"]),
    ("driver-smoke", [sys.executable, "tools/driver_smoke.py", "--exec-all"]),
    ("scale-audit", [sys.executable, "tools/scale_audit.py"]),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
]

QUICK_SKIP = {"correctness-sf0.1", "bench", "bench-compare", "pytest"}


def registry_pin() -> tuple[int, list[str]]:
    """Registry count vs the PLANS.md / COVERAGE.md footers. Returns
    (count, problems) — non-empty problems means a query landed without
    regenerating the audit documents (the round-4 gap)."""
    from eventsourcing_spark.registry import SPARK_QUERIES

    n = len(SPARK_QUERIES)
    problems = []
    plans = open(os.path.join(HERE, "PLANS.md")).read()
    m = re.findall(r"(\d+) flagged / (\d+) queries", plans)
    if not m:
        problems.append("PLANS.md has no 'N flagged / N queries' footer")
    elif int(m[-1][1]) != n:
        problems.append(
            f"PLANS.md footer pins {m[-1][1]} queries, registry has {n} "
            "(regenerate: python tools/scale_audit.py)"
        )
    cov = open(os.path.join(HERE, "COVERAGE.md")).read()
    c = re.findall(r"Gate registry: (\d+) oracle-backed queries", cov)
    if not c:
        problems.append("COVERAGE.md has no 'Gate registry: N ...' footer")
    elif int(c[-1]) != n:
        problems.append(
            f"COVERAGE.md footer pins {c[-1]} queries, registry has {n}"
        )
    return n, problems


def git_sha() -> str:
    out = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=HERE, capture_output=True, text=True
    )
    return out.stdout.strip() or "unknown"


def git_dirty() -> bool:
    out = subprocess.run(
        ["git", "status", "--porcelain"], cwd=HERE, capture_output=True, text=True
    )
    return bool(out.stdout.strip())


def main() -> int:
    quick = "--quick" in sys.argv

    # stage 0: the registry pin — cheap, and a mismatch makes every later
    # stage a lie (it would verify a registry the documents don't describe)
    n_queries, problems = registry_pin()
    if problems:
        print("FAIL  registry-pin")
        for p in problems:
            print(f"      {p}")
        return 1
    print(f"PASS  registry-pin          ({n_queries} queries; docs agree)")
    if "--check-pin-only" in sys.argv:
        return 0

    failures = []
    for name, cmd in STAGES:
        if quick and name in QUICK_SKIP:
            print(f"skip  {name} (--quick)")
            continue
        t0 = time.time()
        out_path = f"/tmp/close_{name.replace('.', '_')}.log"
        # the pytest stage must know it runs INSIDE the battery: the
        # close-state pin test would otherwise deadlock every battery
        # run after the registry count grew (CLOSE_STATE is only
        # written after a green battery)
        env = {**os.environ, "CLOSE_BATTERY_RUNNING": "1"}
        with open(out_path, "w") as out:
            if name == "bench":
                # bench prints its JSON line on stdout; keep it for compare
                with open("/tmp/close_bench.json", "w") as bench_out:
                    rc = subprocess.run(
                        cmd, cwd=HERE, stdout=bench_out, stderr=out, env=env
                    ).returncode
            else:
                rc = subprocess.run(
                    cmd, cwd=HERE, stdout=out, stderr=subprocess.STDOUT,
                    env=env,
                ).returncode
        # (rounds 4-9 carried a warm-host bench RERUN here; round-9 hard
        # data showed warm retries adjudicate monotonically worse as the
        # host heats, so the retry is replaced by bench_compare's
        # --adjudicate-cold fresh-JVM probes, run inside the stage.)
        dt = time.time() - t0
        status = "PASS" if rc == 0 else "FAIL"
        print(f"{status}  {name:20s} ({dt:6.1f}s)  log: {out_path}")
        if rc != 0:
            failures.append(name)
            tail = open(out_path).read().splitlines()[-15:]
            print("      " + "\n      ".join(tail))
            if name.startswith("correctness") or name == "hugeint-guard":
                break  # later stages are meaningless on a red gate

    print(f"\n{'ALL GREEN' if not failures else 'FAILED: ' + ', '.join(failures)}")

    if not failures and not quick:
        # pin what this green FULL battery actually verified; committed so
        # the judge can check "battery ran at THIS sha with THIS registry"
        state = {
            "git_sha": git_sha(),
            "git_dirty": git_dirty(),
            "registry_count": n_queries,
            "stages": [name for name, _ in STAGES],
            "completed_at_utc": datetime.now(timezone.utc).isoformat(
                timespec="seconds"
            ),
        }
        with open(os.path.join(HERE, "CLOSE_STATE.json"), "w") as f:
            json.dump(state, f, indent=1)
            f.write("\n")
        print(
            f"CLOSE_STATE.json written: {state['git_sha'][:9]}"
            f"{' (dirty tree!)' if state['git_dirty'] else ''} "
            f"@ {n_queries} queries — commit it with the round close"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
