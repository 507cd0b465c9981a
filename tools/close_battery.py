"""Round-close verification battery — every gate in one command.

Runs, in order: HUGEINT oracle guard, full DuckDB correctness at sf0.01
and sf0.1, the 32-vs-4-partition determinism sweep, the pristine-session
exec-all smoke, the plan-shape audit (unpartitioned-window rule +
SinglePartition census), bench + per-query regression compare, and the
pytest suite. Prints one PASS/FAIL line per stage and exits non-zero on
the first hard failure. This is the checklist from the round process
notes, encoded so a round can never skip a surface by accident::

    python tools/close_battery.py            # full battery (slow, ~1 h)
    python tools/close_battery.py --quick    # skip sf0.1 + bench + pytest
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bench runs FIRST: it is the only timing-sensitive stage, and ~30 min
# of prior heavy Spark measurably inflates it (observed +20% late-day
# drift on a shared host) — measure before heating the machine.
STAGES: list[tuple[str, list[str]]] = [
    ("bench", [sys.executable, "bench.py"]),
    ("bench-compare", [sys.executable, "tools/bench_compare.py", "/tmp/close_bench.json"]),
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


def main() -> int:
    quick = "--quick" in sys.argv
    failures = []
    for name, cmd in STAGES:
        if quick and name in QUICK_SKIP:
            print(f"skip  {name} (--quick)")
            continue
        t0 = time.time()
        out_path = f"/tmp/close_{name.replace('.', '_')}.log"
        with open(out_path, "w") as out:
            if name == "bench":
                # bench prints its JSON line on stdout; keep it for compare
                with open("/tmp/close_bench.json", "w") as bench_out:
                    rc = subprocess.run(
                        cmd, cwd=HERE, stdout=bench_out, stderr=out
                    ).returncode
            else:
                rc = subprocess.run(
                    cmd, cwd=HERE, stdout=out, stderr=subprocess.STDOUT
                ).returncode
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
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
