"""Registry-count pinning — no query may land after the close battery.

Round-4 post-mortem (VERDICT r4 "what's wrong" #1): `series_knn_daily_spend`
was committed AFTER the round-close battery ran, so it reached HEAD with no
smoke/determinism/sf0.1 coverage. The structural fix is to pin the registry
count in three places that must move together — PLANS.md's footer (written
by tools/scale_audit.py), COVERAGE.md's footer, and the registry itself —
and fail loudly on any skew. tools/close_battery.py enforces the same check
as its first stage and records the SHA + count it verified in
CLOSE_STATE.json.

These tests need no SparkSession: they parse the two documents and import
the registry (plan construction is lazy; importing registers names only).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_count() -> int:
    from eventsourcing_spark.registry import SPARK_QUERIES

    return len(SPARK_QUERIES)


def _plans_footer_count() -> int:
    text = open(os.path.join(HERE, "PLANS.md")).read()
    m = re.findall(r"(\d+) flagged / (\d+) queries", text)
    assert m, "PLANS.md has no 'N flagged / N queries' footer"
    return int(m[-1][1])


def _coverage_footer_count() -> int:
    text = open(os.path.join(HERE, "COVERAGE.md")).read()
    m = re.findall(r"Gate registry: (\d+) oracle-backed queries", text)
    assert m, "COVERAGE.md has no 'Gate registry: N oracle-backed queries' footer"
    return int(m[-1])


def test_registry_count_pinned_across_documents():
    """len(SPARK_QUERIES) == PLANS.md footer == COVERAGE.md footer ==
    the two README mentions."""
    n = _registry_count()
    assert _plans_footer_count() == n, (
        f"PLANS.md footer says {_plans_footer_count()} queries but the "
        f"registry has {n} — regenerate with tools/scale_audit.py"
    )
    assert _coverage_footer_count() == n, (
        f"COVERAGE.md footer says {_coverage_footer_count()} queries but "
        f"the registry has {n} — update the COVERAGE.md footer"
    )
    readme = open(os.path.join(HERE, "README.md")).read()
    for m in re.findall(
        r"All (\d+) registered queries|queries\(\)` \((\d+) operators", readme
    ):
        count = int(m[0] or m[1])
        assert count == n, (
            f"README.md pins {count} queries but the registry has {n}"
        )


def test_close_state_matches_registry_when_present():
    """CLOSE_STATE.json (written by a green close battery) must match the
    current registry count; a stale SHA is allowed mid-round (work happens
    between battery runs) but a count mismatch means a query landed after
    the battery — exactly the round-4 gap this file exists to close.

    The battery itself sets CLOSE_BATTERY_RUNNING for its pytest stage:
    CLOSE_STATE is only written AFTER a green battery, so when the count
    has grown since the last battery this check would deadlock the very
    run that re-establishes the pin (hit at round 5: 304 -> 326)."""
    if os.environ.get("CLOSE_BATTERY_RUNNING"):
        return  # the enclosing battery run IS the re-verification
    path = os.path.join(HERE, "CLOSE_STATE.json")
    if not os.path.exists(path):
        return  # first round with the pin: battery has not run yet
    state = json.load(open(path))
    assert state["registry_count"] == _registry_count(), (
        f"CLOSE_STATE.json pinned {state['registry_count']} queries at "
        f"{state['git_sha'][:9]} but the registry now has "
        f"{_registry_count()} — re-run tools/close_battery.py at HEAD"
    )


def test_close_battery_registry_pin_stage():
    """The battery's own pin check (stage 0) agrees with these tests."""
    rc = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "close_battery.py"),
         "--check-pin-only"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
