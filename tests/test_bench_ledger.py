"""Absolute-floor drift ledger discipline (VERDICT r8 #2).

The ledger lives in ``BENCH_BASELINE.json`` under ``floors`` and is
enforced by ``tools/bench_compare.py``: a committed baseline more than
2.0x its floor fails the gate (and therefore close_battery), so
successive quiet-host re-baselines can never silently absorb a real
code slowdown. These tests pin the file invariants and the gate's
behavior on synthetic breach inputs — no Spark session needed.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_baseline() -> dict:
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        return json.load(f)


def _load_compare_module():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_baselined_query_has_a_floor():
    base = _load_baseline()
    missing = sorted(set(base["queries"]) - set(base.get("floors", {})))
    assert not missing, f"queries without a floor entry: {missing}"


def test_no_committed_baseline_breaches_its_floor():
    base = _load_baseline()
    mod = _load_compare_module()
    breaches = {
        q: (v, base["floors"][q]["floor"])
        for q, v in base["queries"].items()
        if v > base["floors"][q]["floor"] * mod.DRIFT_BREACH_FACTOR
    }
    assert not breaches, (
        f"cumulative drift past {mod.DRIFT_BREACH_FACTOR}x — a floor "
        f"reset needs a named correctness mechanism in ratchet_log: "
        f"{breaches}"
    )


def test_floors_never_above_baseline_by_construction():
    # A floor ABOVE its baseline means the baseline improved past the
    # floor but the floor wasn't ratcheted down — the ledger then
    # understates future drift headroom. bench_compare prints the hint;
    # this pins that the committed file acted on it.
    base = _load_baseline()
    stale = {
        q: (v, base["floors"][q]["floor"])
        for q, v in base["queries"].items()
        if q in base.get("floors", {}) and v < base["floors"][q]["floor"]
    }
    assert not stale, f"floors needing a downward ratchet: {stale}"


def test_reset_floors_carry_reasons():
    base = _load_baseline()
    for q, ent in base.get("floors", {}).items():
        if "reason" in ent:
            assert len(ent["reason"]) > 10, f"{q}: empty reset reason"


def test_gate_fails_on_injected_floor_breach(tmp_path, monkeypatch, capsys):
    mod = _load_compare_module()
    base = _load_baseline()
    # a bench run that exactly matches every committed baseline
    bench = {
        "metric": "headline_total",
        "value": base["total"],
        "unit": "sec",
        "sf": base["sf"],
        "queries": dict(base["queries"]),
    }
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))

    repo_dir = tmp_path / "repo"
    (repo_dir / "tools").mkdir(parents=True)
    # healthy copy -> gate passes
    with open(repo_dir / "BENCH_BASELINE.json", "w") as f:
        json.dump(base, f)
    monkeypatch.setattr(
        os.path, "dirname", _dirname_redirect(repo_dir), raising=True
    )
    try:
        monkeypatch.setattr(sys, "argv", ["bench_compare", str(bench_path)])
        assert mod.main() == 0
        # inject a breach: one query's baseline silently tripled
        broken = json.loads(json.dumps(base))
        victim = sorted(broken["queries"])[0]
        broken["queries"][victim] = broken["floors"][victim]["floor"] * 3
        bench["queries"][victim] = broken["queries"][victim]
        bench_path.write_text(json.dumps(bench))
        with open(repo_dir / "BENCH_BASELINE.json", "w") as f:
            json.dump(broken, f)
        assert mod.main() == 1
        out = capsys.readouterr().out
        assert "FLOOR-BREACH" in out and victim in out
    finally:
        monkeypatch.undo()


def _dirname_redirect(repo_dir):
    """bench_compare locates BENCH_BASELINE.json two dirname() hops up
    from its own __file__; redirect exactly that lookup at the tmp copy
    while every other dirname call behaves normally."""
    real_dirname = os.path.dirname.__wrapped__ if hasattr(
        os.path.dirname, "__wrapped__"
    ) else os.path.dirname

    def fake(path):
        if path.endswith(os.path.join("tools", "bench_compare.py")):
            return str(repo_dir / "tools")
        return real_dirname(path)

    return fake


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


# --------------------------------------------------------------------------
# Cold-probe adjudication (VERDICT r9 #2): a deliberately warm battery
# run must close green without a human, a planted REAL slowdown must
# still fail, and non-timing defects must never be adjudicated away.
# --------------------------------------------------------------------------
def test_adjudicate_cold_clears_warm_artifacts():
    mod = _load_compare_module()
    flags = [("q_a", 1.8, 1.1), ("q_b", 2.4, 1.5)]
    real, cleared = mod.adjudicate_cold(
        flags, prober=lambda names: {"q_a": 1.15, "q_b": 1.4}
    )
    assert not real and len(cleared) == 2


def test_adjudicate_cold_keeps_real_slowdowns():
    mod = _load_compare_module()
    flags = [("q_a", 2.6, 1.2), ("q_b", 2.4, 1.5)]
    real, cleared = mod.adjudicate_cold(
        flags, prober=lambda names: {"q_a": 2.5, "q_b": 1.3}
    )
    assert len(real) == 1 and "q_a" in real[0] and "reproduced" in real[0]
    assert len(cleared) == 1 and "q_b" in cleared[0]


def test_adjudicate_cold_fails_closed():
    mod = _load_compare_module()
    # missing probe result keeps the flag
    real, cleared = mod.adjudicate_cold(
        [("q_a", 2.0, 1.2)], prober=lambda names: {}
    )
    assert len(real) == 1 and "probe failed" in real[0]
    # more flags than the probe bound: not a warm-host artifact — all kept
    many = [(f"q{i}", 2.0, 1.2) for i in range(11)]
    real, cleared = mod.adjudicate_cold(
        many, prober=lambda names: pytest.fail("must not probe >bound")
    )
    assert len(real) == 11 and not cleared


def _warm_bench_setup(tmp_path, inflate):
    """A baseline copy plus a bench run where every >1s query is
    inflated by ``inflate`` (the warm-host signature)."""
    base = _load_baseline()
    bench = {
        "metric": "headline_total", "value": base["total"], "unit": "sec",
        "sf": base["sf"], "queries": dict(base["queries"]),
    }
    victims = sorted(
        n for n, v in base["queries"].items() if v > 1.0
    )[:5]
    for v in victims:
        bench["queries"][v] = round(base["queries"][v] * inflate, 3)
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))
    repo_dir = tmp_path / "repo"
    (repo_dir / "tools").mkdir(parents=True)
    with open(repo_dir / "BENCH_BASELINE.json", "w") as f:
        json.dump(base, f)
    return base, victims, bench_path, repo_dir


def test_warm_battery_closes_green_under_cold_adjudication(
    tmp_path, monkeypatch, capsys
):
    mod = _load_compare_module()
    base, victims, bench_path, repo_dir = _warm_bench_setup(tmp_path, 1.8)
    monkeypatch.setattr(
        os.path, "dirname", _dirname_redirect(repo_dir), raising=True
    )
    try:
        monkeypatch.setattr(
            mod, "_subprocess_prober",
            lambda names: {n: base["queries"][n] for n in names},
        )
        monkeypatch.setattr(
            sys, "argv",
            ["bench_compare", str(bench_path), "--adjudicate-cold"],
        )
        assert mod.main() == 0
        out = capsys.readouterr().out
        assert out.count("cold-cleared") == len(victims)
        assert "REAL-REGRESSION" not in out
    finally:
        monkeypatch.undo()


def test_planted_real_slowdown_still_fails_adjudication(
    tmp_path, monkeypatch, capsys
):
    mod = _load_compare_module()
    base, victims, bench_path, repo_dir = _warm_bench_setup(tmp_path, 1.8)
    slow = victims[0]
    monkeypatch.setattr(
        os.path, "dirname", _dirname_redirect(repo_dir), raising=True
    )
    try:
        monkeypatch.setattr(
            mod, "_subprocess_prober",
            # the planted slowdown reproduces cold; the rest clear
            lambda names: {
                n: base["queries"][n] * (2.0 if n == slow else 1.0)
                for n in names
            },
        )
        monkeypatch.setattr(
            sys, "argv",
            ["bench_compare", str(bench_path), "--adjudicate-cold"],
        )
        assert mod.main() == 1
        out = capsys.readouterr().out
        assert "REAL-REGRESSION" in out and slow in out
        assert out.count("cold-cleared") == len(victims) - 1
    finally:
        monkeypatch.undo()


def test_ledger_defects_are_never_adjudicated(tmp_path, monkeypatch, capsys):
    mod = _load_compare_module()
    base, victims, bench_path, repo_dir = _warm_bench_setup(tmp_path, 1.8)
    # inject a floor breach alongside the warm flags
    broken = json.loads(json.dumps(base))
    victim = victims[0]
    broken["queries"][victim] = broken["floors"][victim]["floor"] * 3
    with open(repo_dir / "BENCH_BASELINE.json", "w") as f:
        json.dump(broken, f)
    monkeypatch.setattr(
        os.path, "dirname", _dirname_redirect(repo_dir), raising=True
    )
    try:
        monkeypatch.setattr(
            mod, "_subprocess_prober",
            lambda names: pytest.fail(
                "ledger defects must not trigger cold probes"
            ),
        )
        monkeypatch.setattr(
            sys, "argv",
            ["bench_compare", str(bench_path), "--adjudicate-cold"],
        )
        assert mod.main() == 1
        assert "FLOOR-BREACH" in capsys.readouterr().out
    finally:
        monkeypatch.undo()
