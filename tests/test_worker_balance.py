"""Worker-balancer math parity — the reference's own unit goldens
(worker/balance_workers_test.go:27 TestMembersList) reproduced against
the pure decision rule in eventsourcing_spark.worker."""

from __future__ import annotations

from eventsourcing_spark.worker import PeerView, balance_step, simulate_heartbeats

WORKERS = ["w1", "w2", "w3", "w4"]


def _counts(state):
    return {p: len(w) for p, w in state.items()}


def test_single_peer_runs_everything():
    # golden: node B1 alone -> 4 running (balance_workers_test.go:36)
    state = simulate_heartbeats(["B1"], WORKERS)
    assert sorted(state["B1"]) == WORKERS


def test_two_peers_split_2_2():
    # golden: B2 joins -> 2 + 2 (balance_workers_test.go:44-47)
    state = simulate_heartbeats(["B1"], WORKERS)
    state = simulate_heartbeats(["B1", "B2"], WORKERS, state)
    assert _counts(state) == {"B1": 2, "B2": 2}
    assert sorted(state["B1"] + state["B2"]) == WORKERS  # disjoint cover


def test_three_peers_each_one_or_two_total_four():
    # golden: B3 joins -> each holds 1..2, total exactly 4
    # (balance_workers_test.go:53-61)
    state = simulate_heartbeats(["B1"], WORKERS)
    state = simulate_heartbeats(["B1", "B2"], WORKERS, state)
    state = simulate_heartbeats(["B1", "B2", "B3"], WORKERS, state)
    counts = _counts(state)
    assert all(1 <= c <= 2 for c in counts.values()), counts
    assert sum(counts.values()) == 4
    assert sorted(state["B1"] + state["B2"] + state["B3"]) == WORKERS

    # stability golden: further heartbeats change nothing
    # (balance_workers_test.go:64-71)
    again = simulate_heartbeats(["B1", "B2", "B3"], WORKERS, state)
    assert again == state


def test_peer_death_redistributes_without_loss():
    # golden: kill B1 -> B2+B3 repartition all 4 workers
    # (balance_workers_test.go:73-83)
    state = simulate_heartbeats(["B1"], WORKERS)
    state = simulate_heartbeats(["B1", "B2"], WORKERS, state)
    state = simulate_heartbeats(["B1", "B2", "B3"], WORKERS, state)
    del state["B1"]
    state = simulate_heartbeats(["B2", "B3"], WORKERS, state)
    assert _counts(state) == {"B2": 2, "B3": 2}
    assert sorted(state["B2"] + state["B3"]) == WORKERS


def test_remainder_claimed_only_after_all_have_min():
    # the +1 rule (balance_workers.go:208-210): with 5 workers / 2 peers
    # the remainder slot is claimed only once both hold the min 2 —
    # never both claiming 3
    ws = ["w1", "w2", "w3", "w4", "w5"]
    state = simulate_heartbeats(["A", "B"], ws)
    counts = sorted(_counts(state).values())
    assert counts == [2, 3]
    assert sorted(state["A"] + state["B"]) == ws


def test_absent_peer_counts_itself():
    # a peer missing from the ledger includes itself in the peer count
    # (balance_workers.go:164-175): quota 2, not 4
    mine = balance_step("me", [PeerView("other", ["w1", "w2"])], WORKERS, [])
    assert len(mine) == 2
    assert set(mine).isdisjoint({"w1", "w2"})


def test_no_double_assignment_under_any_interleaving():
    # exhaustive-ish: every heartbeat order over 3 peers keeps the
    # assignment a partition of the worker set
    import itertools

    for order in itertools.permutations(["P1", "P2", "P3"]):
        state = {p: [] for p in order}
        for _ in range(6):
            for me in order:
                ledger = [PeerView(p, list(w)) for p, w in state.items()]
                state[me] = balance_step(me, ledger, WORKERS, state[me])
        allw = [w for ws in state.values() for w in ws]
        assert sorted(allw) == WORKERS, (order, state)
