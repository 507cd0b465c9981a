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


# ---------------------------------------------------------------------------
# C6 — PARTITION_SLOTS parsing (worker/runworker.go:146-184) and the
# forwarder names built from slots (worker/forwarder.go:16-36), golden-
# tested against the reference README's partitioning walkthrough
# (README.md:510-553: PARTITION_SLOTS=1-4,5-8,9-12 over 3 replicas, and
# the 12-partition 1-6/7-12 two-instance example).
# ---------------------------------------------------------------------------

import pytest

from eventsourcing_spark.worker import (
    PartitionSlot,
    parse_slot,
    parse_slots,
    partitioned_forwarder_names,
    simulate_heartbeats,
)


def test_parse_slot_goldens():
    assert parse_slot("1-6") == PartitionSlot(1, 6)
    assert parse_slot("7-12") == PartitionSlot(7, 12)
    assert parse_slot("3") == PartitionSlot(3, 3)
    assert parse_slot("0") == PartitionSlot(0, 0)
    assert parse_slot("1-6").size == 6
    assert parse_slot("3").size == 1


def test_parse_slots_readme_example():
    # README.md:530 — PARTITION_SLOTS=1-4,5-8,9-12 (raw env string and
    # pre-split list both accepted)
    slots = parse_slots("1-4,5-8,9-12")
    assert slots == [PartitionSlot(1, 4), PartitionSlot(5, 8),
                     PartitionSlot(9, 12)]
    assert [s.size for s in slots] == [4, 4, 4]
    assert parse_slots(["1-6", "7-12"]) == [PartitionSlot(1, 6),
                                            PartitionSlot(7, 12)]


def test_parse_slot_rejects_malformed():
    # loud-error divergences from Go documented at parse_slot: Go's
    # uint32 cast would wrap "-1" to 4294967295 and silently ignore the
    # third token of "1-2-3"
    for bad in ("", "a", "1-b", "1-2-3", "-1", "5-2"):
        with pytest.raises(ValueError):
            parse_slot(bad)


def test_forwarder_names_and_balance_integration():
    # forwarder.go names one worker per slot "{name}-{low}-{high}"; the
    # README walkthrough then balances 3 slots over 1→2→3 replicas
    slots = parse_slots("1-4,5-8,9-12")
    names = partitioned_forwarder_names("fwd", slots)
    assert names == ["fwd-1-4", "fwd-5-8", "fwd-9-12"]

    # 1 replica locks all 3 slots (x = 3/1)
    s1 = simulate_heartbeats(["i1"], names)
    assert sorted(s1["i1"]) == names
    # second replica arrives: x = ceil-ish 3/2 → 2 + 1
    s2 = simulate_heartbeats(["i1", "i2"], names, assignments=s1)
    assert sorted(len(v) for v in s2.values()) == [1, 2]
    # third replica: x = 3/3 → one slot each, full coverage
    s3 = simulate_heartbeats(["i1", "i2", "i3"], names, assignments=s2)
    assert sorted(len(v) for v in s3.values()) == [1, 1, 1]
    assert sorted(w for v in s3.values() for w in v) == names
