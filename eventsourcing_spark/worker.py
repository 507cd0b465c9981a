"""Worker-balancing math — the pure core of the reference's C7 balancer.

The reference spreads N named workers (one per projection/forwarder
partition) over a dynamic set of peers via a shared ledger + heartbeat
loop (worker/balance_workers.go:156-328). The DISTRIBUTED machinery —
redlock/consul locks, ledger registration, heartbeat turbo — is out of
scope here by design (SURVEY §2.9: on a Spark cluster the scheduler owns
task placement). The *balancing decision* itself, however, is a pure
function of the cluster view, and that math is what the reference's own
unit suite pins (worker/balance_workers_test.go:27: 1 peer → 4 workers,
2 peers → 2+2, 3 peers → 1..2 each summing 4, peer death → redistribute).
This module re-expresses exactly that decision rule so the engine keeps
behavioral parity where the reference has tests, without pretending to
own placement:

* quota = ``len(workers) // len(peers)`` (balance_workers.go:177-178);
* one EXTRA worker may be claimed only once every peer holds the
  minimum quota and a remainder exists (balance_workers.go:208-210 —
  prevents two peers grabbing the same remainder slot);
* acquire: first free workers in declared order, up to quota; release:
  first running workers, down to quota (balance_workers.go:285-318);
* a peer missing from the ledger still counts itself
  (balance_workers.go:164-175).

``simulate_heartbeats`` drives the rule round-robin the way the
reference's in-memory locker test does, and is used by the test suite to
reproduce the reference goldens.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PartitionSlot:
    """One partition range a worker owns (worker/runworker.go:146-153):
    ``PARTITION_SLOTS=1-6,7-12`` → two slots covering partitions 1-6 and
    7-12. ``size`` mirrors ``PartitionSlot.Size()`` (To - From + 1)."""

    low: int
    high: int

    @property
    def size(self) -> int:
        return self.high - self.low + 1


def parse_slot(slot: str) -> PartitionSlot:
    """``"1-6"`` → slot(1, 6); ``"3"`` → slot(3, 3)
    (worker/runworker.go:166-184 ``ParseSlot``).

    Divergences from the Go original, both loud-error where Go is
    silent: more than one ``-`` raises (Go ignores everything past the
    second token), and negative/reversed ranges raise (Go casts the
    parsed int to uint32, so ``-1`` silently becomes 4294967295 and a
    reversed range gets a wrapped Size). A config typo should stop the
    worker, not hand it four billion partitions."""
    parts = slot.split("-")
    if len(parts) > 2:
        raise ValueError(f"malformed partition slot {slot!r}: use N or N-M")
    try:
        low = int(parts[0])
        high = int(parts[1]) if len(parts) == 2 else low
    except ValueError:
        raise ValueError(f"malformed partition slot {slot!r}: use N or N-M")
    if low < 0 or high < low:
        raise ValueError(
            f"partition slot {slot!r} out of order: need 0 <= low <= high"
        )
    return PartitionSlot(low, high)


def parse_slots(slots: list[str] | str) -> list[PartitionSlot]:
    """``["1-4", "5-8"]`` (or the raw env string ``"1-4,5-8"``) → slot
    list (worker/runworker.go:155-164 ``ParseSlots``; README's
    ``PARTITION_SLOTS=1-4,5-8,9-12`` example)."""
    if isinstance(slots, str):
        slots = [s for s in (p.strip() for p in slots.split(",")) if s]
    return [parse_slot(s) for s in slots]


def partitioned_forwarder_names(name: str, slots: list[PartitionSlot]) -> list[str]:
    """Worker names for a slot list — one forwarder per slot, named
    ``{name}-{low}-{high}`` exactly as the reference builds them
    (worker/forwarder.go:16-36 ``PartitionedEventForwarders``). These
    are the ``all_workers`` the balancer spreads over peers."""
    return [f"{name}-{s.low}-{s.high}" for s in slots]


@dataclass
class PeerView:
    """One row of the ledger: a peer and the workers it has registered
    (worker/balance_workers.go:14-17)."""

    name: str
    workers: list[str] = field(default_factory=list)


def balance_step(
    me: str,
    peers: list[PeerView],
    all_workers: list[str],
    my_running: list[str],
) -> list[str]:
    """One heartbeat of the balancing rule: the workers peer ``me``
    should run next, given the current ledger view. Deterministic in
    the declared worker order (balance_workers.go:156-238, 285-318)."""
    present = any(p.name == me for p in peers)
    peers_count = len(peers) + (0 if present else 1)
    n = len(all_workers)
    quota = n // peers_count

    # all peers (me included) must hold the min quota before anyone
    # claims a remainder slot (balance_workers.go:181-210); the
    # reference's loop checks EVERY ledger row including the caller's
    # own, so a lagging self entry must also block the remainder claim
    # — checking my_running alone would claim it one heartbeat early.
    all_have_min = len(my_running) >= quota and all(
        len(p.workers) >= quota for p in peers
    )
    if all_have_min and n % peers_count:
        quota += 1

    in_use = {w for p in peers if p.name != me for w in p.workers}
    running = [w for w in my_running if w in set(all_workers)]
    in_use.update(running)

    if len(running) == quota:
        return running
    if len(running) > quota:
        # stop first running workers until at quota (go: Stop branch)
        keep = []
        excess = len(running) - quota
        for w in all_workers:
            if w in running:
                if excess > 0:
                    excess -= 1
                else:
                    keep.append(w)
        return keep
    # acquire first free workers until at quota (go: Start branch)
    for w in all_workers:
        if len(running) >= quota:
            break
        if w in in_use:
            continue
        running.append(w)
        in_use.add(w)
    return running


def simulate_heartbeats(
    peer_names: list[str],
    all_workers: list[str],
    assignments: dict[str, list[str]] | None = None,
    rounds: int = 10,
) -> dict[str, list[str]]:
    """Round-robin heartbeats against a shared in-memory ledger until a
    fixpoint (the in-mem locker drive of balance_workers_test.go).
    ``assignments`` carries state across membership changes — pass the
    previous result after adding/removing peers."""
    state: dict[str, list[str]] = {
        p: list((assignments or {}).get(p, [])) for p in peer_names
    }
    for _ in range(rounds):
        before = {p: list(w) for p, w in state.items()}
        for me in peer_names:
            ledger = [PeerView(p, list(w)) for p, w in state.items()]
            state[me] = balance_step(me, ledger, all_workers, state[me])
        if state == before:  # converged
            break
    return state
