"""Concurrent-writer semantics for S1 (optimistic concurrency under real
parallelism — the reference's unique-index guarantee)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

from eventsourcing_spark.store import ConcurrentModificationError, EventStore

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_racing_writers_one_wins(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "race"))
    store.append(
        "acc-x", "Account",
        [("AccountCreated", {"money": 1, "owner": "O"})],
        expected_version=0, created_at=T0,
    )

    def write(i):
        try:
            store.append(
                "acc-x", "Account",
                [("MoneyDeposited", {"money": i})],
                expected_version=1,  # every racer targets v2
                created_at=T0,
            )
            return "ok"
        except ConcurrentModificationError:
            return "conflict"

    with ThreadPoolExecutor(8) as ex:
        results = list(ex.map(write, range(8)))
    assert results.count("ok") == 1
    assert results.count("conflict") == 7
    # exactly one v2 row exists
    rows = store.events().filter("aggregate_version = 2").collect()
    assert len(rows) == 1


def test_parallel_writers_different_streams(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "par"))

    def write(i):
        store.append(
            f"acc-{i}", "Account",
            [("AccountCreated", {"money": i, "owner": "O"})],
            expected_version=0, created_at=T0,
        )
        return i

    with ThreadPoolExecutor(8) as ex:
        done = list(ex.map(write, range(16)))
    assert len(done) == 16
    assert store.events().count() == 16
    # versions all 1, unique aggregate set
    assert store.events().select("aggregate_id").distinct().count() == 16


def test_lock_released_after_error(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "rel"))
    store.append("a", "Account", [("AccountCreated", {"money": 1, "owner": "x"})],
                 expected_version=0, created_at=T0)
    try:
        store.append("a", "Account", [("AccountCreated", {"money": 1, "owner": "x"})],
                     expected_version=0, created_at=T0)
    except ConcurrentModificationError:
        pass
    # lock must not leak: next append proceeds immediately
    _, v = store.append("a", "Account", [("MoneyDeposited", {"money": 2})],
                        expected_version=1, created_at=T0)
    assert v == 2
