"""Conformance tests — the reference backend suite re-expressed on Spark
(test/pg/store_test.go scenarios; goldens from FIXTURES.md §7).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from eventsourcing_spark.functions.hashing import fnv1a_32_py
from eventsourcing_spark.operators.rehydrate import rehydrate_all
from eventsourcing_spark.store import ConcurrentModificationError, EventStore, Filter

from tests.account import (
    HANDLERS,
    KIND_CREATED,
    KIND_DEPOSITED,
    account_states_sql,
    init_state,
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


@pytest.fixture()
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "es"), snapshot_threshold=3)


def seed_golden_account(store: EventStore, agg_id: str = "acc-1") -> None:
    """TestSaveAndGet fixture (test/pg/store_test.go:68-141): create 100,
    deposits 10+20 → snapshot at v3 (balance 130), deposits 5+1 → 136."""
    last_id, v = store.append(
        agg_id,
        "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Paulo"}),
            (KIND_DEPOSITED, {"money": 10}),
            (KIND_DEPOSITED, {"money": 20}),
        ],
        expected_version=0,
        created_at=T0,
    )
    assert v == 3
    store.save_snapshot(
        last_id, agg_id, 3, "Account",
        {"status": "OPEN", "balance": 130, "owner": "Paulo"}, created_at=T0,
    )
    store.append(
        agg_id,
        "Account",
        [(KIND_DEPOSITED, {"money": 5}), (KIND_DEPOSITED, {"money": 1})],
        expected_version=3,
        created_at=T0,
    )


def test_save_and_get_golden(store):
    seed_golden_account(store)
    rows = store.events().orderBy("aggregate_version").collect()
    assert [r.aggregate_version for r in rows] == [1, 2, 3, 4, 5]
    assert [r.kind for r in rows] == [KIND_CREATED] + [KIND_DEPOSITED] * 4
    # ids strictly increasing and consistent with version order
    ids = [r.id for r in rows]
    assert ids == sorted(ids) and len(set(ids)) == 5
    assert all(r.aggregate_id_hash == fnv1a_32_py("acc-1") for r in rows)

    snap = store.get_snapshot("acc-1").collect()
    assert len(snap) == 1
    assert json.loads(bytes(snap[0].body)) == {
        "status": "OPEN", "balance": 130, "owner": "Paulo",
    }

    # rehydrate with snapshot seed: folds only v4..v5 → balance 136
    out = rehydrate_all(
        store.events(), HANDLERS, init_state, snapshots=store.snapshots()
    ).collect()
    assert len(out) == 1
    assert out[0].aggregate_version == 5
    assert json.loads(out[0].state) == {
        "status": "OPEN", "balance": 136, "owner": "Paulo",
    }

    # rehydrate from scratch agrees
    out2 = rehydrate_all(store.events(), HANDLERS, init_state).collect()
    assert json.loads(out2[0].state)["balance"] == 136


def test_optimistic_concurrency(store):
    seed_golden_account(store)
    with pytest.raises(ConcurrentModificationError):
        store.append(
            "acc-1", "Account",
            [(KIND_DEPOSITED, {"money": 99})],
            expected_version=3,  # v4 already exists
            created_at=T0,
        )
    # non-conflicting append proceeds
    _, v = store.append(
        "acc-1", "Account", [(KIND_DEPOSITED, {"money": 4})],
        expected_version=5, created_at=T0,
    )
    assert v == 6


def test_snapshot_only_stream_rehydrates(store):
    store.save_snapshot(
        "01J00000000000000000000000", "acc-snap", 3, "Account",
        {"status": "OPEN", "balance": 42, "owner": "Ana"}, created_at=T0,
    )
    out = rehydrate_all(
        store.events(), HANDLERS, init_state, snapshots=store.snapshots()
    ).collect()
    by_id = {r.aggregate_id: r for r in out}
    assert json.loads(by_id["acc-snap"].state)["balance"] == 42
    assert by_id["acc-snap"].aggregate_version == 3


def test_sql_fold_matches_generic_fold(store):
    seed_golden_account(store, "acc-1")
    store.append(
        "acc-2", "Account",
        [
            (KIND_CREATED, {"money": 50, "owner": "Maria"}),
            ("MoneyWithdrawn", {"money": 20}),
            ("OwnerUpdated", {"owner": "Maria Q."}),
        ],
        expected_version=0,
        created_at=T0,
    )
    sql_rows = {
        r.aggregate_id: r for r in account_states_sql(store.events()).collect()
    }
    gen_rows = {
        r.aggregate_id: json.loads(r.state)
        for r in rehydrate_all(store.events(), HANDLERS, init_state).collect()
    }
    assert set(sql_rows) == set(gen_rows) == {"acc-1", "acc-2"}
    for agg_id in sql_rows:
        assert sql_rows[agg_id].balance == gen_rows[agg_id]["balance"], agg_id
        assert sql_rows[agg_id].owner == gen_rows[agg_id]["owner"], agg_id
    assert sql_rows["acc-2"].balance == 30
    assert sql_rows["acc-2"].owner == "Maria Q."


def test_filters_and_range_scan(store):
    # two tenants (TestListenerWithDiscriminator, test/pg/store_test.go:286-371)
    store.append(
        "t-abc", "Account",
        [(KIND_CREATED, {"money": 100, "owner": "A"}),
         (KIND_DEPOSITED, {"money": 10})],
        expected_version=0, discriminator={"tenant": "abc"}, created_at=T0,
    )
    store.append(
        "t-xyz", "Account",
        [(KIND_CREATED, {"money": 100, "owner": "X"}),
         (KIND_DEPOSITED, {"money": 10}),
         (KIND_DEPOSITED, {"money": 20}),
         (KIND_DEPOSITED, {"money": 5})],
        expected_version=0, discriminator={"tenant": "xyz"}, created_at=T0,
    )
    store.append(
        "other-kind", "Wallet",
        [(KIND_CREATED, {"money": 1, "owner": "W"})],
        expected_version=0, created_at=T0,
    )

    # F2 discriminator
    xyz = store.get_events(filter=Filter(discriminator={"tenant": ("xyz",)}))
    assert xyz.count() == 4
    assert {r.aggregate_id for r in xyz.collect()} == {"t-xyz"}

    # F1 kinds
    wallets = store.get_events(filter=Filter(aggregate_kinds=("Wallet",)))
    assert wallets.count() == 1

    # F3 splits: partition events by hash mod 2 — the two split scans tile
    all_ids = {r.id for r in store.get_events().collect()}
    s0 = {r.id for r in store.get_events(filter=Filter(splits=2, split_ids=(0,))).collect()}
    s1 = {r.id for r in store.get_events(filter=Filter(splits=2, split_ids=(1,))).collect()}
    assert s0 | s1 == all_ids and not (s0 & s1)

    # S3 keyset pagination: two batches tile the stream in id order
    ordered = sorted(all_ids)
    b1 = [r.id for r in store.get_events(batch_size=4).collect()]
    assert b1 == ordered[:4]
    b2 = [r.id for r in store.get_events(after=b1[-1], batch_size=10).collect()]
    assert b2 == ordered[4:]

    # S4 point-set
    assert store.get_events_by_ids(ordered[:2]).count() == 2

    # S2 by-stream with version offset
    tail = store.get_aggregate_events("t-xyz", gt_version=2).collect()
    assert [r.aggregate_version for r in tail] == [3, 4]

    # A5 distinct streams of a kind
    assert {
        r.aggregate_id for r in store.distinct_aggregates("Account").collect()
    } == {"t-abc", "t-xyz"}


def test_allowed_discriminator_keys(spark, tmp_path):
    store = EventStore(
        spark, str(tmp_path / "es2"), allowed_discriminator_keys=("tenant",)
    )
    store.append(
        "a1", "Account", [(KIND_CREATED, {"money": 1, "owner": "O"})],
        expected_version=0,
        discriminator={"tenant": "abc", "geo": "EU"},  # geo not allowed → dropped
        created_at=T0,
    )
    row = store.events().first()
    assert dict(row.discriminator) == {"tenant": "abc"}


def test_bucket_pruning_matches_full_scan(spark, tmp_path):
    """S2/S3 bucket pruning is an access path, never a semantics change."""
    from datetime import datetime, timezone

    from eventsourcing_spark.store import EventStore, Filter

    store = EventStore(spark, str(tmp_path / "prune"), n_buckets=8)
    t0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    for i in range(12):
        store.append(
            f"agg-{i}", "Account",
            [("AccountCreated", {"money": i, "owner": "x"})],
            expected_version=0, created_at=t0,
        )
    # single-stream read prunes to the stream's bucket directory
    s2 = store.get_aggregate_events("agg-3")
    plan = s2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert s2.count() == 1
    # split-filtered scan: pruned result == row-predicate result
    f = Filter(splits=4, split_ids=(0, 2))
    pruned = [r.id for r in store.get_events(filter=f).collect()]
    full = [
        r.id
        for r in store.events().filter(f.predicate()).orderBy("id").collect()
    ]
    assert pruned == full and len(pruned) > 0
    # non-dividing split grid falls back to the row predicate (still right)
    f3 = Filter(splits=3, split_ids=(1,))
    assert (
        store.get_events(filter=f3).count()
        == store.events().filter(f3.predicate()).count()
    )
