"""M1 forget + M2 copy-replace migration golden tests
(test/pg/store_test.go:373-482, 484-633) and compaction.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from eventsourcing_spark.maintenance import compact_events, forget, migrate_in_place
from eventsourcing_spark.maintenance.migration import KIND_INVALIDATED
from eventsourcing_spark.store import EventStore
from eventsourcing_spark.store.codec import JsonCodec

from tests.account import (
    KIND_CREATED,
    KIND_DEPOSITED,
    KIND_OWNER_UPDATED,
    KIND_WITHDRAWN,
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = T0 + timedelta(hours=1)


def test_forget_golden(spark, tmp_path):
    """Bodies scrubbed (owner blanked) in events + snapshots; counts and
    all other fields intact (test/pg/store_test.go:373-482)."""
    store = EventStore(spark, str(tmp_path / "fg"))
    last_id, _ = store.append(
        "acc-f", "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Paulo"}),
            (KIND_OWNER_UPDATED, {"owner": "Paulo Quintans"}),
            (KIND_OWNER_UPDATED, {"owner": "Paulo Quintans Pereira"}),
        ],
        expected_version=0, created_at=T0,
    )
    store.save_snapshot(
        last_id, "acc-f", 3, "Account",
        {"status": "OPEN", "balance": 100, "owner": "Paulo Quintans Pereira"},
        created_at=T0,
    )
    # an unrelated stream must be untouched
    store.append(
        "acc-other", "Account",
        [(KIND_CREATED, {"money": 5, "owner": "Keep"})],
        expected_version=0, created_at=T0,
    )

    before = {r.id: r for r in store.events().collect()}

    forget(
        store,
        "acc-f",
        kinds=(KIND_OWNER_UPDATED,),
        event_scrubber=lambda kind, body: {**body, "owner": ""},
    )

    after = {r.id: r for r in store.events().collect()}
    assert set(before) == set(after)  # no rows added/removed
    for rid, row in after.items():
        old = before[rid]
        assert (row.aggregate_id, row.aggregate_version, row.kind) == (
            old.aggregate_id, old.aggregate_version, old.kind,
        )
        body = json.loads(bytes(row.body))
        if row.aggregate_id == "acc-f" and row.kind == KIND_OWNER_UPDATED:
            assert body["owner"] == ""
        else:
            assert bytes(row.body) == bytes(old.body), rid

    snap_body = json.loads(bytes(store.get_snapshot("acc-f").first().body))
    assert snap_body["owner"] == ""
    assert snap_body["balance"] == 100


def split_owner(owner: str) -> dict:
    first, _, last = owner.partition(" ")
    return {"firstName": first, "lastName": last}


def migration_handler(events):
    """AccountCreated/OwnerUpdated → _V2 with structured owner
    (test/aggregatev2.go:66-116 upcaster semantics)."""
    out = []
    for kind, body in events:
        if kind == KIND_CREATED:
            out.append(
                (KIND_CREATED + "_V2",
                 {"money": body["money"], "owner": split_owner(body["owner"])})
            )
        elif kind == KIND_OWNER_UPDATED:
            out.append(
                (KIND_OWNER_UPDATED + "_V2", {"owner": split_owner(body["owner"])})
            )
        else:
            out.append((kind, body))
    return out


def test_migration_copy_replace_golden(spark, tmp_path):
    """4-event stream → 9 rows: v1-4 migration=1, v5 Invalidated,
    v6-9 migrated _V2 (test/pg/store_test.go:484-633)."""
    store = EventStore(spark, str(tmp_path / "mg"))
    last_id, _ = store.append(
        "acc-m", "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Paulo Pereira"}),
            (KIND_DEPOSITED, {"money": 20}),
            (KIND_WITHDRAWN, {"money": 15}),
            (KIND_OWNER_UPDATED, {"owner": "Paulo Quintans Pereira"}),
        ],
        expected_version=0, created_at=T0,
    )
    store.save_snapshot(
        last_id, "acc-m", 4, "Account",
        {"status": "OPEN", "balance": 105, "owner": "Paulo Quintans Pereira"},
        created_at=T0,
    )
    # untouched stream (no target kinds... it has created though) — use a
    # Wallet kind stream to stay out of scope
    store.append(
        "w-1", "Wallet", [(KIND_DEPOSITED, {"money": 3})],
        expected_version=0, created_at=T0,
    )

    n = migrate_in_place(
        store,
        revision=1,
        aggregate_kind="Account",
        target_kinds=(KIND_CREATED, KIND_OWNER_UPDATED),
        handler=migration_handler,
        new_aggregate_kind="Account_V2",
        now=T1,
    )
    assert n == 1

    # all generations on disk: 4 old + 5 new + 1 wallet
    raw = store.events_raw().filter(F.col("aggregate_id") == "acc-m")
    rows = raw.orderBy("aggregate_version").collect()
    assert len(rows) == 9
    assert [r.aggregate_version for r in rows] == list(range(1, 10))
    assert [r.migration for r in rows] == [1, 1, 1, 1, 0, 0, 0, 0, 0]
    assert rows[4].kind == KIND_INVALIDATED and rows[4].migrated is False
    assert [r.kind for r in rows[5:]] == [
        "AccountCreated_V2", KIND_DEPOSITED, KIND_WITHDRAWN, "OwnerUpdated_V2",
    ]
    assert all(r.migrated for r in rows[5:])
    assert all(r.aggregate_kind == "Account_V2" for r in rows[5:])
    assert json.loads(bytes(rows[5].body)) == {
        "money": 100, "owner": {"firstName": "Paulo", "lastName": "Pereira"},
    }
    assert json.loads(bytes(rows[8].body)) == {
        "owner": {"firstName": "Paulo", "lastName": "Quintans Pereira"},
    }
    # ids of the new generation continue after the old ones
    assert min(r.id for r in rows[4:]) > max(r.id for r in rows[:4])

    # active view shows ONLY the new generation + untouched wallet (F8)
    active = store.events()
    assert active.filter(F.col("aggregate_id") == "acc-m").count() == 5
    assert active.filter(F.col("aggregate_id") == "w-1").count() == 1

    # snapshots of the migrated stream were deleted
    assert store.get_snapshot("acc-m").count() == 0

    # fold of the active generation gives balance 105 with structured owner
    bal = sum(
        json.loads(bytes(r.body)).get("money", 0)
        * (1 if r.kind != KIND_WITHDRAWN else -1)
        for r in rows[5:]
    )
    assert bal == 105

    # idempotence: target kinds no longer exist in the active view
    assert (
        migrate_in_place(
            store, 2, "Account", (KIND_CREATED, KIND_OWNER_UPDATED),
            migration_handler, now=T1 + timedelta(hours=1),
        )
        == 0
    )


def test_migration_ids_unique_across_fnv_colliding_streams(spark, tmp_path):
    """Two streams whose aggregate_id FNV-31 hashes COLLIDE must still get
    globally unique migration event ids — the reference guarantees this
    via 80-bit random ULID entropy (eventid/eventid.go); here via a
    60-bit md5 stream digest + seq. Regression for the (hash << 32) | seq
    scheme, which emitted byte-identical ids for colliding streams."""
    from eventsourcing_spark.functions.hashing import fnv1a_32_py

    a, b = "acc-198824", "acc-568140"  # brute-forced FNV-31 collision
    assert fnv1a_32_py(a) == fnv1a_32_py(b)

    store = EventStore(spark, str(tmp_path / "col"), n_buckets=4)
    for agg in (a, b):
        store.append(
            agg, "Account",
            [(KIND_CREATED, {"money": 1, "owner": "X Y"}),
             (KIND_DEPOSITED, {"money": 2})],
            expected_version=0, created_at=T0,
        )
    n = migrate_in_place(
        store, revision=1, aggregate_kind="Account",
        target_kinds=(KIND_CREATED,), handler=migration_handler,
        new_aggregate_kind="Account_V2", now=T1,
    )
    assert n == 2
    new_rows = store.events_raw().filter(F.col("migration") == 0).collect()
    ids = [r.id for r in new_rows]
    assert len(ids) == len(set(ids)), "duplicate event ids across streams"
    # ids still monotone in version within each stream
    for agg in (a, b):
        srows = sorted(
            (r for r in new_rows if r.aggregate_id == agg),
            key=lambda r: r.aggregate_version,
        )
        assert [r.id for r in srows] == sorted(r.id for r in srows)


def test_vacuum_all_dropped_keeps_store_readable(spark, tmp_path):
    """n_keep == 0 path: vacuuming a store whose every generation is
    invalidated must not crash on read-back schema inference, must not
    leak the tmp dir, and must leave an empty-but-readable store."""
    import glob

    from eventsourcing_spark.maintenance import vacuum_migrated

    store = EventStore(spark, str(tmp_path / "vz"), n_buckets=4)
    store.append(
        "acc-z", "Account", [(KIND_CREATED, {"money": 1, "owner": "A B"})],
        expected_version=0, created_at=T0,
    )
    # invalidate EVERY row by hand (simulates an aborted migration whose
    # new generation was already vacuumed): migration=1 on all rows
    raw = store.events_raw().withColumn("migration", F.lit(1)).withColumn(
        "bucket", F.pmod(F.col("aggregate_id_hash"), F.lit(store.n_buckets))
    )
    from eventsourcing_spark.maintenance.rewrite import overwrite_dir
    overwrite_dir(raw, store._events_dir, partition_by=["bucket"])

    stats = vacuum_migrated(store)
    assert stats["rows_after"] == 0 and stats["rows_dropped"] == 1
    assert store.events_raw().count() == 0  # readable empty store
    assert not glob.glob(str(tmp_path / "vz/events.vacuum-*"))  # no tmp leak
    # still appendable after the wipe
    store.append(
        "acc-z2", "Account", [(KIND_CREATED, {"money": 2, "owner": "C"})],
        expected_version=0, created_at=T1,
    )
    assert store.events().count() == 1


def test_upcaster_chain_reads_old_bodies(spark):
    """X9 — upcasters let new readers consume pre-migration events
    (encoding/jsoncodec/codec.go:68-77)."""
    codec = JsonCodec()
    codec.register_upcaster(
        KIND_CREATED,
        lambda kind, body: (
            KIND_CREATED + "_V2",
            {"money": body["money"], "owner": split_owner(body["owner"])},
        ),
    )
    kind, body = codec.decode(KIND_CREATED, b'{"money":100,"owner":"Paulo Pereira"}')
    assert kind == "AccountCreated_V2"
    assert body == {"money": 100, "owner": {"firstName": "Paulo", "lastName": "Pereira"}}
    # fixpoint: already-upcasted kinds pass through
    kind2, body2 = codec.decode(kind, json.dumps(body).encode())
    assert (kind2, body2) == (kind, body)


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "cp"), n_buckets=4)
    for i in range(20):
        store.append(
            f"acc-{i}", "Account",
            [(KIND_CREATED, {"money": i, "owner": "x"})],
            expected_version=0, created_at=T0 + timedelta(seconds=i),
        )
    before = {(r.id, r.aggregate_id) for r in store.events().collect()}
    import glob
    n_files_before = len(glob.glob(str(tmp_path / "cp/events/**/*.parquet"), recursive=True))
    compact_events(store)
    after = {(r.id, r.aggregate_id) for r in store.events().collect()}
    n_files_after = len(glob.glob(str(tmp_path / "cp/events/**/*.parquet"), recursive=True))
    assert before == after
    assert n_files_after <= 4 < n_files_before


def test_compaction_small_files(spark, tmp_path):
    """File-per-append layout → compaction: file count collapses, rows
    and the active view survive bit-exact, and the store stays writable
    with optimistic concurrency intact."""
    from eventsourcing_spark.maintenance.compaction import (
        _dir_stats,
        compact_events,
    )

    store = EventStore(spark, str(tmp_path / "cp"), n_buckets=4)
    # 12 appends → 12 parquet files across 4 bucket dirs
    for i in range(12):
        store.append(
            f"acc-{i}", "Account",
            [(KIND_CREATED, {"money": 100 + i}), (KIND_DEPOSITED, {"money": i})],
            expected_version=0, created_at=T0,
        )
    before_rows = store.events().orderBy("id").collect()
    files_before, _ = _dir_stats(store._events_dir)
    assert files_before == 12

    stats = compact_events(store)
    assert stats["files_before"] == 12
    assert stats["files_after"] < 12
    assert stats["rows"] == 24

    after_rows = store.events().orderBy("id").collect()
    assert [tuple(r) for r in after_rows] == [tuple(r) for r in before_rows]

    # still appendable; conflict detection still sees compacted versions
    store.append(
        "acc-0", "Account", [(KIND_DEPOSITED, {"money": 7})],
        expected_version=2, created_at=T1,
    )
    assert store.events().filter(F.col("aggregate_id") == "acc-0").count() == 3
    import pytest as _pytest

    from eventsourcing_spark.store.event_store import ConcurrentModificationError
    with _pytest.raises(ConcurrentModificationError):
        store.append(
            "acc-1", "Account", [(KIND_DEPOSITED, {"money": 1})],
            expected_version=1, created_at=T1,
        )


def test_compaction_empty_store_noop(spark, tmp_path):
    from eventsourcing_spark.maintenance.compaction import compact_events

    store = EventStore(spark, str(tmp_path / "empty"))
    stats = compact_events(store)
    assert stats == {"files_before": 0, "files_after": 0, "bytes": 0, "rows": 0}


def test_vacuum_drops_invalidated_generations(spark, tmp_path):
    """M2 then vacuum: the superseded generation disappears physically,
    the active view is unchanged, and keep_revisions retains history."""
    from eventsourcing_spark.maintenance import vacuum_migrated

    store = EventStore(spark, str(tmp_path / "vac"), n_buckets=4)
    store.append(
        "acc-v", "Account",
        [(KIND_CREATED, {"money": 100, "owner": "A B"}),
         (KIND_DEPOSITED, {"money": 10})],
        expected_version=0, created_at=T0,
    )
    migrate_in_place(
        store, revision=1, aggregate_kind="Account",
        target_kinds=(KIND_CREATED,), handler=migration_handler,
        new_aggregate_kind="Account_V2", now=T1,
    )
    assert store.events_raw().count() == 5  # 2 old + guard + 2 new
    active_before = {(r.id, r.kind) for r in store.events().collect()}

    # retention keeps rev 1 → no-op
    stats = vacuum_migrated(store, keep_revisions=1)
    assert stats["rows_dropped"] == 0 and store.events_raw().count() == 5

    stats = vacuum_migrated(store)
    assert stats == {
        "rows_before": 5, "rows_after": 3, "rows_dropped": 2,
        "files_before": stats["files_before"],
        "files_after": stats["files_after"],
    }
    assert store.events_raw().count() == 3
    assert {(r.id, r.kind) for r in store.events().collect()} == active_before

    # idempotent: second vacuum reclaims nothing
    assert vacuum_migrated(store)["rows_dropped"] == 0
