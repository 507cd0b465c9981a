"""Oracle-gated maintenance-path queries (VERDICT r02 #5).

The write/maintenance operators were pytest-golden only; the driver
never saw them. These gate entries synthesize a deterministic fixture
event store from the driver's ``events`` table (stream ids and bodies
are pure arithmetic over the first N distinct user_ids), run the REAL
write-path operators on it — ``EventStore.append`` with discriminators,
``migrate_in_place`` — and emit the resulting end state; the DuckDB
oracle computes the identical end state arithmetically without ever
touching a store.

* ``m2_migration_endstate`` — the 9-rows-per-stream copy-replace golden
  of test/pg/store_test.go:551-632 generalized to N streams: old
  generation ``migration = rev``, the ``Invalidated`` guard row, and the
  migrated ``_V2`` generation with upcasted JSON bodies, byte-exact.
* ``f4_context_discriminator`` — the context-discriminator merge read
  (store/store.go:195-228): a Filter's key→values OR-set ANDed with the
  ambient context's equality conjunction.

Event ids are ULIDs with random components, so the gate output pins
versions/kinds/bodies/flags — everything the end state defines — and
omits ids (their ordering is asserted by the pytest golden instead).
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import shutil
import tempfile
from datetime import datetime, timezone

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table, materialize
from eventsourcing_spark.maintenance.migration import migrate_in_place
from eventsourcing_spark.queries import query
from eventsourcing_spark.store.event_store import EventStore, Filter

N_STREAMS = 8
T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)

_UIDS_SQL = (
    f"SELECT user_id AS uid FROM ("
    f"SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT {N_STREAMS})"
)


def _fixture_uids(spark, sf_dir) -> list[int]:
    ev = load_table(spark, sf_dir, "events")
    return [
        int(r.user_id)
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(N_STREAMS).collect()
    ]


def _owner(uid: int) -> str:
    return f"First{uid} Middle{uid % 3} Last{uid % 7}"


def _owner2(uid: int) -> str:
    return f"New{uid} Owner{uid % 4}"


def _stream_events(uid: int) -> list[tuple[str, dict]]:
    return [
        ("AccountCreated", {"money": 100 + uid % 50, "owner": _owner(uid)}),
        ("MoneyDeposited", {"money": 20 + uid % 10}),
        ("MoneyWithdrawn", {"money": 5 + uid % 5}),
        ("OwnerUpdated", {"owner": _owner2(uid)}),
    ]


def _disc(uid: int) -> dict[str, str]:
    return {"tenant": f"t{uid % 3}", "region": f"r{uid % 2}"}


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _build_fixture_store(spark, sf_dir: str, tag: str) -> EventStore:
    # stable digest, NOT hash(): PYTHONHASHSEED randomizes str hashes per
    # process, which would name a fresh dir every run and strand the old
    # ones. The pid suffix isolates CONCURRENT processes (two sessions
    # building the same fixture raced on a purely-stable name); the sweep
    # below reclaims dirs left by dead processes, so nothing strands.
    tmp = tempfile.gettempdir()
    for stale in glob.glob(os.path.join(tmp, "es_gate_*_pid*")):
        m = re.search(r"_pid(\d+)$", stale)
        if m and not _pid_alive(int(m.group(1))):
            shutil.rmtree(stale, ignore_errors=True)
    sf_key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tmp, f"es_gate_{tag}_{sf_key}_pid{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    store = EventStore(spark, base)
    for uid in _fixture_uids(spark, sf_dir):
        store.append(
            f"acc-{uid}",
            "Account",
            _stream_events(uid),
            expected_version=0,
            discriminator=_disc(uid),
            created_at=T0,
        )
    return store


def _make_migration_handler():
    """AccountCreated/OwnerUpdated → _V2 with structured owner
    (test/aggregatev2.go:66-116 upcaster semantics).

    Returned as a NESTED function on purpose: the handler runs inside
    the grouped-map worker, and a module-level function would pickle by
    module reference — unimportable under the driver's pristine session
    (no PYTHONPATH export). Nested functions pickle by value."""

    def handler(events):
        out = []
        for kind, body in events:
            if kind == "AccountCreated":
                first, _, last = body["owner"].partition(" ")
                out.append(
                    (
                        "AccountCreated_V2",
                        {
                            "money": body["money"],
                            "owner": {"firstName": first, "lastName": last},
                        },
                    )
                )
            elif kind == "OwnerUpdated":
                first, _, last = body["owner"].partition(" ")
                out.append(
                    (
                        "OwnerUpdated_V2",
                        {"owner": {"firstName": first, "lastName": last}},
                    )
                )
            else:
                out.append((kind, body))
        return out

    return handler


# old-generation body strings, shared by both engines' derivations
_B_CREATED = (
    "'{\"money\":' || CAST(100 + uid % 50 AS VARCHAR) || ',\"owner\":\"First'"
    " || CAST(uid AS VARCHAR) || ' Middle' || CAST(uid % 3 AS VARCHAR)"
    " || ' Last' || CAST(uid % 7 AS VARCHAR) || '\"}'"
)
_B_DEPOSITED = "'{\"money\":' || CAST(20 + uid % 10 AS VARCHAR) || '}'"
_B_WITHDRAWN = "'{\"money\":' || CAST(5 + uid % 5 AS VARCHAR) || '}'"
_B_OWNERUPD = (
    "'{\"owner\":\"New' || CAST(uid AS VARCHAR) || ' Owner'"
    " || CAST(uid % 4 AS VARCHAR) || '\"}'"
)
# migrated-generation bodies: owner split at the first space
_B_CREATED_V2 = (
    "'{\"money\":' || CAST(100 + uid % 50 AS VARCHAR)"
    " || ',\"owner\":{\"firstName\":\"First' || CAST(uid AS VARCHAR)"
    " || '\",\"lastName\":\"Middle' || CAST(uid % 3 AS VARCHAR)"
    " || ' Last' || CAST(uid % 7 AS VARCHAR) || '\"}}'"
)
_B_OWNERUPD_V2 = (
    "'{\"owner\":{\"firstName\":\"New' || CAST(uid AS VARCHAR)"
    " || '\",\"lastName\":\"Owner' || CAST(uid % 4 AS VARCHAR) || '\"}}'"
)


@query(
    "m2_migration_endstate",
    f"""
    WITH uids AS ({_UIDS_SQL}),
    rows AS (
        SELECT uid, 1 AS v, 'Account' AS ak, 'AccountCreated' AS kind,
               1 AS mig, 0 AS migrated, {_B_CREATED} AS body_str FROM uids
        UNION ALL
        SELECT uid, 2, 'Account', 'MoneyDeposited', 1, 0, {_B_DEPOSITED}
        FROM uids
        UNION ALL
        SELECT uid, 3, 'Account', 'MoneyWithdrawn', 1, 0, {_B_WITHDRAWN}
        FROM uids
        UNION ALL
        SELECT uid, 4, 'Account', 'OwnerUpdated', 1, 0, {_B_OWNERUPD}
        FROM uids
        UNION ALL
        SELECT uid, 5, 'Account', 'Invalidated', 0, 0, '{{}}' FROM uids
        UNION ALL
        SELECT uid, 6, 'Account_V2', 'AccountCreated_V2', 0, 1, {_B_CREATED_V2}
        FROM uids
        UNION ALL
        SELECT uid, 7, 'Account_V2', 'MoneyDeposited', 0, 1, {_B_DEPOSITED}
        FROM uids
        UNION ALL
        SELECT uid, 8, 'Account_V2', 'MoneyWithdrawn', 0, 1, {_B_WITHDRAWN}
        FROM uids
        UNION ALL
        SELECT uid, 9, 'Account_V2', 'OwnerUpdated_V2', 0, 1, {_B_OWNERUPD_V2}
        FROM uids
    )
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(v AS BIGINT) AS aggregate_version,
           ak AS aggregate_kind, kind,
           CAST(mig AS BIGINT) AS migration,
           CAST(migrated AS BIGINT) AS migrated,
           body_str
    FROM rows
    """,
)
def m2_migration_endstate(spark, sf_dir):
    """Build the fixture store, run the REAL copy-replace migration, and
    emit every on-disk generation — the end state the 9-row golden pins."""
    store = _build_fixture_store(spark, sf_dir, "m2")
    n = migrate_in_place(
        store,
        revision=1,
        aggregate_kind="Account",
        target_kinds=("AccountCreated", "OwnerUpdated"),
        handler=_make_migration_handler(),
        new_aggregate_kind="Account_V2",
        now=T1,
    )
    assert n == N_STREAMS, f"expected {N_STREAMS} streams migrated, got {n}"
    out = store.events_raw().select(
        "aggregate_id",
        F.col("aggregate_version").cast("long").alias("aggregate_version"),
        "aggregate_kind",
        "kind",
        F.col("migration").cast("long").alias("migration"),
        F.col("migrated").cast("long").alias("migrated"),
        F.col("body").cast("string").alias("body_str"),
    )
    # materialize before returning: the fixture dir is rebuilt per call,
    # so the result must not lazily re-read it later
    return out.transform(materialize)


@query(
    "f4_context_discriminator",
    f"""
    WITH uids AS ({_UIDS_SQL}),
    hit AS (
        SELECT uid FROM uids WHERE uid % 3 IN (0, 1) AND uid % 2 = 0
    ),
    rows AS (
        SELECT uid, 1 AS v, 'AccountCreated' AS kind FROM hit
        UNION ALL SELECT uid, 2, 'MoneyDeposited' FROM hit
        UNION ALL SELECT uid, 3, 'MoneyWithdrawn' FROM hit
        UNION ALL SELECT uid, 4, 'OwnerUpdated' FROM hit
    )
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(v AS BIGINT) AS aggregate_version,
           kind,
           't' || CAST(uid % 3 AS VARCHAR) AS tenant,
           'r' || CAST(uid % 2 AS VARCHAR) AS region
    FROM rows
    """,
)
def f4_context_discriminator(spark, sf_dir):
    """Filter discriminator OR-set (tenant ∈ {{t0,t1}}) ANDed with the
    ambient context's equality conjunction (region = r0) — the F4 merge,
    exercised through the real store read path over a fixture store with
    per-stream discriminators."""
    store = _build_fixture_store(spark, sf_dir, "f4")
    df = store.get_events(
        filter=Filter(discriminator={"tenant": ("t0", "t1")}),
        discriminator={"region": "r0"},
    )
    out = df.select(
        "aggregate_id",
        F.col("aggregate_version").cast("long").alias("aggregate_version"),
        "kind",
        F.col("discriminator").getItem("tenant").alias("tenant"),
        F.col("discriminator").getItem("region").alias("region"),
    )
    return out.transform(materialize)


_UID0_SQL = f"(SELECT min(uid) FROM ({_UIDS_SQL}))"


@query(
    "m1_forget_endstate",
    f"""
    WITH uids AS ({_UIDS_SQL}),
    rows AS (
        SELECT uid, 1 AS v, 'AccountCreated' AS kind,
               CASE WHEN uid = {_UID0_SQL}
                    THEN '{{"money":' || CAST(100 + uid % 50 AS VARCHAR)
                         || ',"owner":"[forgotten]"}}'
                    ELSE {_B_CREATED} END AS body_str
        FROM uids
        UNION ALL
        SELECT uid, 2, 'MoneyDeposited', {_B_DEPOSITED} FROM uids
        UNION ALL
        SELECT uid, 3, 'MoneyWithdrawn', {_B_WITHDRAWN} FROM uids
        UNION ALL
        SELECT uid, 4, 'OwnerUpdated',
               CASE WHEN uid = {_UID0_SQL}
                    THEN '{{"owner":"[forgotten]"}}'
                    ELSE {_B_OWNERUPD} END
        FROM uids
    )
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(v AS BIGINT) AS aggregate_version,
           kind, body_str
    FROM rows
    """,
)
def m1_forget_endstate(spark, sf_dir):
    """M1 GDPR forget through the REAL distributed rewrite
    (maintenance/forget.py — pandas-UDF scrub of matching rows, byte
    pass-through of everything else; eventstore.go:405-432): owner
    fields of ONE stream's target kinds are scrubbed, all other rows
    must come back byte-identical. The scrubber is a nested function
    (pickle-by-value: the executor can't import this package under the
    driver's pristine session)."""
    from eventsourcing_spark.maintenance.forget import forget

    store = _build_fixture_store(spark, sf_dir, "m1")
    uid0 = _fixture_uids(spark, sf_dir)[0]

    def scrubber(kind, body):
        out = dict(body)
        out["owner"] = "[forgotten]"
        return out

    forget(
        store,
        aggregate_id=f"acc-{uid0}",
        kinds=("AccountCreated", "OwnerUpdated"),
        event_scrubber=scrubber,
    )
    out = store.events().select(
        "aggregate_id",
        F.col("aggregate_version").cast("long").alias("aggregate_version"),
        "kind",
        F.col("body").cast("string").alias("body_str"),
    )
    return out.transform(materialize)


@query(
    "x9_upcaster_chain",
    f"""
    WITH uids AS ({_UIDS_SQL})
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(1 AS BIGINT) AS aggregate_version,
           'AccountCreated_V3' AS final_kind,
           '{{"owner":{{"firstName":"First' || CAST(uid AS VARCHAR)
           || '","lastName":"Middle' || CAST(uid % 3 AS VARCHAR)
           || ' Last' || CAST(uid % 7 AS VARCHAR)
           || '"}},"money_cents":' || CAST((100 + uid % 50) * 100 AS VARCHAR)
           || '}}' AS body_str
    FROM uids
    """,
)
def x9_upcaster_chain(spark, sf_dir):
    """X9 upcaster-chain-to-fixpoint semantics (codec.go:51-77),
    distributed: V1 AccountCreated bodies read back through a 2-hop
    chain (V1 → V2 structured owner → V3 integer cents), stopping when
    no upcaster is registered for the resulting kind — the exact loop
    ``JsonCodec.decode`` runs (its class-level twin is pytest-covered;
    this gate pins the chain's arithmetic through a self-contained
    mapInPandas so the driver's pristine session can execute it)."""
    from pyspark.sql import types as T

    store = _build_fixture_store(spark, sf_dir, "x9")
    created = store.events().filter(F.col("kind") == "AccountCreated").select(
        "aggregate_id", "aggregate_version", "kind", "body"
    )

    schema = T.StructType(
        [
            T.StructField("aggregate_id", T.StringType()),
            T.StructField("aggregate_version", T.LongType()),
            T.StructField("final_kind", T.StringType()),
            T.StructField("body_str", T.StringType()),
        ]
    )

    def run(batches):
        import json as _json

        import pandas as pd

        def up_v1(kind, obj):
            first, _, rest = obj["owner"].partition(" ")
            return "AccountCreated_V2", {
                "money": obj["money"],
                "owner": {"firstName": first, "lastName": rest},
            }

        def up_v2(kind, obj):
            return "AccountCreated_V3", {
                "owner": obj["owner"],
                "money_cents": obj["money"] * 100,
            }

        upcasters = {"AccountCreated": up_v1, "AccountCreated_V2": up_v2}

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                kind = r.kind
                obj = _json.loads(bytes(r.body).decode())
                # the codec.go:51-77 fixpoint loop
                while kind in upcasters:
                    new_kind, obj = upcasters[kind](kind, obj)
                    if new_kind == kind:
                        break
                    kind = new_kind
                rows.append(
                    (r.aggregate_id, int(r.aggregate_version), kind,
                     _json.dumps(obj, separators=(",", ":")))
                )
            yield pd.DataFrame(
                rows,
                columns=["aggregate_id", "aggregate_version", "final_kind",
                         "body_str"],
            )

    return created.mapInPandas(run, schema).transform(materialize)


@query(
    "m3_projection_flush",
    f"""
    WITH uids AS ({_UIDS_SQL})
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST((100 + uid % 50) + (20 + uid % 10) - (5 + uid % 5) AS BIGINT)
             AS balance,
           CAST(5 AS BIGINT) AS last_version,
           'NoOp' AS last_kind
    FROM uids
    """,
)
def m3_projection_flush(spark, sf_dir):
    """M3 consistent-projection migration through the REAL operator
    (projection_migration.go:44-149 twin): one fold job flushes every
    Account's balance into the new read-model table and a batch NoOp
    append guards each stream (concurrent writers collide on the version
    bump). The gate pins the flushed balances joined with the
    post-migration stream head — version 5, kind NoOp — per stream."""
    from eventsourcing_spark.maintenance.projection_migration import (
        migrate_consistent_projection,
    )

    store = _build_fixture_store(spark, sf_dir, "m3")
    out_dir = os.path.join(store.base_dir, "read_model")

    def fold(events):
        money = F.get_json_object(
            F.col("body").cast("string"), "$.money"
        ).cast("long")
        delta = (
            F.when(
                F.col("kind").isin("AccountCreated", "MoneyDeposited"), money
            )
            .when(F.col("kind") == "MoneyWithdrawn", -money)
            .otherwise(F.lit(0))
        )
        return events.groupBy("aggregate_id").agg(
            F.sum(delta).cast("long").alias("balance")
        )

    n = migrate_consistent_projection(
        store, "balances", "Account", fold, out_dir, now=T1
    )
    assert n == N_STREAMS, f"expected {N_STREAMS} streams flushed, got {n}"
    states = spark.read.parquet(out_dir)
    heads = store.events().groupBy("aggregate_id").agg(
        F.max("aggregate_version").cast("long").alias("last_version"),
        F.max_by("kind", "aggregate_version").alias("last_kind"),
    )
    out = states.join(heads, "aggregate_id").select(
        "aggregate_id", "balance", "last_version", "last_kind"
    )
    return out.transform(materialize)


SNAP_LAG_THRESHOLD = 3


@query(
    "m4_snapshot_freshness",
    f"""
    WITH uids AS ({_UIDS_SQL})
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(4 AS BIGINT) AS head_version,
           CAST(CASE WHEN uid % 2 = 0 THEN 2 ELSE 0 END AS BIGINT)
             AS snap_version,
           CAST(CASE WHEN uid % 2 = 0 THEN 2 ELSE 4 END AS BIGINT)
             AS lag_events,
           CAST(CASE WHEN (CASE WHEN uid % 2 = 0 THEN 2 ELSE 4 END)
                          >= {SNAP_LAG_THRESHOLD}
                     THEN 1 ELSE 0 END AS BIGINT) AS needs_snapshot
    FROM uids
    """,
)
def m4_snapshot_freshness(spark, sf_dir):
    """Snapshot-freshness audit (the ops view of M4's threshold rule,
    eventstore.go:381-400): per stream, the gap between the head version
    and the latest snapshot — the replay cost a cold rehydration pays.
    Streams past SNAP_LAG_THRESHOLD are due a snapshot write. Exercises
    the REAL save_snapshot write path and the latest-snapshot read
    (max_by) joined against stream heads; a missing snapshot counts the
    full history as lag."""
    store = _build_fixture_store(spark, sf_dir, "m4")
    # snapshot every even-uid stream at version 2 (the fixture's fold
    # state after created+deposit), leaving odd streams snapshot-less
    for uid in _fixture_uids(spark, sf_dir):
        if uid % 2 == 0:
            store.save_snapshot(
                f"snap-{uid}",
                f"acc-{uid}",
                2,
                "Account",
                {"balance": (100 + uid % 50) + (20 + uid % 10)},
                created_at=T0,
            )
    heads = store.events().groupBy("aggregate_id").agg(
        F.max("aggregate_version").cast("long").alias("head_version")
    )
    snaps = store.snapshots().groupBy("aggregate_id").agg(
        F.max("aggregate_version").cast("long").alias("snap_version")
    )
    out = heads.join(snaps, "aggregate_id", "left").select(
        "aggregate_id",
        "head_version",
        F.coalesce("snap_version", F.lit(0)).cast("long").alias("snap_version"),
        (F.col("head_version") - F.coalesce("snap_version", F.lit(0)))
        .cast("long")
        .alias("lag_events"),
    ).withColumn(
        "needs_snapshot",
        F.when(F.col("lag_events") >= SNAP_LAG_THRESHOLD, 1)
        .otherwise(0)
        .cast("long"),
    )
    return out.transform(materialize)


OUTBOX_DRAIN_LIMIT = 10


@query(
    "s6_outbox_lag_audit",
    f"""
    WITH uids AS ({_UIDS_SQL}),
    ranked AS (
        SELECT uid, row_number() OVER (ORDER BY uid) - 1 AS r FROM uids
    )
    SELECT 'acc-' || CAST(uid AS VARCHAR) AS aggregate_id,
           CAST(greatest(0, least(4, 4 * r + 4 - {OUTBOX_DRAIN_LIMIT}))
             AS BIGINT) AS n_pending,
           CAST(CASE WHEN 4 * r + 4 - {OUTBOX_DRAIN_LIMIT} <= 0 THEN 0
                     ELSE greatest({OUTBOX_DRAIN_LIMIT} - 4 * r, 0) + 1
                END AS BIGINT) AS first_pending_version
    FROM ranked
    """,
)
def s6_outbox_lag_audit(spark, sf_dir):
    """Outbox backlog audit through the REAL poller (S6/S7/S13 + J1):
    every fixture event is enqueued, one poll batch drains in id order,
    and the audit reports each stream's remaining depth and the version
    the next drain resumes from — the forwarding-lag dashboard an
    operator watches. Streams are appended at distinct timestamps so the
    global ULID order (and therefore the drained prefix) is
    deterministic."""
    from datetime import timedelta

    from eventsourcing_spark.store.outbox import Outbox, poll_once

    base = os.path.join(
        tempfile.gettempdir(), f"es_gate_ob_{abs(hash(sf_dir)) % 10**8}"
    )
    shutil.rmtree(base, ignore_errors=True)
    store = EventStore(spark, base)
    uids = _fixture_uids(spark, sf_dir)
    for r, uid in enumerate(sorted(uids)):
        store.append(
            f"acc-{uid}",
            "Account",
            _stream_events(uid),
            expected_version=0,
            created_at=T0 + timedelta(seconds=r),
        )
    outbox = Outbox(spark, base)
    outbox.insert([row.id for row in store.events().orderBy("id").collect()])
    poll_once(store, outbox, sink=lambda batch: None, limit=OUTBOX_DRAIN_LIMIT)

    ev = store.events().select("aggregate_id", "aggregate_version", "id")
    pending = outbox.pending_ids()
    joined = ev.join(pending, "id", "left_semi")
    lag = joined.groupBy("aggregate_id").agg(
        F.count("*").cast("long").alias("n_pending"),
        F.min("aggregate_version").cast("long").alias("first_pending_version"),
    )
    out = (
        ev.select("aggregate_id")
        .distinct()
        .join(lag, "aggregate_id", "left")
        .select(
            "aggregate_id",
            F.coalesce("n_pending", F.lit(0)).cast("long").alias("n_pending"),
            F.coalesce("first_pending_version", F.lit(0))
            .cast("long")
            .alias("first_pending_version"),
        )
    )
    return out.transform(materialize)
