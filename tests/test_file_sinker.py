"""File-backed Sinker e2e — the executable twin of the reference's NATS
projection integration test (test/integration/nats/e2e_nats_proj_test.go:
51-187): store → forwarder → bus(files) → catch-up/switch/live
projection, with per-partition resume tokens, redelivery suppression,
and read-model balances asserted end-state-exact.

Token-granularity note: the reference's NATS sink checkpoints per
EVENT (3 events → 3 KV puts); this sinker checkpoints per
partition-batch (same final tokens, fewer puts) — the batch is the
Spark-native unit of work. Assertions pin the final token values and
this sinker's own put counts.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from eventsourcing_spark.projection import CheckpointStore, Projector
from eventsourcing_spark.store import EventStore
from eventsourcing_spark.streaming.file_sink import (
    EventForwarder,
    FileSinker,
    bus_messages,
)

from tests.account import KIND_CREATED, KIND_DEPOSITED, KIND_WITHDRAWN
from tests.test_projection import T0, BalanceReadModel


def _append_paulo(store, t=T0):
    return store.append(
        "acc-1",
        "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Paulo"}),
            (KIND_DEPOSITED, {"money": 10}),
            (KIND_DEPOSITED, {"money": 20}),
        ],
        expected_version=0,
        created_at=t,
    )


def test_projection_before_data(spark, tmp_path):
    """TestNATSProjectionBeforeData (e2e_nats_proj_test.go:51-110):
    projection attaches to an empty store, then events flow through the
    sinker; the switch control sentinel precedes every live delivery."""
    base = str(tmp_path / "bd")
    store = EventStore(spark, base)
    sinker = FileSinker(str(tmp_path / "bus"), "accounts", partitions=1)
    fwd = EventForwarder(store, sinker)

    rm = BalanceReadModel()
    projector = Projector(
        store, "balances", rm.handler, CheckpointStore(spark, base), splits=1
    )
    # before data: catch-up sees nothing, switch is delivered
    projector.project(now=T0 + timedelta(minutes=2))
    assert rm.metas == ["catchup", "switch"]
    assert rm.handled_events == 0

    # events arrive AFTER the projection attached (the scenario's point)
    # → their ULIDs sit past the switch boundary and flow through live
    _append_paulo(store, t=T0 + timedelta(minutes=5))
    assert fwd.forward_once() == 3
    assert sinker.puts == 1  # one batch, one partition

    # live phase consumes the bus, not the store
    projector.live_batch(bus_messages(spark, sinker))
    # reference asserts 4 deliveries: control event first, then 3 live
    assert rm.metas == ["catchup", "switch", "live"]
    assert rm.handled_events == 3
    assert rm.balances == {"acc-1": 130}

    # resume token per partition = last event id published there
    last_id = store.events().agg(F.max("id")).first()[0]
    assert sinker.resume_tokens() == {1: last_id}


def test_projection_after_data(spark, tmp_path):
    """TestNATSProjectionAfterData (e2e_nats_proj_test.go:113-187):
    events exist before the projection starts — catch-up replays from
    the store, live picks up only post-switch bus messages, and the bus
    redelivery of the catch-up span is rejected."""
    base = str(tmp_path / "ad")
    store = EventStore(spark, base)
    sinker = FileSinker(str(tmp_path / "bus"), "accounts", partitions=1)
    fwd = EventForwarder(store, sinker)

    _append_paulo(store)
    assert fwd.forward_once() == 3
    assert fwd.forward_once() == 0  # token suppression: nothing new

    rm = BalanceReadModel()
    projector = Projector(
        store, "balances", rm.handler, CheckpointStore(spark, base), splits=1
    )
    projector.project(now=T0 + timedelta(minutes=2))
    assert rm.balances == {"acc-1": 130}
    assert rm.handled_events == 3

    # update after the subscription is in place
    store.append(
        "acc-1",
        "Account",
        [(KIND_WITHDRAWN, {"money": 15})],
        expected_version=3,
        created_at=T0 + timedelta(minutes=10),
    )
    assert fwd.forward_once() == 1  # only the withdrawal crosses
    assert sinker.puts == 2

    # live: the bus redelivers ALL 4 messages (overlap by design) —
    # the 3 catch-up-covered ones are rejected by the switch threshold
    projector.live_batch(bus_messages(spark, sinker))
    assert rm.balances == {"acc-1": 115}
    assert rm.handled_events == 4
    assert rm.metas == ["catchup", "switch", "live"]

    # replaying the whole bus again is fully rejected (C2/C9)
    projector.live_batch(bus_messages(spark, sinker))
    assert rm.balances == {"acc-1": 115}
    assert rm.handled_events == 4

    # sinker restart: tokens survive (ResumeTokens contract)
    sinker2 = FileSinker(str(tmp_path / "bus"), "accounts", partitions=1)
    assert sinker2.resume_tokens() == sinker.resume_tokens()
    assert EventForwarder(store, sinker2).forward_once() == 0


def test_bus_roundtrip_and_partition_routing(spark, tmp_path):
    """Message JSON written by the sinker parses back bit-exact
    (kafka_frame ↔ parse_messages parity through a real file), and
    partition routing follows CalcPartition(hash, n)."""
    base = str(tmp_path / "rt")
    store = EventStore(spark, base)
    for i in range(5):
        store.append(
            f"acc-{i}",
            "Account",
            [(KIND_CREATED, {"money": 100 + i})],
            expected_version=0,
            created_at=T0,
        )
    sinker = FileSinker(str(tmp_path / "bus"), "accounts", partitions=3)
    assert EventForwarder(store, sinker).forward_once() == 5

    msgs = bus_messages(spark, sinker)
    ev = store.events()
    assert msgs.count() == 5
    # body + identity survive the encode→file→decode roundtrip exactly
    joined = msgs.alias("m").join(ev.alias("e"), "id")
    assert joined.count() == 5
    mism = joined.filter(
        (F.col("m.body") != F.col("e.body"))
        | (F.col("m.aggregate_id") != F.col("e.aggregate_id"))
        | (F.col("m.aggregate_version") != F.col("e.aggregate_version"))
        | (F.col("m.kind") != F.col("e.kind"))
    )
    assert mism.count() == 0
    # routing: partition column == CalcPartition(hash, 3) of the source
    from eventsourcing_spark.functions.hashing import calc_partition

    routed = joined.filter(
        F.col("m.partition")
        != calc_partition(F.col("e.aggregate_id_hash"), 3)
    )
    assert routed.count() == 0
    # every partition holds max(id)-consistent resume token
    toks = sinker.resume_tokens()
    per_part = {
        int(r.partition): r.max_id
        for r in msgs.groupBy("partition").agg(F.max("id").alias("max_id")).collect()
    }
    assert toks == per_part
