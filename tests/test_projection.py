"""Golden catchup→live projection test (FIXTURES.md §7 row 6;
test/integration/nats/e2e_nats_proj_test.go:51-187) + outbox poller,
event-bus routing, and sink-frame codec tests.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from eventsourcing_spark.projection import CheckpointStore, Projector
from eventsourcing_spark.projection.projector import Meta, events_file_stream
from eventsourcing_spark.store import EventStore
from eventsourcing_spark.store.outbox import Outbox, poll_once
from eventsourcing_spark.streaming.eventbus import EventBus, kind_match_py
from eventsourcing_spark.streaming.sink import kafka_frame, parse_messages, to_messages

from tests.account import KIND_CREATED, KIND_DEPOSITED, KIND_WITHDRAWN

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


class BalanceReadModel:
    """Keyed read model {aggregate_id → balance} updated per batch —
    the projection_mock analog (test/integration/projection_mock.go:62-106)."""

    def __init__(self) -> None:
        self.balances: dict[str, int] = {}
        self.metas: list[str] = []
        self.handled_events = 0

    def handler(self, df, meta: Meta) -> None:
        self.metas.append(meta.kind)
        if meta.kind == "switch":
            return
        body = F.col("body").cast("string")
        money = F.get_json_object(body, "$.money").cast("long")
        delta = (
            F.when(F.col("kind").isin(KIND_CREATED, KIND_DEPOSITED), money)
            .when(F.col("kind") == KIND_WITHDRAWN, -money)
            .otherwise(F.lit(0))
        )
        rows = (
            df.groupBy("aggregate_id")
            .agg(F.sum(delta).alias("d"), F.count("*").alias("n"))
            .collect()
        )
        for r in rows:
            self.balances[r.aggregate_id] = self.balances.get(r.aggregate_id, 0) + r.d
            self.handled_events += r.n


def test_catchup_switch_live_golden(spark, tmp_path):
    base = str(tmp_path / "proj")
    store = EventStore(spark, base)
    store.append(
        "acc-1",
        "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Paulo"}),
            (KIND_DEPOSITED, {"money": 10}),
            (KIND_DEPOSITED, {"money": 20}),
        ],
        expected_version=0,
        created_at=T0,
    )

    rm = BalanceReadModel()
    cps = CheckpointStore(spark, base)
    projector = Projector(store, "balances", rm.handler, cps, splits=2)

    # catch-up at T0+2min: until = T0+1min covers the 3 events
    until = projector.project(now=T0 + timedelta(minutes=2))
    assert rm.balances == {"acc-1": 130}
    assert rm.handled_events == 3
    assert rm.metas == ["catchup", "switch"]
    assert projector.checkpoints.switch_threshold() == until

    # a second catch-up pass is a no-op (token rejection, C2)
    projector.catch_up(now=T0 + timedelta(minutes=3))
    assert rm.handled_events == 3

    # live event lands after the switch boundary
    store.append(
        "acc-1",
        "Account",
        [(KIND_WITHDRAWN, {"money": 15})],
        expected_version=3,
        created_at=T0 + timedelta(minutes=10),
    )

    # live phase: file stream sees ALL files (deliberate overlap) —
    # the 3 catch-up events must be rejected, the withdrawal applied.
    q = (
        projector.live_stream_writer(events_file_stream(store))
        .option("checkpointLocation", str(tmp_path / "stream_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert rm.balances == {"acc-1": 115}
    assert rm.handled_events == 4
    # second catch-up pass delivered an empty frame ("catchup" with 0 events)
    assert rm.metas == ["catchup", "switch", "catchup", "live"]

    # replaying the same batch out-of-band is also rejected (per-partition
    # saved position) — duplicates on the bus are harmless (C9)
    projector.live_batch(store.events())
    assert rm.balances == {"acc-1": 115}
    assert rm.handled_events == 4

    # checkpoints survive a restart (new store instance)
    cps2 = CheckpointStore(spark, base)
    projector2 = Projector(store, "balances", rm.handler, cps2, splits=2)
    assert projector2.checkpoints.switch_threshold() == until
    projector2.live_batch(store.events())
    assert rm.balances == {"acc-1": 115}


def test_outbox_poller(spark, tmp_path):
    """TestPollListener analog (test/pg/store_test.go:143-213): 4 events
    forwarded through the outbox, rebuilt balance 135."""
    base = str(tmp_path / "ob")
    store = EventStore(spark, base)
    outbox = Outbox(spark, base)

    last_id, _ = store.append(
        "acc-9",
        "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "P"}),
            (KIND_DEPOSITED, {"money": 10}),
            (KIND_DEPOSITED, {"money": 20}),
        ],
        expected_version=0,
        created_at=T0,
    )
    ids = [r.id for r in store.events().orderBy("id").collect()]
    outbox.insert(ids)  # C10 tx hook
    store.append(
        "acc-9", "Account", [(KIND_DEPOSITED, {"money": 5})],
        expected_version=3, created_at=T0 + timedelta(seconds=1),
    )
    outbox.insert([r.id for r in store.events().collect() if r.id not in ids])

    forwarded: list = []
    total = 0
    # poll in batches of 2 until drained (sink/poller/poller.go:97-161)
    while (n := poll_once(store, outbox, forwarded.extend, limit=2)) > 0:
        total += n
    assert total == 4
    assert outbox.pending_ids().count() == 0
    # forwarded in id order, balance fold = 135
    assert [r.id for r in forwarded] == sorted(r.id for r in forwarded)
    balance = sum(
        json.loads(bytes(r.body))["money"] * (1 if r.kind != KIND_WITHDRAWN else -1)
        for r in forwarded
    )
    assert balance == 135


def test_eventbus_routing(spark):
    df = spark.createDataFrame(
        [("MoneyDeposited",), ("MoneyWithdrawn",), ("OwnerUpdated",)], "kind string"
    )
    got: dict[str, list[str]] = {}
    bus = EventBus()
    calls: list[str] = []
    bus.use(lambda h: (lambda d: (calls.append("mw"), h(d))[-1]))
    bus.subscribe("Money*", lambda d: got.setdefault("money", []).extend(
        r.kind for r in d.collect()))
    bus.subscribe("OwnerUpdated", lambda d: got.setdefault("owner", []).extend(
        r.kind for r in d.collect()))
    bus.publish(df)
    assert sorted(got["money"]) == ["MoneyDeposited", "MoneyWithdrawn"]
    assert got["owner"] == ["OwnerUpdated"]
    assert calls == ["mw", "mw"]
    assert kind_match_py("Money*", "MoneyDeposited")
    assert not kind_match_py("Money", "MoneyDeposited")


def test_sink_frame_roundtrip(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "snk"))
    store.append(
        "acc-s", "Account",
        [(KIND_CREATED, {"money": 7, "owner": "Z"})],
        expected_version=0, created_at=T0, discriminator={"tenant": "abc"},
    )
    ev = store.events()

    msgs = to_messages(ev, partitions=12)
    row = msgs.first()
    assert 1 <= row.partition <= 12
    assert not hasattr(row, "aggregate_id_hash") or "aggregate_id_hash" not in msgs.columns

    frame = kafka_frame(ev, partitions=12)
    assert set(frame.columns) == {"key", "value", "partition"}
    decoded = parse_messages(frame).first()
    assert decoded.aggregate_id == "acc-s"
    assert json.loads(bytes(decoded.body)) == {"money": 7, "owner": "Z"}
    assert dict(decoded.discriminator) == {"tenant": "abc"}

    # kafka shape: broker-side partitioning, no partition column
    frame2 = kafka_frame(ev)
    assert set(frame2.columns) == {"key", "value"}
