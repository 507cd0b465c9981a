"""Live Kafka publish smoke (S11/S12 second half) — executable on any
host that has a broker + the spark-sql-kafka package; SKIPPED (not
absent) in the sandbox, so the remaining partial has a real test path.

The frame written is exactly ``kafka_frame()`` (key = aggregate_id,
value = message JSON, explicit partition column), i.e. the same bytes
the FileSinker e2e verifies end-to-end — only the transport differs.
"""

from __future__ import annotations

import socket

import pytest

BROKER = "localhost:9092"


def _broker_reachable() -> bool:
    host, port = BROKER.split(":")
    try:
        with socket.create_connection((host, int(port)), timeout=0.5):
            return True
    except OSError:
        return False


def _kafka_source_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKER
        ).option("subscribe", "__probe").load()
        return True
    except Exception as exc:  # noqa: BLE001
        return "Failed to find data source: kafka" not in str(exc)


@pytest.mark.skipif(not _broker_reachable(), reason=f"no Kafka broker at {BROKER}")
def test_kafka_writestream_roundtrip(spark, tmp_path):
    if not _kafka_source_available(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")

    from datetime import datetime, timezone

    from eventsourcing_spark.store import EventStore
    from eventsourcing_spark.streaming.sink import kafka_frame, parse_messages
    from eventsourcing_spark.projection.projector import events_file_stream

    base = str(tmp_path / "kafka")
    store = EventStore(spark, base)
    store.append(
        "acc-k",
        "Account",
        [("AccountCreated", {"money": 100, "owner": "K"})],
        expected_version=0,
        created_at=datetime(2024, 1, 1, tzinfo=timezone.utc),
    )
    topic = "es_smoke"
    q = (
        events_file_stream(store)
        .transform(lambda df: kafka_frame(df))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("topic", topic)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    readback = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    msgs = parse_messages(readback)
    assert msgs.filter(msgs.aggregate_id == "acc-k").count() >= 1


def test_kafka_subscriber_options_starttime_mapping():
    """Consumer-side StartTime parity (projection/kafka/subscriber.go:
    150-220) as pure config — runs broker-less. The reference seeks each
    partition to the first offset at-or-after the resume timestamp; the
    Spark mapping is startingOffsetsByTimestamp (partition-enumerated)
    or startingTimestamp (whole topic), falling through to `latest` for
    partitions with nothing after the timestamp, and `earliest` when no
    resume point exists (C1 catch-up)."""
    import json
    from datetime import datetime, timezone

    from eventsourcing_spark.streaming.sink import kafka_subscriber_options

    # no resume point → catch-up from earliest
    o = kafka_subscriber_options("events", "b:9092")
    assert o["startingOffsets"] == "earliest"
    assert o["failOnDataLoss"] == "false"
    assert "startingOffsetsByTimestamp" not in o

    # resume timestamp, partition-enumerated
    t = datetime(2024, 3, 1, 12, 0, tzinfo=timezone.utc)
    o = kafka_subscriber_options(
        "events", "b:9092", start_time=t, partitions=3, group_id="proj-1"
    )
    by_ts = json.loads(o["startingOffsetsByTimestamp"])
    ms = int(t.timestamp() * 1000)
    assert by_ts == {"events": {"0": ms, "1": ms, "2": ms}}
    assert o["startingOffsetsByTimestampStrategy"] == "latest"
    assert o["kafka.group.id"] == "proj-1"
    assert "startingOffsets" not in o

    # resume timestamp without partition enumeration → whole-topic form
    o = kafka_subscriber_options("events", "b:9092", start_time=ms)
    assert o["startingTimestamp"] == str(ms)
