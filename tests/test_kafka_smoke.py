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
