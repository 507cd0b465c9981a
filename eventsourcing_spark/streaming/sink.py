"""Bus sink encoding — S11/S12 (sink/nats/sink.go, sink/kafka/kafka.go).

Events become ``Message`` envelopes (Event minus hash/migrated,
sink/sink.go:38-47), JSON-encoded with the body base64'd
(sink/sink.go:62-91). Partition routing is explicit:
``partition = hash % n + 1`` (util/common.go:13-18) — the NATS shape;
the Kafka shape keys by aggregate_id and lets the broker partition.

``kafka_frame`` produces the exact columns Spark's kafka writer expects
(key/value/partition), so forwarding is just::

    events_stream.transform(lambda df: kafka_frame(df, n)) \\
        .writeStream.format("kafka")...

No Kafka broker ships in this container, so tests cover the frame and
its JSON round-trip; the writeStream wiring is config, not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventsourcing_spark.functions.hashing import calc_partition
from eventsourcing_spark.schema import MESSAGE_COLUMNS


def message_json(df: DataFrame | None = None) -> Column:
    """JSON codec of the bus envelope (sink/sink.go:62-91): lowerCamel-ish
    snake keys as stored, binary body → base64 (Spark's to_json default)."""
    return F.to_json(F.struct(*MESSAGE_COLUMNS))


def to_messages(events: DataFrame, partitions: int) -> DataFrame:
    """Event → Message + partition column (S11 routing)."""
    return events.select(
        *MESSAGE_COLUMNS,
        calc_partition(F.col("aggregate_id_hash"), partitions).alias("partition"),
    )


def kafka_frame(events: DataFrame, partitions: int | None = None) -> DataFrame:
    """Columns for writeStream.format("kafka").

    * Kafka shape (S12): key = aggregate_id → broker partitions, order
      preserved per aggregate (sink/kafka/kafka.go:156-181).
    * NATS shape (S11): pass ``partitions`` to add the explicit
      partition column (sink/nats/sink.go:140-174).
    """
    out = events.select(
        F.col("aggregate_id").cast("string").alias("key"),
        message_json().alias("value"),
        *(
            [
                (calc_partition(F.col("aggregate_id_hash"), partitions) - 1)
                .cast("int")
                .alias("partition")
            ]
            if partitions
            else []
        ),
    )
    return out


def kafka_subscriber_options(
    topic: str,
    brokers: str,
    start_time=None,
    partitions: int | None = None,
    group_id: str | None = None,
) -> dict[str, str]:
    """ReadStream options for the S12 consumer side — the Spark mapping
    of the reference subscriber's ``StartTime`` offset reset
    (projection/kafka/subscriber.go:150-220): the reference seeks every
    partition to the first offset at-or-after the resume timestamp via
    ``OffsetsForTimes``; Spark's native equivalent is
    ``startingOffsetsByTimestamp`` — a per-topic map of partition →
    epoch-ms, with ``startingOffsetsByTimestampStrategy=latest`` for
    partitions with no record after the timestamp (matching the
    reference's fall-through to the head). Without a resume point the
    subscriber starts at ``earliest`` (catch-up semantics, C1).

    Pure config — unit-testable without a broker; apply with::

        spark.readStream.format("kafka").options(**opts).load()
    """
    import json as _json
    from datetime import datetime as _dt

    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        # the projector handles dedup (C2/C9): deliver-at-least-once
        "failOnDataLoss": "false",
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    if start_time is None:
        opts["startingOffsets"] = "earliest"
        return opts
    ms = (
        int(start_time.timestamp() * 1000)
        if isinstance(start_time, _dt)
        else int(start_time)
    )
    if partitions is None:
        # per-topic timestamp form (no partition enumeration needed)
        opts["startingTimestamp"] = str(ms)
    else:
        opts["startingOffsetsByTimestamp"] = _json.dumps(
            {topic: {str(p): ms for p in range(partitions)}}
        )
    opts["startingOffsetsByTimestampStrategy"] = "latest"
    return opts


def parse_messages(
    raw: DataFrame, value_col: str = "value", keep: tuple[str, ...] = ()
):
    """Inverse codec for consumers (sink/sink.go:93-116): JSON → Message
    columns; body arrives base64 → decode back to binary. ``keep`` names
    transport columns to carry through (e.g. the bus partition)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("aggregate_id", T.StringType()),
            T.StructField("aggregate_version", T.IntegerType()),
            T.StructField("aggregate_kind", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("body", T.StringType()),  # base64
            T.StructField(
                "discriminator", T.MapType(T.StringType(), T.StringType())
            ),
            T.StructField("created_at", T.TimestampType()),
        ]
    )
    parsed = raw.select(
        *keep, F.from_json(F.col(value_col).cast("string"), schema).alias("m")
    ).select(*keep, "m.*")
    return parsed.withColumn("body", F.unbase64(F.col("body")))
