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
