"""Canonical schemas for the event store (reference parity).

Envelope columns mirror the reference DDL
(store/postgresql/store.go:687-698); the dynamic ``disc_<key>`` columns
of the SQL backends are modelled as one ``discriminator``
map<string,string> column, matching the Mongo representation
(store/mongodb/store.go:63) — cleaner and prunable in Spark.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- events: the one true table -------------------------------------------
EVENT_SCHEMA = T.StructType(
    [
        # 26-char ULID; lexicographic order == time order (eventid/eventid.go:14-25)
        T.StructField("id", T.StringType(), False),
        T.StructField("aggregate_id", T.StringType(), False),
        # FNV-1a 32-bit of aggregate_id, sign bit cleared (util/common.go:40-56)
        T.StructField("aggregate_id_hash", T.IntegerType(), False),
        # 1,2,3,... dense per aggregate (store/postgresql/store.go:195-197)
        T.StructField("aggregate_version", T.IntegerType(), False),
        T.StructField("aggregate_kind", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        # JSON-encoded domain event (encoding/jsoncodec/codec.go:46-49)
        T.StructField("body", T.BinaryType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        # 0 = active; >0 = invalidated by migration rev (events_migration.go:123-127)
        T.StructField("migration", T.IntegerType(), False),
        T.StructField("migrated", T.BooleanType(), False),
        T.StructField("discriminator", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# --- snapshots (store/postgresql/store.go:737-747) ------------------------
SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("aggregate_id", T.StringType(), False),
        T.StructField("aggregate_version", T.IntegerType(), False),
        T.StructField("aggregate_kind", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("discriminator", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# --- outbox: pending event ids (store/postgresql/outbox.go:94-96) ---------
OUTBOX_SCHEMA = T.StructType([T.StructField("id", T.StringType(), False)])

# --- kv resume store (store/postgresql/kvstore.go:82-85) ------------------
KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# --- bus message envelope = Event minus hash/migrated (sink/sink.go:38-47)
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("aggregate_id", T.StringType(), False),
        T.StructField("aggregate_version", T.IntegerType(), False),
        T.StructField("aggregate_kind", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("discriminator", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# --- checkpoints for projections (projection/checkpoints.go:16-19) --------
CHECKPOINT_SCHEMA = T.StructType(
    [
        # "<projection>-<partition>" or "<projection>" (checkpoints.go:70-127)
        T.StructField("key", T.StringType(), False),
        T.StructField("event_id", T.StringType(), True),
        T.StructField("sequence", T.LongType(), True),
    ]
)

MESSAGE_COLUMNS = [f.name for f in MESSAGE_SCHEMA.fields]
EVENT_COLUMNS = [f.name for f in EVENT_SCHEMA.fields]
