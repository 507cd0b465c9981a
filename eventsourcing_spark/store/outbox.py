"""Outbox + poller — S6/S7/S13/J1 (store/postgresql/outbox.go, sink/poller/poller.go).

The outbox holds only pending event IDs (outbox.go:94-96); the poller
drains it in id order: fetch a batch (S6), inner-join back to the events
table (J1 — broadcast: the pending side is tiny by construction), hand
the batch to a sink, then delete the forwarded IDs (S7).

In the Spark-first architecture the outbox is usually unnecessary —
streaming the events table IS the feed — but the component is kept for
API parity and for exactly-once bridging to external buses.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsourcing_spark.schema import OUTBOX_SCHEMA
from eventsourcing_spark.store.event_store import EventStore


class Outbox:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self._dir = os.path.join(base_dir, "outbox")

    def insert(self, ids: list[str]) -> None:
        """Tx-hook insert (C10; store/postgresql/outbox.go:109-123)."""
        if not ids:
            return
        df = self.spark.createDataFrame([(i,) for i in ids], OUTBOX_SCHEMA)
        df.write.mode("append").parquet(self._dir)

    def pending_ids(self) -> DataFrame:
        if not self._has_data():
            return self.spark.createDataFrame([], OUTBOX_SCHEMA)
        return self.spark.read.schema(OUTBOX_SCHEMA).parquet(self._dir)

    def pending_events(self, store: EventStore, limit: int) -> DataFrame:
        """S6 + J1 — batch of pending events in id order
        (store/postgresql/outbox.go:47-75)."""
        batch = self.pending_ids().orderBy("id").limit(limit)
        return store.events().join(F.broadcast(batch), "id", "inner").orderBy("id")

    def after_sink(self, ids: list[str]) -> None:
        """S7 — delete forwarded ids (store/postgresql/outbox.go:77-80).
        Parquet has no row delete; rewrite via anti-join (Delta DELETE on
        a real lakehouse)."""
        if not ids or not self._has_data():
            return
        remaining = self.pending_ids().filter(~F.col("id").isin(ids))
        rows = [(r.id,) for r in remaining.collect()]
        tmp = self.spark.createDataFrame(rows, OUTBOX_SCHEMA)
        tmp.write.mode("overwrite").parquet(self._dir)

    def _has_data(self) -> bool:
        return os.path.isdir(self._dir) and any(
            not n.startswith((".", "_")) for n in os.listdir(self._dir)
        )


def poll_once(
    store: EventStore,
    outbox: Outbox,
    sink: Callable[[list], None],
    limit: int = 20,
) -> int:
    """One poller iteration (sink/poller/poller.go:97-161): S6 → sink → S7.
    Returns the number of events forwarded. The reference loops this every
    200 ms with backoff; driver-side looping belongs to the caller."""
    batch = outbox.pending_events(store, limit).collect()
    if not batch:
        return 0
    sink(batch)
    outbox.after_sink([r.id for r in batch])
    return len(batch)
