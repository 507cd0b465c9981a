"""Small-file compaction for the events table.

OLTP-style usage (one parquet append per aggregate write) proliferates
tiny files; scans then pay per-file overhead — observed locally: ~800
files → an 815-task stage for 815 rows. Compaction rewrites each hash
bucket into ``files_per_bucket`` files, sorted by ``id`` within the
bucket so range scans (S3) benefit from parquet min/max pruning — the
analog of the reference's ``(id, migration)`` index
(store/postgresql/store.go:699-701), done with file layout instead of
a btree. On Delta this is OPTIMIZE + ZORDER BY (id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.maintenance.rewrite import overwrite_dir
from eventsourcing_spark.store.event_store import EventStore


def compact_events(store: EventStore, files_per_bucket: int = 1) -> None:
    ev = store.events_raw().withColumn(
        "bucket", F.pmod(F.col("aggregate_id_hash"), F.lit(store.n_buckets))
    )
    compacted = ev.repartition(
        store.n_buckets * files_per_bucket, "bucket"
    ).sortWithinPartitions("id")
    overwrite_dir(compacted, store._events_dir, partition_by=["bucket"])
