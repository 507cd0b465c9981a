"""Physical table layout for shuffle-free joins: bucketing.

The reference co-locates work by hashing aggregate IDs into partitions
(util/common.go:40-56 FNV-1a → partition; README.md:508-553 partition
scheme). Spark's equivalent for *storage* is bucketed tables: write both
sides pre-hashed into the same number of buckets on the join key, and
every future equi-join / groupBy on that key runs with ZERO exchanges —
the scan itself delivers the required hash partitioning. At 100 TB this
is the difference between re-shuffling the fact table on every query
and never shuffling it at all: you pay one shuffle at write time,
amortized over every read.

``write_bucketed`` / ``read_bucketed`` wrap the saveAsTable dance;
``verify_colocated_join`` proves the property from the physical plan
(no Exchange over either side), which tests/test_layout.py pins.

Cluster notes: bucket count should be sized so one bucket ≈ one
executor-core's worth of data at the target scale (here 8 for test
data); both tables MUST agree on count and key. Spark bucketing is
hive-style (hash(key) % n into per-partition files) and survives
restarts — it's metadata in the catalog, not session state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from eventsourcing_spark.plans import plan_stats


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sort-within-bucket) table.

    Sorting within buckets additionally removes the Sort from
    sort-merge-join plans and gives parquet min/max pruning on the sort
    key — the same reason the reference keeps (aggregate_id, version)
    indexed (store/postgresql/store.go:699-701).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def verify_colocated_join(joined: DataFrame) -> dict:
    """Plan stats for a join expected to be exchange-free.

    A co-located bucketed join shows SortMergeJoin/ShuffledHashJoin with
    ``Exchange == 0`` — the bucketed scans already satisfy the join's
    distribution requirement.
    """
    stats = plan_stats(joined)
    stats["colocated"] = (
        stats["Exchange"] == 0 and stats["BroadcastExchange"] == 0
    )
    return stats
