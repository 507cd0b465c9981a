"""Incremental NB training at ingest — the streaming twin of
``nb_quality_train``.

A production quality gate is retrained as the corpus grows; with NB
that is trivial because the model IS a sum of per-document sufficient
statistics. Each micro-batch aggregates its own (token, cnt_good,
cnt_bad) deltas and writes them to a counts registry; the model at any
moment is one groupBy-sum over the registry fed through the SAME
``model_from_counts`` finisher the batch trainer uses, so the two
training paths cannot drift (the same shared-classifier discipline as
pipeline/streaming_incremental.py).

Exactly-once counting: counts are ADDITIVE, so the at-least-once
append the dedup registries tolerate (sets are idempotent) would
DOUBLE-COUNT here. Every batch therefore writes its delta to an
epoch-keyed subdirectory (``counts_dir/batch=<epoch_id>``) with
mode=overwrite: a foreachBatch retry of the same epoch overwrites its
own previous (possibly partial) output instead of appending a second
copy. Structured Streaming replays a failed batch under the SAME epoch
id, which makes the write idempotent end to end.

Scale shape: the per-batch aggregation is batch-sized (map-side
combine to token grain); the registry grows by one small token-grain
delta per batch; deriving the model is one keyed sum over token-grain
rows — never a rescan of the raw corpus. Registry compaction
(pipeline/registry_maintenance.py) does NOT apply here: that swap
dedups a key SET, while these rows are additive deltas — compact by
replacing the directory with its groupBy-sum under the same quiescence
contract if file counts ever matter.

Reference parity: none — training-pipeline surface on the projection
live phase's foreachBatch machinery (projection/projector.py), like
the other streaming_* twins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.nb_classifier import (
    model_from_counts,
    token_counts_df,
)

COUNTS_SCHEMA = "token string, cnt_good long, cnt_bad long"


def nb_counts_batch(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's additive NB sufficient statistics."""
    return token_counts_df(batch_df)


def nb_counts_at_ingest(
    stream_docs: DataFrame, counts_dir: str, checkpoint_dir: str
):
    """Wire a document stream into the counts registry. Returns the
    started query (availableNow trigger — drain then stop; swap the
    trigger for continuous ingest)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        delta = nb_counts_batch(batch_df)
        # epoch-keyed overwrite = idempotent under foreachBatch retry
        delta.write.mode("overwrite").parquet(
            os.path.join(counts_dir, f"batch={epoch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def nb_model_from_registry(spark, counts_dir: str) -> DataFrame:
    """The current model: sum the registry's per-batch deltas to total
    counts, then the SAME vocab-cap + ilog2 finisher as batch
    training."""
    deltas = spark.read.schema(COUNTS_SCHEMA).parquet(
        os.path.join(counts_dir, "*")
    )
    totals = deltas.groupBy("token").agg(
        F.sum("cnt_good").cast("long").alias("cnt_good"),
        F.sum("cnt_bad").cast("long").alias("cnt_bad"),
    )
    return model_from_counts(totals)
