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
DOUBLE-COUNT here. Every batch therefore commits its delta unit under
its EPOCH KEY in the counts manifest
(registry_manifest.append_df(epoch_key=...)): a foreachBatch retry of
the same epoch REPLACES that epoch's previously committed unit instead
of adding a second copy. Structured Streaming replays a failed batch
under the SAME epoch id, which makes the commit idempotent end to end
— and unlike the old ``batch=<epoch>``-subdirectory overwrite, a
reader can never observe the half-overwritten state, because the old
unit stays live until the replacement's atomic manifest commit.

Scale shape: the per-batch aggregation is batch-sized (map-side
combine to token grain); the registry grows by one small token-grain
delta per batch; deriving the model is one keyed sum over token-grain
rows — never a rescan of the raw corpus. File-count maintenance is
``registry_manifest.compact_counts_registry``: groupBy-sum fold of
every epoch except the newest (the only one a retry can still
replace), total-sum-verified, safe under live ingest.

Reference parity: none — training-pipeline surface on the projection
live phase's foreachBatch machinery (projection/projector.py), like
the other streaming_* twins.
"""

from __future__ import annotations

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
        from eventsourcing_spark.pipeline.registry_manifest import append_df

        delta = nb_counts_batch(batch_df)
        # epoch-keyed manifest commit = idempotent under foreachBatch
        # retry (the retry's commit replaces this epoch's prior unit)
        append_df(delta, counts_dir, epoch_key=str(epoch_id))

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
    from eventsourcing_spark.pipeline.registry_manifest import read_registry

    deltas = read_registry(spark, counts_dir, COUNTS_SCHEMA)
    totals = deltas.groupBy("token").agg(
        F.sum("cnt_good").cast("long").alias("cnt_good"),
        F.sum("cnt_bad").cast("long").alias("cnt_bad"),
    )
    return model_from_counts(totals)
