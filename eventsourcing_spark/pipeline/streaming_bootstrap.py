"""Streaming Poisson-bootstrap maintenance — uncertainty at ingest.

The batch gate query (analytics.poisson_bootstrap_ci) answers "what is
the CI of the mean purchase value over this corpus at rest"; the
production question (Chamandy et al. 2012 — the paper is literally
about STREAMS) is the running CI while data arrives. The Poisson
bootstrap makes that free: the per-replicate sufficient statistics
(Σw·cents, Σw) are ADDITIVE, so each micro-batch contributes a 33-row
delta (32 replicates + the b = −1 totals row) that merges by plain sum
— the same mergeable-state shape as the streaming sketches.

Exactly-once: deltas are epoch-keyed manifest appends
(registry_manifest.append_df with epoch_key), so a foreachBatch retry
REPLACES its previous unit instead of double-counting — the
streaming_nb discipline. The weights are md5-derived per (event_id,
replicate), independent of batch boundaries, so the streamed registry
reproduces the batch query EXACTLY on the same rows (the parity test's
assertion, bit-for-bit).
"""

from __future__ import annotations

try:  # pragma: no cover — executor-side pickling hygiene
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

from pyspark.sql import DataFrame

REG_SCHEMA = "b long, wc long, ws long"


def bootstrap_counts_batch(batch_df: DataFrame) -> DataFrame:
    """33-row additive delta for one micro-batch of raw events."""
    from eventsourcing_spark.analytics import (
        bootstrap_replicate_stats,
        purchases_frame,
    )

    return bootstrap_replicate_stats(purchases_frame(batch_df))


def bootstrap_counts_at_ingest(
    stream_events: DataFrame, registry_dir: str, checkpoint_dir: str
):
    """Maintain the replicate-statistics registry over an event stream.
    Returns the started streaming query (availableNow trigger)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from eventsourcing_spark.pipeline.registry_manifest import append_df

        delta = bootstrap_counts_batch(batch_df)
        append_df(delta, registry_dir, epoch_key=f"boot-{epoch_id}")

    return (
        stream_events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def bootstrap_ci_from_registry(spark, registry_dir: str) -> DataFrame:
    """Running CI from the merged registry — identical arithmetic to
    the batch gate query's finisher."""
    from eventsourcing_spark.analytics import bootstrap_ci_from_stats
    from eventsourcing_spark.pipeline.registry_manifest import read_registry

    return bootstrap_ci_from_stats(
        read_registry(spark, registry_dir, REG_SCHEMA)
    )
