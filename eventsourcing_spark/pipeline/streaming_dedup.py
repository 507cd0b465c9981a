"""Online exact dedup at ingest: the streaming face of dedup_exact.

Batch dedup (pipeline.queries.dedup_exact) assumes the corpus is at
rest; a training-data pipeline also needs the *ingest-time* version —
suppress documents whose content has already been admitted, while the
stream is running. Mechanics per micro-batch (foreachBatch):

1. hash the batch (md5 of text — same family as the batch operators);
2. within-batch keeper: min doc_id per hash (a batch can carry its own
   duplicates);
3. anti-join against the fingerprint registry (every hash ever
   admitted);
4. append the survivors to the output corpus, then their hashes to the
   registry.

Write order is survivors-first: a crash between the two writes re-emits
those documents on retry (at-least-once) instead of losing them forever
(registry-first would suppress unseen docs). Residual duplicates from
such a retry are exactly what the downstream batch ``dedup_exact``
sweep removes — the two operators are designed as a pair.

Scale shape: the registry is a hash-keyed table, so step 3 is one keyed
shuffle of the (small) micro-batch against it; at 100 TB the registry
is bucketed by hash prefix so the anti-join co-locates and only the
touched buckets are read. Nothing here is per-row Python.

Reference parity: none — the reference has no dedup surface; this is
training-pipeline surface built on the same foreachBatch machinery as
the projection live phase (projection/projector.py).
"""

from __future__ import annotations

# Worker-closure hygiene: the stateful process functions below reference
# module-level helpers and run on executors; register this module for
# by-value pickling so they stay executable under a session with no
# PYTHONPATH export (see pipeline/media_codecs.py for the full rationale).
try:  # pragma: no cover
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REGISTRY_SCHEMA = "text_hash string"


def _is_missing_registry(e: Exception) -> bool:
    """True only for 'the registry path does not exist / holds no
    parquet yet' — the two error CONDITIONS Spark raises for a
    never-written registry. Any other failure (permissions, corrupt
    footer, transient FS error surfaced as AnalysisException) must
    re-raise: treating it as an empty registry would silently disable
    duplicate suppression for the batch. Error-condition check first
    (PySpark 4's stable contract); message substrings only as the
    fallback for exceptions that carry no condition."""
    get_cond = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    if get_cond is not None:
        try:
            cond = get_cond()
        except Exception:  # noqa: BLE001 — defensive; fall through to msg
            cond = None
        if cond is not None:
            return cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
    msg = str(e)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg
    )


def _seen_hashes(spark, registry_dir: str) -> DataFrame:
    """Registry frame, or the empty frame when no registry exists yet.

    Manifest-committed read (registry_manifest.read_registry): the
    newest manifest pins exactly the committed units, so a concurrent
    append or compaction is invisible mid-flight — no missing-path
    window, no raw directory listing. Legacy bare directories (tests,
    pre-round-8 registries) fall back to the raw read with the
    empty-frame-on-missing contract."""
    from eventsourcing_spark.pipeline.registry_manifest import read_registry

    return read_registry(spark, registry_dir, REGISTRY_SCHEMA)


def dedup_batch(batch_df: DataFrame, registry_dir: str) -> DataFrame:
    """Steps 1-3 on one micro-batch (also usable on a static frame)."""
    hashed = batch_df.withColumn("text_hash", F.md5("text"))
    w = Window.partitionBy("text_hash")
    first = (
        hashed.withColumn("_keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keeper"))
        .drop("_keeper")
    )
    seen = _seen_hashes(batch_df.sparkSession, registry_dir)
    return first.join(seen, "text_hash", "left_anti")


def dedup_at_ingest(
    stream_docs: DataFrame,
    out_dir: str,
    registry_dir: str,
    checkpoint_dir: str,
):
    """Wire a document stream through ingest dedup.

    Returns the started streaming query (availableNow trigger — drain
    what exists, then stop; swap the trigger for continuous ingest)."""

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        from eventsourcing_spark.pipeline.registry_manifest import append_df

        fresh = dedup_batch(batch_df, registry_dir).persist()
        try:
            if fresh.isEmpty():
                return
            fresh.drop("text_hash").write.mode("append").parquet(out_dir)
            # manifest-committed append: the unit becomes visible to
            # probes only at the atomic manifest commit
            append_df(fresh.select("text_hash").distinct(), registry_dir)
        finally:
            fresh.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
