"""Streaming twin of the incremental-dedup classifier: classify every
incoming document as exact_dup / near_dup / novel at ingest, admit the
novel ones, and keep an audit trail — the live face of
``dedup_incremental_batch``.

The classification core is literally the batch query's function
(``pipeline.queries.classify_against_index`` — SEMI joins against a
hash index and a MinHash band index), so a batch backfill and live
ingest provably classify identically: the C2 dual-idempotent-rule
pattern (projection/checkpoints.py) applied to curation. The two
registries are the same artifacts the other streaming dedup faces
maintain (streaming_dedup's md5 registry, streaming_neardup's band
registry) — one ingest pipeline can share them.

Per micro-batch (foreachBatch, driver-side plan building only):

1. classify the batch against the registries (the shared rule);
2. within-batch resolution among registry-novel docs, in the
   established keeper order: exact keeper first (min doc_id per md5 —
   losers are exact_dup of an admitted batch member), then the
   probe-before-star near keeper among the exact keepers (losers are
   near_dup of an admitted member; see streaming_neardup for why the
   registry probe must precede the star);
3. admit the survivors, then append their md5s and bands to the two
   registries, then the full (doc_id, status) audit.

Write order is survivors-first (at-least-once): a crash between writes
re-emits documents on retry instead of suppressing never-admitted
content; the residue is what the downstream batch sweep removes.

Scale shape: two SEMI probes of the (small) micro-batch against
key-bucketed registries plus batch-local windows — per-key work is the
duplication degree, never O(k²); nothing corpus-global, no Python rows.

Reference parity: none — training-pipeline surface on the projection
live phase's foreachBatch machinery (projection/projector.py).
"""

from __future__ import annotations

# Worker-closure hygiene, as in the sibling streaming dedup faces (see
# pipeline/media_codecs.py for the rationale).
try:  # pragma: no cover
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.queries import (
    _bands,
    classify_against_index,
)
from eventsourcing_spark.pipeline.streaming_dedup import _seen_hashes
from eventsourcing_spark.pipeline.streaming_neardup import _seen_bands
from eventsourcing_spark.io import materialize


def classify_batch(batch_df: DataFrame, hash_dir: str, band_dir: str):
    """One micro-batch → (statuses, admitted): the full rule (registry
    classification + within-batch keeper resolution). Also usable on a
    static frame — the parity tests replay through this directly."""
    spark = batch_df.sparkSession
    st = classify_against_index(
        batch_df, _seen_hashes(spark, hash_dir), _seen_bands(spark, band_dir)
    )
    novel = batch_df.join(
        st.filter(F.col("status") == "novel").select("doc_id"), "doc_id"
    )
    # Within-batch exact keeper: min doc_id per text hash.
    hashed = novel.withColumn("text_hash", F.md5("text"))
    wh = Window.partitionBy("text_hash")
    exact_losers = (
        hashed.withColumn("_k", F.min("doc_id").over(wh))
        .filter(F.col("doc_id") > F.col("_k"))
        .select("doc_id")
    )
    ek = novel.join(exact_losers, "doc_id", "left_anti")
    # Within-batch near keeper among the exact keepers (registry-clean
    # by construction — the probe already ran in classify).
    bands = _bands(ek)
    wb = Window.partitionBy("band_id", "band_key")
    near_losers = (
        bands.withColumn("_k", F.min("doc_id").over(wb))
        .filter(F.col("doc_id") > F.col("_k"))
        .select("doc_id")
        .distinct()
    )
    admitted = ek.join(near_losers, "doc_id", "left_anti")
    statuses = st.filter(F.col("status") != "novel").unionByName(
        exact_losers.select("doc_id", F.lit("exact_dup").alias("status"))
    ).unionByName(
        near_losers.select("doc_id", F.lit("near_dup").alias("status"))
    ).unionByName(
        admitted.select("doc_id", F.lit("novel").alias("status"))
    )
    return statuses, admitted


def incremental_ingest(
    stream_docs: DataFrame,
    out_dir: str,
    hash_dir: str,
    band_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
):
    """Wire a document stream through classify-and-admit ingest.

    Returns the started streaming query (availableNow trigger — drain
    what exists, then stop; swap the trigger for continuous ingest)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        statuses, admitted = classify_batch(batch_df, hash_dir, band_dir)
        # EAGER materialization before any write: both plans read the
        # registries, and the registry appends below would otherwise be
        # visible to a lazy re-evaluation (a doc would classify as a
        # duplicate of itself on the audit write). persist() is lazy
        # and partitions can recompute — localCheckpoint is the
        # module-wide rule for read-your-own-writes hazards.
        admitted = admitted.transform(materialize)
        statuses = statuses.transform(materialize)
        if not admitted.isEmpty():
            admitted.write.mode("append").parquet(out_dir)
        # Corpus → audit → registries: a retry after a partial failure
        # re-admits (at-least-once, downstream sweep removes the
        # residue); registry-before-audit would instead mislabel the
        # re-run's audit rows as duplicates.
        statuses.withColumn("batch_id", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(audit_dir)
        if not admitted.isEmpty():
            from eventsourcing_spark.pipeline.registry_manifest import (
                append_df,
            )

            # manifest-committed appends (atomic visibility at commit)
            append_df(
                admitted.select(F.md5("text").alias("text_hash")).distinct(),
                hash_dir,
            )
            append_df(
                _bands(admitted).select("band_id", "band_key").distinct(),
                band_dir,
            )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
