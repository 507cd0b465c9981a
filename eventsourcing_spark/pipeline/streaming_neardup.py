"""Online NEAR-dup suppression at ingest: the MinHash face of
``streaming_dedup``.

``streaming_dedup`` admits a document unless its exact bytes were seen;
a crawl pipeline also has to turn away the *near*-copy — the same page
re-serialized with tokens reordered, boilerplate re-flowed, or a few
words swapped. This module keeps a registry of MinHash LSH band keys
(pipeline.queries._bands — the identical family the batch operators
use, so stream and batch agree on what "near" means) and suppresses any
incoming document that shares a band with an admitted one. Note the
band registry *subsumes* the exact-hash registry: identical text has an
identical signature, so every exact duplicate is also a band hit.

Per micro-batch (foreachBatch, driver-side plan building only):

1. band the batch (2 bands of 2 md5 min-hashes per doc);
2. within-batch keeper-star (same rule as dedup_lsh_clusters): a doc
   sharing a band with a SMALLER doc_id in the batch is suppressed —
   deterministic at any parallelism, no chained-transitivity ambiguity;
3. semi-join the survivors' bands against the registry; any hit
   suppresses the doc;
4. append survivors to the corpus, then their bands to the registry.

Write order is survivors-first (at-least-once): a crash between the two
writes re-emits documents on retry instead of silently suppressing
never-admitted content; the residue is exactly what the downstream
batch dedup sweep removes. Scale shape: step 3 is one keyed shuffle of
the (small) micro-batch bands against a band-keyed registry — bucketed
by band-key prefix at 100 TB so the probe co-locates; per-key work is
the duplication degree (semi-join = existence only), never O(k²).

Reference parity: none — the reference has no dedup surface; this is
training-pipeline surface on the projection live phase's foreachBatch
machinery (projection/projector.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.queries import _bands

BAND_REGISTRY_SCHEMA = "band_id int, band_key string"


def _seen_bands(spark, registry_dir: str) -> DataFrame:
    if os.path.isdir(registry_dir) and any(
        f.endswith(".parquet") for f in os.listdir(registry_dir)
    ):
        return spark.read.parquet(registry_dir)
    return spark.createDataFrame([], BAND_REGISTRY_SCHEMA)


def neardup_batch(batch_df: DataFrame, registry_dir: str) -> DataFrame:
    """Steps 1-3 on one micro-batch (also usable on a static frame).

    Returns the admitted documents (original columns, no band columns).
    """
    bands = _bands(batch_df)
    # Within-batch keeper-star: min doc_id per band bucket claims it.
    claim = Window.partitionBy("band_id", "band_key")
    suppressed = (
        bands.withColumn("_keeper", F.min("doc_id").over(claim))
        .filter(F.col("doc_id") > F.col("_keeper"))
        .select("doc_id")
        .distinct()
    )
    kept = batch_df.join(suppressed, "doc_id", "left_anti")
    # Registry probe: any band hit suppresses the doc.
    seen = _seen_bands(batch_df.sparkSession, registry_dir)
    hit = (
        _bands(kept)
        .join(seen, ["band_id", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    return kept.join(hit, "doc_id", "left_anti")


def neardup_at_ingest(
    stream_docs: DataFrame,
    out_dir: str,
    registry_dir: str,
    checkpoint_dir: str,
):
    """Wire a document stream through ingest near-dup suppression.

    Returns the started streaming query (availableNow trigger — drain
    what exists, then stop; swap the trigger for continuous ingest)."""

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        fresh = neardup_batch(batch_df, registry_dir).persist()
        try:
            if fresh.isEmpty():
                return
            fresh.write.mode("append").parquet(out_dir)
            _bands(fresh).select("band_id", "band_key").distinct().write.mode(
                "append"
            ).parquet(registry_dir)
        finally:
            fresh.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
