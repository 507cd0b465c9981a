"""Streaming twin of HTML main-content extraction: reduce crawled
pages to content at ingest, keeping the boilerplate census as an audit
trail — the live face of ``html_extract_stats``.

The extraction rule is literally the batch query's frame builder
(``pipeline.html_extract.extraction_stats`` — one JVM projection of
regexp/split/higher-order expressions), so a batch backfill over the
same pages and the live ingest provably extract identically — the same
dual-rule discipline as pipeline/streaming_incremental.py.

Per micro-batch (foreachBatch): run the shared projection, write the
extracted rows. There is no registry and no cross-batch state —
extraction is a pure map, which is exactly why it belongs at ingest:
the cost rides executor count and nothing is replayed later.

Reference parity: none — training-pipeline surface on the projection
live phase's foreachBatch machinery (projection/projector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from eventsourcing_spark.pipeline.html_extract import extraction_stats


def extract_at_ingest(
    stream_pages: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Wire a page stream (doc_id, html, ...) through extraction.

    Returns the started streaming query (availableNow trigger — drain
    what exists, then stop; swap the trigger for continuous ingest)."""

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        extraction_stats(batch_df).write.mode("append").parquet(out_dir)

    return (
        stream_pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
