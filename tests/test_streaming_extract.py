"""Batch↔streaming parity for HTML extraction: the same pages streamed
through extract_at_ingest and run through the batch rule produce
identical extraction rows (one shared frame builder)."""

from __future__ import annotations

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.html_extract import (
    extraction_stats,
    wrap_as_html,
)
from eventsourcing_spark.pipeline.streaming_extract import extract_at_ingest


def test_streamed_extraction_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    pages = wrap_as_html(docs)
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    # Two separate appends -> two micro-batch drains.
    pages.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, source string, html string"
    ).parquet(src)
    extract_at_ingest(stream, out, cp).awaitTermination(120)
    pages.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id bigint, source string, html string"
    ).parquet(src)
    extract_at_ingest(stream, out, cp).awaitTermination(120)

    streamed = {
        r.doc_id: (r.extracted_text, r.n_blocks, r.n_content_blocks,
                   r.boilerplate_ppm)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: (r.extracted_text, r.n_blocks, r.n_content_blocks,
                   r.boilerplate_ppm)
        for r in extraction_stats(pages).collect()
    }
    assert streamed == batch and len(streamed) == 60
