"""Ingest-time NEAR-dup suppression: token-reordered copies are turned
away across batches and restarts; batch and stream agree on the rule."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.queries import _bands
from eventsourcing_spark.pipeline.streaming_neardup import (
    neardup_at_ingest,
    neardup_batch,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"


def _write_batch(spark, src_dir, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "reg": str(tmp_path / "reg"),
        "cp": str(tmp_path / "cp"),
    }


def _drain(spark, d):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(d["src"])
    q = neardup_at_ingest(stream, d["out"], d["reg"], d["cp"])
    q.awaitTermination(120)


def test_reordered_copy_suppressed_within_and_across_batches(spark, dirs):
    # doc 2 is doc 1 with tokens reordered: identical token SET, so an
    # identical MinHash signature — a near-dup that md5(text) misses.
    _write_batch(
        spark,
        dirs["src"],
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "delta gamma beta alpha", "en"),
            (3, "omicron sigma tau upsilon", "en"),
        ],
    )
    _drain(spark, dirs)
    out = {r.doc_id: r.text for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(out) == {1, 3}

    # Second drain: a reorder of doc 3 arrives — the registry turns it
    # away; genuinely new content is admitted.
    _write_batch(
        spark,
        dirs["src"],
        [
            (4, "upsilon tau sigma omicron", "en"),
            (5, "kappa lambda mu nu", "de"),
        ],
    )
    _drain(spark, dirs)
    out = {r.doc_id: r.text for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(out) == {1, 3, 5}

    # Third drain with nothing new: checkpoint skips consumed files
    # (idempotent restart).
    _drain(spark, dirs)
    assert spark.read.parquet(dirs["out"]).count() == 3


def test_stream_agrees_with_batch_replay(spark, dirs):
    """The streamed end-state equals replaying the same deterministic
    rule (keeper-star, then registry probe) batch-by-batch statically."""
    b1 = [
        (10, "one two three four five six", "en"),
        (11, "six five four three two one", "en"),
        (12, "seven eight nine ten eleven", "en"),
    ]
    b2 = [
        (13, "eleven ten nine eight seven", "en"),
        (14, "twelve thirteen fourteen fifteen", "fr"),
        (15, "fifteen fourteen thirteen twelve", "fr"),
    ]
    _write_batch(spark, dirs["src"], b1)
    _drain(spark, dirs)
    _write_batch(spark, dirs["src"], b2)
    _drain(spark, dirs)
    streamed = sorted(
        r.doc_id for r in spark.read.parquet(dirs["out"]).collect()
    )

    # Static replay with plain DataFrame ops.
    admitted_bands = None
    expect = []
    for rows in (b1, b2):
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        bands = _bands(df)
        claim = Window.partitionBy("band_id", "band_key")
        supp = (
            bands.withColumn("_k", F.min("doc_id").over(claim))
            .filter(F.col("doc_id") > F.col("_k"))
            .select("doc_id")
            .distinct()
        )
        kept = df.join(supp, "doc_id", "left_anti")
        if admitted_bands is not None:
            hit = (
                _bands(kept)
                .join(admitted_bands, ["band_id", "band_key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            kept = kept.join(hit, "doc_id", "left_anti")
        expect.extend(r.doc_id for r in kept.collect())
        newb = _bands(kept).select("band_id", "band_key").distinct()
        admitted_bands = (
            newb
            if admitted_bands is None
            else admitted_bands.union(newb).distinct()
        )
    assert streamed == sorted(expect)


def test_neardup_batch_is_usable_statically(spark, dirs):
    df = spark.createDataFrame(
        [
            (20, "red green blue yellow", "en"),
            (21, "yellow blue green red", "en"),
            (22, "cyan magenta black white", "en"),
        ],
        DOCS_SCHEMA,
    )
    fresh = neardup_batch(df, dirs["reg"])  # empty registry
    assert sorted(r.doc_id for r in fresh.collect()) == [20, 22]
    assert fresh.columns == df.columns
