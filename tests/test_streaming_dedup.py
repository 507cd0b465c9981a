"""Ingest-time dedup: suppression across batches, restarts, and within
a batch; at-least-once on the survivors side."""

from __future__ import annotations

import pytest

from eventsourcing_spark.pipeline.streaming_dedup import (
    dedup_at_ingest,
    dedup_batch,
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
    q = dedup_at_ingest(stream, d["out"], d["reg"], d["cp"])
    q.awaitTermination(120)


def test_dedup_within_and_across_batches(spark, dirs):
    _write_batch(
        spark,
        dirs["src"],
        [(1, "alpha", "en"), (2, "alpha", "en"), (3, "beta", "en")],
    )
    _drain(spark, dirs)
    out = {r.doc_id: r.text for r in spark.read.parquet(dirs["out"]).collect()}
    # within-batch duplicate suppressed, min doc_id kept
    assert out == {1: "alpha", 3: "beta"}

    # second drain: re-seen content suppressed by the registry, new kept
    _write_batch(
        spark,
        dirs["src"],
        [(4, "alpha", "en"), (5, "gamma", "de")],
    )
    _drain(spark, dirs)
    out = {r.doc_id: r.text for r in spark.read.parquet(dirs["out"]).collect()}
    assert out == {1: "alpha", 3: "beta", 5: "gamma"}

    # third drain with nothing new: checkpoint skips consumed files,
    # output unchanged (idempotent restart)
    _drain(spark, dirs)
    assert spark.read.parquet(dirs["out"]).count() == 3


def test_dedup_batch_is_usable_statically(spark, dirs):
    df = spark.createDataFrame(
        [(10, "x", "en"), (11, "x", "en"), (12, "y", "fr")], DOCS_SCHEMA
    )
    fresh = dedup_batch(df, dirs["reg"])  # empty registry
    assert sorted(r.doc_id for r in fresh.collect()) == [10, 12]
    assert "text_hash" in fresh.columns


def test_missing_registry_classifier_narrow(spark, tmp_path):
    """Only PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA fall back to the
    empty frame; any other AnalysisException re-raises (a real read
    failure must fail the batch, not silently disable suppression)."""
    from pyspark.errors import AnalysisException

    from eventsourcing_spark.pipeline.streaming_dedup import (
        _is_missing_registry,
        _seen_hashes,
    )

    # Real missing path → classified missing, probe yields empty frame.
    try:
        spark.read.schema("a int").parquet(str(tmp_path / "nope"))
        raise AssertionError("expected AnalysisException")
    except AnalysisException as e:
        assert _is_missing_registry(e)
    assert _seen_hashes(spark, str(tmp_path / "nope")).count() == 0

    # A different analysis failure (ambiguous/unresolved column) must
    # NOT be classified as a missing registry.
    try:
        spark.range(1).select("no_such_column").collect()
        raise AssertionError("expected AnalysisException")
    except AnalysisException as e:
        assert not _is_missing_registry(e)

    # Condition-less exceptions fall back to message substrings only.
    assert _is_missing_registry(RuntimeError("PATH_NOT_FOUND: gone"))
    assert not _is_missing_registry(RuntimeError("disk on fire"))
