"""Streaming quality gate: ingest routing matches the batch gate's
verdicts exactly (shared score_docs), kept ∪ rejected partitions each
batch with no loss and no overlap, and the gate composes with the
streaming-trained model."""

from __future__ import annotations

import pytest

from eventsourcing_spark.pipeline.nb_classifier import (
    model_from_counts,
    prior_df,
    score_docs,
    token_counts_df,
)
from eventsourcing_spark.pipeline.streaming_nb import (
    nb_counts_at_ingest,
    nb_model_from_registry,
)
from eventsourcing_spark.pipeline.streaming_quality_gate import (
    quality_gate_at_ingest,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"

GOOD = "the quick brown fox and a story of the day to tell"
BAD = "zzzz qqqq zzzz qqqq zzzz"

TRAIN = [(i, GOOD if i % 2 == 0 else BAD, "en") for i in range(20)]
ARRIVING = [
    (100, GOOD, "en"),
    (101, BAD, "en"),
    (102, "a story of the fox to tell and the day", "en"),
    (103, "qqqq zzzz qqqq", "en"),
]


@pytest.fixture()
def dirs(tmp_path):
    return {
        k: str(tmp_path / k)
        for k in ("src", "kept", "rej", "cp", "csrc", "counts", "ccp")
    }


def _trained(spark):
    train = spark.createDataFrame(TRAIN, DOCS_SCHEMA)
    return model_from_counts(token_counts_df(train)), prior_df(train)


def test_ingest_routing_matches_batch_verdicts(spark, dirs):
    model, prior = _trained(spark)
    arriving = spark.createDataFrame(ARRIVING, DOCS_SCHEMA)
    arriving.coalesce(1).write.mode("append").parquet(dirs["src"])
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(dirs["src"])
    q = quality_gate_at_ingest(
        stream, model, prior, dirs["kept"], dirs["rej"], dirs["cp"]
    )
    q.awaitTermination(120)

    kept = {r.doc_id for r in spark.read.parquet(dirs["kept"]).collect()}
    rej = {r.doc_id for r in spark.read.parquet(dirs["rej"]).collect()}
    # partition: no loss, no overlap
    assert kept | rej == {100, 101, 102, 103}
    assert kept & rej == set()
    # exact agreement with the batch path (shared score_docs)
    from pyspark.sql import functions as F

    batch_kept = {
        r.doc_id
        for r in score_docs(arriving, model, prior)
        .filter(
            F.coalesce(F.col("tok_sum"), F.lit(0)) + F.col("prior_fx") >= 0
        )
        .collect()
    }
    assert kept == batch_kept
    # the separable signal routed as designed
    assert {100, 102} <= kept and {101, 103} <= rej


def test_gate_composes_with_streaming_trained_model(spark, dirs):
    """Train via the streaming counts registry, then gate with the
    registry-derived model — the full train-at-ingest → apply-at-ingest
    loop."""
    spark.createDataFrame(TRAIN, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["csrc"])
    cstream = spark.readStream.schema(DOCS_SCHEMA).parquet(dirs["csrc"])
    nb_counts_at_ingest(cstream, dirs["counts"], dirs["ccp"]).awaitTermination(
        120
    )
    model = nb_model_from_registry(spark, dirs["counts"])
    prior = prior_df(spark.createDataFrame(TRAIN, DOCS_SCHEMA))

    spark.createDataFrame(ARRIVING, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["src"])
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(dirs["src"])
    quality_gate_at_ingest(
        stream, model, prior, dirs["kept"], dirs["rej"], dirs["cp"]
    ).awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(dirs["kept"]).collect()}
    assert kept == {100, 102}
