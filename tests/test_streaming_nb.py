"""Streaming NB training: per-batch count deltas sum to exactly the
batch-trained model (shared finisher = provable batch↔stream parity),
and the epoch-keyed write is idempotent under batch replay."""

from __future__ import annotations

import os

import pytest

from eventsourcing_spark.pipeline.nb_classifier import (
    model_from_counts,
    token_counts_df,
)
from eventsourcing_spark.pipeline.streaming_nb import (
    nb_counts_at_ingest,
    nb_counts_batch,
    nb_model_from_registry,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"

BATCHES = [
    [(0, "the quick brown fox and a dog of the day to tell", "en"),
     (1, "aaaa bbbb aaaa bbbb aaaa", "en")],
    [(2, "the lazy dog and a fox of the night to tell", "en"),
     (3, "cccc dddd cccc dddd cccc", "en")],
    [(4, "a story of the fox and the dog to tell today", "en")],
]


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "counts", "cp")}


def _drain(spark, dirs):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(dirs["src"])
    q = nb_counts_at_ingest(stream, dirs["counts"], dirs["cp"])
    q.awaitTermination(120)


def test_streamed_model_equals_batch_model(spark, dirs):
    all_rows = []
    for batch in BATCHES:
        spark.createDataFrame(batch, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["src"])
        all_rows.extend(batch)
        _drain(spark, dirs)

    streamed = {
        r.token: (r.cnt_good, r.cnt_bad, r.llr_fx)
        for r in nb_model_from_registry(spark, dirs["counts"]).collect()
    }
    batch_model = model_from_counts(
        token_counts_df(spark.createDataFrame(all_rows, DOCS_SCHEMA))
    )
    expected = {
        r.token: (r.cnt_good, r.cnt_bad, r.llr_fx)
        for r in batch_model.collect()
    }
    assert streamed == expected
    # a genuinely discriminative token made it in with a nonzero llr
    assert streamed["the"][2] != 0 or streamed["aaaa"][2] != 0


def test_epoch_keyed_write_is_idempotent(spark, dirs):
    """Re-running an epoch's commit (foreachBatch retry semantics)
    leaves the counts unchanged — each retry's manifest commit REPLACES
    the epoch's prior unit, so no double counting."""
    from eventsourcing_spark.pipeline.registry_manifest import append_df

    df = spark.createDataFrame(BATCHES[0], DOCS_SCHEMA)
    delta = nb_counts_batch(df)
    for _ in range(3):  # three retries of the SAME epoch
        append_df(delta, dirs["counts"], epoch_key="7")
    model = {
        r.token: (r.cnt_good, r.cnt_bad)
        for r in nb_model_from_registry(spark, dirs["counts"]).collect()
    }
    expect = {
        r.token: (r.cnt_good, r.cnt_bad) for r in delta.collect()
    }
    assert model == expect


def test_checkpoint_skips_consumed_files(spark, dirs):
    """A drain with nothing new writes no new registry batches."""
    spark.createDataFrame(BATCHES[0], DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["src"])
    _drain(spark, dirs)
    n1 = len(os.listdir(dirs["counts"]))
    _drain(spark, dirs)  # nothing new
    assert len(os.listdir(dirs["counts"])) == n1
