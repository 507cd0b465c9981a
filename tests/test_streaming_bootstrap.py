"""Streaming Poisson bootstrap: the running CI from the ingest registry
equals the batch gate query on the same rows BIT-FOR-BIT (md5 weights
are batch-boundary-independent), and replayed epochs don't double-count.
"""

from __future__ import annotations

import os

import pytest

from eventsourcing_spark.pipeline.streaming_bootstrap import (
    bootstrap_ci_from_registry,
    bootstrap_counts_at_ingest,
    bootstrap_counts_batch,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

BATCHES = [
    [(i, None, i % 7, "purchase" if i % 2 else "view", 10.0 + i, "{}")
     for i in range(0, 40)],
    [(i, None, i % 7, "purchase" if i % 3 else "error", 5.0 + i, "{}")
     for i in range(40, 90)],
    [(i, None, i % 7, "purchase", 100.0 + i, "{}")
     for i in range(90, 120)],
]


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "reg", "cp")}


def _drain(spark, dirs):
    stream = spark.readStream.schema(EV_SCHEMA).parquet(dirs["src"])
    q = bootstrap_counts_at_ingest(stream, dirs["reg"], dirs["cp"])
    q.awaitTermination(120)


def test_streamed_ci_equals_batch_ci(spark, dirs):
    all_rows = []
    for batch in BATCHES:
        spark.createDataFrame(batch, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["src"])
        all_rows.extend(batch)
        _drain(spark, dirs)

    streamed = bootstrap_ci_from_registry(spark, dirs["reg"]).collect()[0]

    from eventsourcing_spark.analytics import (
        bootstrap_ci_from_stats,
        bootstrap_replicate_stats,
        purchases_frame,
    )

    full = spark.createDataFrame(all_rows, EV_SCHEMA)
    batch_row = bootstrap_ci_from_stats(
        bootstrap_replicate_stats(purchases_frame(full))
    ).collect()[0]

    assert streamed == batch_row
    assert streamed.lo_micro <= streamed.point_micro <= streamed.hi_micro
    assert streamed.n_rows == sum(
        1 for r in all_rows if r[3] == "purchase"
    )


def test_epoch_replay_is_idempotent(spark, dirs):
    from eventsourcing_spark.pipeline.registry_manifest import append_df

    batch = spark.createDataFrame(BATCHES[0], EV_SCHEMA)
    delta = bootstrap_counts_batch(batch)
    append_df(delta, dirs["reg"], epoch_key="boot-0")
    once = bootstrap_ci_from_registry(spark, dirs["reg"]).collect()[0]
    # a foreachBatch retry re-appends the SAME epoch: must replace
    append_df(delta, dirs["reg"], epoch_key="boot-0")
    twice = bootstrap_ci_from_registry(spark, dirs["reg"]).collect()[0]
    assert once == twice
