"""Streaming session tracker (transformWithStateInPandas): exact parity
with the batch twin over in-order micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.streaming.sessions import (
    closed_sessions_batch,
    track_sessions,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "cp": str(tmp_path / "cp"),
    }


def _stage_time_ordered_chunks(spark, sf_dir, src_dir, n_chunks=3):
    """Chunk the events table into time-contiguous files so per-key
    event-time order holds across micro-batches (the operator's
    ordering contract, same as a Kafka partition's)."""
    ev = load_table(spark, sf_dir, "events")
    ranked = ev.withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, n_chunks + 1):
        (
            ranked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )
    return ev


def test_stream_sessions_match_batch(spark, sf_dir, dirs):
    ev = _stage_time_ordered_chunks(spark, sf_dir, dirs["src"])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = (
        track_sessions(stream)
        .writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["cp"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        tuple(r)
        for r in spark.read.schema(
            "user_id long, session_start_ms long, session_end_ms long,"
            " n_events long, total_cents long"
        )
        .parquet(dirs["out"])
        .collect()
    }
    want = {tuple(r) for r in closed_sessions_batch(ev).collect()}
    # exact: same sessions, same integer totals, regardless of batching
    assert got == want
    assert want, "testdata must contain at least one closed session"
