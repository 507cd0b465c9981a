"""Streaming CEP (view→click matcher): exact parity with the batch twin
over in-order micro-batches, and replay idempotence of the match set."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.streaming.cep import (
    conversions_batch,
    detect_conversions,
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


def test_stream_conversions_match_batch(spark, sf_dir, dirs):
    ev = _stage_time_ordered_chunks(spark, sf_dir, dirs["src"])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = (
        detect_conversions(stream)
        .writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["cp"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out_schema = (
        "user_id long, view_ms long, click_ms long, gap_ms long,"
        " click_event_id long"
    )
    got = {
        tuple(r)
        for r in spark.read.schema(out_schema).parquet(dirs["out"]).collect()
    }
    want = {tuple(r) for r in conversions_batch(ev).collect()}
    assert got == want
    assert want  # the pattern actually fires on the dataset

    # a click matches at most once (match closes on the click)
    ids = [r[-1] for r in got]
    assert len(ids) == len(set(ids))


def test_batch_twin_gap_bounds(spark, sf_dir):
    c = conversions_batch(load_table(spark, sf_dir, "events"))
    from eventsourcing_spark.streaming.cep import MATCH_WINDOW_MS

    assert c.filter((F.col("gap_ms") < 0) | (F.col("gap_ms") > MATCH_WINDOW_MS)).count() == 0
