"""Streaming HLL maintenance: stream/batch register parity (exact),
replay idempotence, and estimate agreement."""

from __future__ import annotations

import pytest

from eventsourcing_spark.io import load_table
from eventsourcing_spark.sketches import hll_estimate, hll_registers
from eventsourcing_spark.streaming.sketches import (
    hll_maintain,
    read_registers,
    streaming_distinct_estimate,
)

REG_SCHEMA = "event_type string, b bigint, m_b int"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "reg": str(tmp_path / "reg"),
        "cp": str(tmp_path / "cp"),
    }


def _stage_in_chunks(spark, sf_dir, src_dir, n_chunks=4):
    ev = load_table(spark, sf_dir, "events")
    # split into n_chunks files so the file stream sees several batches
    ev.repartition(n_chunks).write.mode("overwrite").parquet(src_dir)
    return ev


def _drain(spark, dirs):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = hll_maintain(
        stream, dirs["reg"], dirs["cp"], ["event_type"], "user_id", REG_SCHEMA
    )
    q.awaitTermination(180)


def _frame_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_registers_match_batch_exactly(spark, sf_dir, dirs):
    ev = _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain(spark, dirs)

    batch_regs = hll_registers(ev, ["event_type"], "user_id")
    stored = read_registers(spark, dirs["reg"], ["event_type"], REG_SCHEMA)
    # max-merge is order/partitioning-insensitive: EXACT equality
    assert _frame_set(stored) == _frame_set(batch_regs)

    # estimates agree bit-for-bit too
    got = _frame_set(streaming_distinct_estimate(spark, dirs["reg"], ["event_type"], REG_SCHEMA))
    want = _frame_set(hll_estimate(batch_regs, ["event_type"]))
    assert got == want


def test_replay_is_idempotent(spark, sf_dir, dirs):
    _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain(spark, dirs)
    before = _frame_set(read_registers(spark, dirs["reg"], ["event_type"], REG_SCHEMA))

    # second drain over the same source: checkpoint skips consumed files;
    # even a forced re-merge of old data would be a no-op (max idempotent)
    _drain(spark, dirs)
    after = _frame_set(read_registers(spark, dirs["reg"], ["event_type"], REG_SCHEMA))
    assert after == before
