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


# ---------------------------------------------------------------------------
# Streaming CMS: add-merge parity with one-shot batch counters, and the
# epoch guard that makes the non-idempotent merge effectively-once.
# ---------------------------------------------------------------------------


def _drain_cms(spark, dirs, cp=None):
    from eventsourcing_spark.streaming.sketches import cms_maintain

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = cms_maintain(stream, dirs["reg"], cp or dirs["cp"], "user_id")
    q.awaitTermination(180)


def test_cms_stream_counters_match_batch(spark, sf_dir, dirs):
    from eventsourcing_spark.sketches import cms_counters
    from eventsourcing_spark.streaming.sketches import (
        CMS_SCHEMA,
        _split_cms,
        streaming_cms_estimate,
    )

    ev = _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_cms(spark, dirs)

    stored, epoch = _split_cms(
        read_registers(spark, dirs["reg"], [], CMS_SCHEMA)
    )
    assert epoch >= 0
    want = _frame_set(cms_counters(ev, "user_id"))
    assert _frame_set(stored) == want

    # point estimates are upper bounds on true counts (one-sided error)
    truec = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    keys = sorted(truec)[:10]
    est = {
        r["key"]: r["cms_estimate"]
        for r in streaming_cms_estimate(spark, dirs["reg"], keys).collect()
    }
    assert all(est[k] >= truec[k] for k in keys)


def test_cms_epoch_guard_rejects_replay(spark, sf_dir, dirs, tmp_path):
    from eventsourcing_spark.streaming.sketches import CMS_SCHEMA

    _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_cms(spark, dirs)
    before = _frame_set(read_registers(spark, dirs["reg"], [], CMS_SCHEMA))

    # force a FULL replay with a fresh checkpoint: every batch re-fires
    # with epoch ids <= the stored epoch and must be rejected
    _drain_cms(spark, dirs, cp=str(tmp_path / "cp2"))
    after = _frame_set(read_registers(spark, dirs["reg"], [], CMS_SCHEMA))
    assert after == before


# ---------------------------------------------------------------------------
# Streaming KMV: min-set merge parity with the batch sketch, and
# guard-free replay idempotence (the algebra absorbs re-merges).
# ---------------------------------------------------------------------------


def _drain_kmv(spark, dirs, cp=None):
    from eventsourcing_spark.streaming.sketches import kmv_maintain

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = kmv_maintain(
        stream, dirs["reg"], cp or dirs["cp"], "event_type", "user_id"
    )
    q.awaitTermination(180)


def test_kmv_stream_state_matches_batch(spark, sf_dir, dirs):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eventsourcing_spark.sketches import KMV_K, _h32
    from eventsourcing_spark.streaming.sketches import KMV_STATE_SCHEMA

    ev = _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_kmv(spark, dirs)

    w = Window.partitionBy("grp").orderBy("h")
    want = _frame_set(
        ev.select(
            F.col("event_type").cast("string").alias("grp"),
            _h32(F.col("user_id")).alias("h"),
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("grp", "h")
    )
    got = _frame_set(read_registers(spark, dirs["reg"], [], KMV_STATE_SCHEMA))
    assert got == want


def test_kmv_replay_idempotent_without_guard(spark, sf_dir, dirs, tmp_path):
    from eventsourcing_spark.streaming.sketches import KMV_STATE_SCHEMA

    _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_kmv(spark, dirs)
    before = _frame_set(read_registers(spark, dirs["reg"], [], KMV_STATE_SCHEMA))
    # full replay with a fresh checkpoint: min-set merge absorbs it
    _drain_kmv(spark, dirs, cp=str(tmp_path / "cp3"))
    after = _frame_set(read_registers(spark, dirs["reg"], [], KMV_STATE_SCHEMA))
    assert after == before


# ---------------------------------------------------------------------------
# SpaceSaving: bounded state, bracketing guarantee, heavy-hitter
# completeness across micro-batches.
# ---------------------------------------------------------------------------


def _drain_ss(spark, dirs, cp=None):
    from eventsourcing_spark.streaming.sketches import space_saving_maintain

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = space_saving_maintain(
        stream, dirs["reg"], cp or dirs["cp"], "user_id"
    )
    q.awaitTermination(180)


def test_space_saving_guarantees(spark, sf_dir, dirs):
    from pyspark.sql import functions as F

    from eventsourcing_spark.streaming.sketches import (
        SS_K,
        space_saving_topk,
    )

    ev = _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_ss(spark, dirs)

    state = {
        r["key"]: (r["cnt"], r["err"])
        for r in space_saving_topk(spark, dirs["reg"]).collect()
    }
    assert len(state) <= SS_K
    true = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true.values())
    # bracketing: cnt-err <= true <= cnt for every stored key
    for key, (cnt, err) in state.items():
        assert cnt - err <= true[key] <= cnt
    # completeness: every key with true count > N/K is present
    for key, n in true.items():
        if n > n_total / SS_K:
            assert key in state, (key, n)


def test_space_saving_replay_rejected(spark, sf_dir, dirs, tmp_path):
    from eventsourcing_spark.streaming.sketches import SS_SCHEMA

    _stage_in_chunks(spark, sf_dir, dirs["src"])
    _drain_ss(spark, dirs)
    before = _frame_set(read_registers(spark, dirs["reg"], [], SS_SCHEMA))
    _drain_ss(spark, dirs, cp=str(tmp_path / "cp4"))
    after = _frame_set(read_registers(spark, dirs["reg"], [], SS_SCHEMA))
    assert after == before
