"""Streaming windowed aggs + stateful fold + M3 migration + map_merge."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from eventsourcing_spark.functions.maps import map_merge
from eventsourcing_spark.maintenance.projection_migration import (
    KIND_NOOP,
    migrate_consistent_projection,
)
from eventsourcing_spark.projection.projector import events_file_stream
from eventsourcing_spark.store import EventStore
from eventsourcing_spark.streaming.windows import stateful_running_fold, windowed_counts

from tests.account import KIND_CREATED, KIND_DEPOSITED, KIND_WITHDRAWN, account_states_sql

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def seed(store: EventStore):
    for i, (aid, evs) in enumerate(
        [
            ("w-1", [(KIND_CREATED, {"money": 100, "owner": "A"}),
                     (KIND_DEPOSITED, {"money": 10})]),
            ("w-2", [(KIND_CREATED, {"money": 50, "owner": "B"}),
                     (KIND_WITHDRAWN, {"money": 20})]),
        ]
    ):
        store.append(aid, "Account", evs, expected_version=0,
                     created_at=T0 + timedelta(minutes=90 * i))


def test_windowed_counts_batch_and_stream_agree(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "wc"))
    seed(store)

    batch = windowed_counts(store.events(), window="1 hour").collect()
    batch_set = {(r.window_start, r.kind, r.n_events) for r in batch}
    assert len(batch_set) >= 2

    out: list = []
    q = (
        windowed_counts(events_file_stream(store), window="1 hour")
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, _e: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "wc_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_set = {(r.window_start, r.kind, r.n_events) for r in out}
    assert stream_set == batch_set


def test_stateful_running_fold_across_batches(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "sf"))
    seed(store)

    results: dict[str, tuple[int, int]] = {}

    def absorb(df, _epoch):
        for r in df.collect():
            results[r.aggregate_id] = (r.balance, r.n_events)

    q = (
        stateful_running_fold(events_file_stream(store))
        .writeStream.outputMode("update")
        .foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "sf_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert results["w-1"] == (110, 2)
    assert results["w-2"] == (30, 2)

    # second batch of events: state persists across restarts via the
    # streaming checkpoint — the running fold continues, not restarts
    store.append("w-1", "Account", [(KIND_DEPOSITED, {"money": 5})],
                 expected_version=2, created_at=T0 + timedelta(hours=5))
    q2 = (
        stateful_running_fold(events_file_stream(store))
        .writeStream.outputMode("update")
        .foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "sf_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert results["w-1"] == (115, 3)
    assert results["w-2"] == (30, 2)  # untouched key keeps its state


def test_consistent_projection_migration(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "m3"))
    seed(store)
    out_dir = str(tmp_path / "m3_states")

    n = migrate_consistent_projection(
        store, "balances-v2", "Account", account_states_sql, out_dir, now=T0 + timedelta(days=1)
    )
    assert n == 2

    # states flushed
    states = {r.aggregate_id: r for r in spark.read.parquet(out_dir).collect()}
    assert states["w-1"].balance == 110
    assert states["w-2"].balance == 30

    # NoOp guard appended at version max+1, visible and version-bumping
    noops = store.events().filter(F.col("kind") == KIND_NOOP).collect()
    assert {(r.aggregate_id, r.aggregate_version) for r in noops} == {
        ("w-1", 3), ("w-2", 3),
    }
    # a writer that raced with stale version now collides
    import pytest

    from eventsourcing_spark.store import ConcurrentModificationError

    with pytest.raises(ConcurrentModificationError):
        store.append("w-1", "Account", [(KIND_DEPOSITED, {"money": 1})],
                     expected_version=2, created_at=T0 + timedelta(days=2))

    # idempotent: ledger short-circuits the second run
    assert migrate_consistent_projection(
        store, "balances-v2", "Account", account_states_sql, out_dir
    ) == 0
    assert store.events().filter(F.col("kind") == KIND_NOOP).count() == 2


def test_map_merge_last_wins(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "9", "c": "3"})],
        "m1 map<string,string>, m2 map<string,string>",
    )
    row = df.select(map_merge(F.col("m1"), F.col("m2")).alias("m")).first()
    assert dict(row.m) == {"a": "1", "b": "9", "c": "3"}
    # empty maps are identity
    df2 = spark.createDataFrame([({}, {"x": "1"})], "m1 map<string,string>, m2 map<string,string>")
    assert dict(df2.select(map_merge(F.col("m1"), F.col("m2")).alias("m")).first().m) == {"x": "1"}


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from eventsourcing_spark.streaming.windows import stream_interval_join

    store = EventStore(spark, str(tmp_path / "ij"))
    # x-1: withdrawal 10 min after the deposit (inside the 30 min bound);
    # x-2: withdrawal 2 h after (outside) — must not pair.
    store.append(
        "x-1", "Account",
        [(KIND_CREATED, {"money": 100, "owner": "A"})],
        expected_version=0, created_at=T0,
    )
    store.append(
        "x-1", "Account",
        [(KIND_WITHDRAWN, {"money": 30})],
        expected_version=1, created_at=T0 + timedelta(minutes=10),
    )
    store.append(
        "x-2", "Account",
        [(KIND_CREATED, {"money": 50, "owner": "B"})],
        expected_version=0, created_at=T0,
    )
    store.append(
        "x-2", "Account",
        [(KIND_WITHDRAWN, {"money": 20})],
        expected_version=1, created_at=T0 + timedelta(hours=2),
    )

    def split(df):
        deposits = df.filter(F.col("kind") == KIND_CREATED).select(
            "aggregate_id", "created_at", "kind"
        )
        withdrawals = df.filter(F.col("kind") == KIND_WITHDRAWN).select(
            "aggregate_id", "created_at", "kind"
        )
        return deposits, withdrawals

    batch = stream_interval_join(*split(store.events())).collect()
    batch_set = {(r.aggregate_id, r.created_at, r.created_at_r) for r in batch}
    assert {r.aggregate_id for r in batch} == {"x-1"}

    out: list = []
    stream = events_file_stream(store)
    q = (
        stream_interval_join(*split(stream))
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _e: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ij_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_set = {(r.aggregate_id, r.created_at, r.created_at_r) for r in out}
    assert stream_set == batch_set


def test_stream_interval_join_left_outer(spark, tmp_path):
    from eventsourcing_spark.streaming.windows import stream_interval_join

    store = EventStore(spark, str(tmp_path / "ijo"))
    store.append(
        "y-1", "Account",
        [(KIND_CREATED, {"money": 100, "owner": "A"})],
        expected_version=0, created_at=T0,
    )
    store.append(
        "y-2", "Account",
        [(KIND_CREATED, {"money": 50, "owner": "B"})],
        expected_version=0, created_at=T0,
    )
    store.append(
        "y-1", "Account",
        [(KIND_WITHDRAWN, {"money": 30})],
        expected_version=1, created_at=T0 + timedelta(minutes=10),
    )

    df = store.events()
    deposits = df.filter(F.col("kind") == KIND_CREATED).select(
        "aggregate_id", "created_at"
    )
    withdrawals = df.filter(F.col("kind") == KIND_WITHDRAWN).select(
        "aggregate_id", "created_at"
    )
    out = stream_interval_join(
        deposits, withdrawals, how="leftOuter"
    ).collect()
    by_id = {r.aggregate_id: r for r in out}
    assert set(by_id) == {"y-1", "y-2"}
    assert by_id["y-1"].created_at_r is not None
    assert by_id["y-2"].created_at_r is None

    # streaming acceptance: the outer plan must be constructible and run
    stream = events_file_stream(store)
    sd = stream.filter(F.col("kind") == KIND_CREATED).select(
        "aggregate_id", "created_at"
    )
    sw = stream.filter(F.col("kind") == KIND_WITHDRAWN).select(
        "aggregate_id", "created_at"
    )
    rows: list = []
    q = (
        stream_interval_join(sd, sw, how="leftOuter")
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ijo_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # matched pair is emitted immediately; the unmatched y-2 row is held
    # until a later watermark advance, so only assert the matched subset
    assert {r.aggregate_id for r in rows if r.created_at_r is not None} == {"y-1"}


def test_heavy_hitters_batch_and_stream_agree(spark, tmp_path):
    from eventsourcing_spark.streaming.windows import (
        heavy_hitters_writer,
        windowed_heavy_hitters,
    )

    store = EventStore(spark, str(tmp_path / "hh"))
    seed(store)

    batch = windowed_heavy_hitters(store.events(), k=2, window="1 hour").collect()
    batch_set = {(r.window_start, r.kind, r.n_events, r.rk) for r in batch}
    assert batch_set and all(r.rk <= 2 for r in batch)

    counts = windowed_heavy_hitters(
        events_file_stream(store), k=2, window="1 hour"
    )
    q = heavy_hitters_writer(
        counts, str(tmp_path / "hh_out"), str(tmp_path / "hh_cp"), k=2
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "hh_out")).collect()
    stream_set = {(r.window_start, r.kind, r.n_events, r.rk) for r in got}
    assert stream_set == batch_set


def test_dedup_within_watermark_absorbs_redelivery(spark, tmp_path):
    import datetime as dt

    from eventsourcing_spark.streaming.windows import dedup_within_watermark

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    t0 = dt.datetime(2024, 1, 1)
    schema = "id string, aggregate_id string, created_at timestamp, v long"
    batch1 = [(f"e{i}", f"a{i % 3}", t0 + dt.timedelta(seconds=i), i) for i in range(10)]
    # batch 2 redelivers half of batch 1 (transport retry) + new events
    batch2 = batch1[5:] + [
        (f"e{10 + i}", f"a{i % 3}", t0 + dt.timedelta(seconds=10 + i), 10 + i)
        for i in range(5)
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_within_watermark(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == sorted({r[0] for r in batch1 + batch2})  # each id exactly once

    # batch frame: same call, plain dropDuplicates semantics
    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    assert dedup_within_watermark(batch_df).count() == 15
