"""KLL quantile sketch: the batch closed form equals a real compactor
cascade; the streaming twin keeps bounded state, honors its own
rank-error certificate, and replays idempotently."""

from __future__ import annotations

import bisect
import random

from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.kll import (
    KLL_K,
    KLL_LEVELS,
    kll_sketch_df,
)
from eventsourcing_spark.streaming.kll import (
    KLL,
    kll_maintain,
    streaming_sketch,
)

EVENTS_SCHEMA = "event_id long, value double"


def _cascade_fixed_offset(vals, k):
    """Reference implementation: true KLL cascade fed sorted values
    with the FIXED even-position offset (the batch derandomization)."""
    levels = [[]]
    for v in sorted(vals):
        levels[0].append(v)
        lvl = 0
        while len(levels[lvl]) >= k:
            buf = levels[lvl][:k]
            levels[lvl] = levels[lvl][k:]
            keep = [buf[i] for i in range(1, k, 2)]
            if lvl + 1 == len(levels):
                levels.append([])
            levels[lvl + 1].extend(keep)
            lvl += 1
    return sorted(
        (v, lvl) for lvl, buf in enumerate(levels) for v in buf
    )


def test_batch_closed_form_equals_cascade(spark, tmp_path):
    random.seed(7)
    n = 3000
    vals = [(i, round(random.uniform(0, 500), 2)) for i in range(n)]
    df = spark.createDataFrame(vals, EVENTS_SCHEMA)
    sketch, stats = kll_sketch_df(spark, df)
    got = sorted(
        (r.value, r.lvl) for r in sketch.collect()
    )
    want = _cascade_fixed_offset([v for _, v in vals], KLL_K)
    assert got == want
    # weight conservation: sketch weights sum to n
    assert sum(1 << lvl for _, lvl in got) == n
    st = stats.first()
    assert st.c == n and len(st.narr) == KLL_LEVELS + 1


def test_online_sketch_bound_and_merge():
    random.seed(11)
    data = [random.gauss(100, 25) for _ in range(20000)]
    sk = KLL(k=64)
    sk.update(data)
    sv = sorted(data)
    assert sk.size() <= 64 * len(sk.levels)
    b = sk.bound()
    assert b > 0
    for frac in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(frac)
        true_rank = bisect.bisect_right(sv, est)
        target = max(1, int(frac * len(data)))
        w_max = 1 << (len(sk.levels) - 1)
        assert abs(true_rank - target) <= b + w_max
    # merge: two halves merged carry the summed certificate and still
    # honor it
    a, c = KLL(k=64), KLL(k=64)
    a.update(data[:10000])
    c.update(data[10000:])
    a.merge(c)
    assert a.n == len(data)
    assert a.size() <= 64 * len(a.levels)
    for frac in (0.1, 0.5, 0.9):
        est = a.quantile(frac)
        true_rank = bisect.bisect_right(sv, est)
        target = max(1, int(frac * len(data)))
        assert abs(true_rank - target) <= a.bound() + (
            1 << (len(a.levels) - 1)
        )


def test_alternating_offsets_are_deterministic():
    data = list(range(1000))
    a, b = KLL(k=16), KLL(k=16)
    a.update(data)
    b.update(data)
    assert a.items() == b.items() and a.bound() == b.bound()


def test_streaming_maintenance(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("src", "state", "cp")}
    random.seed(3)
    all_vals = []
    rows = []
    for i in range(4000):
        v = round(random.uniform(0, 1000), 3)
        all_vals.append(v)
        rows.append((i, v))
    # stage as 4 files → several micro-batches
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(4).write.mode(
        "overwrite"
    ).parquet(dirs["src"])
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = kll_maintain(stream, dirs["state"], dirs["cp"], "value", k=128)
    q.awaitTermination(180)

    sk = streaming_sketch(spark, dirs["state"], k=128)
    assert sk.n == len(all_vals)
    assert sk.size() <= 128 * len(sk.levels)  # bounded state
    sv = sorted(all_vals)
    for frac in (0.1, 0.5, 0.9):
        est = sk.quantile(frac)
        true_rank = bisect.bisect_right(sv, est)
        target = max(1, int(frac * sk.n))
        assert abs(true_rank - target) <= sk.bound() + (
            1 << (len(sk.levels) - 1)
        )

    # drain again with nothing new: state unchanged (checkpoint skips)
    q = kll_maintain(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"]),
        dirs["state"],
        dirs["cp"],
        "value",
        k=128,
    )
    q.awaitTermination(180)
    sk2 = streaming_sketch(spark, dirs["state"], k=128)
    assert sk2.n == sk.n and sk2.items() == sk.items()


def test_epoch_retry_replaces_snapshot(spark, tmp_path):
    """Re-running an epoch's merge (foreachBatch retry semantics)
    replaces its snapshot instead of double-merging."""
    from eventsourcing_spark.pipeline.registry_manifest import append_df

    state = str(tmp_path / "state")
    base = KLL(k=32)
    base.update(range(100))
    append_df(
        spark.createDataFrame(base.to_rows(),
                              "kind string, lvl int, value double, cnt long"
                              ).coalesce(1),
        state,
        epoch_key="0",
    )
    from eventsourcing_spark.streaming.kll import _prev_snapshot_rows

    for _ in range(3):  # three retries of epoch 1
        prev = KLL.from_rows(_prev_snapshot_rows(spark, state, 1), 32)
        prev.update(range(100, 200))
        append_df(
            spark.createDataFrame(
                prev.to_rows(),
                "kind string, lvl int, value double, cnt long",
            ).coalesce(1),
            state,
            epoch_key="1",
        )
    sk = streaming_sketch(spark, state, k=32)
    assert sk.n == 200  # not 100 + 3·100
