"""asof_join_backward edge semantics (operators/asof.py).

The oracle gate checks it against DuckDB's native ASOF JOIN at sf0.01;
here the hand-built cases pin the contract: inclusive at equal
timestamps, nulls before any right row, values never leak across keys.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from eventsourcing_spark.operators.asof import asof_join_backward


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(0), "L-before-any"),
            ("u1", _ts(5), "L-equal-ts"),
            ("u1", _ts(9), "L-between"),
            ("u1", _ts(20), "L-after-second"),
            ("u2", _ts(30), "L-other-key"),
        ],
        "key string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 50.0),
            ("u1", _ts(10), 100.0),
            ("u2", _ts(1), 7.0),
        ],
        "key string, ts timestamp, rv double",
    )
    out = asof_join_backward(
        left, right, key_cols=["key"], left_ts="ts", right_ts="ts",
        value_cols=["rv"], ts_out="rts",
    )
    got = {r.tag: (r.rv, r.rts) for r in out.collect()}
    assert got["L-before-any"] == (None, None)
    assert got["L-equal-ts"] == (50.0, _ts(5))  # inclusive at equal ts
    assert got["L-between"] == (50.0, _ts(5))
    assert got["L-after-second"] == (100.0, _ts(10))
    assert got["L-other-key"] == (7.0, _ts(1))  # no cross-key leakage
    assert out.count() == left.count()  # left-join cardinality


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([("a", _ts(1), 1)], "key string, ts timestamp, x int")
    right = spark.createDataFrame([("a", _ts(0), 2.0)], "key string, ts timestamp, v double")
    out = asof_join_backward(left, right, ["key"], "ts", "ts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window — never a join node, never a range cross-product
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share the window shuffle
    assert out.filter(F.col("v") == 2.0).count() == 1


def test_bucketed_range_join_semantics(spark):
    from pyspark.sql import functions as F

    from eventsourcing_spark.operators.rangejoin import bucketed_range_join

    left = spark.createDataFrame(
        [("k1", 1000, "w1"), ("k1", 5000, "w2"), ("k2", 1000, "w3")],
        "key string, at long, tag string",
    )
    right = spark.createDataFrame(
        [("k1", 400, 1.0), ("k1", 999, 2.0), ("k1", 1000, 4.0), ("k2", 500, 8.0)],
        "key string, rts long, rv double",
    )
    # window = [at-600, at): inclusive low, exclusive high
    out = bucketed_range_join(
        left, right, ["key"],
        left_lo_ms=F.col("at") - 600, left_hi_ms=F.col("at"),
        right_ts_ms=F.col("rts"), bucket_ms=600,
    )
    agg = {
        r.tag: (r.n, r.s)
        for r in out.groupBy("tag")
        .agg(F.count("rv").alias("n"), F.sum("rv").alias("s"))
        .collect()
    }
    assert agg["w1"] == (2, 3.0)   # 400 (=at-600, inclusive) + 999; 1000 excluded
    assert agg["w2"] == (0, None)  # empty window survives the left join
    assert agg["w3"] == (1, 8.0)   # no cross-key contamination
    # bucketization is an access path: same result as the theta join
    theta = (
        left.join(
            right,
            (left.key == right.key)
            & (right.rts >= left.at - 600)
            & (right.rts < left.at),
            "left",
        )
        .groupBy("tag")
        .agg(F.count("rv").alias("n"))
    )
    assert {r.tag: r.n for r in theta.collect()} == {t: n for t, (n, _) in agg.items()}


def test_nearest_asof_picks_closer_side(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["asof_nearest_error"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r["direction"] == "none":
            assert r["nearest_error_ms"] is None and r["gap_ms"] is None
        else:
            assert r["gap_ms"] >= 0
            assert abs(r["ts_ms"] - r["nearest_error_ms"]) == r["gap_ms"]
            if r["direction"] == "prior":
                assert r["nearest_error_ms"] <= r["ts_ms"]
            else:
                assert r["nearest_error_ms"] > r["ts_ms"]


def test_asof_nearest_matches_directional_pair(spark):
    """asof_join_nearest == backward + forward on the same inputs,
    including inclusive ties and no-match nulls, with ONE exchange."""
    from eventsourcing_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [
            ("u1", _ts(0), "before-any"),
            ("u1", _ts(5), "equal-ts"),
            ("u1", _ts(9), "between"),
            ("u1", _ts(20), "after-last"),
            ("u2", _ts(30), "other-key"),
            ("u3", _ts(1), "no-right-rows"),
        ],
        "key string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 0),
            ("u1", _ts(10), 0),
            ("u2", _ts(31), 0),
        ],
        "key string, ts timestamp, pad int",
    ).select("key", "ts")

    out = asof_join_nearest(
        left, right, key_cols=["key"], left_ts="ts", right_ts="ts",
        ts_back="pts", ts_fwd="nts",
    )
    got = {r.tag: (r.pts, r.nts) for r in out.collect()}

    b = asof_join_backward(
        left, right, key_cols=["key"], left_ts="ts", right_ts="ts",
        value_cols=[], ts_out="pts",
    )
    f = asof_join_forward(
        left, right, key_cols=["key"], left_ts="ts", right_ts="ts",
        value_cols=[], ts_out="nts",
    )
    want_b = {r.tag: r.pts for r in b.collect()}
    want_f = {r.tag: r.nts for r in f.collect()}
    assert got == {t: (want_b[t], want_f[t]) for t in want_b}
    # spot-pin the semantics, not just parity
    assert got["equal-ts"] == (_ts(5), _ts(5))       # inclusive both ways
    assert got["before-any"] == (None, _ts(5))
    assert got["after-last"] == (_ts(10), None)
    assert got["no-right-rows"] == (None, None)
    assert out.count() == left.count()

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # both directional windows share one key shuffle
    assert plan.count("Exchange hashpartitioning") <= 2
