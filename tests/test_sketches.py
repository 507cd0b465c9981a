"""Sketch estimators (KMV / HLL / CMS) and the forward as-of join.

The correctness gate already hash-matches the sketch *values* against
DuckDB; these tests pin the estimator guarantees the hash can't express:
KMV's exact-below-k fallback, HLL's error envelope, CMS's one-sided
error, and forward as-of's tie/no-match semantics on a hand-built frame.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eventsourcing_spark.operators.asof import asof_join_forward
from eventsourcing_spark.sketches import (
    sketch_cms_heavy_hitters,
    sketch_hll_distinct,
    sketch_kmv_distinct,
)


def test_kmv_exact_fallback_and_estimate(spark, sf_dir):
    rows = {r.event_type: r for r in sketch_kmv_distinct(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        if r.n_exact < 32:  # sketch holds the whole distinct set
            assert r.kmv_estimate == r.n_exact
        else:  # standard KMV error ~ 1/sqrt(k) = 18%; allow 3x
            assert 0.4 * r.n_exact <= r.kmv_estimate <= 2.5 * r.n_exact


def test_hll_estimate_envelope(spark, sf_dir):
    for r in sketch_hll_distinct(spark, sf_dir).collect():
        assert r.hll_estimate > 0
        # with the literal-table linear-counting correction the standard
        # HLL error envelope applies at every cardinality (σ≈1.04/√64 =
        # 13%; allow ~4σ)
        assert 0.5 * r.n_exact <= r.hll_estimate <= 1.6 * r.n_exact


def test_cms_estimate_is_one_sided(spark, sf_dir):
    out = sketch_cms_heavy_hitters(spark, sf_dir).collect()
    assert 0 < len(out) <= 20  # top-20 probe set (fewer users at tiny sf)
    for r in out:
        assert r.cms_estimate >= r.true_n  # CMS never underestimates


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1),
            ("a", _ts("2024-01-01T12:00:00"), 2),
            ("a", _ts("2024-01-01T15:00:00"), 3),  # no future right row
            ("b", _ts("2024-01-01T09:00:00"), 4),  # key with no right rows
        ],
        "k string, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:00:00"), 100),  # before all left rows
            ("a", _ts("2024-01-01T12:00:00"), 200),  # tie: inclusive match
            ("a", _ts("2024-01-01T13:00:00"), 300),
        ],
        "k string, ts timestamp, rv int",
    )
    out = asof_join_forward(
        left, right, ["k"], "ts", "ts", ["rv"], ts_out="matched_ts"
    )
    got = {r.left_id: (r.rv, r.matched_ts) for r in out.collect()}
    assert got[1] == (200, _ts("2024-01-01T12:00:00"))  # earliest at-or-after
    assert got[2] == (200, _ts("2024-01-01T12:00:00"))  # inclusive tie
    assert got[3] == (None, None)  # nothing in the future
    assert got[4] == (None, None)  # key absent on right
    assert len(got) == 4  # every left row survives


def test_asof_forward_matches_sql_oracle(spark, sf_dir):
    """Forward as-of over real events == per-row correlated-min lookup."""
    from eventsourcing_spark.io import register_views
    from eventsourcing_spark.queries import SPARK_QUERIES

    register_views(spark, sf_dir)
    ours = SPARK_QUERIES["asof_next_error"](spark, sf_dir)
    ref = spark.sql(
        """
        WITH err AS (
            SELECT user_id, ts, max_by(value, event_id) AS v
            FROM events WHERE event_type = 'error' GROUP BY user_id, ts
        ),
        c AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        nxt AS (
            SELECT c.event_id, c.user_id, c.ts, min(err.ts) AS nts
            FROM c LEFT JOIN err
              ON c.user_id = err.user_id AND err.ts >= c.ts
            GROUP BY c.event_id, c.user_id, c.ts
        )
        SELECT n.event_id, n.user_id, unix_millis(n.ts) AS ts_ms,
               CAST(e2.v AS DOUBLE) AS next_error_value,
               unix_millis(n.nts) AS next_error_ms
        FROM nxt n LEFT JOIN err e2
          ON n.user_id = e2.user_id AND n.nts = e2.ts
        """
    )
    assert ours.count() == ref.count()
    sym_diff = ours.exceptAll(ref).union(ref.exceptAll(ours))
    assert sym_diff.count() == 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    from eventsourcing_spark.sketches import sketch_bloom_membership

    rows = sketch_bloom_membership(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_false_neg == 0          # Bloom's one-sided guarantee
        assert r.n_pass >= r.n_true        # pass = true + false positives
        assert r.n_pass == r.n_true + r.n_false_pos


def test_weighted_priority_sample_prefers_heavy_docs(spark, sf_dir):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.mixing import (
        SAMPLE_K,
        weighted_priority_sample,
    )

    docs = load_table(spark, sf_dir, "documents").filter("n_chars > 0")
    n_docs = docs.count()
    sample = weighted_priority_sample(spark, sf_dir).collect()
    k = min(SAMPLE_K, n_docs)
    assert len(sample) == k
    assert sorted(r.rank for r in sample) == list(range(1, k + 1))
    if n_docs > 2 * SAMPLE_K:
        # weighted inclusion: the sampled mean length must exceed the
        # corpus mean (weights = n_chars)
        corpus_mean = docs.agg({"n_chars": "avg"}).first()[0]
        sample_mean = sum(r.n_chars for r in sample) / len(sample)
        assert sample_mean > corpus_mean


def test_kmv_intersection_estimator(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES
    from eventsourcing_spark.sketches import KMV_K

    rows = SPARK_QUERIES["kmv_intersection_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    types = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        types.update((r["type_a"], r["type_b"]))
        assert 0 <= r["n_common"] <= r["k_used"] <= KMV_K
        if r["k_used"] < KMV_K:
            # sketch holds the whole union -> estimate is exact
            assert r["inter_est"] == r["n_exact"] == r["n_common"]
        else:
            assert r["inter_est"] >= 0
    n = len(types)
    assert len(rows) == n * (n - 1) // 2


def test_bloom_semijoin_prune_one_sided(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    row = SPARK_QUERIES["bloom_semijoin_prune"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # one-sided error: every true match passes the filter
    assert row["n_true"] <= row["n_pass"] <= row["n_rows"]
    assert row["n_false_pos"] == row["n_pass"] - row["n_true"]
    assert row["pass_ppm"] == row["n_pass"] * 1_000_000 // row["n_rows"]


def test_sliding_hll_tracks_exact_within_error(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["sketch_hll_sliding"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] >= 1
        # 64-register HLL with linear-counting correction: generous
        # envelope, mostly exercised in the small-range regime here
        assert abs(r["hll_estimate"] - r["n_exact"]) <= max(
            10, r["n_exact"] * 0.35
        )


def test_hll_intersection_inclusion_exclusion(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["hll_intersection_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        # the identity the query implements, with the clamp
        assert r["inter_est"] == max(
            r["est_a"] + r["est_b"] - r["est_union"], 0
        )
        # union can never be estimated smaller than either side
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - max(
            2, r["est_union"] * 0.1
        )
