"""Approximate-aggregation breadth: declared-builtin sketches, ε-tested.

The reference has no sketches (SURVEY §2.4 "absent — engine gets them
free from Spark SQL"). These cannot go through the DuckDB value-hash
gate — approx algorithms are engine-specific — so they are pinned here
against exact answers with error bounds instead:

* ``approx_count_distinct`` (HyperLogLog++) — the streaming/distributed
  distinct-count path (one pass, fixed memory, no shuffle of values);
* ``hll_sketch_agg``/``hll_union_agg`` (Apache DataSketches HLL) —
  *mergeable* sketches: partial sketches per partition/day union into a
  global count without re-scanning, the pattern a 100 TB rollup needs;
* ``percentile_approx`` (KLL-style) — bounded-memory quantiles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact, approx = (
        ev.agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .first()
    )
    assert abs(approx - exact) <= max(3, 0.05 * exact), (exact, approx)


def test_hll_sketches_merge_across_partitions(spark, sf_dir):
    """Partial HLL sketches built per event_type union into the global
    distinct-user count — merge-without-rescan, the scale rollup path."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()[0]
    assert abs(merged - exact) <= max(3, 0.05 * exact), (exact, merged)


def test_percentile_approx_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    exact_med, approx_med = (
        ev.agg(
            F.expr("percentile(value, 0.5)").alias("exact"),
            F.percentile_approx("value", 0.5, 10000).alias("approx"),
        ).first()
    )
    # rank error: the approx median's true rank is within 1% of n/2
    rank = ev.filter(F.col("value") <= approx_med).count()
    assert abs(rank - n / 2) <= max(2, 0.01 * n), (exact_med, approx_med, rank, n)


def test_analogy_matches_numpy(spark):
    import numpy as np

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.similarity import (
        ANALOGY_A,
        ANALOGY_B,
        ANALOGY_C,
        ANALOGY_K,
    )
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    got = [
        (r["vec_id"], r["dot"])
        for r in sorted(
            SPARK_QUERIES["emb_analogy_topk"](spark, sf).collect(),
            key=lambda r: r["rank"],
        )
    ]
    emb = {
        r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1000)
        .astype(np.int64)
        for r in load_table(spark, sf, "embeddings").collect()
    }
    target = emb[ANALOGY_A] - emb[ANALOGY_B] + emb[ANALOGY_C]
    scores = sorted(
        (
            (-int(v @ target), k)
            for k, v in emb.items()
            if k not in (ANALOGY_A, ANALOGY_B, ANALOGY_C)
        )
    )[:ANALOGY_K]
    assert got == [(k, -s) for s, k in scores]


def test_recommendation_excludes_nothing_but_scores_all_users(spark):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["user_type_recommendation"](spark, sf).collect()
    n_users = (
        load_table(spark, sf, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    assert all(r["score"] > 0 for r in rows)


def test_ivf_sweep_recall_monotone_in_nprobe(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = {
        r["nprobe"]: r
        for r in SPARK_QUERIES["ivf_nprobe_recall_sweep"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {1, 2, 4}
    # probing more cells can only widen the candidate set
    assert (
        rows[1]["n_candidates"]
        <= rows[2]["n_candidates"]
        <= rows[4]["n_candidates"]
    )
    assert rows[1]["n_hit"] <= rows[2]["n_hit"] <= rows[4]["n_hit"]
    assert all(0 <= r["recall_ppm"] <= 1_000_000 for r in rows.values())


def test_distance_histogram_covers_all_sampled_pairs(spark):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["emb_distance_histogram"](spark, sf).collect()
    assert rows
    n_vec = load_table(spark, sf, "embeddings").count()
    assert sum(r["n_pairs"] for r in rows) == n_vec  # one partner each
    for r in rows:
        assert r["min_dot"] <= r["max_dot"]
        # bucket bounds bracket the min/max within the bucket
        assert r["bucket"] * 50_000 <= r["max_dot"] < (r["bucket"] + 1) * 50_000
