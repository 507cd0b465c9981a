"""Semantic invariants for the time-series / retrieval / graph additions
(the DuckDB oracle pins exact values; these pin cross-query properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.graph import graph_kcore, KCORE_K
from eventsourcing_spark.pipeline.queries import dedup_jaccard_verify
from eventsourcing_spark.pipeline.queries import dedup_containment_verify
from eventsourcing_spark.pipeline.retrieval import (
    QUERY_TERMS,
    bm25_topk,
    term_match_retrieval,
)
from eventsourcing_spark.pipeline.similarity import GRAM_DIMS, emb_gram_matrix
from eventsourcing_spark.timeseries import (
    TOL_MS,
    asof_tolerance_prior_error,
    interval_overlap_hours,
    m4_downsample,
    sliding_distinct_exact,
)
from eventsourcing_spark.queries import asof_prior_error


def test_m4_bounds_and_total(spark, sf_dir):
    m4 = m4_downsample(spark, sf_dir)
    bad = m4.filter(
        (F.col("min_v") > F.col("max_v"))
        | (F.col("first_v") < F.col("min_v"))
        | (F.col("first_v") > F.col("max_v"))
        | (F.col("last_v") < F.col("min_v"))
        | (F.col("last_v") > F.col("max_v"))
    )
    assert bad.count() == 0
    total = load_table(spark, sf_dir, "events").count()
    assert m4.agg(F.sum("n")).first()[0] == total


def test_sliding_distinct_dominates_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("unix_millis(ts) div 3600000").alias("hour_idx")
    ).agg(F.count_distinct("user_id").alias("n_hour"))
    s = sliding_distinct_exact(spark, sf_dir)
    j = s.join(hourly, "hour_idx")
    # a 24 h trailing window can never see fewer users than its last hour
    assert j.filter(F.col("n_users_24h") < F.col("n_hour")).count() == 0


def test_asof_tolerance_is_filtered_asof(spark, sf_dir):
    tol = asof_tolerance_prior_error(spark, sf_dir)
    # matches always within tolerance, nulls are consistent
    assert (
        tol.filter(F.col("ts_ms") - F.col("prior_error_ms") > TOL_MS).count() == 0
    )
    assert (
        tol.filter(
            F.col("prior_error_ms").isNull() != F.col("prior_error_value").isNull()
        ).count()
        == 0
    )
    # exactly the untolerated as-of rows whose gap fits, nulled otherwise
    base = asof_prior_error(spark, sf_dir).select(
        "event_id",
        F.col("prior_error_ms").alias("base_ms"),
        (F.col("ts_ms") - F.col("prior_error_ms") <= TOL_MS).alias("fits"),
    )
    j = tol.join(base, "event_id")
    assert j.filter(F.col("fits") & (F.col("prior_error_ms") != F.col("base_ms"))).count() == 0
    assert j.filter(
        (~F.coalesce(F.col("fits"), F.lit(False))) & F.col("prior_error_ms").isNotNull()
    ).count() == 0


def test_interval_overlap_covers_own_hours(spark, sf_dir):
    ov = interval_overlap_hours(spark, sf_dir)
    # every user-day span overlaps at least its own first event's hour,
    # and co-active events ≥ the user's own events in span hours ≥ 1
    assert ov.filter(F.col("n_overlap_hours") < 1).count() == 0
    assert ov.filter(F.col("n_coactive_events") < F.col("n_overlap_hours")).count() == 0
    spans = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.expr("unix_millis(ts) div 86400000").alias("day_idx"))
        .count()
    )
    assert ov.count() == spans.count()


def test_bm25_hits_subset_of_term_match_universe(spark, sf_dir):
    bm = bm25_topk(spark, sf_dir)
    rows = bm.collect()
    assert 0 < len(rows) <= 20
    assert all(1 <= r["n_terms_hit"] <= len(QUERY_TERMS) for r in rows)
    assert all(r["bm25_score"] > 0 for r in rows)
    tm = term_match_retrieval(spark, sf_dir)
    assert tm.count() > 0  # same probe terms resolve in both scorers


def test_gram_matrix_shape_and_diagonal(spark, sf_dir):
    g = emb_gram_matrix(spark, sf_dir).collect()
    assert len(g) == GRAM_DIMS * (GRAM_DIMS + 1) // 2
    assert all(r["dot"] >= 0 for r in g if r["i"] == r["j"])


def test_containment_dominates_jaccard(spark, sf_dir):
    c = dedup_containment_verify(spark, sf_dir).select(
        "doc_a", "doc_b", "containment"
    )
    j = dedup_jaccard_verify(spark, sf_dir)
    both = c.join(j, ["doc_a", "doc_b"])
    assert both.filter(F.col("containment") < F.col("jaccard")).count() == 0
    assert c.filter((F.col("containment") > 1.0)).count() == 0


def test_kcore_degrees(spark, sf_dir):
    core = graph_kcore(spark, sf_dir)
    assert core.filter(F.col("core_degree") < 1).count() == 0
    # after peeling to fixpoint the 2-core has min degree >= k; three
    # rounds may not reach fixpoint, but the *final* degree count must
    # reflect the last induced edge set: total degree is even
    total = core.agg(F.sum("core_degree")).first()[0] or 0
    assert total % 2 == 0


def test_funnel_any_order_vs_user_types(spark, sf_dir):
    from eventsourcing_spark.timeseries import FUNNEL_TYPES, funnel_any_order_window

    f = funnel_any_order_window(spark, sf_dir)
    # a user lacking one of the three types anywhere can never complete
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_TYPES)
    )
    have_all = (
        ev.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("nt"))
        .filter(F.col("nt") == len(FUNNEL_TYPES))
        .select("user_id")
    )
    completed = f.filter(F.col("completed") == 1)
    assert completed.join(have_all, "user_id", "left_anti").count() == 0
    assert f.filter((F.col("completed") == 0) & (F.col("n_complete_windows") > 0)).count() == 0


def test_variance_matches_float_within_rounding(spark, sf_dir):
    from eventsourcing_spark.timeseries import value_variance_stats

    rows = value_variance_stats(spark, sf_dir).collect()
    for r in rows:
        n, s, ss = r["n"], r["sum_cents"], r["sum_sq_cents"]
        assert n >= 2
        float_var = (n * ss - s * s) / (n * (n - 1))
        assert abs(float_var - r["variance_cents2"]) < 1  # integer floor only
        assert r["variance_cents2"] >= 0
