"""Semantic invariants for the EWMA / Gini / bounded-funnel / heatmap /
YoY additions (the DuckDB oracle pins exact values; these pin properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.analytics import (
    ewma_user_value,
    funnel_time_bounded,
    user_event_gini,
    value_hour_heatmap,
)
from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import DEC
from eventsourcing_spark.tpch import monthly_revenue_yoy


def test_ewma_first_event_equals_value(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    first = (
        ev.groupBy("user_id")
        .agg(F.min_by("event_id", F.struct(F.unix_millis("ts"), "event_id")).alias("event_id"))
        .join(ev, ["user_id", "event_id"])
        .select(
            "event_id",
            ((F.col("value").cast(DEC)) * 100).cast("long").alias("cents"),
        )
    )
    ewma = ewma_user_value(spark, sf_dir)
    j = ewma.join(first, "event_id")
    assert j.filter(F.col("ewma_cents") != F.col("cents")).count() == 0


def test_gini_bounds_and_degenerate(spark, sf_dir):
    g = user_event_gini(spark, sf_dir)
    assert g.filter((F.col("gini_ppm") < 0) | (F.col("gini_ppm") >= 1_000_000)).count() == 0
    assert g.filter((F.col("n_types") == 1) & (F.col("gini_ppm") != 0)).count() == 0
    total = load_table(spark, sf_dir, "events").count()
    assert g.agg(F.sum("n_events")).first()[0] == total


def test_bounded_funnel_subset_of_clicks(spark, sf_dir):
    f = funnel_time_bounded(spark, sf_dir)
    assert f.filter(F.col("n_converted_clicks") > F.col("n_clicks")).count() == 0
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    j = f.join(clicks, "user_id", "left").fillna({"n": 0})
    assert j.filter(F.col("n_clicks") != F.col("n")).count() == 0


def test_heatmap_partitions_all_events(spark, sf_dir):
    h = value_hour_heatmap(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert h.agg(F.sum("n")).first()[0] == ev.count()
    assert h.filter((F.col("hh") < 0) | (F.col("hh") > 23)).count() == 0


def test_yoy_delta_identity_and_total(spark, sf_dir):
    y = monthly_revenue_yoy(spark, sf_dir)
    bad = y.filter(
        F.abs(
            F.col("yoy_delta")
            - (F.col("revenue") - F.coalesce(F.col("prev_year_revenue"), F.lit(0.0)))
        )
        > 1e-6
    )
    assert bad.count() == 0
    orders = load_table(spark, sf_dir, "orders")
    expect = orders.agg(F.sum(F.col("o_totalprice").cast(DEC))).first()[0]
    got = y.agg(F.sum(F.col("revenue").cast(DEC))).first()[0]
    assert float(got) == float(expect)


def test_stickiness_bounds(spark, sf_dir):
    from eventsourcing_spark.analytics import dau_mau_stickiness

    r = dau_mau_stickiness(spark, sf_dir)
    assert r.filter(F.col("dau") > F.col("mau")).count() == 0
    assert r.filter(
        (F.col("stickiness_ppm") < 0) | (F.col("stickiness_ppm") > 1_000_000)
    ).count() == 0


def test_contingency_marginals(spark, sf_dir):
    from eventsourcing_spark.analytics import lang_source_contingency

    c = lang_source_contingency(spark, sf_dir)
    # cell counts per lang must sum to the row_total carried on each cell
    rows = c.groupBy("lang").agg(
        F.sum("n").alias("s"), F.first("row_total").alias("rt")
    )
    assert rows.filter(F.col("s") != F.col("rt")).count() == 0
    # n_total on every cell equals the corpus size, and cell counts sum to it
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert c.filter(F.col("n_total") != n_docs).count() == 0
    assert c.agg(F.sum("n")).first()[0] == n_docs


def test_dimension_stats_shape(spark, sf_dir):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.similarity import emb_dimension_stats

    d = emb_dimension_stats(spark, sf_dir)
    rows = d.collect()
    assert len(rows) == 64
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    for r in rows:
        assert r.n == n_vec
        assert r.min_q <= r.max_q
        assert r.var_numerator >= 0


def test_vocab_coverage_monotone(spark, sf_dir):
    from eventsourcing_spark.pipeline.chunking import vocab_coverage_curve

    rows = vocab_coverage_curve(spark, sf_dir).orderBy("vocab_k").collect()
    cov = [r.coverage_ppm for r in rows]
    assert cov == sorted(cov)
    assert all(0 <= c <= 1_000_000 for c in cov)
    assert all(r.covered <= r.total_tokens for r in rows)


def test_pareto_share_bounds(spark, sf_dir):
    from eventsourcing_spark.analytics import value_pareto_share

    r = value_pareto_share(spark, sf_dir).first()
    assert r.top_users == (r.n_users + 9) // 10
    assert 0 < r.top_cents <= r.total_cents
    # top decile must hold at least its proportional share
    assert r.share_ppm >= 100_000


def test_fanout_profile_accounts_all_lines(spark, sf_dir):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.tpch import join_fanout_profile

    p = join_fanout_profile(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    total = p.agg(F.sum(F.col("n_lines") * F.col("n_orders"))).first()[0]
    assert total == li.count()


def test_quartiles_cover_segments(spark, sf_dir):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.tpch import customer_balance_quartiles

    q = customer_balance_quartiles(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    assert q.agg(F.sum("n")).first()[0] == cust.count()
    # quartile boundaries are ordered within each segment
    rows = q.orderBy("c_mktsegment", "quartile").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg_rows in by_seg.values():
        for a, b in zip(seg_rows, seg_rows[1:]):
            assert a.min_bal <= b.min_bal


def test_priority_mix_shares_sum(spark, sf_dir):
    from eventsourcing_spark.tpch import priority_mix_by_year

    m = priority_mix_by_year(spark, sf_dir)
    per_year = m.groupBy("yr").agg(
        F.sum("n").alias("s"), F.first("yr_total").alias("t")
    )
    assert per_year.filter(F.col("s") != F.col("t")).count() == 0


def test_weekend_lift_accounts_all(spark, sf_dir):
    from eventsourcing_spark.analytics import weekend_lift_by_type

    w = weekend_lift_by_type(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert w.agg(F.sum(F.col("n_weekday") + F.col("n_weekend"))).first()[0] == ev.count()
    assert w.filter(F.col("lift_ppm") <= 0).count() == 0


def test_time_to_conversion_counts(spark, sf_dir):
    from eventsourcing_spark.analytics import time_to_conversion_stats

    t = time_to_conversion_stats(spark, sf_dir)
    assert t.filter(F.col("n_converted") > F.col("n_users")).count() == 0
    ev = load_table(spark, sf_dir, "events")
    n_signup_users = (
        ev.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    assert t.agg(F.sum("n_users")).first()[0] == n_signup_users


def test_dup_rate_consistency(spark, sf_dir):
    from eventsourcing_spark.pipeline.queries import dedup_exact, dup_rate_by_source

    d = dup_rate_by_source(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert d.agg(F.sum("n_docs")).first()[0] == docs.count()
    # total dropped across sources == corpus minus distinct contents
    n_distinct = dedup_exact(spark, sf_dir).count()
    assert d.agg(F.sum("n_dropped")).first()[0] == docs.count() - n_distinct
    assert d.filter(F.col("n_dropped") > F.col("n_in_dup_families")).count() == 0


def test_label_centroid_distances_symmetric_complete(spark, sf_dir):
    from eventsourcing_spark.io import load_table as lt
    from eventsourcing_spark.pipeline.similarity import label_centroid_distances

    d = label_centroid_distances(spark, sf_dir)
    n_labels = lt(spark, sf_dir, "embeddings").select("label").distinct().count()
    assert d.count() == n_labels * (n_labels - 1) // 2
    assert d.filter(F.col("dist2_q") < 0).count() == 0
    assert d.filter(F.col("label_a") >= F.col("label_b")).count() == 0


def test_incremental_merge_equals_recompute(spark):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["incremental_agg_merge"](spark, sf).collect()
    assert rows and all(r["ok"] == 1 for r in rows)
    n_events = load_table(spark, sf, "events").count()
    assert sum(r["n_total"] for r in rows) == n_events
    # the split is real: both sides non-empty
    assert sum(r["n_base"] for r in rows) > 0
    assert sum(r["n_delta"] for r in rows) > 0


def test_zonemap_advisor_accounting(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    row = SPARK_QUERIES["zonemap_prune_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row["n_pruned"] <= row["n_buckets"]
    assert row["rows_matching"] <= row["rows_scanned"] <= row["rows_total"]
    # zone maps are safe: every matching row lives in a scanned bucket,
    # and on the id-ordered event log a 1-day window prunes most buckets
    assert row["n_pruned"] > 0
    assert row["scan_saving_ppm"] == (
        (row["rows_total"] - row["rows_scanned"]) * 1_000_000
        // row["rows_total"]
    )


def test_item_item_cosine_bounds(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["item_item_cosine"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["cos_ppm"] <= 1_000_000
        assert r["dot"] > 0 and r["n_users"] > 0


def test_late_arrival_audit_bounds(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["late_arrival_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_inversions"] < r["n_events"]
        if r["n_inversions"] == 0:
            assert r["max_backwards_ms"] == 0
        else:
            assert r["max_backwards_ms"] > 0


def test_fk_integrity_clean_on_synthetic_data(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["fk_integrity_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4
    by_rel = {r["relation"]: r for r in rows}
    # TPC-H-shaped generators produce no orphans
    assert all(r["n_orphans"] == 0 for r in rows)
    # but childless parents are legitimate (customers without orders)
    assert by_rel["customer.c_nationkey->nation"]["n_childless"] >= 0


def test_daily_spine_is_dense_and_cumulative(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = sorted(
        SPARK_QUERIES["daily_revenue_spine"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    # dense: consecutive days, no holes
    days = [r["day"] for r in rows]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    # cumulative matches running sum; gaps carry zero revenue
    run = 0
    for r in rows:
        run += r["revenue_cents"]
        assert r["cum_revenue_cents"] == run
        if r["is_gap"] == 1:
            assert r["n_orders"] == 0 and r["revenue_cents"] == 0


def test_winsorized_mean_is_pulled_inward(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["winsorized_value_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        # clamping affects ~10% of rows (5% each tail) and never more
        assert 0 <= r["n_clamped"] <= r["n"] * 0.15 + 2
        # winsorized mean lives inside the raw value envelope
        assert r["winsor_mean_x100"] >= 0


def test_reconciliation_buckets_cover_all_orders(spark):
    from pyspark.sql import functions as F

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["order_total_reconciliation"](spark, sf).collect()
    assert rows
    n_with_lines = (
        load_table(spark, sf, "orders")
        .join(
            load_table(spark, sf, "lineitem").select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == n_with_lines


def test_fano_factor_identity(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["user_burstiness_fano"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_events"] >= 1 and r["n_hours"] >= 1
        assert r["var_denom"] == r["n_hours"] * r["n_events"]
        assert r["fano_x1000"] == r["var_numer"] * 1000 // r["var_denom"]


def test_snapshot_planner_accounting(spark):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["snapshot_policy_planner"](spark, sf).collect()
    assert rows
    assert sum(r["total_events"] for r in rows) == load_table(
        spark, sf, "events"
    ).count()
    for r in rows:
        # a snapshot every 5 events: snapshots <= events/5 per bucket
        assert r["total_snapshots"] * 5 <= r["total_events"]
        assert 0 <= r["avg_residual_replay_x100"] < 500


def test_zscore_flags_window_bounds(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["daily_value_zscore_flags"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_window"] <= 14
        assert r["is_anomaly"] in (0, 1)


def test_seasonal_index_averages_to_unity(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["seasonal_revenue_index"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    # Σ index_m · share weights: mean of the index over months ≈ 1e6
    # (floor-division slack bounded by number of months)
    mean_idx = sum(r["seasonal_ppm"] for r in rows) // len(rows)
    assert abs(mean_idx - 1_000_000) <= len(rows)
    assert {r["month_of_year"] for r in rows} <= set(range(1, 13))


def test_kruskal_wallis_degenerate_all_equal_reports_zero(spark, tmp_path):
    """Round-9 ADVICE: when every pooled value is identical the tie
    correction hits N³−N−Σ(t³−t) = 0; the greatest(den,1) guard must
    report the well-defined H = 0 in BOTH engines instead of raising
    DIVIDE_BY_ZERO under Spark-4 ANSI."""
    import duckdb

    import __spark_entry__ as entry
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = str(tmp_path)
    con = duckdb.connect()
    con.execute("PRAGMA threads=2")
    con.execute(
        "COPY (SELECT * REPLACE (CAST(7.77 AS DOUBLE) AS value)"
        " FROM '/root/testdata/sf0.001/events.parquet')"
        f" TO '{sf}/events.parquet' (FORMAT PARQUET)"
    )
    row = SPARK_QUERIES["kruskal_wallis_values"](spark, sf).collect()[0]
    assert row.h_milli == 0
    assert row.tie_sum == row.n_rows**3 - row.n_rows
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    o = con.execute(entry.oracle_sql()["kruskal_wallis_values"]).fetchone()
    assert o == (row.k_groups, row.n_rows, row.tie_sum, row.h_milli)
    con.close()
