"""Semantic invariants for the product-analytics batch (cohorts,
transitions, Benford, LOCF, A/B) — the oracle gate pins exact values;
these pin the relationships the hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

import eventsourcing_spark.analytics  # noqa: F401
from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_cohort_retention_monotone_bounds(spark):
    rows = SPARK_QUERIES["cohort_retention"](spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    for cohort, offs in by_cohort.items():
        assert 0 in offs  # week 0 = the cohort itself
        for off, n in offs.items():
            assert n <= offs[0]  # retention never exceeds cohort size


def test_transition_matrix_accounting(spark):
    rows = SPARK_QUERIES["event_transition_matrix"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user's sequence of k events yields k-1 transitions
    assert sum(r.n for r in rows) == n_events - n_users
    for src in {r.src for r in rows}:
        total = next(r.src_total for r in rows if r.src == src)
        assert sum(r.n for r in rows if r.src == src) == total


def test_benford_accounting(spark):
    rows = SPARK_QUERIES["benford_value_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.first_digit <= 9
        assert 0 <= r.observed_ppm <= 1_000_000
        assert r.deviation_ppm == abs(r.observed_ppm - r.benford_ppm)


def test_locf_grid_is_dense_and_carried(spark):
    out = SPARK_QUERIES["locf_hourly_series"](spark, SF)
    ev = load_table(spark, SF, "events")
    HOUR = 3600 * 1000
    spans = (
        ev.select("user_id", F.unix_millis("ts").alias("ms"))
        .groupBy("user_id")
        .agg(
            (F.expr(f"max(ms) div {HOUR}") - F.expr(f"min(ms) div {HOUR}") + 1)
            .alias("hours")
        )
        .collect()
    )
    assert out.count() == sum(r.hours for r in spans)  # dense grid per user
    # only a user's FIRST grid point may be null (hour-floor lands before
    # the first observation); every later point carries a value
    firsts = out.groupBy("user_id").agg(F.min("hour_ms").alias("first_h"))
    nulls = out.filter(F.col("locf_cents").isNull()).join(
        firsts, "user_id"
    )
    assert nulls.filter(F.col("hour_ms") != F.col("first_h")).count() == 0


def test_ab_assignment_is_exhaustive(spark):
    rows = {r.variant: r for r in SPARK_QUERIES["ab_test_conversion"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    assert set(rows) <= {"A", "B"}
    assert sum(r.n_users for r in rows.values()) == n_users
    for r in rows.values():
        assert 0 <= r.n_converted <= r.n_users
        assert r.conv_ppm == (1_000_000 * r.n_converted) // r.n_users


def test_bitmap_distinct_is_exact(spark):
    import eventsourcing_spark.sketches  # noqa: F401

    rows = SPARK_QUERIES["bitmap_distinct_users"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    for r in rows:
        true_n = (
            ev.filter(F.col("event_type") == r.event_type)
            .select("user_id")
            .distinct()
            .count()
        )
        assert r.n_distinct == true_n  # zero error, unlike HLL


def test_attribution_matrix_totals(spark):
    from pyspark.sql import functions as F

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["attribution_first_last"](spark, sf).collect()
    assert rows
    total = sum(r["n_purchases"] for r in rows)
    n_purchases = (
        load_table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    # every purchase is credited exactly once in the matrix
    assert total == n_purchases
    # a purchase that opens the day credits itself as first touch and
    # 'none' as last touch — both labels legal, nothing else leaks in
    types = {"view", "click", "purchase", "signup", "error", "none"}
    for r in rows:
        assert r["first_touch"] in types and r["last_touch"] in types


def test_rfm_scores_balanced_and_labeled(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["rfm_segmentation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            assert 1 <= r[col] <= 4
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance
    labels = {r["segment"] for r in rows}
    assert labels <= {"champion", "loyal", "at_risk", "hibernating", "regular"}
    assert n == len({r["user_id"] for r in rows})


def test_linear_attribution_conserves_credit(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["multi_touch_linear_attribution"](
        spark, sf
    ).collect()
    assert rows
    # credit conservation: every purchase with >=1 prior same-day touch
    # distributes exactly 1,000,000 points
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy(
        "user_id", F.expr("unix_millis(ts) div 86400000")
    ).orderBy(F.unix_millis("ts"), "event_id")
    n_credited = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("event_type") == "purchase") & (F.col("rn") > 1))
        .count()
    )
    assert sum(r["credit_points"] for r in rows) == 1_000_000 * n_credited


def test_shipping_sla_accounting(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["shipping_sla_by_priority"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_met"] <= r["n_orders"]
        assert r["met_ppm"] == r["n_met"] * 1_000_000 // r["n_orders"]


def test_growth_curve_monotone_and_total(spark):
    from pyspark.sql import functions as F

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        SPARK_QUERIES["user_growth_curve"](spark, sf).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    cum = 0
    for r in rows:
        cum += r["n_new_users"]
        assert r["n_cum_users"] == cum
    n_users = (
        load_table(spark, sf, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["n_cum_users"] == n_users


def test_transition_gaps_positive(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["transition_gap_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 1
        assert 0 <= r["median_gap_ms"] <= r["p90_gap_ms"]


def test_cohort_value_curve_cumulative(spark):
    from collections import defaultdict

    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["cohort_value_curve"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort[r["cohort_week"]].append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["week_offset"])
        run = 0
        for r in rs:
            run += r["revenue_cents"]
            assert r["cum_revenue_cents"] == run


def test_growth_accounting_flows_balance(spark):
    from collections import defaultdict

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = {r["week"]: r for r in SPARK_QUERIES["growth_accounting_weekly"](
        spark, sf
    ).collect()}
    # weekly active = new + retained + resurrected
    uw = (
        load_table(spark, sf, "events")
        .select("user_id", F.expr("unix_millis(ts) div 604800000").alias("w"))
        .distinct()
        .groupBy("w")
        .count()
        .collect()
    )
    active = {r["w"]: r["count"] for r in uw}
    for week, r in rows.items():
        assert (
            r["n_new"] + r["n_retained"] + r["n_resurrected"] == active[week]
        )
        # churned from w-1 = active(w-1) - retained(w)
        if week - 1 in active:
            assert r["n_churned"] == active[week - 1] - r["n_retained"]
