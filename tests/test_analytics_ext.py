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
