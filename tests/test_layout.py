"""Bucketed layout: the join and the aggregation really are
exchange-free, and results are identical to the unbucketed plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.layout import (
    read_bucketed,
    verify_colocated_join,
    write_bucketed,
)
from eventsourcing_spark.plans import plan_stats


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    write_bucketed(
        ev.select("event_id", "user_id", "event_type", "value"),
        "ev_bucketed",
        ["user_id"],
        8,
        sort_cols=["user_id"],
    )
    write_bucketed(counts, "counts_bucketed", ["user_id"], 8, sort_cols=["user_id"])
    yield "ev_bucketed", "counts_bucketed"
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS counts_bucketed")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    ev_t, counts_t = bucketed_tables
    # force the join strategy decision away from broadcast so the test
    # proves co-location, not broadcastability
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ev_t).join(
            read_bucketed(spark, counts_t), "user_id"
        )
        stats = verify_colocated_join(joined)
        assert stats["colocated"], stats
        # same rows as the unbucketed join
        assert joined.count() == read_bucketed(spark, ev_t).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_is_exchange_free(spark, bucketed_tables):
    ev_t, _ = bucketed_tables
    agg = (
        read_bucketed(spark, ev_t)
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    stats = plan_stats(agg)
    assert stats["Exchange"] == 0, stats


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed_tables):
    ev_t, _ = bucketed_tables
    bucketed_agg = (
        read_bucketed(spark, ev_t)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    plain_agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    assert {(r.user_id, r.n) for r in bucketed_agg.collect()} == {
        (r.user_id, r.n) for r in plain_agg.collect()
    }
