"""Time-series operators: M4 downsampling, exact sliding distinct,
tolerance as-of, and interval-overlap joins.

Extends the event-log window family (SURVEY.md §2.5; rolling/SCD2 in
analytics.py) with the remaining shapes a telemetry store needs:

* ``m4_downsample`` — the M4 aggregation (min/max/first/last per pixel
  bucket; Jugel et al., VLDB 2014): the standard error-free line-chart
  downsampler.  One grouped aggregate keyed (user, hour) — at 100 TB
  each bucket aggregates independently and coarser zoom levels re-roll
  the bucket table, never the raw events.
* ``sliding_distinct_exact`` — exact 24 h sliding distinct users on an
  hourly grid via interval→bucket explode (each event lands in the ≤24
  grid cells whose trailing window covers it).  The deliberate 24×
  fan-out is the cost of exactness — the approximate twin
  (``sketch_hll_sliding``) does the same grid with mergeable sketches;
  keeping both pins the exact/approx contrast the docs claim.
* ``asof_tolerance_prior_error`` — backward as-of with a max-staleness
  bound (ASOF ... TOLERANCE in kdb/QuestDB terms): matches further away
  than 1 h are nulled.  Same single-shuffle union+window as
  operators/asof.py (eventstore.go:249-300 is the untolerated special
  case); the bound is a post-filter on the matched timestamp, so the
  join cost is unchanged.
* ``interval_overlap_hours`` — interval × point overlap join through
  operators/rangejoin.bucketed_range_join: per-user daily activity
  spans joined to the global hourly activity table on hour ∈ [lo, hi].
  Day buckets keep it equi-join shaped (shuffle on the day key, never a
  theta cross-product); the exact range predicate is re-applied after.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import query

HOUR_MS = 3600 * 1000
TOL_MS = HOUR_MS  # as-of tolerance: 1 hour


@query(
    "m4_downsample",
    """
    SELECT user_id,
           epoch_ms(ts) // 3600000 AS hour_idx,
           min(value) AS min_v,
           max(value) AS max_v,
           min_by(value, event_id) AS first_v,
           max_by(value, event_id) AS last_v,
           count(*) AS n
    FROM events
    GROUP BY user_id, epoch_ms(ts) // 3600000
    """,
)
def m4_downsample(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr("unix_millis(ts) div 3600000")
    return ev.groupBy("user_id", hour.alias("hour_idx")).agg(
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.min_by("value", "event_id").alias("first_v"),
        F.max_by("value", "event_id").alias("last_v"),
        F.count("*").alias("n"),
    )


@query(
    "sliding_distinct_exact",
    """
    WITH hits AS (
        SELECT unnest(generate_series(epoch_ms(ts) // 3600000,
                                      epoch_ms(ts) // 3600000 + 23)) AS hour_idx,
               user_id
        FROM events
    )
    SELECT hour_idx, count(DISTINCT user_id) AS n_users_24h
    FROM hits
    GROUP BY hour_idx
    """,
)
def sliding_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr("unix_millis(ts) div 3600000")
    hits = ev.select(
        F.explode(F.sequence(hour, hour + F.lit(23))).alias("hour_idx"),
        "user_id",
    )
    return hits.groupBy("hour_idx").agg(
        F.count_distinct("user_id").alias("n_users_24h")
    )


@query(
    "asof_tolerance_prior_error",
    f"""
    WITH err AS (
        SELECT user_id, ts, max_by(value, event_id) AS prior_error_value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
               err.prior_error_value,
               epoch_ms(err.ts) AS prior_ms
        FROM p ASOF LEFT JOIN err
          ON p.user_id = err.user_id AND p.ts >= err.ts
    )
    SELECT event_id, user_id, ts_ms,
           CASE WHEN ts_ms - prior_ms <= {TOL_MS}
                THEN CAST(prior_error_value AS DOUBLE) END AS prior_error_value,
           CASE WHEN ts_ms - prior_ms <= {TOL_MS}
                THEN prior_ms END AS prior_error_ms
    FROM m
    """,
)
def asof_tolerance_prior_error(spark, sf_dir):
    from eventsourcing_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("prior_error_value"))
    )
    joined = asof_join_backward(
        purchases,
        errors,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["prior_error_value"],
        ts_out="prior_ts",
    )
    ts_ms = F.unix_millis("ts")
    prior_ms = F.unix_millis("prior_ts")
    in_tol = (ts_ms - prior_ms) <= TOL_MS
    return joined.select(
        "event_id",
        "user_id",
        ts_ms.alias("ts_ms"),
        F.when(in_tol, F.col("prior_error_value").cast("double")).alias(
            "prior_error_value"
        ),
        F.when(in_tol, prior_ms).alias("prior_error_ms"),
    )


@query(
    "interval_overlap_hours",
    """
    WITH spans AS (
        SELECT user_id,
               epoch_ms(ts) // 86400000 AS day_idx,
               min(epoch_ms(ts)) AS lo_ms,
               max(epoch_ms(ts)) AS hi_ms
        FROM events
        GROUP BY user_id, epoch_ms(ts) // 86400000
    ),
    hourly AS (
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
               count(*) AS n_events
        FROM events
        GROUP BY epoch_ms(ts) // 3600000
    )
    SELECT s.user_id, s.day_idx,
           count(*) AS n_overlap_hours,
           sum(h.n_events) AS n_coactive_events
    FROM spans s
    JOIN hourly h ON h.hour_ms >= s.lo_ms - 3599999 AND h.hour_ms < s.hi_ms + 1
    GROUP BY s.user_id, s.day_idx
    """,
)
def interval_overlap_hours(spark, sf_dir):
    from eventsourcing_spark.operators.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    spans = ev.groupBy(
        "user_id", F.expr("unix_millis(ts) div 86400000").alias("day_idx")
    ).agg(F.min(ms).alias("lo_ms"), F.max(ms).alias("hi_ms"))
    hourly = ev.groupBy(
        (F.expr("unix_millis(ts) div 3600000") * HOUR_MS).alias("hour_ms")
    ).agg(F.count("*").alias("n_events"))
    # True interval-overlap: hour [h, h+1h) overlaps span [lo, hi] iff
    # h ∈ [lo - (1h - 1), hi] — shifting the left bound turns overlap
    # into the operator's point-in-range shape.
    joined = bucketed_range_join(
        spans,
        hourly,
        key_cols=[],
        left_lo_ms=F.col("lo_ms") - (HOUR_MS - 1),
        left_hi_ms=F.col("hi_ms") + 1,
        right_ts_ms=F.col("hour_ms"),
        bucket_ms=86400000,
        how="inner",
    )
    return joined.groupBy("user_id", "day_idx").agg(
        F.count("*").alias("n_overlap_hours"),
        F.sum("n_events").alias("n_coactive_events"),
    )
