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

from eventsourcing_spark.io import load_table, materialize
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
           CAST(sum(h.n_events) AS BIGINT) AS n_coactive_events
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


FUNNEL_TYPES = ("view", "click", "purchase")
FUNNEL_WIN_MS = HOUR_MS


@query(
    "funnel_any_order_window",
    f"""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    anchored AS (
        SELECT a.user_id, a.ms AS anchor_ms,
               count(DISTINCT b.event_type) AS n_types
        FROM ev a JOIN ev b
          ON b.user_id = a.user_id
         AND b.ms >= a.ms AND b.ms < a.ms + {FUNNEL_WIN_MS}
        GROUP BY a.user_id, a.ms
    )
    SELECT user_id,
           CAST(max(CASE WHEN n_types = {len(FUNNEL_TYPES)} THEN 1 ELSE 0 END)
                AS BIGINT) AS completed,
           CAST(count(*) FILTER (WHERE n_types = {len(FUNNEL_TYPES)})
                AS BIGINT) AS n_complete_windows
    FROM anchored GROUP BY user_id
    """,
)
def funnel_any_order_window(spark, sf_dir):
    """Any-order window funnel (ClickHouse ``windowFunnel``'s unordered
    cousin): a user converts if some 1 h window starting at one of
    their events contains all three of view/click/purchase, in any
    order.  The ordered variant (``funnel_conversion`` /
    ``funnel_time_bounded``) is a per-user window scan; any-order needs
    the within-window type SET, built here with
    operators/rangejoin.bucketed_range_join keyed by user — per-task
    work is bounded by (user, hour-bucket) population, never the
    user's full history, which is what keeps the self-join shape alive
    at 100 TB."""
    from eventsourcing_spark.operators.rangejoin import bucketed_range_join

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_TYPES))
        .select("user_id", F.unix_millis("ts").alias("ms"), "event_type")
    )
    anchors = ev.select("user_id", F.col("ms").alias("anchor_ms"))
    joined = bucketed_range_join(
        anchors,
        ev.withColumnRenamed("ms", "bms"),
        key_cols=["user_id"],
        left_lo_ms=F.col("anchor_ms"),
        left_hi_ms=F.col("anchor_ms") + FUNNEL_WIN_MS,
        right_ts_ms=F.col("bms"),
        bucket_ms=FUNNEL_WIN_MS,
        how="inner",
    )
    anchored = joined.groupBy("user_id", "anchor_ms").agg(
        F.count_distinct("event_type").alias("n_types")
    )
    full = F.col("n_types") == len(FUNNEL_TYPES)
    return anchored.groupBy("user_id").agg(
        F.max(F.when(full, 1).otherwise(0)).cast("long").alias("completed"),
        F.sum(F.when(full, 1).otherwise(0)).cast("long").alias("n_complete_windows"),
    )


@query(
    "value_variance_stats",
    """
    WITH c AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents * cents) AS BIGINT) AS sum_sq_cents,
           CAST((count(*) * sum(cents * cents) - sum(cents) * sum(cents))
                // (count(*) * (count(*) - 1)) AS BIGINT)
             AS variance_cents2
    FROM c GROUP BY event_type
    """,
)
def value_variance_stats(spark, sf_dir):
    """Parallel variance from exact sufficient statistics (the
    map-combinable form of Chan et al.'s pairwise update): n, Σx, Σx²
    in integer cents, variance = (n·Σx² − (Σx)²) // (n·(n−1)).  The
    float-accumulator version is partition-order-dependent; this one is
    bit-identical at any parallelism — the same exactness contract as
    trend_user_value's OLS statistics."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    agg = ev.select("event_type", cents.alias("cents")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.col("cents") * F.col("cents")).alias("sum_sq_cents"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("sum_sq_cents").cast("long").alias("sum_sq_cents"),
        F.expr(
            "(n * sum_sq_cents - sum_cents * sum_cents) div (n * (n - 1))"
        ).cast("long").alias("variance_cents2"),
    )


# ---------------------------------------------------------------------------
# Ingestion-order audit — the data-quality check an event-sourced
# ingest needs before replays are trusted: within each stream, does the
# id order (the reference's global ULID order, eventid/eventid.go)
# agree with event time? Adjacent inversions (ts decreasing while
# event_id increases) measure out-of-order arrival — the quantity
# watermarks and the C9 dedup-not-drop rule exist to absorb. One
# partitioned lag window keyed on the stream: a single shuffle at any
# scale, inversions counted where they happen.
# ---------------------------------------------------------------------------
@query(
    "ingestion_order_audit",
    """
    WITH s AS (
        SELECT user_id,
               epoch_ms(ts) AS ms,
               lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                       ORDER BY event_id) AS prev_ms
        FROM events
    ),
    u AS (
        SELECT user_id,
               count(*) - 1 AS n_pairs,
               count(*) FILTER (WHERE ms < prev_ms) AS n_inversions,
               coalesce(max(greatest(prev_ms - ms, 0)), 0) AS max_backstep_ms
        FROM s GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_streams,
           CAST(count(*) FILTER (WHERE n_inversions > 0) AS BIGINT)
             AS streams_with_inversions,
           CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
           CAST(sum(n_inversions) AS BIGINT) AS n_inversions,
           CAST(sum(n_inversions) * 1000000 // greatest(sum(n_pairs), 1)
                AS BIGINT) AS inversion_ppm,
           CAST(max(max_backstep_ms) AS BIGINT) AS max_backstep_ms
    FROM u
    """,
)
def ingestion_order_audit(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = ev.select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        F.lag(F.unix_millis("ts")).over(w).alias("prev_ms"),
    )
    u = s.groupBy("user_id").agg(
        (F.count("*") - 1).alias("n_pairs"),
        F.count(F.when(F.col("ms") < F.col("prev_ms"), 1)).alias("n_inversions"),
        # clamp at 0 so a fully in-order stream reports 0, not the
        # negated smallest forward gap (both engines clamp identically)
        F.coalesce(
            F.max(F.greatest(F.col("prev_ms") - F.col("ms"), F.lit(0))),
            F.lit(0),
        ).alias("max_backstep_ms"),
    )
    return u.agg(
        F.count("*").cast("long").alias("n_streams"),
        F.count(F.when(F.col("n_inversions") > 0, 1))
        .cast("long")
        .alias("streams_with_inversions"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_inversions").cast("long").alias("n_inversions"),
        F.expr(
            "cast(sum(n_inversions) * 1000000"
            " div greatest(sum(n_pairs), 1) as bigint)"
        ).alias("inversion_ppm"),
        F.max("max_backstep_ms").cast("long").alias("max_backstep_ms"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness — traffic-shape profiling per event type:
# coefficient of variation of the inter-arrival gaps within each
# stream, aggregated per type. CV² > 1 means bursty (heavier than
# Poisson), CV² < 1 means regular — the number that sizes streaming
# state and micro-batch triggers. Exact integer sufficient statistics
# (n, Σgap, Σgap²) as in value_variance_stats; CV²·1e6 compares
# n·Σgap² − (Σgap)² against (Σgap)² cross-multiplied, so no float
# reduction order can flip a classification. Headroom: (Σgap)²·10⁶ must
# stay under DECIMAL(38); Σgap (total observed gap time per type) fits
# while n_streams·window ≲ 10¹⁵ ms — beyond that, shard the audit by
# time window (per-day audits roll up losslessly) before widening types.
# ---------------------------------------------------------------------------
@query(
    "interarrival_burstiness",
    """
    WITH g AS (
        SELECT user_id, event_type,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY epoch_ms(ts),
                   event_id) AS gap_ms
        FROM events
    ),
    s AS (
        -- gap² can reach 10^20 (months in ms, squared): carry the
        -- squared sums in DECIMAL(38,0) on BOTH engines (also keeps
        -- DuckDB off HUGEINT)
        SELECT event_type,
               CAST(count(*) AS DECIMAL(38,0)) AS n,
               CAST(sum(CAST(gap_ms AS DECIMAL(38,0))) AS DECIMAL(38,0))
                 AS sum_gap,
               CAST(sum(CAST(gap_ms AS DECIMAL(38,0))
                        * CAST(gap_ms AS DECIMAL(38,0))) AS DECIMAL(38,0))
                 AS sum_gap_sq
        FROM g WHERE gap_ms IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           -- floor() on both engines: DuckDB rounds on DECIMAL / and
           -- CAST-to-BIGINT, Spark truncates
           CAST(floor(sum_gap / n) AS BIGINT) AS mean_gap_ms,
           CAST(floor((n * sum_gap_sq - sum_gap * sum_gap) * 1000000
                / (sum_gap * sum_gap)) AS BIGINT) AS cv2_ppm,
           CASE WHEN (n * sum_gap_sq - sum_gap * sum_gap) > sum_gap * sum_gap
                THEN 'bursty' ELSE 'regular' END AS shape
    FROM s
    WHERE n > 1
    """,
)
def interarrival_burstiness(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(ms, "event_id")
    g = ev.select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    d = F.col("gap_ms").cast("decimal(38,0)")
    s = g.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(d).cast("decimal(38,0)").alias("sum_gap"),
        F.sum(d * d).cast("decimal(38,0)").alias("sum_gap_sq"),
    ).filter(F.col("n") > 1)
    num = F.col("n") * F.col("sum_gap_sq") - F.col("sum_gap") * F.col("sum_gap")
    den = F.col("sum_gap") * F.col("sum_gap")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.floor(F.col("sum_gap") / F.col("n")).cast("long").alias("mean_gap_ms"),
        F.floor(num * 1000000 / den).cast("long").alias("cv2_ppm"),
        F.when(num > den, "bursty").otherwise("regular").alias("shape"),
    )


# ---------------------------------------------------------------------------
# Backfill gap detection — the completeness audit an ingestion pipeline
# runs before replay/backfill orchestration: which calendar days inside
# the corpus's [first, last] span are missing or THIN (below
# THIN_PCT% of the mean daily volume)? Gaps are emitted as
# consecutive-day RANGES via the
# gaps-and-islands trick (day − row_number is constant within a run).
# Scale shape: the day spine explodes from a broadcast 1-row min/max
# frame (|days| = calendar horizon, bounded); the per-day counts are
# one keyed aggregate of the corpus; the islands window runs over the
# missing-day frame only — every stage aggregate-bounded.
# ---------------------------------------------------------------------------
THIN_PCT = 95  # a day is thin below this % of the mean daily volume


@query(
    "backfill_gap_days",
    f"""
    WITH bounds AS (
        SELECT min(epoch_ms(ts) // 86400000) AS d0,
               max(epoch_ms(ts) // 86400000) AS d1,
               count(*) AS total
        FROM events
    ),
    spine AS (
        SELECT gs.day FROM generate_series(0, 100000) t(i),
             bounds, LATERAL (SELECT bounds.d0 + t.i AS day) gs
        WHERE gs.day <= bounds.d1
    ),
    daily AS (
        SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    -- floor: THIN_PCT% of the mean daily volume, cross-multiplied
    thin AS (
        SELECT spine.day, coalesce(daily.n, 0) AS n,
               spine.day - row_number() OVER (ORDER BY spine.day) AS grp
        FROM spine LEFT JOIN daily ON spine.day = daily.day, bounds
        WHERE coalesce(daily.n, 0) * (bounds.d1 - bounds.d0 + 1) * 100
              < bounds.total * THIN_PCT
    )
    SELECT CAST(min(day) AS BIGINT) AS gap_start_day,
           CAST(max(day) AS BIGINT) AS gap_end_day,
           CAST(count(*) AS BIGINT) AS gap_days,
           CAST(sum(n) AS BIGINT) AS events_in_gap
    FROM thin GROUP BY grp
    """.replace("THIN_PCT", str(THIN_PCT)),
)
def backfill_gap_days(spark, sf_dir):
    from pyspark.sql import Window

    # Round 12 (scan-collapse): bounds and daily each scanned the
    # corpus, and the spine + crossJoin replanned bounds twice — 3
    # scans. Every bound is a re-aggregation of the day-grain count
    # frame (d0/d1 = min/max day, total = sum n), so daily is
    # materialized once (calendar-bounded rows) and the spine row
    # CARRIES d0/d1/total through its explode — no second bounds
    # frame, no crossJoin, 1 corpus scan.
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_millis(ts) div 86400000")
    daily = (
        ev.groupBy(day.alias("day"))
        .agg(F.count("*").alias("n"))
        .transform(materialize)
    )
    spine = daily.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.sum("n").alias("total"),
    ).select(
        F.explode(F.sequence("d0", "d1")).alias("day"), "d0", "d1", "total"
    )
    thin = (
        spine.join(daily, "day", "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        # thin day: n < THIN_PCT% of mean, cross-multiplied integer-exact
        .filter(
            F.col("n") * (F.col("d1") - F.col("d0") + 1) * 100
            < F.col("total") * THIN_PCT
        )
        # |thin| ≤ calendar days — aggregate-bounded global window
        .withColumn("grp", F.col("day") - F.row_number().over(Window.orderBy("day")))
    )
    return thin.groupBy("grp").agg(
        F.min("day").cast("long").alias("gap_start_day"),
        F.max("day").cast("long").alias("gap_end_day"),
        F.count("*").cast("long").alias("gap_days"),
        F.sum("n").cast("long").alias("events_in_gap"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# Time-series similarity search — distributed kNN over per-entity
# series (the EDBT'19 "Time Series Similarity Search for Streaming
# Data in Distributed Systems" problem, batch form): which users'
# daily-spend series are closest to a probe user's? Exact squared
# Euclidean distance over the aligned day grid, decomposed so NO
# pairwise day-join or pivot is needed:
#     dist²(u) = Σc_u² − 2·Σ_d c_u(d)·c_p(d) + Σc_p²
# The first term is a per-user aggregate, the middle a join against the
# BROADCAST probe series (|days| rows), the last a broadcast scalar —
# so the whole search is one keyed aggregate + a map-side probe at any
# number of users, and top-k is a TakeOrdered. Integer cents throughout
# (day sums ≲ 10⁶ cents, squares 10¹², corpus-summed 10¹⁵ — int64-safe;
# at 10⁹-user scale widen to DECIMAL(38) like interarrival_burstiness).
# ---------------------------------------------------------------------------
SERIES_KNN_K = 10


@query(
    "series_knn_daily_spend",
    f"""
    WITH daily AS (
        SELECT user_id, epoch_ms(ts) // 86400000 AS day,
               sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT)) AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    probe_id AS (SELECT min(user_id) AS pid FROM daily),
    probe AS (
        SELECT day, cents FROM daily, probe_id WHERE user_id = pid
    ),
    self_sq AS (
        SELECT user_id, sum(cents * cents) AS a FROM daily GROUP BY user_id
    ),
    cross_term AS (
        SELECT d.user_id, sum(d.cents * p.cents) AS b
        FROM daily d JOIN probe p ON d.day = p.day
        GROUP BY d.user_id
    ),
    p_sq AS (SELECT sum(cents * cents) AS c FROM probe)
    SELECT s.user_id,
           CAST(s.a - 2 * coalesce(x.b, 0) + p_sq.c AS BIGINT) AS dist_sq
    FROM self_sq s
    LEFT JOIN cross_term x ON s.user_id = x.user_id
    CROSS JOIN p_sq, probe_id
    WHERE s.user_id <> probe_id.pid
    ORDER BY dist_sq, s.user_id
    LIMIT {SERIES_KNN_K}
    """,
)
def series_knn_daily_spend(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100).cast("long")
    # Round 12 (scan-collapse): `daily` feeds five consumers (probe_id,
    # probe, self_sq, cross_term, and p_sq via probe) — unmaterialized,
    # each replans the whole lineage, 7 parquet scans of events in one
    # plan. The frame is (user, day) grain — three ints per active
    # user-day, orders of magnitude below event grain — so materialize
    # the one keyed aggregate the algorithm needs and roll every
    # consumer off it.
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.expr("unix_millis(ts) div 86400000").alias("day")
        )
        .agg(F.sum(cents).alias("cents"))
        .transform(materialize)
    )
    probe_id = daily.agg(F.min("user_id").alias("pid"))
    probe = (
        daily.join(F.broadcast(probe_id), daily.user_id == F.col("pid"))
        .select("day", F.col("cents").alias("p_cents"))
    )
    self_sq = daily.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("cents")).alias("a")
    )
    cross_term = (
        daily.join(F.broadcast(probe), "day")
        .groupBy("user_id")
        .agg(F.sum(F.col("cents") * F.col("p_cents")).alias("b"))
    )
    p_sq = probe.agg(F.sum(F.col("p_cents") * F.col("p_cents")).alias("c"))
    return (
        self_sq.join(cross_term, "user_id", "left")
        .crossJoin(F.broadcast(p_sq))
        .crossJoin(F.broadcast(probe_id))
        .filter(F.col("user_id") != F.col("pid"))
        .select(
            "user_id",
            (
                F.col("a") - 2 * F.coalesce(F.col("b"), F.lit(0)) + F.col("c")
            ).cast("long").alias("dist_sq"),
        )
        .orderBy("dist_sq", "user_id")
        .limit(SERIES_KNN_K)
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (ACF) of daily revenue at calendar lags
# 1..7 — the first thing a forecasting pipeline computes (weekly
# seasonality shows as a lag-7 peak) and the residual-whiteness audit
# after any model fit. Standard biased estimator: acf(L) =
# Σ_t (x_t−x̄)(x_{t+L}−x̄) / Σ_t (x_t−x̄)², pairs matched by CALENDAR
# day arithmetic (a missing day contributes no pair — the estimator
# stays well-defined on sparse spines and both engines agree on the
# pair set by construction).
#
# Exactness: mean-centering is cross-multiplied through n (n·x_t − S
# instead of x_t − S/n) so every term is integer, with the final ppm
# ratio floor()ed on both engines (DuckDB rounds DECIMAL division where
# Spark truncates — the module-wide rule). n and S ride a broadcast
# 1-row stats frame, never a data-dependent literal.
#
# Overflow proof (the 100 TB bound): the raw deviation D_t = n·x_t − S
# is harmless (|D| ≤ n·max_daily_cents, and n is CALENDAR-bounded by
# the order-date spine, not data volume), but Σ D² is NOT — at ~10¹⁵
# cents/day it passes 10³⁸ and Spark (non-ANSI) silently NULLs where
# DuckDB raises. So the deviations are clamped through a stats-driven
# scale factor before squaring: K = 1 + max|D| div C with C = 10¹³,
# D' = floor(D/K) computed as (D + K·C) div K − C (the shift makes the
# operand non-negative, where Spark's `div` and DuckDB's HUGEINT `//`
# — both truncating — equal floor; K·C ≥ max|D| by construction of K).
# Then |D'| ≤ C, so Σ D'² ≤ n_days·10²⁶ and the ppm numerator
# Σ(D'·D')·10⁶ ≤ n_days·10³² < 10³⁸ for any day spine up to 10⁵ days
# (the TPC-H date domain is ~2.4k days) — provable at ANY corpus size.
# At test scale factors max|D| < C, so K = 1 and D' = D exactly: the
# clamp only engages past ~10 TB and there costs < 2·K/rms(D) relative
# error — sub-ppm. K rides the stats frame like n and S.
#
# Scale shape: ONE corpus-sized keyed aggregate (groupBy day); the lag
# join, centering, clamping, and ratio all run on the bounded day spine
# (grows with the calendar, not data volume).
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 7
ACF_DEV_CLAMP = 10**13  # C above: post-clamp |deviation| bound


@query(
    "acf_daily_revenue",
    f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS cents
        FROM orders GROUP BY 1
    ),
    st0 AS MATERIALIZED (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(cents) AS HUGEINT) AS s
        FROM daily
    ),
    dev AS MATERIALIZED (
        SELECT day, st0.n * CAST(cents AS HUGEINT) - st0.s AS d
        FROM daily, st0
    ),
    sc AS MATERIALIZED (
        SELECT CAST(1 AS HUGEINT) + max(abs(d)) // {ACF_DEV_CLAMP} AS k
        FROM dev
    ),
    sdev AS MATERIALIZED (
        SELECT day, (d + sc.k * {ACF_DEV_CLAMP}) // sc.k
                    - CAST({ACF_DEV_CLAMP} AS HUGEINT) AS dd
        FROM dev, sc
    ),
    st AS MATERIALIZED (
        SELECT CAST(sum(dd * dd) AS DECIMAL(38,0)) AS den FROM sdev
    ),
    lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
    pairs AS (
        SELECT l.lag, a.dd * b.dd AS term
        FROM sdev a
        CROSS JOIN lags l
        JOIN sdev b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    )
    SELECT lag AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(floor(CAST(sum(term) AS DECIMAL(38,0)) * 1000000
                      / any_value(st.den)) AS BIGINT)
             AS acf_ppm
    FROM pairs, st
    GROUP BY lag
    ORDER BY lag
    """,
)
def acf_daily_revenue(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
        .transform(materialize)  # read by stats, both join sides, and centering
    )
    st = daily.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "day", (F.col("n") * F.col("cents") - F.col("s")).alias("d")
    )
    # Stats-driven clamp K (see header proof): K = 1 at test SFs, and
    # floor(d/K) = (d + K·C) div K − C with the non-negative shift so
    # Spark's truncating `div` equals floor.
    sc = dev.agg(
        (F.lit(1).cast("long") + F.expr(f"max(abs(d)) div {ACF_DEV_CLAMP}"))
        .alias("k")
    )
    centered = dev.crossJoin(F.broadcast(sc)).select(
        "day",
        (
            F.expr(
                f"(d + cast(k as decimal(38,0)) * {ACF_DEV_CLAMP}) div k"
            )
            - F.lit(ACF_DEV_CLAMP)
        )
        .cast("decimal(38,0)")
        .alias("dev"),
    )
    den = centered.agg(
        F.sum(F.col("dev") * F.col("dev")).cast("decimal(38,0)").alias("den")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = centered.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add("day", F.col("lag")).alias("day"), F.col("dev").alias("dev_a")
    )
    pairs = a.join(
        centered.select("day", F.col("dev").alias("dev_b")), "day"
    ).select("lag", (F.col("dev_a") * F.col("dev_b")).alias("term"))
    return (
        pairs.groupBy("lag")
        .agg(F.count("*").cast("long").alias("n_pairs"), F.sum("term").alias("num"))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").alias("lag_days"),
            "n_pairs",
            F.floor(F.col("num") * 1000000 / F.col("den"))
            .cast("long")
            .alias("acf_ppm"),
        )
        .orderBy("lag_days")
    )


# ---------------------------------------------------------------------------
# Theil-Sen trend estimate of daily revenue — the robust slope a
# forecasting/monitoring pipeline prefers over OLS (29% outlier
# breakdown vs 0%): the MEDIAN of all pairwise slopes (x_j−x_i)/(d_j−d_i)
# over the trailing 120 calendar days. One corrupted day barely moves
# it; an OLS fit through the same data follows the outlier.
#
# Exactness: slopes are floor()ed into milli-cents/day (DECIMAL
# division + floor — the module rule for both engines), and the median
# is the LOWER median selected by rank (k = (n+1)//2) from the
# distinct-slope-value histogram: groupBy(slope) → counts → running
# cumsum ordered by slope → first value whose cumsum reaches k. No
# engine's percentile interpolation is involved, so the result
# hash-matches bit-for-bit.
#
# Scale shape: one corpus-sized keyed aggregate (groupBy day); the
# pair join is calendar-bounded (≤ 120·119/2 = 7140 pairs forever —
# grows with the window, not data volume), and the ordering window
# runs on the distinct-slope histogram of that bounded pair set.
# ---------------------------------------------------------------------------
THEIL_SEN_WINDOW_DAYS = 120


@query(
    "theil_sen_daily_trend",
    f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS cents
        FROM orders GROUP BY 1
    ),
    mx AS (SELECT max(day) AS max_day FROM daily),
    win AS MATERIALIZED (
        SELECT day, cents FROM daily, mx
        WHERE day > max_day - {THEIL_SEN_WINDOW_DAYS}
    ),
    slopes AS (
        SELECT CAST(floor((b.cents - a.cents) * 1000
                          / CAST(date_diff('day', a.day, b.day)
                                 AS DECIMAL(38,0))) AS BIGINT) AS slope_milli
        FROM win a JOIN win b ON a.day < b.day
    ),
    hist AS (
        SELECT slope_milli, count(*) AS c FROM slopes GROUP BY slope_milli
    ),
    cum AS (
        SELECT slope_milli,
               sum(c) OVER (ORDER BY slope_milli) AS cum_c,
               sum(c) OVER () AS n_pairs
        FROM hist
    )
    SELECT CAST((SELECT count(*) FROM win) AS BIGINT) AS n_days,
           CAST(any_value(n_pairs) AS BIGINT) AS n_pairs,
           CAST(min(slope_milli) AS BIGINT) AS slope_milli_per_day
    FROM cum
    WHERE cum_c >= (n_pairs + 1) // 2
    """,
)
def theil_sen_daily_trend(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("cents")
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    win = (
        daily.crossJoin(F.broadcast(mx))
        .filter(F.datediff(F.col("max_day"), F.col("day")) < THEIL_SEN_WINDOW_DAYS)
        .select("day", "cents")
        .transform(materialize)  # both sides of the pair join
    )
    a, b = win.alias("a"), win.alias("b")
    slopes = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .select(
            F.floor(
                (F.col("b.cents") - F.col("a.cents"))
                * 1000
                / F.datediff(F.col("b.day"), F.col("a.day")).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("slope_milli")
        )
    )
    hist = slopes.groupBy("slope_milli").agg(F.count("*").alias("c"))
    w = Window.orderBy("slope_milli")
    cum = hist.select(
        "slope_milli",
        F.sum("c").over(w).alias("cum_c"),
        F.sum("c").over(Window.partitionBy()).alias("n_pairs"),
    )
    n_days = win.agg(F.count("*").cast("long").alias("n_days"))
    return (
        cum.filter(F.col("cum_c") >= F.expr("(n_pairs + 1) div 2"))
        .agg(
            F.any_value("n_pairs").cast("long").alias("n_pairs"),
            F.min("slope_milli").cast("long").alias("slope_milli_per_day"),
        )
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "n_pairs", "slope_milli_per_day")
    )
