"""Operator-coverage query registry: SURVEY.md §2 mapped to the driver tables.

Every entry pairs a Spark DataFrame implementation with a DuckDB oracle
SQL string over the same parquet views. The driver compares row count +
schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* monetary aggregates are summed as ``decimal(18,2)`` (exact — the
  synthetic data is 2-decimal) and cast to double at the end, so
  Spark's parallel partial aggregation and DuckDB's sequential sum
  cannot diverge in floating point;
* similarity scores use quantized-integer dot products (exact in both
  engines) instead of float cosine;
* timestamps are emitted as epoch milliseconds (bigint) to sidestep
  timezone/dtype mismatches.

Scale notes are inline: each query is written the way it should run on
a 1000-executor cluster (broadcast the small side, aggregate before
join where legal, LSH banding instead of all-pairs, etc.).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eventsourcing_spark.functions import calc_partition, split_predicate
from eventsourcing_spark.io import load_table, materialize

DEC = "decimal(18,2)"

QueryFn = Callable[[SparkSession, str], DataFrame]
SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}
# queries whose plan contains a single-partition window that IS bounded:
# name -> the written cardinality bound that justifies it. scale_audit
# suppresses the unpartitioned-window flag for these and prints the bound.
BOUNDED_WINDOW: dict[str, str] = {}
# queries where an ESTIMATOR-chosen broadcast whose build side descends
# from a Generate/explode node is justified in writing (name -> reason).
# The round-11 100x OOM rule: Generate nodes propagate poor size stats,
# so a bounded-by-construction side must carry an explicit F.broadcast()
# — this dict is the documented exception list, kept empty by policy
# unless a plan shape genuinely cannot carry the hint.
GENERATE_BROADCAST_OK: dict[str, str] = {}


def query(name: str, oracle: str | None = None, bounded_window: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # duplicate-registration guard: a second @query with the same name
        # would silently SHADOW the first in the gate (found the hard way:
        # a new vocab_coverage_curve replaced chunking.py's). Fail loudly
        # at import instead.
        if name in SPARK_QUERIES:
            raise ValueError(
                f"duplicate gate query name {name!r}: already registered by "
                f"{SPARK_QUERIES[name].__module__}.{SPARK_QUERIES[name].__qualname__}"
            )
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        if bounded_window is not None:
            BOUNDED_WINDOW[name] = bounded_window
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _dec(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


# ---------------------------------------------------------------------------
# S2 — by-stream scan (store/postgresql/store.go:423-444): all events of one
# aggregate in fold order. Filter + orderBy; pushdown reaches the parquet scan.
# ---------------------------------------------------------------------------
@query(
    "s2_stream_scan",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id = (SELECT min(user_id) FROM events)
    ORDER BY event_id
    """,
)
def s2_stream_scan(spark, sf_dir):
    ev = _events(spark, sf_dir)
    target = ev.agg(F.min("user_id").alias("uid"))
    return (
        ev.join(F.broadcast(target), ev.user_id == target.uid)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# S3 — global keyset range scan (store/postgresql/store.go:497-518):
# (after, until] on the monotonic id + LIMIT batch.
# ---------------------------------------------------------------------------
@query(
    "s3_range_scan",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id > (SELECT min(event_id) + 100 FROM events)
      AND event_id <= (SELECT min(event_id) + 1100 FROM events)
    ORDER BY event_id
    LIMIT 500
    """,
)
def s3_range_scan(spark, sf_dir):
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        (F.min("event_id") + 100).alias("after"),
        (F.min("event_id") + 1100).alias("until"),
    )
    return (
        ev.join(
            F.broadcast(bounds),
            (ev.event_id > F.col("after")) & (ev.event_id <= F.col("until")),
        )
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# S4 — point-set scan by raw IDs (store/postgresql/store.go:665-674).
# IN-list stays a pushed-down parquet filter; for huge lists use a
# broadcast semi-join instead (J1 shows that shape).
# ---------------------------------------------------------------------------
_S4_IDS = [i * 7 for i in range(100)]

@query(
    "s4_point_lookup",
    f"""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id IN ({", ".join(map(str, _S4_IDS))})
    ORDER BY event_id
    """,
)
def s4_point_lookup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_id").isin(_S4_IDS))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# S5/A3/W1 — latest snapshot per stream (store/postgresql/store.go:295-323):
# argmax by id per aggregate. max_by = single shuffle with partial
# aggregation — strictly better than the window+filter formulation at scale.
# ---------------------------------------------------------------------------
@query(
    "s5_latest_snapshot",
    """
    SELECT user_id,
           max(event_id) AS last_event_id,
           arg_max(event_type, event_id) AS last_event_type,
           arg_max(value, event_id) AS last_value
    FROM events
    GROUP BY user_id
    """,
)
def s5_latest_snapshot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max_by("value", "event_id").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# A1 — aggregate rehydration fold (eventstore.go:279-300). The per-kind
# handler fold compiles to a conditional aggregate — one shuffle, fully
# JVM-side, instead of a per-key imperative loop.
# ---------------------------------------------------------------------------
@query(
    "a1_fold_balance",
    f"""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS {DEC})
                         WHEN event_type = 'error' THEN -CAST(value AS {DEC})
                         ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS balance,
           count(*) AS n_events,
           max(event_id) AS last_event_id
    FROM events
    GROUP BY user_id
    """,
)
def a1_fold_balance(spark, sf_dir):
    ev = _events(spark, sf_dir)
    delta = (
        F.when(F.col("event_type") == "purchase", _dec("value"))
        .when(F.col("event_type") == "error", -_dec("value"))
        .otherwise(F.lit(0).cast(DEC))
    )
    return ev.groupBy("user_id").agg(
        F.sum(delta).cast("double").alias("balance"),
        F.count("*").alias("n_events"),
        F.max("event_id").alias("last_event_id"),
    )


# ---------------------------------------------------------------------------
# A4/W2 — dense version numbering per stream (store/postgresql/store.go:195-197):
# row_number over (aggregate order by id).
# ---------------------------------------------------------------------------
@query(
    "a4_version_numbers",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
             AS aggregate_version
    FROM events
    WHERE user_id < 20
    """,
)
def a4_version_numbers(spark, sf_dir):
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("aggregate_version"),
    )


# ---------------------------------------------------------------------------
# A5 — distinct streams enumeration (store/postgresql/projection_migration.go:182-220)
# ---------------------------------------------------------------------------
@query(
    "a5_distinct_streams",
    "SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'",
)
def a5_distinct_streams(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.filter(F.col("event_type") == "signup").select("user_id").distinct()


# ---------------------------------------------------------------------------
# F1 — kind filter (store/store.go:75-82) + value predicate; both push to scan.
# ---------------------------------------------------------------------------
@query(
    "f1_kind_filter",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'signup') AND value > 50
    """,
)
def f1_kind_filter(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.filter(
        F.col("event_type").isin("purchase", "signup") & (F.col("value") > 50)
    ).select("event_id", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# F2/F4 — discriminator filter (store/postgresql/store.go:555-577): predicate
# over a payload attribute ("props" plays the discriminator document).
# ---------------------------------------------------------------------------
@query(
    "f2_discriminator_filter",
    f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) BETWEEN 10 AND 19
    GROUP BY event_type
    """,
)
def f2_discriminator_filter(spark, sf_dir):
    ev = _events(spark, sf_dir)
    k = F.regexp_extract("props", "[0-9]+", 0).cast("long")
    return (
        ev.filter(k.between(10, 19))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# F3 — split/partition predicate (store/postgresql/store.go:536-548):
# MOD(hash, splits) IN (...). user_id stands in for aggregate_id_hash.
# ---------------------------------------------------------------------------
@query(
    "f3_split_scan",
    """
    SELECT event_type, count(*) AS n
    FROM events
    WHERE user_id % 8 IN (0, 3, 5)
    GROUP BY event_type
    """,
)
def f3_split_scan(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.filter(split_predicate(F.col("user_id"), 8, [0, 3, 5]))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# W2 — running state within a stream (running balance; SURVEY §2.5 W2).
# Sequential window sum over exact decimals — deterministic.
# ---------------------------------------------------------------------------
@query(
    "w2_running_balance",
    f"""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS {DEC})) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
)
def w2_running_balance(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# W3 — monotonic-ID gap analysis (projection/checkpoints.go:75-91 analog):
# lag() per stream.
# ---------------------------------------------------------------------------
@query(
    "w3_gap_stats",
    """
    SELECT user_id, max(gap) AS max_gap, count(*) AS n_gaps
    FROM (
        SELECT user_id,
               event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
                 AS gap
        FROM events
    )
    WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
)
def w3_gap_stats(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = ev.select(
        "user_id", (F.col("event_id") - F.lag("event_id").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.max("gap").alias("max_gap"), F.count("*").alias("n_gaps")
    )


# ---------------------------------------------------------------------------
# O1 — order + limit (top-k). TakeOrderedAndProject: no global sort at scale.
# Deterministic tie-break on event_id.
# ---------------------------------------------------------------------------
@query(
    "o1_topk_events",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 100
    """,
)
def o1_topk_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# J1 — outbox ⋈ events on id (store/postgresql/outbox.go:49-66): broadcast
# hash join driven from the tiny pending-IDs side.
# ---------------------------------------------------------------------------
@query(
    "j1_outbox_join",
    """
    SELECT e.event_id, e.user_id, e.event_type, e.value
    FROM events e
    JOIN (SELECT event_id FROM events WHERE event_id % 101 = 0) o
      USING (event_id)
    """,
)
def j1_outbox_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    outbox = ev.filter(F.col("event_id") % 101 == 0).select("event_id")
    return ev.join(F.broadcast(outbox), "event_id", "inner").select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# J2 — snapshot ⋈ events rehydration (eventstore.go:249-300): latest snapshot
# per stream + only the events after it, as one set-oriented query.
# ---------------------------------------------------------------------------
@query(
    "j2_snapshot_rehydrate",
    f"""
    WITH bounds AS (
        SELECT CAST(floor((min(event_id) + max(event_id)) / 2) AS BIGINT) AS cutoff
        FROM events
    ),
    snap AS (
        SELECT user_id, max(event_id) AS snap_id
        FROM events, bounds
        WHERE event_id <= cutoff
        GROUP BY user_id
    ),
    streams AS (SELECT DISTINCT user_id FROM events)
    SELECT s.user_id,
           sn.snap_id,
           count(e.event_id) AS n_after,
           CAST(coalesce(sum(CAST(e.value AS {DEC})), CAST(0 AS {DEC})) AS DOUBLE)
             AS value_after
    FROM streams s
    LEFT JOIN snap sn ON s.user_id = sn.user_id
    LEFT JOIN events e
      ON e.user_id = s.user_id AND e.event_id > coalesce(sn.snap_id, -1)
    GROUP BY s.user_id, sn.snap_id
    """,
)
def j2_snapshot_rehydrate(spark, sf_dir):
    # Round 12 (scan-collapse): the snap/streams/replay theta-join form
    # scanned events 4x and shuffled a per-user range join. One keyed
    # conditional aggregate is provably identical: snap_id is the
    # per-user max(event_id <= cutoff), so "event_id > coalesce(snap_id,
    # -1)" selects exactly the user's events with event_id > cutoff —
    # there are no events in (snap_id, cutoff] by maximality, and for
    # users with no snapshot every event is > cutoff (>= 0 > -1; event
    # ids are a non-negative sequence, so cutoff >= 0). The left joins
    # only ever re-attach rows of the same user, so grouping the raw
    # events by user_id yields the same row set.
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.floor((F.min("event_id") + F.max("event_id")) / 2)
        .cast("long")
        .alias("cutoff")
    )
    with_cut = ev.join(F.broadcast(bounds))
    after = F.col("event_id") > F.col("cutoff")
    return with_cut.groupBy("user_id").agg(
        F.max(F.when(~after, F.col("event_id"))).alias("snap_id"),
        F.count(F.when(after, F.col("event_id"))).alias("n_after"),
        F.coalesce(F.sum(F.when(after, _dec("value"))), F.lit(0).cast(DEC))
        .cast("double")
        .alias("value_after"),
    )


# ---------------------------------------------------------------------------
# J3 — candidate-stream semi-join (store/postgresql/events_migration.go:69-87):
# all events of streams that contain a marker event.
# ---------------------------------------------------------------------------
@query(
    "j3_candidate_semijoin",
    f"""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS total_value
    FROM events
    WHERE user_id IN (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'error' AND value > 150
    )
    GROUP BY user_id
    """,
)
def j3_candidate_semijoin(spark, sf_dir):
    ev = _events(spark, sf_dir)
    candidates = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 150)
    ).select("user_id")
    return (
        ev.join(F.broadcast(candidates.distinct()), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# C2 — checkpoint rejection as anti-join (projection/checkpoints.go:58-92):
# overlap window arrives twice; processed IDs are rejected exactly once.
# ---------------------------------------------------------------------------
@query(
    "c2_checkpoint_antijoin",
    """
    WITH bounds AS (
        SELECT CAST(floor((min(event_id) + max(event_id)) / 2) AS BIGINT) AS cutoff
        FROM events
    )
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e, bounds b
    WHERE e.event_id > b.cutoff - 1000
      AND NOT EXISTS (
          SELECT 1 FROM events p, bounds b2
          WHERE p.event_id = e.event_id AND p.event_id <= b2.cutoff
      )
    """,
)
def c2_checkpoint_antijoin(spark, sf_dir):
    # Round 12 (scan-collapse): the anti-join is provably a filter. An
    # incoming row with event_id <= cutoff matches ITSELF in the
    # processed set (p.event_id = e.event_id AND p.event_id <= cutoff)
    # and is rejected; an incoming row with event_id > cutoff cannot
    # equal any processed id (all <= cutoff). So the surviving rows are
    # exactly `event_id > cutoff` — the overlap window (cutoff-1000,
    # cutoff] is rejected wholesale without shuffling the corpus
    # against itself. 4 scans + anti-join exchange -> 2 scans (one
    # narrow min/max pass + one pushed-down filter scan).
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.floor((F.min("event_id") + F.max("event_id")) / 2)
        .cast("long")
        .alias("cutoff")
    )
    with_cut = ev.join(F.broadcast(bounds))
    return with_cut.filter(F.col("event_id") > F.col("cutoff")).select(
        "event_id", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# Sessionization — gap-based sessions per stream (streaming analytic over the
# same table; watermark analog of SURVEY §2.9 C4). 30-minute inactivity gap.
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    """
    WITH marked AS (
        SELECT user_id,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                         OR lag(epoch_ms(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM marked
    GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    new_session = F.when(
        (ms - F.lag(ms).over(w) > 1800000) | F.lag(ms).over(w).isNull(), 1
    ).otherwise(0)
    marked = ev.select("user_id", new_session.alias("new_session"))
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# As-of join — the J2 snapshot⋈events rehydration pattern (eventstore.go:
# 249-300) generalized to a point-in-time operator: each purchase event is
# annotated with the user's latest error event at or before it. Spark has
# no native ASOF JOIN; operators/asof.py builds it as union + running
# last_value — one shuffle, no range cross-product. DuckDB's native
# ASOF LEFT JOIN is the oracle.
# ---------------------------------------------------------------------------
@query(
    "asof_prior_error",
    """
    WITH err AS (
        SELECT user_id, ts, max_by(value, event_id) AS prior_error_value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, p.value,
           err.prior_error_value,
           epoch_ms(err.ts) AS prior_error_ms
    FROM p ASOF LEFT JOIN err
      ON p.user_id = err.user_id AND p.ts >= err.ts
    """,
)
def asof_prior_error(spark, sf_dir):
    from eventsourcing_spark.operators.asof import asof_join_backward

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
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
        ts_out="prior_error_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        F.col("prior_error_value").cast("double").alias("prior_error_value"),
        F.unix_millis("prior_error_ts").alias("prior_error_ms"),
    )


# ---------------------------------------------------------------------------
# Forward as-of join — the other half of the point-in-time pattern: for
# every click, the user's NEXT error at-or-after it (time-to-failure
# analysis). Same union + one-shuffle window strategy as the backward
# direction; oracle is DuckDB's native forward ASOF (`left.ts <= right.ts`).
# ---------------------------------------------------------------------------
@query(
    "asof_next_error",
    """
    WITH err AS (
        SELECT user_id, ts, max_by(value, event_id) AS next_error_value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    c AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
           CAST(err.next_error_value AS DOUBLE) AS next_error_value,
           epoch_ms(err.ts) AS next_error_ms
    FROM c ASOF LEFT JOIN err
      ON c.user_id = err.user_id AND c.ts <= err.ts
    """,
)
def asof_next_error(spark, sf_dir):
    from eventsourcing_spark.operators.asof import asof_join_forward

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # right side unique per (key, ts): ties at identical timestamps would
    # otherwise make first()'s pick order-dependent
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("next_error_value"))
    )
    joined = asof_join_forward(
        clicks,
        errors,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["next_error_value"],
        ts_out="next_error_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("next_error_value").cast("double").alias("next_error_value"),
        F.unix_millis("next_error_ts").alias("next_error_ms"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join — click attribution: for every purchase, the count
# and value of the user's clicks in the preceding 10 minutes. The Spark
# side uses the bucketized equi-join (operators/rangejoin.py) so per-task
# work is bounded by bucket population, never by a theta cross-product;
# the oracle states the same semantics as a plain BETWEEN join (fine for
# DuckDB at oracle scale, fatal on a cluster at 100 TB).
# ---------------------------------------------------------------------------
@query(
    "range_click_attribution",
    f"""
    SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
           count(c.event_id) AS n_clicks,
           CAST(coalesce(sum(CAST(c.value AS {DEC})), 0) AS DOUBLE) AS click_value
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
      AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 600000
      AND epoch_ms(c.ts) < epoch_ms(p.ts)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def range_click_attribution(spark, sf_dir):
    from eventsourcing_spark.operators.rangejoin import bucketed_range_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_millis("ts").alias("click_ms"),
        F.col("value").alias("click_val"),
    )
    pms = F.unix_millis(F.col("ts"))
    joined = bucketed_range_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        left_lo_ms=pms - 600000,
        left_hi_ms=pms,
        right_ts_ms=F.col("click_ms"),
        bucket_ms=600000,
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("click_id").alias("n_clicks"),
        F.coalesce(F.sum(F.col("click_val").cast(DEC)), F.lit(0).cast(DEC))
        .cast("double")
        .alias("click_value"),
    ).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "n_clicks",
        "click_value",
    )


# ---------------------------------------------------------------------------
# Set operations — absent from the reference (SURVEY §2.7); declared
# built-in and pinned here: purchasers minus error-reporters (EXCEPT),
# and the intersection of both populations (INTERSECT).
# ---------------------------------------------------------------------------
@query(
    "set_ops_user_cohorts",
    """
    WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         errs AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT user_id, 'clean_buyer' AS cohort
    FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errs)
    UNION ALL
    SELECT user_id, 'buyer_with_errors' AS cohort
    FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errs)
    """,
)
def set_ops_user_cohorts(spark, sf_dir):
    # Round 12 (scan-collapse): EXCEPT/INTERSECT over two distinct sets
    # re-scanned events 4x (each set feeds both set-ops). Both cohorts
    # are functions of two per-user existence flags, so ONE keyed
    # aggregate computes them: a buyer is clean iff no error event,
    # buyer_with_errors iff both flags set. Same distinct-user row set,
    # same labels; 4 scans + 2 set-op shuffles -> 1 scan + 1 aggregate.
    ev = _events(spark, sf_dir)
    flags = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("has_buy"),
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .alias("has_err"),
        )
    )
    return flags.filter(F.col("has_buy") == 1).select(
        "user_id",
        F.when(F.col("has_err") == 1, F.lit("buyer_with_errors"))
        .otherwise(F.lit("clean_buyer"))
        .alias("cohort"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles per event type — interpolated quantiles over sorted
# doubles; Spark's percentile() and DuckDB's quantile_cont implement the
# same (1-f)·a + f·b interpolation, making the oracle compare exact.
# ---------------------------------------------------------------------------
@query(
    "value_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Exact corpus-wide percentiles WITHOUT value buffering — the 100 TB
# path. `percentile()` / `quantile_cont` buffer every value of a group
# in executor memory (fine per-event_type above; fatal for one global
# group at corpus scale). Here the exact discrete percentile is a
# distributed global rank (operators/ranking.py: range shuffle +
# partition-local row_number + broadcast offsets) followed by a
# broadcast probe of the ceil(p·n) target ranks — no task ever holds
# more than one partition of values, and the probe is a map-side join.
# ---------------------------------------------------------------------------
_PCT_PROBES = (0.25, 0.5, 0.75, 0.9, 0.99)


@query(
    "global_value_percentiles_rank",
    f"""
    WITH s AS (
        SELECT value, row_number() OVER (ORDER BY value, event_id) AS rk
        FROM events WHERE value IS NOT NULL
    ),
    n AS (SELECT count(*) AS c FROM s),
    probes AS (
        SELECT * FROM (VALUES {", ".join(f"({p})" for p in _PCT_PROBES)}) t(p)
    )
    SELECT probes.p,
           (SELECT s.value FROM s, n
            WHERE s.rk = greatest(1, CAST(ceil(probes.p * n.c) AS BIGINT)))
             AS pct_value,
           (SELECT CAST(c AS BIGINT) FROM n) AS n
    FROM probes
    """,
)
def global_value_percentiles_rank(spark, sf_dir):
    from eventsourcing_spark.operators.ranking import global_rank

    vals = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("value", "event_id")
    )
    ranked = global_rank(vals, "value", "event_id")
    n = vals.agg(F.count("*").alias("c"))
    probes = (
        spark.createDataFrame([(p,) for p in _PCT_PROBES], "p double")
        .crossJoin(F.broadcast(n))
        .select(
            "p",
            F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("c"))).alias("rk"),
            F.col("c").cast("long").alias("n"),
        )
    )
    return ranked.join(F.broadcast(probes), "rk").select(
        "p", F.col("value").alias("pct_value"), "n"
    )


# ---------------------------------------------------------------------------
# TPC-H-ish relational coverage: the engine inherits full SQL from Spark;
# these prove joins/aggregations at bench scale.
# ---------------------------------------------------------------------------
@query(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
                    * (1 + CAST(l_tax AS {DEC}))) AS DOUBLE) AS sum_charge,
           CAST(CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
           CAST(CAST(sum(CAST(l_discount AS {DEC})) AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount")
    tax = _dec("l_tax")
    qty = _dec("l_quantity")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue,
           epoch_ms(o_orderdate) AS orderdate_ms
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            # parquet TIMESTAMP(ms) surfaces as TIMESTAMP_NTZ; session tz is
            # UTC so the cast is value-preserving and matches DuckDB epoch_ms
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_ms"
            ),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    # dims (nation⋈region, supplier) broadcast; facts join on keys
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nr), supp.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Skew-resistant salted aggregation: identical semantics to a plain
# groupBy (the oracle IS the plain groupBy), executed as two-phase
# partial/final so one hot key cannot overload a single reducer.
# ---------------------------------------------------------------------------
@query(
    "skew_salted_fold",
    f"""
    SELECT user_id,
           CAST(sum(CAST(value AS {DEC})) AS DOUBLE) AS total_value,
           count(*) AS n_events,
           max(event_id) AS last_event_id
    FROM events
    GROUP BY user_id
    """,
)
def skew_salted_fold(spark, sf_dir):
    from eventsourcing_spark.operators.skew import salted_agg

    ev = _events(spark, sf_dir).withColumn("value_dec", _dec("value"))
    out = salted_agg(
        ev,
        keys=["user_id"],
        aggs={
            "total_value": ("sum", "value_dec"),
            "n_events": ("count", "event_id"),
            "last_event_id": ("max", "event_id"),
        },
        salt=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


# ---------------------------------------------------------------------------
# X1-X3 under the gate: time → boundary ULID → extracted millis must equal
# the oracle's epoch_ms — a full encode/decode round-trip of the ULID codec
# on real timestamps, per row.
# ---------------------------------------------------------------------------
@query(
    "x_ulid_roundtrip",
    """
    SELECT event_id, epoch_ms(ts) AS ts_ms
    FROM events
    """,
)
def x_ulid_roundtrip(spark, sf_dir):
    from eventsourcing_spark.functions.ulid import ulid_millis, ulid_time_only

    ev = _events(spark, sf_dir)
    boundary = ulid_time_only(F.col("ts").cast("timestamp"))
    return ev.select("event_id", ulid_millis(boundary).alias("ts_ms"))


# ---------------------------------------------------------------------------
# X4/X5 under the gate: FNV-1a 32 (sign-cleared) of the stringified stream
# key + bus partition routing, replayed in DuckDB via list_reduce.
# ---------------------------------------------------------------------------
@query(
    "x_fnv_partition",
    """
    WITH h AS (
        SELECT DISTINCT user_id,
               list_reduce(
                   list_prepend(2166136261::BIGINT,
                       list_transform(
                           string_split_regex('user-' || CAST(user_id AS VARCHAR), ''),
                           c -> ascii(c)::BIGINT)),
                   (a, c) -> (xor(a, c) * 16777619) % 4294967296
               ) & 2147483647 AS key_hash
        FROM events
    )
    SELECT user_id, CAST(key_hash AS BIGINT) AS key_hash,
           CAST(key_hash % 12 + 1 AS BIGINT) AS partition
    FROM h
    """,
)
def x_fnv_partition(spark, sf_dir):
    from eventsourcing_spark.functions import calc_partition, fnv1a_32

    ev = _events(spark, sf_dir)
    key = F.concat(F.lit("user-"), F.col("user_id").cast("string"))
    h = fnv1a_32(key).cast("long")
    return (
        ev.select("user_id").distinct()
        .select(
            "user_id",
            h.alias("key_hash"),
            calc_partition(h, 12).cast("long").alias("partition"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT CAST(sum(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS {DEC})) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue,
           any_value(c_acctbal) AS c_acctbal,
           any_value(n_name) AS n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.any_value("c_acctbal").alias("c_acctbal"),
            F.any_value("n_name").alias("n_name"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Native session windows (Spark session_window): gap-based sessions computed
# by the engine itself — streaming-capable form of sessionize_events.
# ---------------------------------------------------------------------------
@query(
    "session_window_stats",
    """
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id, CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
           CAST(max(cnt) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, sid, count(*) AS cnt FROM sess GROUP BY user_id, sid)
    GROUP BY user_id
    """,
)
def session_window_stats(spark, sf_dir):
    ev = _events(spark, sf_dir)
    sess = ev.groupBy(
        F.session_window(F.col("ts").cast("timestamp"), "30 minutes"),
        "user_id",
    ).agg(F.count("*").alias("cnt"))
    return sess.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.max("cnt").cast("long").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-resolution time rollup (continuous-aggregate
# shape): hour and day buckets per event type from ONE pass via grouping
# sets — the engine-side analog of TimescaleDB continuous aggregates /
# Druid rollup segments. At 100 TB the single grouping-sets pass beats
# two jobs: one scan, one expand, one keyed shuffle, and the coarser
# level aggregates the same map-side partials.
# ---------------------------------------------------------------------------
@query(
    "hypertable_rollup",
    f"""
    WITH b AS (
        SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_hour,
               epoch_ms(date_trunc('day', ts)) AS bucket_day,
               event_type,
               CAST(value AS {DEC}) AS v
        FROM events
    )
    SELECT coalesce(bucket_hour, -1) AS bucket_hour,
           coalesce(bucket_day, -1) AS bucket_day,
           event_type,
           count(*) AS n_events,
           CAST(sum(v) AS DOUBLE) AS total_value
    FROM b
    GROUP BY GROUPING SETS ((bucket_hour, event_type),
                            (bucket_day, event_type))
    """,
)
def hypertable_rollup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    b = ev.select(
        F.unix_millis(F.date_trunc("hour", "ts")).alias("bucket_hour"),
        F.unix_millis(F.date_trunc("day", "ts")).alias("bucket_day"),
        "event_type",
        F.col("value").cast(DEC).alias("v"),
    )
    agg = b.groupingSets(
        [["bucket_hour", "event_type"], ["bucket_day", "event_type"]],
        "bucket_hour",
        "bucket_day",
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
    )
    return agg.select(
        F.coalesce("bucket_hour", F.lit(-1)).alias("bucket_hour"),
        F.coalesce("bucket_day", F.lit(-1)).alias("bucket_day"),
        "event_type",
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# Funnel analysis — view → click → purchase, strictly time-ordered per user.
# The A2 incremental-read-model family (projection/projection.go catch-up
# fold) generalized to a multi-stage conversion metric. ONE shuffle: all
# three stage computations are running conditional mins over the same
# (user_id; ts, event_id) window, so they share a single exchange, and the
# per-user rollup reuses that partitioning. The final one-row agg is a
# trivial collapse. At 100 TB the plan is scan → window → two aggs, with
# no self-joins (the naive 3-way self-join funnel would shuffle 3×).
# Latency sums stay in exact integer milliseconds.
# ---------------------------------------------------------------------------
@query(
    "funnel_conversion",
    """
    WITH marked AS (
        SELECT user_id,
               epoch_ms(ts) AS ms,
               event_type,
               min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
                   OVER w AS first_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    marked2 AS (
        SELECT user_id, ms, event_type, first_view,
               min(CASE WHEN event_type = 'click' AND ms > first_view
                        THEN ms END) OVER w AS first_click
        FROM marked
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_type
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ms END) AS t1,
               min(CASE WHEN event_type = 'click' AND ms > first_view
                        THEN ms END) AS t2,
               min(CASE WHEN event_type = 'purchase' AND ms > first_click
                        THEN ms END) AS t3
        FROM marked2
        GROUP BY user_id
    )
    SELECT count(t1) AS n_viewed,
           count(t2) AS n_clicked_after_view,
           count(t3) AS n_purchased_after_click,
           CAST(coalesce(sum(t2 - t1), 0) AS BIGINT) AS sum_view_to_click_ms,
           CAST(coalesce(sum(t3 - t2), 0) AS BIGINT) AS sum_click_to_purchase_ms
    FROM per_user
    """,
)
def funnel_conversion(spark, sf_dir):
    ev = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        ms.alias("ms"),
        "event_type",
        F.min(F.when(F.col("event_type") == "view", ms)).over(w1).alias("first_view"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_click_after = (F.col("event_type") == "click") & (
        F.col("ms") > F.col("first_view")
    )
    marked2 = marked.withColumn(
        "first_click", F.min(F.when(is_click_after, F.col("ms"))).over(w2)
    )
    per_user = marked2.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ms"))).alias("t1"),
        F.min(F.when(is_click_after, F.col("ms"))).alias("t2"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ms") > F.col("first_click")),
                F.col("ms"),
            )
        ).alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
        F.coalesce(F.sum(F.col("t2") - F.col("t1")), F.lit(0))
        .cast("long")
        .alias("sum_view_to_click_ms"),
        F.coalesce(F.sum(F.col("t3") - F.col("t2")), F.lit(0))
        .cast("long")
        .alias("sum_click_to_purchase_ms"),
    )


# ---------------------------------------------------------------------------
# Z-order layout key — multi-dimensional clustering for data skipping:
# interleave (user, hour) bits so sorting by ONE key co-locates records
# that are close in EITHER dimension; parquet min/max stats then prune
# range predicates on user AND on time from the same layout (the Delta
# OPTIMIZE ZORDER / Hudi clustering primitive, here as an inspectable
# column expression). The locality payoff is asserted structurally in
# tests: consecutive z-sorted records differ by small user/hour deltas.
# ---------------------------------------------------------------------------
from eventsourcing_spark.functions.hashing import morton_key_sql


@query(
    "x_zorder_key",
    f"""
    SELECT event_id,
           user_id % 65536 AS ux,
           (epoch_ms(ts) // 3600000) % 65536 AS hy,
           {morton_key_sql("user_id % 65536", "(epoch_ms(ts) // 3600000) % 65536")}
             AS zkey
    FROM events
    """,
)
def x_zorder_key(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.expr("user_id % 65536").alias("ux"),
        F.expr("(unix_millis(ts) div 3600000) % 65536").alias("hy"),
        F.expr(
            morton_key_sql(
                "user_id % 65536", "(unix_millis(ts) div 3600000) % 65536"
            )
        ).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# Hilbert layout key — the locality-preserving upgrade to x_zorder_key
# (round 5): consecutive Hilbert keys are ALWAYS one grid step apart
# (no Morton seam jumps), so range scans over the sort order touch
# tighter (user, hour) neighborhoods and file stats prune better — why
# Iceberg ships hilbert clustering alongside zorder. The 16-step xy2d
# transform is generated from one expression builder for both engines
# (chained projections / MATERIALIZED CTE steps — see
# functions/hashing.py for the negative-intermediate and CTE-inlining
# traps); path-adjacency and reference-transform parity are pinned in
# tests/test_functions.py.
# ---------------------------------------------------------------------------
from eventsourcing_spark.functions.hashing import (  # noqa: E402
    hilbert_oracle_cte,
    with_hilbert_key,
)


@query(
    "x_hilbert_key",
    "WITH "
    + hilbert_oracle_cte(
        base_select=(
            "SELECT event_id, user_id % 65536 AS ux,"
            " (epoch_ms(ts) // 3600000) % 65536 AS hy FROM events"
        ),
        carry_cols=["event_id", "ux", "hy"],
        x_col="ux",
        y_col="hy",
    ),
)
def x_hilbert_key(spark, sf_dir):
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        F.expr("user_id % 65536").alias("ux"),
        F.expr("(unix_millis(ts) div 3600000) % 65536").alias("hy"),
    )
    return with_hilbert_key(base, "ux", "hy")


# ---------------------------------------------------------------------------
# Nearest as-of join — both directions at once: each purchase annotated
# with the user's CLOSEST error event in time (prior or next), ties to
# the prior side. The incident-correlation question ("what error is this
# purchase nearest to?") that neither directional as-of answers alone.
# Composition of the two one-shuffle directional operators + an
# event_id equi-join of their outputs — still no range cross-product
# anywhere. Oracle: DuckDB native backward + forward ASOF, same CASE.
# ---------------------------------------------------------------------------
@query(
    "asof_nearest_error",
    """
    WITH err AS (
        SELECT user_id, ts FROM events WHERE event_type = 'error'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT p.event_id, p.user_id, p.ts, err.ts AS pts
        FROM p ASOF LEFT JOIN err
          ON p.user_id = err.user_id AND p.ts >= err.ts
    ),
    f AS (
        SELECT p.event_id, err.ts AS nts
        FROM p ASOF LEFT JOIN err
          ON p.user_id = err.user_id AND p.ts <= err.ts
    ),
    j AS (
        SELECT b.event_id, b.user_id, epoch_ms(b.ts) AS ts_ms,
               epoch_ms(b.pts) AS pms, epoch_ms(f.nts) AS nms
        FROM b JOIN f ON f.event_id = b.event_id
    )
    SELECT event_id, user_id, ts_ms,
           CASE WHEN pms IS NULL AND nms IS NULL THEN NULL
                WHEN nms IS NULL THEN pms
                WHEN pms IS NULL THEN nms
                WHEN ts_ms - pms <= nms - ts_ms THEN pms
                ELSE nms END AS nearest_error_ms,
           CASE WHEN pms IS NULL AND nms IS NULL THEN NULL
                WHEN nms IS NULL THEN ts_ms - pms
                WHEN pms IS NULL THEN nms - ts_ms
                ELSE least(ts_ms - pms, nms - ts_ms) END AS gap_ms,
           CASE WHEN pms IS NULL AND nms IS NULL THEN 'none'
                WHEN nms IS NULL THEN 'prior'
                WHEN pms IS NULL THEN 'next'
                WHEN ts_ms - pms <= nms - ts_ms THEN 'prior'
                ELSE 'next' END AS direction
    FROM j
    """,
)
def asof_nearest_error(spark, sf_dir):
    # Round 12 (scan-collapse): the backward and forward as-of halves
    # each unioned purchases+errors and shuffled separately (4 event
    # scans), then re-joined on event_id (another full shuffle of the
    # purchase side). asof_join_nearest computes both directions on ONE
    # union and ONE key shuffle — identical inclusive tie semantics,
    # same (pms, nms) per purchase row, join eliminated.
    from eventsourcing_spark.operators.asof import asof_join_nearest

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.lit(1).alias("__one"))
        .select("user_id", "ts")
    )
    j = asof_join_nearest(
        purchases, errors, key_cols=["user_id"], left_ts="ts",
        right_ts="ts", ts_back="pts", ts_fwd="nts",
    ).select(
        "event_id", "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_millis("pts").alias("pms"),
        F.unix_millis("nts").alias("nms"),
    )
    pms, nms, ts_ms = F.col("pms"), F.col("nms"), F.col("ts_ms")
    both_null = pms.isNull() & nms.isNull()
    prior_wins = (ts_ms - pms) <= (nms - ts_ms)
    nearest = (
        F.when(both_null, F.lit(None).cast("long"))
        .when(nms.isNull(), pms)
        .when(pms.isNull(), nms)
        .when(prior_wins, pms)
        .otherwise(nms)
    )
    gap = (
        F.when(both_null, F.lit(None).cast("long"))
        .when(nms.isNull(), ts_ms - pms)
        .when(pms.isNull(), nms - ts_ms)
        .otherwise(F.least(ts_ms - pms, nms - ts_ms))
    )
    direction = (
        F.when(both_null, F.lit("none"))
        .when(nms.isNull(), F.lit("prior"))
        .when(pms.isNull(), F.lit("next"))
        .when(prior_wins, F.lit("prior"))
        .otherwise(F.lit("next"))
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_ms",
        nearest.alias("nearest_error_ms"),
        gap.alias("gap_ms"),
        direction.alias("direction"),
    )


# ---------------------------------------------------------------------------
# Split-balance profile — the F3 split predicate's health check: hash
# every stream key with the reference's FNV-1a (X4), route it to
# N = 12 splits (X5), and report per-split event counts plus the
# balance ratio vs a perfect 1/N share. Run BEFORE choosing catch-up
# parallelism (projection.go's catchupSplits): a skewed hash or a hot
# stream shows up here as a split whose ratio leaves 1000±ε. One scan,
# one 12-group rollup.
# ---------------------------------------------------------------------------

_SPLIT_N = 12


@query(
    "split_balance_profile",
    f"""
    WITH h AS (
        SELECT user_id,
               list_reduce(
                   list_prepend(2166136261::BIGINT,
                       list_transform(
                           string_split_regex('user-' || CAST(user_id AS VARCHAR), ''),
                           c -> ascii(c)::BIGINT)),
                   (a, c) -> (xor(a, c) * 16777619) % 4294967296
               ) & 2147483647 AS key_hash
        FROM events
    ),
    sp AS (
        SELECT key_hash % {_SPLIT_N} + 1 AS split_id, count(*) AS n_events,
               count(DISTINCT user_id) AS n_streams
        FROM h GROUP BY key_hash % {_SPLIT_N} + 1
    )
    SELECT CAST(split_id AS BIGINT) AS split_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_streams AS BIGINT) AS n_streams,
           CAST(n_events * {_SPLIT_N} * 1000
                // (SELECT sum(n_events) FROM sp) AS BIGINT)
             AS balance_x1000
    FROM sp
    """,
)
def split_balance_profile(spark, sf_dir):
    from eventsourcing_spark.functions import calc_partition, fnv1a_32

    ev = _events(spark, sf_dir)
    key = F.concat(F.lit("user-"), F.col("user_id").cast("string"))
    h = ev.select(
        "user_id",
        calc_partition(fnv1a_32(key).cast("long"), _SPLIT_N)
        .cast("long")
        .alias("split_id"),
    )
    sp = h.groupBy("split_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_streams"),
    )
    w = Window.partitionBy(F.lit(1))
    return sp.select(
        F.col("split_id").cast("long").alias("split_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_streams").cast("long").alias("n_streams"),
        F.expr(
            f"n_events * {_SPLIT_N} * 1000"
            " div (sum(n_events) OVER (PARTITION BY 1))"
        )
        .cast("long")
        .alias("balance_x1000"),
    )


# ---------------------------------------------------------------------------
# Point-in-time state rebuild — "the account book as of T": the fold
# (A1, eventstore.go:279-300) restricted to events at or before a
# cutoff. This is the batch form of the reference's temporal rebuild
# (snapshot + tail replay): the cutoff predicate pushes into the scan,
# so the 100 TB plan reads only the prefix partitions when the log is
# date-partitioned (store/event_store.py layout), then folds per key in
# one shuffle.
# ---------------------------------------------------------------------------
AS_OF_DAY = 10  # fold events with day index <= 10 (relative to epoch day 0 of data)


@query(
    "state_as_of_day",
    f"""
    WITH base AS (SELECT min(epoch_ms(ts) // 86400000) AS d0 FROM events),
    pre AS (
        SELECT e.* FROM events e CROSS JOIN base
        WHERE epoch_ms(ts) // 86400000 - base.d0 <= {AS_OF_DAY}
    )
    SELECT user_id,
           CAST(max(event_id) AS BIGINT) AS last_event_id,
           max_by(event_type, event_id) AS last_event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS {DEC})
                         WHEN event_type = 'error'
                         THEN -CAST(value AS {DEC})
                         ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS balance
    FROM pre GROUP BY user_id
    """,
)
def state_as_of_day(spark, sf_dir):
    ev = _events(spark, sf_dir)
    day = F.expr("unix_millis(ts) div 86400000")
    d0 = ev.agg(F.min(day).alias("d0"))
    pre = ev.crossJoin(F.broadcast(d0)).filter(day - F.col("d0") <= AS_OF_DAY)
    delta = (
        F.when(F.col("event_type") == "purchase", _dec("value"))
        .when(F.col("event_type") == "error", -_dec("value"))
        .otherwise(F.lit(0).cast(DEC))
    )
    return pre.groupBy("user_id").agg(
        F.max("event_id").cast("long").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(delta).cast("double").alias("balance"),
    )


# ---------------------------------------------------------------------------
# Join-skew profiler — the measurement that decides whether a keyed
# shuffle needs salting/AQE skew handling BEFORE the job runs: per join
# key family, the frequency distribution's shape in integer-exact form.
# skew_ppm = max key share; top1_vs_mean = how many average keys the
# hottest key weighs (the "last reducer" multiplier — a salted rewrite
# like skew_salted_fold pays off roughly when this exceeds the per-task
# row budget). One aggregate over one scan per key family; the profile
# table is O(distinct keys) and the output O(families).
# ---------------------------------------------------------------------------
@query(
    "join_skew_profile",
    """
    WITH fams AS (
        SELECT 'user_id' AS fam, CAST(user_id AS VARCHAR) AS k FROM events
        UNION ALL
        SELECT 'event_type', event_type FROM events
        UNION ALL
        SELECT 'user_day', CAST(user_id AS VARCHAR) || '@'
               || CAST(epoch_ms(ts) // 86400000 AS VARCHAR) FROM events
    ),
    freq AS (SELECT fam, k, count(*) AS c FROM fams GROUP BY fam, k)
    SELECT fam,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS skew_ppm,
           CAST((max(c) * count(*)) // sum(c) AS BIGINT) AS top1_vs_mean
    FROM freq GROUP BY fam
    """,
)
def join_skew_profile(spark, sf_dir):
    # Round 12 (scan-collapse): the 3-arm UNION scanned events once per
    # key family. One scan emits all three (fam, k) rows per event via
    # explode — bag-identical to the union (same multiset of rows).
    ev = _events(spark, sf_dir)
    fams = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("user_id").alias("fam"),
                    F.col("user_id").cast("string").alias("k"),
                ),
                F.struct(
                    F.lit("event_type").alias("fam"),
                    F.col("event_type").alias("k"),
                ),
                F.struct(
                    F.lit("user_day").alias("fam"),
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("@"),
                        F.expr("cast(unix_millis(ts) div 86400000 as string)"),
                    ).alias("k"),
                ),
            )
        ).alias("fk")
    ).select("fk.fam", "fk.k")
    freq = fams.groupBy("fam", "k").agg(F.count("*").alias("c"))
    return freq.groupBy("fam").agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.expr("(1000000 * max(c)) div sum(c)").cast("long").alias("skew_ppm"),
        F.expr("(max(c) * count(*)) div sum(c)").cast("long").alias("top1_vs_mean"),
    )


# ---------------------------------------------------------------------------
# Layout-skipping comparison — the measurement that justifies paying
# for a clustering rewrite: given the SAME selective 2-d range query
# (a 64-user × 64-hour box), how many 512-row rowgroups can min/max
# stats prune under (a) row-major time-then-user order — the ingest
# default, (b) the Z-order key, (c) the Hilbert key? This is the
# planning query behind Delta OPTIMIZE ZORDER / Iceberg rewrite
# decisions: run it on a sample, read the prune ratios, pick a layout.
#
# Mechanics: y is the hour index normalized by a broadcast min (no
# data-dependent literal, no wraparound), each layout ranks the corpus
# by its key through operators/ranking.global_rank — the distributed
# zip-with-index, NO single-partition window — and rowgroup stats are
# one keyed aggregate per layout. The predicate box is absolute in
# normalized coordinates, so both engines prune identically and the
# three summary rows hash-match. Oracle ranks with plain row_number()
# (DuckDB is single-process; the Spark side is what must stay
# distributed). At 100 TB the ratio is the deliverable: rowgroup size
# and box size scale together, so local ratios transfer.
# ---------------------------------------------------------------------------
LAYOUT_GROUP_ROWS = 512
LAYOUT_XLO, LAYOUT_XHI = 10, 73
LAYOUT_YLO, LAYOUT_YHI = 100, 163


def _layout_skip_oracle() -> str:
    from eventsourcing_spark.functions.hashing import (
        hilbert_chain_sql,
        morton_key_sql,
    )

    g = LAYOUT_GROUP_ROWS
    box = (f"gmin_x <= {LAYOUT_XHI} AND gmax_x >= {LAYOUT_XLO} "
           f"AND gmin_y <= {LAYOUT_YHI} AND gmax_y >= {LAYOUT_YLO}")
    per_layout = []
    for name, key in (
        ("linear", "y * 65536 + x"),
        ("zorder", morton_key_sql("x", "y")),
        ("hilbert", "hkey"),
    ):
        per_layout.append(f"""
    rk_{name} AS (
        SELECT x, y,
               (row_number() OVER (ORDER BY {key}, event_id) - 1) // {g}
                 AS grp
        FROM keyed
    ),
    gr_{name} AS (
        SELECT grp, count(*) AS n, min(x) AS gmin_x, max(x) AS gmax_x,
               min(y) AS gmin_y, max(y) AS gmax_y
        FROM rk_{name} GROUP BY grp
    ),
    sm_{name} AS (
        SELECT '{name}' AS layout,
               count(*) AS n_groups,
               sum(CASE WHEN {box} THEN 0 ELSE 1 END) AS n_pruned,
               sum(CASE WHEN {box} THEN n ELSE 0 END) AS rows_scanned
        FROM gr_{name}
    )""")
    chain = hilbert_chain_sql(
        base_select="SELECT event_id, x, y FROM base",
        carry_cols=["event_id", "x", "y"],
        x_col="x",
        y_col="y",
    )
    head = f"""
    WITH st AS (SELECT min(epoch_ms(ts) // 3600000) AS h0 FROM events),
    base AS MATERIALIZED (
        SELECT event_id, user_id % 65536 AS x,
               epoch_ms(ts) // 3600000 - h0 AS y
        FROM events, st
    ),
    {chain},
    keyed AS MATERIALIZED (
        SELECT event_id, x, y, cd AS hkey FROM h16
    ),"""
    tail = """
    SELECT layout,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_pruned AS BIGINT) AS n_pruned,
           CAST((1000000 * n_pruned) // n_groups AS BIGINT) AS prune_ppm,
           CAST(rows_scanned AS BIGINT) AS rows_scanned
    FROM (SELECT * FROM sm_linear UNION ALL SELECT * FROM sm_zorder
          UNION ALL SELECT * FROM sm_hilbert)
    ORDER BY layout
    """
    return head + ",".join(per_layout) + tail


@query("layout_skipping_compare", _layout_skip_oracle())
def layout_skipping_compare(spark, sf_dir):
    from eventsourcing_spark.functions.hashing import (
        morton_key_sql,
        with_hilbert_key,
    )
    from eventsourcing_spark.operators.ranking import global_rank

    ev = _events(spark, sf_dir)
    st = ev.agg(F.expr("min(unix_millis(ts) div 3600000)").alias("h0"))
    base = ev.crossJoin(F.broadcast(st)).select(
        "event_id",
        F.expr("user_id % 65536").alias("x"),
        F.expr("unix_millis(ts) div 3600000 - h0").alias("y"),
    )
    keyed = with_hilbert_key(base, "x", "y").withColumn(
        "zkey", F.expr(morton_key_sql("x", "y"))
    ).withColumn("lkey", F.expr("y * 65536 + x")).transform(materialize)

    overlap = (
        (F.col("gmin_x") <= LAYOUT_XHI)
        & (F.col("gmax_x") >= LAYOUT_XLO)
        & (F.col("gmin_y") <= LAYOUT_YHI)
        & (F.col("gmax_y") >= LAYOUT_YLO)
    )

    def summary(name, key_col):
        ranked = global_rank(keyed, key_col, "event_id")
        groups = (
            ranked.groupBy(
                F.expr(f"(rk - 1) div {LAYOUT_GROUP_ROWS}").alias("grp")
            )
            .agg(
                F.count("*").alias("n"),
                F.min("x").alias("gmin_x"),
                F.max("x").alias("gmax_x"),
                F.min("y").alias("gmin_y"),
                F.max("y").alias("gmax_y"),
            )
        )
        return groups.agg(
            F.lit(name).alias("layout"),
            F.count("*").alias("n_groups"),
            F.sum(F.when(overlap, 0).otherwise(1)).alias("n_pruned"),
            F.sum(F.when(overlap, F.col("n")).otherwise(0)).alias(
                "rows_scanned"
            ),
        )
    out = (
        summary("linear", "lkey")
        .unionByName(summary("zorder", "zkey"))
        .unionByName(summary("hilbert", "hkey"))
    )
    return out.select(
        "layout",
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_pruned").cast("long").alias("n_pruned"),
        F.expr("(1000000 * n_pruned) div n_groups").alias("prune_ppm"),
        F.col("rows_scanned").cast("long").alias("rows_scanned"),
    ).orderBy("layout")
