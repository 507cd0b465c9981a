"""Streaming analytics over the event stream: windowed aggregations with
watermarks and a custom stateful fold.

The reference has no windowed aggregations — its C4 "watermark analog"
is the catch-up StartOffset safety margin. An analytics engine needs the
real thing, so these operators make the implied windows explicit
(SURVEY.md §2.5) on Structured Streaming:

* ``windowed_counts`` — tumbling/sliding event-time windows + watermark;
  identical code path works on a batch frame (Spark unifies the API).
* ``stateful_running_fold`` — applyInPandasWithState: the A2 read-model
  maintained incrementally with per-key state, the engine-level
  equivalent of the reference's keyed projection map
  (test/integration/projection_mock.go:62-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    time_col: str = "created_at",
    key_col: str = "kind",
) -> DataFrame:
    """Event-time windowed counts/sums with late-data bound.

    On a stream: watermark drops state for windows older than the bound
    (bounded memory at 100 TB/day rates). On a batch frame the same
    expression computes historical windows — ``withWatermark`` is a
    no-op there.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), window, slide or window)
    return df.groupBy(win.alias("w"), F.col(key_col)).agg(
        F.count("*").alias("n_events")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
    )


STATE_SCHEMA = T.StructType(
    [
        T.StructField("balance", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

FOLD_OUT_SCHEMA = T.StructType(
    [
        T.StructField("aggregate_id", T.StringType()),
        T.StructField("balance", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def stateful_running_fold(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-aggregate running (balance, count)
    maintained across micro-batches via applyInPandasWithState.

    Money semantics follow the Account fixture: AccountCreated/
    MoneyDeposited add, MoneyWithdrawn subtracts (body JSON `money`).
    Emits the updated state row per key per batch (update-mode shape).
    """
    import json as _json

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            balance, n = state.get
        else:
            balance, n = 0, 0
        for pdf in pdfs:
            for row in pdf.itertuples():
                body = _json.loads(
                    bytes(row.body).decode() if isinstance(row.body, (bytes, bytearray))
                    else row.body
                )
                money = int(body.get("money", 0))
                if row.kind in ("AccountCreated", "MoneyDeposited"):
                    balance += money
                elif row.kind == "MoneyWithdrawn":
                    balance -= money
                n += 1
        state.update((balance, n))
        yield pd.DataFrame(
            {"aggregate_id": [key[0]], "balance": [balance], "n_events": [n]}
        )

    return events.groupBy("aggregate_id").applyInPandasWithState(
        fold,
        outputStructType=FOLD_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "aggregate_id",
    time_col: str = "created_at",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left row with
    the right-side rows of the same key whose event time falls in
    ``(left.time, left.time + within]``.

    The reference never correlates two live streams (its only join
    shapes are J1-J3, SURVEY.md §2.3); an analytics engine needs the
    real thing for pattern detection (e.g. a withdrawal shortly after a
    deposit on the same aggregate). Watermarks on both inputs plus the
    closed time-range predicate are exactly what lets Spark expire
    buffered join state, so state stays bounded by
    ``watermark + within`` per key at 100 TB/day rates. The same
    expression joins two batch frames (watermark is skipped there),
    which is how the test pins stream output to the batch answer.

    Right-side columns come back suffixed to keep the output schema
    unambiguous. ``how`` accepts the outer variants too ("leftOuter",
    "rightOuter", "fullOuter"); on streams Spark requires exactly the
    watermark + time-range shape this function always emits, so
    unmatched rows are released once the watermark passes their bound.
    """
    lf = left.withWatermark(time_col, watermark) if left.isStreaming else left
    rf = right.withWatermark(time_col, watermark) if right.isStreaming else right
    rf = rf.select([F.col(c).alias(c + suffix) for c in rf.columns])
    cond = (
        (F.col(key_col) == F.col(key_col + suffix))
        & (F.col(time_col + suffix) > F.col(time_col))
        & (
            F.col(time_col + suffix)
            <= F.col(time_col) + F.expr(f"INTERVAL {within}")
        )
    )
    return lf.join(rf, cond, how)


def windowed_heavy_hitters(
    events: DataFrame,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "created_at",
    key_col: str = "kind",
) -> DataFrame:
    """Top-k keys per event-time window (streaming heavy hitters).

    Batch: windowed counts + one ``row_number`` pass (rank ties broken by
    key for determinism). Stream: Structured Streaming forbids window
    functions on an unfinished aggregation, so this returns the windowed
    counts — rank them per micro-batch in the sink with
    ``rank_heavy_hitters`` (see ``heavy_hitters_writer``). The aggregate
    state Spark keeps is one counter per (window, key) — bounded by the
    watermark, independent of event volume; the per-window top-k frame
    the sink ranks is tiny.
    """
    counts = windowed_counts(
        events, window=window, watermark=watermark,
        time_col=time_col, key_col=key_col,
    )
    if events.isStreaming:
        return counts
    return rank_heavy_hitters(counts, k=k, key_col=key_col)


def rank_heavy_hitters(counts: DataFrame, k: int = 3, key_col: str = "kind") -> DataFrame:
    """Rank a (window_start, window_end, key, n_events) frame to top-k."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.col(key_col)
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def heavy_hitters_writer(
    counts_stream: DataFrame, sink_path: str, checkpoint: str,
    k: int = 3, key_col: str = "kind",
):
    """Stream writer: complete-mode windowed counts → per-trigger top-k.

    Complete mode re-emits the full (small) aggregate each trigger; the
    sink ranks and overwrites — idempotent by construction, so replays
    after failure converge (C8 exactly-once-effect, projection/types.go:
    129-153 analog). At larger key cardinality switch to update mode and
    merge per-window deltas instead.
    """

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        top = rank_heavy_hitters(batch_df, k=k, key_col=key_col)
        top.write.mode("overwrite").parquet(sink_path)

    return (
        counts_stream.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str] | None = None,
    time_col: str = "created_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop at-least-once redelivery duplicates with BOUNDED state.

    The C2 checkpoint anti-join deduplicates against the *whole* history
    (exact, but state grows with the table); for transport-level
    duplicates — a Kafka producer retry, a feed reconnect replaying the
    tail (store/postgresql/listener_logrepl.go re-subscribe path) — the
    duplicate always arrives within a bounded delay, and Spark's
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes it. The two compose: this operator absorbs the
    transport noise cheaply; the checkpoint rule guarantees effect-
    exactly-once behind it.

    On a batch frame the same call degrades to plain ``dropDuplicates``
    semantics (watermark is a no-op), so batch/stream parity holds.
    """
    keys = list(key_cols or ["id"])
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
