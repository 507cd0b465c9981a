"""Streaming sessionization: a per-user session tracker with bounded state.

The batch engine sessionizes with window/lag expressions
(queries.sessionize_events) and the native ``session_window`` aggregate
(session_window_stats); this operator is the *continuous* version: it
closes a session when the inactivity gap exceeds the threshold, emits
one summary row per closed session, and holds ONLY the open session in
state — one fixed-size tuple per key, bounded regardless of stream
length, which is the property that matters at 100 TB/day.

API note: built on ``applyInPandasWithState`` (Arrow-batched typed
state). Spark 4 ships ``transformWithStateInPandas`` as the successor
API; this container's Python environment lacks the protobuf runtime its
driver worker imports, so the operator uses the stable API — the state
algebra (read tuple → fold batch → write tuple) is identical and would
port to a StatefulProcessor unchanged.

Totals are tracked in integer cents so stream and batch agree
bit-for-bit.

Ordering contract (same as the reference's per-aggregate feed order,
README.md:389-399): rows must arrive per-key in event-time order across
micro-batches. Within a batch this operator sorts; across batches an
out-of-order arrival would splice sessions wrongly — upstream, that is
the file/Kafka source's per-partition order guarantee. The batch twin
(``closed_sessions_batch``) is the oracle: stream output over any
in-order batching equals the batch computation minus each user's still-
open last session (asserted exactly in tests/test_streaming_sessions.py).

Reference parity: none to port — the reference has no session concept;
this is SURVEY §2.5's "implied window" made explicit as a custom
stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MS = 30 * 60 * 1000  # same 30-minute gap as sessionize_events

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _prepared(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("long")
        .alias("cents"),
    )


def track_sessions(stream_events: DataFrame) -> DataFrame:
    """Wire an event stream through the session tracker (append mode)."""

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        user_id = key[0]
        cur = list(state.get) if state.exists else None
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms")
            for ts_ms, cents in zip(pdf["ts_ms"], pdf["cents"]):
                ts_ms, cents = int(ts_ms), int(cents)
                if cur is not None and ts_ms - cur[1] > GAP_MS:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = None
                if cur is None:
                    cur = [ts_ms, ts_ms, 0, 0]
                cur[1] = ts_ms
                cur[2] += 1
                cur[3] += cents
        if cur is not None:
            state.update(tuple(cur))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_ms",
                    "session_end_ms",
                    "n_events",
                    "total_cents",
                ],
            )

    return (
        _prepared(stream_events)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # closed sessions are final — never re-emitted — so this is a
            # true append-mode operator (works with any append sink)
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def closed_sessions_batch(events: DataFrame) -> DataFrame:
    """Batch twin: every session except each user's last (still open)."""
    p = _prepared(events)
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    sess = p.withColumn(
        "new_session",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w) > GAP_MS)
            | F.lag("ts_ms").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w))
    agg = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("total_cents"),
    )
    last = agg.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    return (
        agg.join(last, "user_id")
        .filter(F.col("session_id") != F.col("last_id"))
        .select(
            "user_id",
            "session_start_ms",
            "session_end_ms",
            "n_events",
            "total_cents",
        )
    )
