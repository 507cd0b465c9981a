"""Streaming complex-event-processing: sequence-pattern detection.

The Flink/Esper capability the batch funnels approximate: detect
``view → click within 30 minutes`` *as the events arrive* and emit one
match row per conversion. This is the continuous twin of
``analytics.funnel_time_bounded`` (which aggregates the same pattern in
batch); the emitted match rows are the raw material that rollup
aggregates.

Design (same contract as streaming/sessions.py):

* **Bounded state** — one long per key (the last view's epoch-ms).
  Pattern state for a fixed-length sequence is O(pattern length), never
  O(stream length) — the property that keeps 10⁹ keys in executor
  memory at 100 TB/day.
* **Non-consuming match** — every click pairs with the latest preceding
  view inside the window; a view can serve many clicks (standard
  attribution semantics; a consuming variant would just clear state on
  match).
* **Append mode** — a match is final when emitted (the pattern closes
  on the click, never retro-actively), so any append sink works.
* **Ordering contract** — per-key event-time order across micro-batches
  (a Kafka partition's guarantee); within a batch the operator sorts by
  (ts_ms, event_id), the same total order the batch twin uses.

The batch twin ``conversions_batch`` is the oracle: a running
latest-view marker (rows-frame window) filtered to in-window clicks —
asserted exactly equal in tests/test_streaming_cep.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MATCH_WINDOW_MS = 30 * 60 * 1000  # view → click attribution window

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_ms", T.LongType()),
        T.StructField("click_ms", T.LongType()),
        T.StructField("gap_ms", T.LongType()),
        T.StructField("click_event_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_view_ms", T.LongType())])


def _prepared(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    )


def detect_conversions(stream_events: DataFrame) -> DataFrame:
    """Wire an event stream through the view→click matcher (append)."""

    def match(key, pdfs, state: GroupState):
        import pandas as pd

        user_id = key[0]
        last_view = state.get[0] if state.exists else None
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "event_id"])
            for eid, etype, ts_ms in zip(
                pdf["event_id"], pdf["event_type"], pdf["ts_ms"]
            ):
                ts_ms = int(ts_ms)
                if etype == "view":
                    last_view = ts_ms
                elif etype == "click" and last_view is not None:
                    gap = ts_ms - last_view
                    if 0 <= gap <= MATCH_WINDOW_MS:
                        out.append(
                            (user_id, last_view, ts_ms, gap, int(eid))
                        )
        if last_view is not None:
            state.update((last_view,))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "view_ms",
                    "click_ms",
                    "gap_ms",
                    "click_event_id",
                ],
            )

    return (
        _prepared(stream_events)
        .groupBy("user_id")
        .applyInPandasWithState(
            match,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def conversions_batch(events: DataFrame) -> DataFrame:
    """Batch oracle: latest-view running marker + in-window click filter.

    One window exchange on user_id — the exact total order
    (ts_ms, event_id) the stream tracker applies within batches.
    """
    m = _prepared(events)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_ms"))
    ).over(w)
    marked = m.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_ms",
        last_view.alias("view_ms"),
    )
    gap = F.col("ts_ms") - F.col("view_ms")
    return (
        marked.filter(
            (F.col("event_type") == "click")
            & F.col("view_ms").isNotNull()
            & (gap >= 0)
            & (gap <= MATCH_WINDOW_MS)
        )
        .select(
            "user_id",
            "view_ms",
            F.col("ts_ms").alias("click_ms"),
            gap.alias("gap_ms"),
            F.col("event_id").alias("click_event_id"),
        )
    )
