"""Bucketized range (interval) join.

A time-window join (`right.ts ∈ [left.lo, left.hi)` per key) written as
a theta-join degrades to a per-key cross product — on a skewed key a
single task owns |L_k|·|R_k| comparisons and the job dies at scale. The
bucketized form keeps everything equi-join shaped:

* each left row explodes into the fixed-width time buckets its window
  overlaps (a window of width W overlaps ⌈W/bucket⌉+1 ≤ 2 buckets when
  bucket ≥ W);
* right rows map to exactly one bucket;
* the join key becomes (key, bucket) — an ordinary hash shuffle whose
  per-task work is bounded by bucket population, not window population;
* the exact range predicate is re-applied after the join (the buckets
  are an access path, never the semantics).

This is the same layout-as-index move the event store makes with its
hash buckets (store/event_store.py), applied to the time dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_lo_ms: Column,
    left_hi_ms: Column,
    right_ts_ms: Column,
    bucket_ms: int,
    how: str = "left",
) -> DataFrame:
    """Join each left row to the right rows with
    ``left_lo_ms <= right_ts_ms < left_hi_ms`` on the same key.

    Timestamps are epoch-millisecond Columns (exact integer arithmetic).
    With ``how='left'`` every left row survives; aggregate with
    null-skipping functions (count(col), sum) so empty windows read as
    zero. Left rows appear once per overlapped bucket — any follow-up
    aggregation must group by a left-side unique key.
    """
    import functools
    import operator

    lo, hi = left_lo_ms.cast("long"), left_hi_ms.cast("long")
    l_exp = (
        left.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn(
            _BUCKET,
            F.explode(F.sequence(F.floor(lo / bucket_ms), F.floor(hi / bucket_ms))),
        )
        .alias("__l")
    )
    r = (
        right.withColumn("__rts", right_ts_ms.cast("long"))
        .withColumn(_BUCKET, F.floor(F.col("__rts") / bucket_ms))
        .alias("__r")
    )
    cond = functools.reduce(
        operator.and_,
        [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in key_cols]
        + [
            F.col(f"__l.{_BUCKET}") == F.col(f"__r.{_BUCKET}"),
            F.col("__r.__rts") >= F.col("__l.__lo"),
            F.col("__r.__rts") < F.col("__l.__hi"),
        ],
    )
    # This operator's whole point is the ordinary-hash-shuffle plan on
    # (key, bucket) — pin it. The exploded left's size estimate does
    # not grow with the bucket fan-out (Generate propagates its
    # child's stats), so left to the estimator the join can broadcast
    # a corpus-sized exploded side at exactly the scale where it dies
    # (the round-11 contamination_overlap OOM class); SMJ keeps both
    # sides co-partitioned and spills gracefully on hot buckets.
    joined = l_exp.join(r.hint("merge"), cond, how)
    for k in key_cols:
        joined = joined.drop(F.col(f"__r.{k}"))
    return joined.drop(
        F.col(f"__l.{_BUCKET}"), F.col(f"__r.{_BUCKET}"), "__lo", "__hi", "__rts"
    )
