"""As-of (point-in-time) join — the J2 rehydration pattern generalized.

The reference's snapshot ⋈ events rehydration (eventstore.go:249-300) is
an as-of pattern: "the latest right-side row at or before this left-side
row". This module implements it as a *union + running last_value* —
one shuffle on the key, no range cross-product, no per-row subquery —
which is the only as-of formulation that survives 100 TB:

* both sides are tagged and unioned (right side sorts before left at
  equal timestamps ⇒ inclusive `left.ts >= right.ts` semantics);
* one window per key ordered by (ts, side) carries the most recent
  right-side values forward with ``last(..., ignorenulls=True)``;
* left rows are then filtered back out, now annotated.

Cost: a single hash-shuffle of |L|+|R| rows on the join key and a
sort within partitions — identical asymptotics to a sort-merge join,
with none of the O(|L|·|R|) blowup a naive `ts_l >= ts_r` theta-join
produces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    ts_out: str = "asof_ts",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same key (backward as-of, inclusive).

    ``value_cols`` are the right-side columns to carry; they must not
    collide with left column names. The matched right timestamp is
    emitted as ``ts_out``. Rows with no prior right row get nulls.
    """
    lcols = left.columns
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn(ts_out, F.lit(None))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None))
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(ts_out),
        *value_cols,
    )
    l_norm = l_tagged.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        _SIDE,
        ts_out,
        *value_cols,
        *[c for c in lcols if c not in key_cols],
    )
    r_norm = r_tagged
    for c in [c for c in lcols if c not in key_cols]:
        r_norm = r_norm.withColumn(c, F.lit(None))
    unioned = l_norm.unionByName(r_norm)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *key_cols,
        "__ts",
        _SIDE,
        *[c for c in lcols if c not in key_cols],
        F.last(ts_out, ignorenulls=True).over(w).alias(ts_out),
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE, "__ts")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    ts_out: str = "asof_ts",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts >= left_ts`` on the same key (forward as-of, inclusive).

    Mirror of :func:`asof_join_backward` with the window frame reversed:
    the union is ordered ``(ts asc, left-before-right at ties)`` and the
    nearest *future* right-side values are pulled back with
    ``first(..., ignorenulls=True)`` over ``[currentRow,
    unboundedFollowing]``. Same single-shuffle cost model — this is the
    "next event after t" half of the point-in-time pattern (e.g. time
    from click to the next error), which the reference can only express
    as a per-aggregate replay loop (eventstore.go:279-293).
    """
    lcols = left.columns
    # left sorts BEFORE right at equal timestamps (side 0 < 1) so the
    # inclusive `right_ts >= left_ts` match lands inside the frame.
    l_tagged = left.withColumn(_SIDE, F.lit(0)).withColumn(ts_out, F.lit(None))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None))
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.col(right_ts).alias(ts_out),
        *value_cols,
    )
    l_norm = l_tagged.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        _SIDE,
        ts_out,
        *value_cols,
        *[c for c in lcols if c not in key_cols],
    )
    r_norm = r_tagged
    for c in [c for c in lcols if c not in key_cols]:
        r_norm = r_norm.withColumn(c, F.lit(None))
    unioned = l_norm.unionByName(r_norm)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *key_cols,
        "__ts",
        _SIDE,
        *[c for c in lcols if c not in key_cols],
        F.first(ts_out, ignorenulls=True).over(w).alias(ts_out),
        *[F.first(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return carried.filter(F.col(_SIDE) == 0).drop(_SIDE, "__ts")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    ts_back: str = "asof_prev_ts",
    ts_fwd: str = "asof_next_ts",
) -> DataFrame:
    """Both as-of directions at once: for each left row attach the
    latest ``right_ts <= left_ts`` (as ``ts_back``) AND the earliest
    ``right_ts >= left_ts`` (as ``ts_fwd``), both inclusive, on the
    same key — in ONE union and ONE key shuffle (round 12).

    Equivalent to ``asof_join_backward`` + ``asof_join_forward`` +
    an equi-join back on a left-row id, minus that join's extra
    shuffle of the left side and the second scan of each input: the
    two directional windows share ``partitionBy(*key_cols)``, so the
    planner inserts only an in-partition re-sort between them, never
    a second Exchange. Tie handling matches the directional
    operators: the right side sorts before the left at equal ``ts``
    in BOTH window orders (ascending for backward, descending for
    forward), which is exactly the inclusive `<=` / `>=` semantics.
    """
    lcols = left.columns
    l_norm = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__rts"),
        *[c for c in lcols if c not in key_cols],
    )
    r_norm = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__rts"),
    )
    for c in [c for c in lcols if c not in key_cols]:
        r_norm = r_norm.withColumn(c, F.lit(None))
    unioned = l_norm.unionByName(r_norm)

    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").desc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *key_cols,
        _SIDE,
        *[c for c in lcols if c not in key_cols],
        F.last("__rts", ignorenulls=True).over(wb).alias(ts_back),
        F.last("__rts", ignorenulls=True).over(wf).alias(ts_fwd),
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
