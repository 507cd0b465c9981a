"""Distributed global ranking — zip-with-index and ntile without the
single-partition window.

``row_number() OVER (ORDER BY ...)`` and ``ntile(k) OVER (ORDER BY ...)``
with no PARTITION BY are the canonical 100 TB scale-killers: Catalyst
plans them as ``Exchange SinglePartition`` + a full sort on ONE task
(the exact class ``plans.unpartitioned_windows`` flags). Both are
nevertheless exactly computable distributed:

* **global_rank** — range-partition by the sort key (every key in
  partition p orders before partition p+1 by construction), stamp
  partition ids, ``row_number`` WITHIN each partition, and add the
  exclusive cumulative partition counts — a P-row aggregate frame
  broadcast back. Spark's exchange reuse materializes the range shuffle
  once for both consumers (counts + ranks), so the corpus is shuffled
  exactly once and never concentrated.
* **ntile_expr** — ``ntile(k)``'s group sizes are a closed form of the
  global rank: the first ``n % k`` tiles take ``n div k + 1`` rows, the
  rest ``n div k``; integer ``div`` arithmetic maps rank → tile with no
  window at all.

Together they replace the reference pattern
``ntile(k) OVER (ORDER BY v, id)`` with a plan whose every exchange is
key-partitioned. Used by rfm_segmentation and sorted_neighborhood_pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from eventsourcing_spark.io import materialize


def _ranged_checkpoint(df: DataFrame, num_partitions: int, order_cols):
    """Range-partition by the total order and FREEZE the partition ids
    in materialized data (eager localCheckpoint).

    Why materialize: the offsets branch and the rank branch both consume
    this frame, and the RangePartitioner re-SAMPLES its boundaries on
    every execution. Sharing the exchange via ``spark.sql.exchange.reuse``
    was the round-4 design, but reuse depends on plan canonicalization
    and was observed to silently fail under AQE in a larger query
    (round 5: a rank consumed by an aggregate produced uneven
    512-row groups — duplicate/skipped ranks — with reuse ON). A
    checkpoint makes the invariant structural: one physical
    materialization, both branches read the same pids, and the final
    rank is partitioning-independent (any consistent boundaries give
    the same total order), so results are deterministic across runs,
    partition counts, and reuse/AQE settings."""
    return (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__rank_pid", F.spark_partition_id())
        .transform(materialize)
    )


def global_rank(
    df: DataFrame,
    *order_cols: Column | str,
    rank_col: str = "rk",
    num_partitions: int | None = None,
    with_ranged: bool = False,
):
    """``df`` plus ``rank_col`` = 1-based position in the total order of
    ``order_cols`` (pass ``F.desc(...)`` for descending dimensions).

    The order must be total (include a unique tiebreaker column) for the
    rank to be deterministic. Adds one range exchange + one pid-hash
    exchange; no stage sees more than one partition's rows.

    **Correctness invariant — one materialization.** The offsets branch
    and the main branch must see IDENTICAL partition ids, but the
    RangePartitioner re-samples boundaries per execution, and exchange
    reuse (the round-4 mechanism) was observed to silently fail under
    AQE in larger plans. The range-partitioned frame is therefore
    eagerly ``localCheckpoint``ed (see :func:`_ranged_checkpoint`):
    both branches read one materialization, and the rank is exact under
    any reuse/AQE/partition-count setting (pinned by the parity suite,
    which now runs with exchange reuse disabled too).

    ``with_ranged=True`` additionally returns the materialized
    range-partitioned frame so callers needing corpus-level statistics
    (row counts, totals) can aggregate the checkpoint blocks instead of
    replanning the source scan (round 13: kll_quantile_sketch).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = _ranged_checkpoint(df, num_partitions, order_cols)
    offs = (
        ranged.groupBy("__rank_pid")
        .agg(F.count("*").alias("__pn"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__pn").over(
                    # P-row frame: single-partition by design, bounded
                    Window.orderBy("__rank_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__rank_pid", "__off")
    )
    ranked = (
        ranged.join(F.broadcast(offs), "__rank_pid")
        .withColumn(
            rank_col,
            F.col("__off")
            + F.row_number().over(
                Window.partitionBy("__rank_pid").orderBy(*order_cols)
            ),
        )
        .drop("__rank_pid", "__off")
    )
    if with_ranged:
        return ranked, ranged.drop("__rank_pid")
    return ranked


def ntile_expr(rank_col: str, total_col: str, k: int) -> Column:
    """``ntile(k)`` of a precomputed global rank: exact integer closed
    form of Spark/ANSI tile sizing (first ``n % k`` tiles get one extra
    row). ``total_col`` is the row count (e.g. from a broadcast 1-row
    stats frame); integer ``div`` throughout — float division would
    round past 2^53."""
    r, n = rank_col, total_col
    return (
        F.expr(
            f"1 + CASE WHEN {r} <= ({n} % {k}) * ({n} div {k} + 1)"
            f" THEN ({r} - 1) div ({n} div {k} + 1)"
            f" ELSE ({n} % {k})"
            f"  + ({r} - ({n} % {k}) * ({n} div {k} + 1) - 1)"
            f"    div greatest({n} div {k}, 1) END"
        )
    ).cast("int")


def global_rank_cumsum(
    df: DataFrame,
    value_col: str,
    *order_cols: Column | str,
    rank_col: str = "rk",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus global rank AND inclusive prefix sum of ``value_col``
    in the total order of ``order_cols`` — the distributed form of
    ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``.

    Same two-phase shape as :func:`global_rank`: range-partition, compute
    the partition-local rank/cumsum, then add each partition's exclusive
    predecessor totals from a broadcast P-row frame. Coverage curves,
    Lorenz/Gini accumulations, and quantile boundary scans all reduce to
    this without a single-partition window.

    Same one-materialization invariant as :func:`global_rank`
    (the ranged frame is eagerly checkpointed).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = _ranged_checkpoint(df, num_partitions, order_cols)
    offs = (
        ranged.groupBy("__rank_pid")
        .agg(
            F.count("*").alias("__pn"),
            F.sum(value_col).alias("__pv"),
        )
        .select(
            "__rank_pid",
            F.coalesce(
                F.sum("__pn").over(
                    Window.orderBy("__rank_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__off"),
            F.coalesce(
                F.sum("__pv").over(
                    Window.orderBy("__rank_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__voff"),
        )
    )
    local = Window.partitionBy("__rank_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offs), "__rank_pid")
        .withColumn(rank_col, F.col("__off") + F.row_number().over(local))
        .withColumn(
            cum_col,
            F.col("__voff")
            + F.sum(value_col).over(
                local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("__rank_pid", "__off", "__voff")
    )
