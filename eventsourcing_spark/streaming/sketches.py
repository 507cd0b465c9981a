"""Streaming sketch maintenance: incremental distinct counts via HLL.

The batch sketch (eventsourcing_spark.sketches) is mergeable by
construction — registers max-combine — which makes incremental
maintenance trivial: per micro-batch, compute the batch's registers and
max-merge them into a stored register table. The stored state is
O(groups × 64) rows *regardless of stream volume*; that bounded-state
property is exactly why you run a sketch instead of
``approx_count_distinct`` over an ever-growing window at 100 TB/day.

Exactness of the merge (not just the estimate): max is commutative,
associative, and idempotent, so the stored registers after any
partitioning of the input into micro-batches are bit-identical to the
batch registers over the whole input — including under at-least-once
replays (re-merging a batch is a no-op). The parity test asserts frame
equality, not approximate agreement.

Registry write is read-then-overwrite through a driver-side collect:
legitimate here *by design* — the register frame is bounded tiny (the
sketch's whole point); at cluster scale you'd swap the parquet dir for
a Delta table MERGE keyed on (group, b) and keep the same algebra.

Reference parity: none — the reference counts by replaying rows
(projection/player.go count handlers); this is the scale-capable
replacement built on the same foreachBatch machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from eventsourcing_spark.sketches import (
    hll_estimate,
    hll_registers,
    merge_hll_registers,
)


def read_registers(
    spark, registers_dir: str, group_cols: list[str], schema: str
) -> DataFrame:
    if os.path.isdir(registers_dir) and any(
        f.endswith(".parquet") for f in os.listdir(registers_dir)
    ):
        return spark.read.parquet(registers_dir)
    return spark.createDataFrame([], schema)


def hll_maintain(
    stream_df: DataFrame,
    registers_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    registers_schema: str,
):
    """Maintain HLL registers over a stream (availableNow drain trigger).

    ``registers_schema`` is the DDL of the register frame, e.g.
    ``"event_type string, b bigint, m_b int"``.
    """

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_regs = hll_registers(batch_df, group_cols, value_col)
        stored = read_registers(spark, registers_dir, group_cols, registers_schema)
        merged = merge_hll_registers(
            stored, batch_regs, group_cols=group_cols
        )
        # materialize before overwriting the directory being read
        rows = merged.collect()  # bounded: O(groups × 64) by construction
        spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(registers_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_distinct_estimate(
    spark, registers_dir: str, group_cols: list[str], registers_schema: str
) -> DataFrame:
    """Current distinct-count estimate from the maintained registers."""
    regs = read_registers(spark, registers_dir, group_cols, registers_schema)
    return hll_estimate(regs, group_cols)
