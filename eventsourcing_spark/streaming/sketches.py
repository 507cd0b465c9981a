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

# Worker-closure hygiene: the stateful process functions below reference
# module-level helpers and run on executors; register this module for
# by-value pickling so they stay executable under a session with no
# PYTHONPATH export (see pipeline/media_codecs.py for the full rationale).
try:  # pragma: no cover
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

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


# ---------------------------------------------------------------------------
# Streaming count-min maintenance. Unlike HLL's max-merge, CMS counters
# ADD-combine — which is NOT idempotent: re-merging a replayed batch
# double-counts. So the maintainer applies the reference's checkpoint-
# rejection rule (projection/checkpoints.go:75-91 — reject anything at
# or below the last applied position) to sketch state: the stored frame
# carries the last applied epoch id, and a batch whose epoch is not
# strictly greater is dropped. Counters + epoch commit in ONE directory
# overwrite (the epoch rides as a depth=-1 marker row), so state and
# watermark can't diverge; a cluster deployment swaps the directory for
# a Delta MERGE in one txn and keeps the same algebra.
# ---------------------------------------------------------------------------

CMS_SCHEMA = "depth int, bucket bigint, cnt bigint"
_EPOCH_DEPTH = -1


def _split_cms(df: DataFrame):
    from pyspark.sql import functions as F

    counters = df.filter(F.col("depth") != _EPOCH_DEPTH)
    epoch_rows = df.filter(F.col("depth") == _EPOCH_DEPTH).collect()
    epoch = epoch_rows[0]["cnt"] if epoch_rows else -1
    return counters, epoch


def cms_maintain(
    stream_df: DataFrame,
    counters_dir: str,
    checkpoint_dir: str,
    value_col: str,
):
    """Maintain count-min counters over a stream (availableNow drain)."""
    from pyspark.sql import functions as F

    from eventsourcing_spark.sketches import cms_counters

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        stored_all = read_registers(spark, counters_dir, [], CMS_SCHEMA)
        stored, applied_epoch = _split_cms(stored_all)
        if epoch_id <= applied_epoch:
            return  # replayed batch: add-merge is not idempotent, reject
        batch_counters = cms_counters(batch_df, value_col).select(
            F.col("depth").cast("int"),
            F.col("bucket").cast("long"),
            F.col("cnt").cast("long"),
        )
        merged = (
            stored.unionByName(batch_counters)
            .groupBy("depth", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        rows = merged.collect()  # bounded: O(D×W) cells by construction
        out = spark.createDataFrame(rows, CMS_SCHEMA).unionByName(
            spark.createDataFrame(
                [(_EPOCH_DEPTH, -1, int(epoch_id))], CMS_SCHEMA
            )
        )
        out.coalesce(1).write.mode("overwrite").parquet(counters_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_cms_estimate(spark, counters_dir: str, keys) -> DataFrame:
    """Point-query the maintained counters: min over depths per key."""
    from pyspark.sql import functions as F

    from eventsourcing_spark.sketches import _CMS_D, _cms_bucket

    counters, _ = _split_cms(
        read_registers(spark, counters_dir, [], CMS_SCHEMA)
    )
    probes = spark.createDataFrame([(k,) for k in keys], "key long")
    pb = None
    for d in range(_CMS_D):
        arm = probes.select(
            "key",
            F.lit(d).alias("depth"),
            _cms_bucket(d, F.col("key")).alias("bucket"),
        )
        pb = arm if pb is None else pb.unionByName(arm)
    return (
        pb.join(counters, ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
        )
    )


# ---------------------------------------------------------------------------
# Streaming KMV maintenance — the third merge algebra: the k smallest
# distinct hashes per group. Union-then-take-k-smallest is commutative,
# associative, AND idempotent (re-merging any batch is a no-op, like
# HLL's max and unlike CMS's add), so no epoch guard is needed; the
# stored state is ≤ k rows per group regardless of stream volume.
# ---------------------------------------------------------------------------

KMV_STATE_SCHEMA = "grp string, h bigint"


def kmv_maintain(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
):
    """Maintain per-group k-minimum-value sketches over a stream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eventsourcing_spark.sketches import KMV_K, _h32

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = batch_df.select(
            F.col(group_col).cast("string").alias("grp"),
            _h32(F.col(value_col)).alias("h"),
        ).distinct()
        stored = read_registers(spark, state_dir, [], KMV_STATE_SCHEMA)
        w = Window.partitionBy("grp").orderBy("h")
        merged = (
            stored.unionByName(batch_sk)
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .select("grp", "h")
        )
        rows = merged.collect()  # bounded: ≤ k rows per group
        spark.createDataFrame(rows, KMV_STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_kmv_estimate(spark, state_dir: str) -> DataFrame:
    """Distinct-count estimates from the maintained per-group sketches."""
    from pyspark.sql import functions as F

    from eventsourcing_spark.sketches import KMV_K, _U32

    sk = read_registers(spark, state_dir, [], KMV_STATE_SCHEMA)
    agg = sk.groupBy("grp").agg(
        F.max("h").alias("h_k"), F.count("*").alias("n_in_sketch")
    )
    est = F.when(
        F.col("n_in_sketch") < KMV_K, F.col("n_in_sketch")
    ).otherwise(F.expr(f"({KMV_K - 1} * {_U32}) div h_k"))
    return agg.select("grp", est.cast("long").alias("kmv_estimate"))


# ---------------------------------------------------------------------------
# SpaceSaving top-k maintenance (Metwally, Agrawal & El Abbadi 2005) —
# heavy hitters at HARD-bounded state: exactly K counters regardless of
# stream volume or key cardinality (the complete-mode heavy-hitter
# query in streaming/windows.py keeps one row per key; this keeps K).
# Per micro-batch: per-key batch counts fold into the counter table;
# an unseen key evicts the current minimum and inherits its count as
# overestimation error. Guarantee maintained across batches: any key
# with true count > N/K is in the table, and every stored (count,
# error) brackets the true count: count − error ≤ true ≤ count.
# The counter table commits with the processed-N and epoch in one
# directory overwrite (same effectively-once discipline as CMS — the
# fold is order-sensitive, so replays must be rejected, not absorbed).
# ---------------------------------------------------------------------------

SS_K = 16
SS_SCHEMA = "key string, cnt bigint, err bigint"
_SS_META_KEY = "__meta__"  # carries (epoch, N) in (cnt, err)


def _ss_split(df: DataFrame):
    from pyspark.sql import functions as F

    counters = [
        (r["key"], r["cnt"], r["err"])
        for r in df.filter(F.col("key") != _SS_META_KEY).collect()
    ]
    meta = df.filter(F.col("key") == _SS_META_KEY).collect()
    epoch = meta[0]["cnt"] if meta else -1
    total = meta[0]["err"] if meta else 0
    return counters, epoch, total


def space_saving_maintain(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    k: int = SS_K,
):
    """Maintain a K-counter SpaceSaving summary over a stream."""
    from pyspark.sql import functions as F

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        stored = read_registers(spark, state_dir, [], SS_SCHEMA)
        counters, applied_epoch, total = _ss_split(stored)
        if epoch_id <= applied_epoch:
            return  # replay: the fold is order-sensitive, reject
        batch = (
            batch_df.select(F.col(value_col).cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count("*").alias("c"))
            .collect()
        )  # bounded by batch key cardinality; the STORED state is K rows
        table = {key: (cnt, err) for key, cnt, err in counters}
        for r in sorted(batch, key=lambda r: (-r["c"], r["key"])):
            key, c = r["key"], r["c"]
            total += c
            if key in table:
                cnt, err = table[key]
                table[key] = (cnt + c, err)
            elif len(table) < k:
                table[key] = (c, 0)
            else:
                evict, (mn, _) = min(
                    table.items(), key=lambda kv: (kv[1][0], kv[0])
                )
                del table[evict]
                table[key] = (mn + c, mn)
        rows = [(key, cnt, err) for key, (cnt, err) in table.items()]
        rows.append((_SS_META_KEY, int(epoch_id), total))
        spark.createDataFrame(rows, SS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def space_saving_topk(spark, state_dir: str) -> DataFrame:
    """Current summary: (key, cnt, err); true count in [cnt-err, cnt]."""
    from pyspark.sql import functions as F

    return read_registers(spark, state_dir, [], SS_SCHEMA).filter(
        F.col("key") != _SS_META_KEY
    )
