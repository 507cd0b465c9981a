"""Incremental record linkage at ingest — the streaming face of
``fs_linkage_weights`` (pipeline/linkage.py).

Batch linkage assumes the master file is at rest; an MDM/customer-dedup
pipeline also needs the ingest-time question — "which records arriving
NOW match a record we already hold?" — answered while the stream runs.
Per micro-batch (foreachBatch):

1. normalize the batch to the registry grain (+ a balance BAND key);
2. score batch-vs-batch pairs (a batch can carry its own near-matches);
3. score batch-vs-registry pairs (every record ever admitted);
4. append the scored pairs to the match log, then the batch rows to the
   record registry (manifest-committed, pipeline/registry_manifest.py).

Blocking: streaming cannot use the batch operator's sorted-neighborhood
(a global sort order is not maintainable incrementally — every arrival
would shift positions). The incremental form blocks on
``(nation, balance-band)`` with the probe side exploded to bands
``b−1, b, b+1``: the band width (10 000 cents) is ≥ 2× the agreement
tolerance (5 000), so every pair the balance-agreement predicate could
ever score TRUE is guaranteed to share a probed band — candidate recall
for the match class is exact by construction, not probabilistic. Pairs
whose balances differ by more than one band are out of tolerance and
can only be 'possible'/'non_match' edge patterns; the parity test pins
the emitted set against a batch recomputation with the SAME blocking.

Scale shape: the probe join is keyed (nation, band) — 3 keys per new
row, never a block scan; the registry is manifest-read so concurrent
compaction is invisible; scoring is the map-side integer log-odds
expression shared with the batch operator (same constants imported, so
the two faces cannot drift). Write order is matches-first: a crash
between the two writes re-emits matches on retry (at-least-once)
rather than silently losing them — the same discipline as
streaming_dedup.
"""

from __future__ import annotations

try:  # pragma: no cover — executor-side pickling hygiene
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.linkage import (
    BAL_TOL_CENTS,
    MATCH_MIN,
    POSSIBLE_MIN,
    W_BAL_A,
    W_BAL_D,
    W_NAME_A,
    W_NAME_D,
    W_SEG_A,
    W_SEG_D,
)
from eventsourcing_spark.queries import DEC

REG_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long,"
    " c_mktsegment string, bal_c long, band long"
)
# band width in cents; must stay >= 2 * BAL_TOL_CENTS for the ±1-band
# probe to cover the balance-agreement tolerance exactly
BAND_WIDTH = 10_000
assert BAND_WIDTH >= 2 * BAL_TOL_CENTS


def prep_records(df: DataFrame) -> DataFrame:
    """Normalize raw customer rows to the registry grain."""
    bal_c = (F.col("c_acctbal").cast(DEC) * 100).cast("long")
    return df.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
        bal_c.alias("bal_c"),
        (bal_c - (bal_c % BAND_WIDTH)).cast("long").alias("band"),
    )


def _score(pairs: DataFrame) -> DataFrame:
    """FS agreement pattern + weight + decision over an aliased pair
    frame (sides ``a``/``b``) — the batch operator's constants."""
    agr_seg = F.col("a.c_mktsegment") == F.col("b.c_mktsegment")
    agr_bal = F.abs(F.col("a.bal_c") - F.col("b.bal_c")) <= BAL_TOL_CENTS
    agr_name = F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1
    bit = lambda c: F.when(c, F.lit("1")).otherwise(F.lit("0"))  # noqa: E731
    weight = (
        F.when(agr_seg, F.lit(W_SEG_A)).otherwise(F.lit(W_SEG_D))
        + F.when(agr_bal, F.lit(W_BAL_A)).otherwise(F.lit(W_BAL_D))
        + F.when(agr_name, F.lit(W_NAME_A)).otherwise(F.lit(W_NAME_D))
    ).cast("long")
    return pairs.select(
        F.least(F.col("a.c_custkey"), F.col("b.c_custkey")).alias("id_a"),
        F.greatest(F.col("a.c_custkey"), F.col("b.c_custkey")).alias("id_b"),
        F.concat(bit(agr_seg), bit(agr_bal), bit(agr_name)).alias("pattern"),
        weight.alias("weight_micro"),
        F.when(weight >= MATCH_MIN, F.lit("match"))
        .when(weight >= POSSIBLE_MIN, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


def banded_pairs(new_side: DataFrame, base_side: DataFrame) -> DataFrame:
    """Scored candidate pairs between ``new_side`` and ``base_side``
    under (nation, band±1) blocking, normalized to id_a < id_b and
    deduplicated (a same-frame self-pairing arrives once per
    direction)."""
    probe = new_side.withColumn(
        "probe_band",
        F.explode(
            F.array(
                F.col("band") - BAND_WIDTH,
                F.col("band"),
                F.col("band") + BAND_WIDTH,
            )
        ),
    )
    joined = probe.alias("a").join(
        base_side.alias("b"),
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.probe_band") == F.col("b.band"))
        & (F.col("a.c_custkey") != F.col("b.c_custkey")),
    )
    return _score(joined).distinct()


def linkage_batch(batch_df: DataFrame, registry_dir: str) -> DataFrame:
    """Steps 1-3 on one micro-batch (also usable on a static frame):
    within-batch pairs plus batch-vs-registry pairs, non-matches
    dropped (the match log records evidence, not the cross product)."""
    from eventsourcing_spark.pipeline.registry_manifest import read_registry

    batch = prep_records(batch_df)
    base = read_registry(batch_df.sparkSession, registry_dir, REG_SCHEMA)
    within = banded_pairs(batch, batch)
    cross = banded_pairs(batch, base)
    return (
        within.unionByName(cross)
        .filter(F.col("decision") != "non_match")
        .distinct()
    )


def linkage_at_ingest(
    stream_records: DataFrame,
    matches_dir: str,
    registry_dir: str,
    checkpoint_dir: str,
):
    """Wire a customer-record stream through incremental linkage.
    Returns the started streaming query (availableNow trigger)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from eventsourcing_spark.pipeline.registry_manifest import append_df

        matches = linkage_batch(batch_df, registry_dir).persist()
        try:
            if not matches.isEmpty():
                matches.write.mode("append").parquet(matches_dir)
            # epoch-keyed like streaming_bootstrap/streaming_nb: a
            # foreachBatch RETRY replaces the epoch's unit instead of
            # appending the batch's rows to the registry a second time
            # (unbounded duplicate state otherwise).
            append_df(
                prep_records(batch_df),
                registry_dir,
                epoch_key=f"link-{epoch_id}",
            )
        finally:
            matches.unpersist()

    return (
        stream_records.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
