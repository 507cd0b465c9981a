"""Incremental record linkage: the streamed match log equals a batch
recomputation under the same blocking, and the registry is
manifest-committed.

The pair evidence is deterministic integers (pattern + micro-weight),
so parity is exact set equality, not row counts.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.streaming_linkage import (
    banded_pairs,
    linkage_at_ingest,
    prep_records,
)

RAW_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long,"
    " c_acctbal double, c_mktsegment string"
)

# three ingest batches with known cross-batch near-matches:
#  - 1 vs 101: same nation/segment, balance within tolerance, name
#    edit-distance 1  -> pattern 111, match
#  - 2 vs 102: same nation, balance close, different segment -> 011
#  - 3 vs 103: same nation/segment, balance far (2 bands away), name
#    edit 1 -> never paired (out of band reach) — the documented
#    blocking bound, asserted absent
#  - 4 vs 5 within one batch: same nation/segment, close balance -> 110
BATCHES = [
    [
        (1, "Customer#000000001", 7, 100.00, "BUILDING"),
        (2, "Customer#000000002", 7, 5000.00, "MACHINERY"),
        (3, "Customer#000000003", 7, 900.00, "AUTOMOBILE"),
        (4, "Customer#000000004", 3, 777.00, "HOUSEHOLD"),
        (5, "Customer#000000905", 3, 790.00, "HOUSEHOLD"),
    ],
    [
        (101, "Customer#000000091", 7, 120.00, "BUILDING"),
        (102, "Customer#000000202", 7, 5010.00, "FURNITURE"),
    ],
    [
        (103, "Customer#000000103", 7, 90900.00, "AUTOMOBILE"),
        (104, "Customer#000000104", 19, 5.00, "BUILDING"),
    ],
]


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "matches", "reg", "cp")}


def _drain(spark, dirs):
    stream = spark.readStream.schema(RAW_SCHEMA).parquet(dirs["src"])
    q = linkage_at_ingest(stream, dirs["matches"], dirs["reg"], dirs["cp"])
    q.awaitTermination(120)


def _pairs(df):
    return {
        (r.id_a, r.id_b, r.pattern, r.weight_micro, r.decision)
        for r in df.collect()
    }


def test_streamed_matches_equal_batch_recompute(spark, dirs):
    all_rows = []
    for batch in BATCHES:
        spark.createDataFrame(batch, RAW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["src"])
        all_rows.extend(batch)
        _drain(spark, dirs)

    streamed = _pairs(spark.read.parquet(dirs["matches"]).distinct())

    # batch recompute: ALL pairs under the same (nation, band±1)
    # blocking over the full record set at rest
    full = prep_records(spark.createDataFrame(all_rows, RAW_SCHEMA))
    batch_pairs = _pairs(
        banded_pairs(full, full).filter(F.col("decision") != "non_match")
    )
    assert streamed == batch_pairs
    assert len(streamed) > 0

    # the known cross-batch match surfaced with full agreement
    full_match = {(p[0], p[1]) for p in streamed if p[2] == "111"}
    assert (1, 101) in full_match
    # 2 vs 102 agree on balance+name-disagree pattern but not segment
    assert any(p[0] == 2 and p[1] == 102 for p in streamed)
    # the out-of-band pair is absent in BOTH faces (blocking bound)
    assert not any(p[0] == 3 and p[1] == 103 for p in streamed)
    assert not any(p[0] == 3 and p[1] == 103 for p in batch_pairs)
    # within-batch pair found in the first batch
    assert any(p[0] == 4 and p[1] == 5 for p in streamed)


def test_registry_is_manifest_committed(spark, dirs):
    for batch in BATCHES[:2]:
        spark.createDataFrame(batch, RAW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["src"])
        _drain(spark, dirs)
    assert os.path.isdir(os.path.join(dirs["reg"], "_manifests"))
    from eventsourcing_spark.pipeline.registry_manifest import read_registry
    from eventsourcing_spark.pipeline.streaming_linkage import REG_SCHEMA

    reg = read_registry(spark, dirs["reg"], REG_SCHEMA)
    assert reg.count() == len(BATCHES[0]) + len(BATCHES[1])
