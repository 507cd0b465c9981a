"""Batch↔streaming parity for the incremental-dedup classifier: the
same corpus replayed through the live foreachBatch path and through the
static batch rule produces identical (doc_id → status) maps and
identical admitted sets — the classification core is literally one
shared function (pipeline.queries.classify_against_index)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.queries import (
    _bands,
    classify_against_index,
)
from eventsourcing_spark.pipeline.streaming_incremental import (
    classify_batch,
    incremental_ingest,
)

DOCS_SCHEMA = "doc_id long, text string, source string"


@pytest.fixture()
def dirs(tmp_path):
    return {
        k: str(tmp_path / k)
        for k in ("src", "out", "hash", "band", "audit", "cp")
    }


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _drain(spark, d):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(d["src"])
    q = incremental_ingest(
        stream, d["out"], d["hash"], d["band"], d["audit"], d["cp"]
    )
    q.awaitTermination(120)


B1 = [
    (1, "alpha beta gamma delta", "s0"),
    (2, "alpha beta gamma delta", "s0"),   # exact dup of 1, same batch
    (3, "delta gamma beta alpha", "s0"),   # near dup of 1 (reordered)
    (4, "omicron sigma tau upsilon", "s0"),
]
B2 = [
    (5, "alpha beta gamma delta", "s1"),   # exact dup of admitted 1
    (6, "upsilon tau sigma omicron", "s1"),  # near dup of admitted 4
    (7, "kappa lambda mu nu xi", "s1"),    # novel
]


def test_stream_statuses_match_static_replay(spark, dirs):
    _write_batch(spark, dirs["src"], B1)
    _drain(spark, dirs)
    _write_batch(spark, dirs["src"], B2)
    _drain(spark, dirs)

    streamed = {
        r.doc_id: r.status
        for r in spark.read.parquet(dirs["audit"]).collect()
    }
    admitted_stream = sorted(
        r.doc_id for r in spark.read.parquet(dirs["out"]).collect()
    )

    # Static replay: the SAME shared rule, indexes built by hand from
    # what the prior batch admitted.
    hash_idx = None
    band_idx = None
    expect = {}
    admitted_static = []
    for rows in (B1, B2):
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        hi = hash_idx if hash_idx is not None else spark.createDataFrame(
            [], "text_hash string"
        )
        bi = band_idx if band_idx is not None else spark.createDataFrame(
            [], "band_id int, band_key string"
        )
        st = classify_against_index(df, hi, bi)
        nov = df.join(
            st.filter(F.col("status") == "novel").select("doc_id"), "doc_id"
        )
        # within-batch exact keeper, then near keeper (the module rule)
        h = nov.withColumn("h", F.md5("text"))
        ek_ids = h.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        ek = nov.join(ek_ids.select("doc_id"), "doc_id")
        nb = _bands(ek)
        keep_ids = nb.groupBy("band_id", "band_key").agg(
            F.min("doc_id").alias("k")
        )
        near_losers = {
            r.doc_id
            for r in nb.join(
                keep_ids, ["band_id", "band_key"]
            ).filter(F.col("doc_id") > F.col("k")).select("doc_id").distinct().collect()
        }
        for r in st.collect():
            expect[r.doc_id] = r.status
        ek_set = {r.doc_id for r in ek.select("doc_id").collect()}
        nov_set = {r.doc_id for r in nov.select("doc_id").collect()}
        for d in nov_set - ek_set:
            expect[d] = "exact_dup"
        for d in near_losers:
            expect[d] = "near_dup"
        adm = ek.join(
            spark.createDataFrame(
                [(d,) for d in near_losers] or [(-(10**9),)], "doc_id long"
            ),
            "doc_id",
            "left_anti",
        )
        admitted_static.extend(r.doc_id for r in adm.select("doc_id").collect())
        nh = adm.select(F.md5("text").alias("text_hash")).distinct()
        nb2 = _bands(adm).select("band_id", "band_key").distinct()
        hash_idx = nh if hash_idx is None else hash_idx.union(nh).distinct()
        band_idx = nb2 if band_idx is None else band_idx.union(nb2).distinct()

    assert streamed == expect
    assert admitted_stream == sorted(admitted_static)
    # Spot-check the semantics the corpus was built to exercise.
    assert streamed[2] == "exact_dup" and streamed[3] == "near_dup"
    assert streamed[5] == "exact_dup" and streamed[6] == "near_dup"
    assert streamed[7] == "novel"
    assert admitted_stream == [1, 4, 7]


def test_classify_batch_usable_statically(spark, dirs):
    df = spark.createDataFrame(B1, DOCS_SCHEMA)
    statuses, admitted = classify_batch(df, dirs["hash"], dirs["band"])
    got = {r.doc_id: r.status for r in statuses.collect()}
    assert got == {1: "novel", 2: "exact_dup", 3: "near_dup", 4: "novel"}
    assert sorted(r.doc_id for r in admitted.collect()) == [1, 4]
    # Every incoming doc gets exactly one audit row.
    assert sorted(got) == [1, 2, 3, 4]
