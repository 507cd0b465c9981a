"""Sharded training-export round-trip (pipeline.export).

Writes the documents table as shard-partitioned parquet in deterministic
shuffle order, reads it back, and checks the three properties training
ingestion relies on: no docs lost, the on-disk layout is one directory
per shard, and (shard, pos) ordering reproduces shuffle_shard_assign
exactly.
"""

from __future__ import annotations

import os

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline import export
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_shard_export_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    export.export_documents(spark, SF, out, max_records_per_file=50)

    docs = load_table(spark, SF, "documents")
    back = export.read_training_shards(spark, out)
    assert back.count() == docs.count()

    # layout: hive-partitioned by shard, every dir two hex chars
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert shard_dirs and all(len(d) == len("shard=") + 2 for d in shard_dirs)

    # order parity with the gate query: same (doc_id → shard, pos) map
    expected = {
        r.doc_id: (r.shard, r.pos)
        for r in SPARK_QUERIES["shuffle_shard_assign"](spark, SF).collect()
    }
    got = {r.doc_id: (r.shard, r.pos) for r in back.collect()}
    assert got == expected

    # bounded files: with max_records_per_file=50, no file exceeds 50 rows
    for d in shard_dirs:
        files = [
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        ]
        assert files
        for f in files:
            n = spark.read.parquet(os.path.join(out, d, f)).count()
            assert n <= 50


def test_jsonl_export_roundtrip(spark, sf_dir, tmp_path):
    import os

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.export import (
        read_jsonl_shards,
        write_jsonl_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(docs, out, shard_hex_chars=1, compression=None)

    # one directory per shard, line-delimited json inside
    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert shards
    back = read_jsonl_shards(spark, out)
    assert back.count() == docs.count()
    # same content (doc_id set) and a total order under (shard, pos)
    assert (
        back.select("doc_id").distinct().count()
        == docs.select("doc_id").distinct().count()
    )
    ordered = back.orderBy("shard", "pos").select("doc_id").collect()
    assert len(ordered) == docs.count()
