"""Registry compaction: file count shrinks, the key SET is untouched,
and suppression behavior is bit-identical before/after (semi-join
probes cannot see file layout or duplicate keys)."""

from __future__ import annotations

import pytest

from eventsourcing_spark.pipeline.registry_maintenance import (
    _dir_stats,
    compact_registry,
)
from eventsourcing_spark.pipeline.streaming_dedup import (
    dedup_at_ingest,
    dedup_batch,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "out", "reg", "cp")}


def _ingest_batches(spark, dirs, n_batches=6):
    for b in range(n_batches):
        rows = [
            (b * 10 + i, f"content {b} {i} unique", "en") for i in range(5)
        ]
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["src"])
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(dirs["src"])
        q = dedup_at_ingest(stream, dirs["out"], dirs["reg"], dirs["cp"])
        q.awaitTermination(120)


def test_compaction_shrinks_files_and_preserves_suppression(spark, dirs):
    _ingest_batches(spark, dirs)
    files_before, _ = _dir_stats(dirs["reg"])
    assert files_before >= 6  # one append per drained batch

    keys_before = {
        r.text_hash for r in spark.read.parquet(dirs["reg"]).collect()
    }
    stats = compact_registry(spark, dirs["reg"], ["text_hash"], n_files=2)
    assert stats["files_before"] == files_before
    assert stats["files_after"] < files_before
    assert stats["keys"] == len(keys_before)

    keys_after = {
        r.text_hash for r in spark.read.parquet(dirs["reg"]).collect()
    }
    assert keys_after == keys_before

    # A replay of already-admitted content is still fully suppressed;
    # novel content still passes.
    replay = spark.createDataFrame(
        [(99, "content 0 0 unique", "en"), (100, "brand new thing", "en")],
        DOCS_SCHEMA,
    )
    fresh = dedup_batch(replay, dirs["reg"])
    assert [r.doc_id for r in fresh.collect()] == [100]


def test_compaction_folds_duplicate_keys(spark, tmp_path):
    reg = str(tmp_path / "reg")
    df = spark.createDataFrame(
        [("h1",), ("h2",)], "text_hash string"
    )
    for _ in range(4):  # at-least-once retries append the same keys
        df.coalesce(1).write.mode("append").parquet(reg)
    assert spark.read.parquet(reg).count() == 8
    stats = compact_registry(spark, reg, ["text_hash"])
    assert stats["keys"] == 2 and stats["rows_before"] == 8
    assert spark.read.parquet(reg).count() == 2


def test_compaction_aborts_on_concurrent_append(spark, tmp_path, monkeypatch):
    """A micro-batch file landing between the rewrite scan and the swap
    must abort the compaction (loud error, registry untouched) instead
    of being silently deleted with the old directory."""
    import eventsourcing_spark.pipeline.registry_maintenance as rm

    reg = str(tmp_path / "reg")
    df = spark.createDataFrame([("h1",), ("h2",)], "text_hash string")
    df.coalesce(1).write.mode("append").parquet(reg)

    real_fp = rm._key_fingerprint
    state = {"fired": False}

    def fp_with_injected_append(frame, key_cols):
        # second call = tmp verification, i.e. inside the compaction
        # window: append a new key file to the LIVE registry first.
        if state["fired"]:
            spark.createDataFrame(
                [("h3-late",)], "text_hash string"
            ).coalesce(1).write.mode("append").parquet(reg)
        state["fired"] = True
        return real_fp(frame, key_cols)

    monkeypatch.setattr(rm, "_key_fingerprint", fp_with_injected_append)
    with pytest.raises(RuntimeError, match="ingest not quiesced"):
        rm.compact_registry(spark, reg, ["text_hash"])
    # The late key survives — nothing was deleted.
    keys = {r.text_hash for r in spark.read.parquet(reg).collect()}
    assert "h3-late" in keys and keys >= {"h1", "h2"}


def test_compaction_noop_on_missing_dir(spark, tmp_path):
    stats = compact_registry(spark, str(tmp_path / "nope"), ["text_hash"])
    assert stats == {
        "files_before": 0, "files_after": 0, "keys": 0, "rows_before": 0
    }
