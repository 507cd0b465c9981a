"""Compaction for the streaming-dedup registries.

The ingest faces (streaming_dedup, streaming_neardup,
streaming_incremental) commit one small parquet unit per micro-batch to
their registries; after a day of 30-second batches the md5/band
registries are a few thousand tiny units and every probe pays per-file
scan overhead — the same pathology maintenance/compaction.py fixes for
the events table, at the curation layer.

Round 8: registries are MANIFEST-COMMITTED
(pipeline/registry_manifest.py), which replaces the old directory-swap
compaction and its ingest-quiescence contract entirely. Compaction is
now safe under live ingest: it rewrites the units of the manifest
version it scanned, and its commit retry-loop carries forward any unit
appended concurrently — no abort path, no lost keys, no reader
missing-path window (readers resolve a manifest, never a raw
directory listing). The key set is still deduplicated and
fingerprint-verified before the commit (at-least-once retries legally
append duplicate keys; a registry is a SET, so compaction folds them;
probes are semi-joins, for which duplicates and ordering are
invisible).

``compact_registry`` is the stable entry point; it delegates to
``registry_manifest.compact_set_registry`` (upgrading a pre-manifest
directory in place on first contact). Space is reclaimed by
``registry_manifest.vacuum_registry`` after a grace period, protecting
readers that pinned an older manifest.
"""

from __future__ import annotations

import os

from eventsourcing_spark.pipeline.registry_manifest import (  # noqa: F401
    compact_set_registry,
    vacuum_registry,
)


def _dir_stats(path: str) -> tuple[int, int]:
    """(parquet file count, total bytes) under a registry directory —
    test/observability helper, counts physical files across all units."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        if os.path.basename(root) == "_manifests":
            continue
        for f in files:
            if not f.startswith((".", "_")) and f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact_registry(
    spark, registry_dir: str, key_cols: list[str], n_files: int = 4
) -> dict:
    """Fold a SET registry into ``n_files`` parquet files of distinct
    keys via a manifest commit — safe under live ingest (see module
    docstring). Returns {files_before, files_after, keys, rows_before};
    no-op on a missing/empty registry. files_before/after count
    manifest UNITS (one per committed append)."""
    if not os.path.isdir(registry_dir):
        return {"files_before": 0, "files_after": 0, "keys": 0,
                "rows_before": 0}
    return compact_set_registry(
        spark, registry_dir, key_cols, n_files=n_files
    )
