"""Compaction for the streaming-dedup registries.

The ingest faces (streaming_dedup, streaming_neardup,
streaming_incremental) append one small parquet file per micro-batch to
their registries; after a day of 30-second batches the md5/band
registries are a few thousand tiny files and every probe pays per-file
scan overhead — the same pathology maintenance/compaction.py fixes for
the events table, at the curation layer.

``compact_registry`` rewrites a registry into few files with the same
verified-swap discipline as compact_events (maintenance/compaction.py):
the rewrite is fingerprint-verified against the live registry BEFORE
the directory swap, and the key set is deduplicated (at-least-once
retries legally append duplicate keys; a registry is a SET, so
compaction is also the place duplicates are folded). Suppression
behavior is provably unchanged: probes are semi-joins, for which
duplicate keys and ordering are invisible.

Directory swap is os.rename — atomic on a POSIX filesystem; on an
object store, point the registry at a manifest or use a table format
with atomic commit (the same caveat compact_events carries).

CONCURRENCY CONTRACT: ingest MUST be quiesced for the duration of
``compact_registry`` (stop the streaming query, compact, restart).
Two races make live compaction unsafe without a manifest layer:

* a micro-batch file appended between the rewrite scan and the
  directory swap would be silently deleted with the old directory —
  lost dedup keys re-admit previously-suppressed duplicates with no
  error anywhere;
* a reader probing between the two renames sees a missing path and
  treats the registry as empty (the probe helpers' path-not-found
  fallback), suppressing nothing for that batch.

The first race is now *enforced*, not just documented: the live
directory's file listing is snapshotted before the rewrite scan and
re-verified immediately before the swap; any change (new, removed, or
resized file) aborts the compaction with the registry untouched. The
residual window between that final check and os.rename is a few
microseconds of pure filesystem calls — quiescing ingest remains the
contract; the check converts a violated contract from silent data loss
into a loud abort. The second race is inherent to directory-swap
storage; a manifest/table format with atomic commit is the production
answer on object stores.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F


def _dir_stats(path: str) -> tuple[int, int]:
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")) and f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def _listing_snapshot(path: str) -> frozenset[tuple[str, int]]:
    """(relative path, size) of every data file — the identity of the
    live registry contents for the pre-swap concurrent-append check."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")) and f.endswith(".parquet"):
                full = os.path.join(root, f)
                entries.append(
                    (os.path.relpath(full, path), os.path.getsize(full))
                )
    return frozenset(entries)


def _key_fingerprint(df, key_cols) -> tuple[int, int]:
    """(distinct key count, order-free fingerprint of the distinct key
    set): sum of 40-bit md5 slices over the concatenated key — the
    compact_events idiom, on the registry's SET semantics."""
    keyed = df.select(
        F.md5(F.concat_ws("\x1f", *key_cols)).alias("k")
    ).distinct()
    fp = F.conv(F.substring(F.col("k"), 1, 10), 16, 10).cast("long")
    row = keyed.agg(
        F.count("*").alias("n"), F.coalesce(F.sum(fp), F.lit(0)).alias("s")
    ).first()
    return int(row.n), int(row.s)


def compact_registry(
    spark, registry_dir: str, key_cols: list[str], n_files: int = 4
) -> dict:
    """Rewrite a registry directory into ``n_files`` parquet files of
    distinct keys. Returns {files_before, files_after, keys, rows_before};
    no-op on a missing/empty registry. Aborts (registry untouched) if
    the rewritten key set does not fingerprint-match the live one, OR if
    the live directory's file listing changed between the rewrite scan
    and the swap (a concurrent micro-batch append — see the module
    docstring's quiescence contract)."""
    if not os.path.isdir(registry_dir):
        return {"files_before": 0, "files_after": 0, "keys": 0,
                "rows_before": 0}
    files_before, _ = _dir_stats(registry_dir)
    listing_at_scan = _listing_snapshot(registry_dir)
    live = spark.read.parquet(registry_dir)
    rows_before = live.count()
    n_keys, fp = _key_fingerprint(live, key_cols)
    if n_keys == 0:
        return {"files_before": files_before, "files_after": files_before,
                "keys": 0, "rows_before": rows_before}

    compacted = (
        live.dropDuplicates(key_cols)
        .repartition(n_files, *key_cols)
    )
    tmp = f"{registry_dir}.compact-{uuid.uuid4().hex[:8]}"
    compacted.write.mode("overwrite").parquet(tmp)
    new = spark.read.parquet(tmp)
    n_new, fp_new = _key_fingerprint(new, key_cols)
    if (n_new, fp_new) != (n_keys, fp):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"registry compaction verification failed: keys "
            f"{n_keys}->{n_new}, fingerprint {fp}->{fp_new}; "
            f"registry left untouched"
        )
    listing_now = _listing_snapshot(registry_dir)
    if listing_now != listing_at_scan:
        added = sorted(p for p, _ in listing_now - listing_at_scan)
        removed = sorted(p for p, _ in listing_at_scan - listing_now)
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            "registry changed during compaction (ingest not quiesced): "
            f"+{added[:5]} -{removed[:5]}; registry left untouched — "
            "stop the streaming query before compacting"
        )
    old = f"{registry_dir}.old-{uuid.uuid4().hex[:8]}"
    os.rename(registry_dir, old)
    os.rename(tmp, registry_dir)
    shutil.rmtree(old, ignore_errors=True)

    files_after, _ = _dir_stats(registry_dir)
    return {"files_before": files_before, "files_after": files_after,
            "keys": n_keys, "rows_before": rows_before}
