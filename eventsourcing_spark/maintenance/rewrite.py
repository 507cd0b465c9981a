"""Atomic-ish table rewrite for parquet-backed stores.

Parquet has no UPDATE/DELETE; mutation operators (M1 forget, M2
migration) rewrite the table: materialize the new frame to a sibling
temp dir, then swap directories. On a lakehouse this whole module is
replaced by Delta/Iceberg ``UPDATE``/``MERGE`` — the operators above it
only build DataFrames, so they port unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def overwrite_dir(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    tmp = f"{path}.rewrite-{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
