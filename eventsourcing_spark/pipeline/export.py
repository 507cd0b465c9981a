"""Training-shard export: materialize the deterministic shuffle order.

:func:`eventsourcing_spark.pipeline.mixing.shuffle_shard_assign` computes
the shard/position layout; this module writes it — one directory per
shard, rows inside each file in shuffle order, file sizes bounded so a
1000-executor training job can stream them without further splitting.

Scale shape: ``repartition(shard)`` co-locates each shard on one task
(shards are hash-sized, so this is balanced by construction — md5
prefixes are uniform), ``sortWithinPartitions`` orders rows inside the
shard without any global sort, and ``maxRecordsPerFile`` bounds file
size at the writer, so a mega-shard degrades into several well-ordered
files instead of one huge one. At 100 TB with 4-hex-char shards this is
65 536 independent sorted writes.

Reference parity: none — the reference (quintans/eventsourcing) has no
bulk export path; engine addition from the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.mixing import SHARD_HEX_CHARS


def shard_layout(docs: DataFrame, shard_hex_chars: int = SHARD_HEX_CHARS) -> DataFrame:
    """The export frame: every document column plus (shard, pos)."""
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.substring(h, 1, shard_hex_chars)
    w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
    return docs.withColumn("shard", shard).withColumn(
        "pos", F.row_number().over(w)
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    *,
    shard_hex_chars: int = SHARD_HEX_CHARS,
    max_records_per_file: int = 100_000,
) -> None:
    """Write ``path/shard=XX/part-*.parquet`` in deterministic shuffle
    order: partitioned by shard, sorted by position inside each file,
    file size bounded by ``max_records_per_file``."""
    layout = shard_layout(docs, shard_hex_chars)
    (
        layout.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read shards back; ordering by (shard, pos) restores the exact
    training order that was written."""
    return spark.read.parquet(path)


def export_documents(
    spark: SparkSession, sf_dir: str, path: str, **kwargs
) -> None:
    """Convenience: shard-export the driver documents table."""
    write_training_shards(load_table(spark, sf_dir, "documents"), path, **kwargs)


def write_jsonl_shards(
    docs: DataFrame,
    path: str,
    *,
    shard_hex_chars: int = SHARD_HEX_CHARS,
    max_records_per_file: int = 100_000,
    compression: str | None = "gzip",
) -> None:
    """JSONL variant of the shard export — the interchange format most
    training loaders consume directly (one JSON object per line).

    Same layout contract as :func:`write_training_shards`
    (``path/shard=XX/``, rows in shuffle order, bounded files); Spark's
    native json writer streams line-delimited output without any
    driver-side formatting, so this is the identical distributed write
    with a different encoder. ``pos`` is kept in the payload so a reader
    can re-assert order after any concatenation.
    """
    layout = shard_layout(docs, shard_hex_chars)
    writer = (
        layout.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.partitionBy("shard").json(path)


def read_jsonl_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL shard export; order restored by (shard, pos)."""
    return spark.read.json(path)
