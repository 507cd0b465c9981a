"""Table loaders for the driver's synthetic datasets (TESTDATA.md).

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark surfaces it as a
long of nanoseconds. ``load_table`` normalizes it back to a proper
TimestampType (µs precision — identical truncation to what DuckDB and
pandas apply), so every operator downstream sees a clean schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # normalize any nanos-as-long timestamp columns back to TimestampType
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer `div`, NOT `/`: double division of ~1.7e18 ns only
            # carries ~0.25 µs precision and can round across the
            # microsecond boundary, diverging from DuckDB's exact
            # truncation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


_BYTES_PER_PARTITION = 256 * 1024


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the scan produced too few partitions — and
    never to more partitions than the data justifies.

    Small single-file tables (documents/embeddings at test scale) arrive
    as one partition, serializing CPU-heavy expressions (md5 minhash,
    dot products). But blanket-repartitioning a 1 MB table to
    defaultParallelism is just as wrong: 32 near-empty tasks cost more
    in scheduling and (for pandas-UDF stages) python-worker startup than
    the work itself. Target ≈256 KB of input per partition, capped at
    defaultParallelism. At 100 TB the scan already yields thousands of
    partitions and this whole function is a plan-time no-op.
    """
    if min_partitions is None:
        size = sum(
            os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
            for f in df.inputFiles()
            if os.path.exists(f[len("file:"):] if f.startswith("file:") else f)
        )
        by_size = max(1, size // _BYTES_PER_PARTITION)
        min_partitions = int(
            min(by_size, df.sparkSession.sparkContext.defaultParallelism)
        )
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
