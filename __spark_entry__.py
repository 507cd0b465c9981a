"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (snapshot-style latest state +
rehydration fold per stream) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator registry
(eventsourcing_spark.queries + pipeline.queries) for the DuckDB
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsourcing_spark.registry import ORACLE_SQL, SPARK_QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-stream account state = latest event (S5) + fold (A1)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.queries import DEC

    ev = load_table(spark, SF0001, "events")
    delta = (
        F.when(F.col("event_type") == "purchase", F.col("value").cast(DEC))
        .when(F.col("event_type") == "error", -F.col("value").cast(DEC))
        .otherwise(F.lit(0).cast(DEC))
    )
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.count("*").alias("n_events"),
        F.sum(delta).cast("double").alias("balance"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
