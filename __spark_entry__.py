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

import eventsourcing_spark.analytics  # noqa: F401 — registers event-analytics ops
import eventsourcing_spark.pipeline.chunking  # noqa: F401 — registers chunking ops
import eventsourcing_spark.pipeline.graph  # noqa: F401 — registers graph ops
import eventsourcing_spark.pipeline.retrieval  # noqa: F401 — registers retrieval ops
import eventsourcing_spark.pipeline.clustering  # noqa: F401 — registers k-means op
import eventsourcing_spark.pipeline.queries  # noqa: F401 — registers pipeline ops
import eventsourcing_spark.pipeline.similarity  # noqa: F401 — registers similarity ops
import eventsourcing_spark.pipeline.curation  # noqa: F401 — registers curation ops
import eventsourcing_spark.pipeline.mixing  # noqa: F401 — registers mixing ops
import eventsourcing_spark.pipeline.setjoin  # noqa: F401 — registers set-similarity join
import eventsourcing_spark.sketches  # noqa: F401 — registers sketch estimators
import eventsourcing_spark.tpch  # noqa: F401 — registers extended TPC-H ops
from eventsourcing_spark.queries import ORACLE_SQL, SPARK_QUERIES

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
