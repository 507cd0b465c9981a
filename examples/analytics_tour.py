"""Event-log analytics tour. Run: python examples/analytics_tour.py

The reporting layer an event store grows: the same `events` table that
drives rehydration/projections answers analyst questions as declarative
Spark plans — no second system, no ETL copy.

  1. funnel          — view → click → purchase conversion, one shuffle
  2. rolling         — trailing-7-day per-user spend (RANGE frame)
  3. SCD2            — "state as of T" as validity intervals + point probe
  4. outliers        — per-user MAD anomaly counts (window medians)
  5. pivot           — user × event-type feature matrix
  6. clustering      — Lloyd k-means over embeddings (integer-exact)
  7. centrality      — PageRank over the LSH near-duplicate graph

Each op also runs under the DuckDB value-hash oracle gate
(tools/check_correctness.py) — this tour shows the API, not the proof.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import eventsourcing_spark.analytics  # noqa: F401
import eventsourcing_spark.pipeline.clustering  # noqa: F401
import eventsourcing_spark.pipeline.graph  # noqa: F401
from eventsourcing_spark import get_spark
from eventsourcing_spark.queries import SPARK_QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("analytics-tour")
    spark.sparkContext.setLogLevel("ERROR")

    f = SPARK_QUERIES["funnel_conversion"](spark, SF).first()
    print(
        f"funnel: {f['n_viewed']} viewed -> {f['n_clicked_after_view']} clicked "
        f"-> {f['n_purchased_after_click']} purchased"
    )

    roll = SPARK_QUERIES["rolling_7d_value"](spark, SF)
    peak = roll.orderBy(F.desc("rolling_sum")).first()
    print(
        f"rolling 7d: peak user {peak['user_id']} hit "
        f"{peak['rolling_sum']:.2f} over {peak['rolling_n']} events"
    )

    scd = SPARK_QUERIES["scd2_intervals"](spark, SF)
    probe_ms = scd.agg(F.expr("percentile(valid_from_ms, 0.5)")).first()[0]
    asof = scd.filter(
        (F.col("valid_from_ms") <= probe_ms)
        & (F.col("valid_to_ms").isNull() | (F.col("valid_to_ms") > probe_ms))
    )
    print(f"scd2: {asof.count()} users have a live interval at t={int(probe_ms)}")

    mad = SPARK_QUERIES["mad_outliers"](spark, SF)
    worst = mad.orderBy(F.desc("n_outliers")).first()
    print(
        f"outliers: user {worst['user_id']} has {worst['n_outliers']}/"
        f"{worst['n_events']} events beyond 3 MAD"
    )

    piv = SPARK_QUERIES["pivot_event_matrix"](spark, SF)
    buyer = piv.orderBy(F.desc("n_purchase")).first()
    print(f"pivot: heaviest buyer user {buyer['user_id']} ({buyer['n_purchase']} purchases)")

    km = SPARK_QUERIES["kmeans_clusters"](spark, SF).orderBy(F.desc("n_members"))
    top = km.first()
    print(f"kmeans: largest of {km.count()} clusters holds {top['n_members']} vectors")

    pr = SPARK_QUERIES["pagerank_neardup"](spark, SF).first()
    print(
        f"pagerank: most central vector {pr['vec_id']} "
        f"(degree {pr['degree']}, rank {pr['rank_scaled'] / 1e6:.3f})"
    )


if __name__ == "__main__":
    main()
