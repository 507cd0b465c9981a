"""Time-series & retrieval operator tour. Run: python examples/timeseries_tour.py

The analytic shapes added on top of the event-log core:

  1. M4 downsample      — error-free line-chart buckets (min/max/first/last)
  2. sliding distinct   — exact 24 h rolling users vs the HLL sketch twin
  3. tolerance as-of    — "latest error within the hour" point-in-time join
  4. survival           — Kaplan-Meier churn curve, integer product-limit
  5. BM25 / MaxSim      — lexical and late-interaction retrieval, integer-exact
  6. skyline            — Pareto front of (length, quality) for curation

Every op here also runs under the DuckDB value-hash oracle gate
(tools/check_correctness.py); this tour shows the API shapes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.session import get_spark  # noqa: E402
from eventsourcing_spark.analytics import kaplan_meier_daily  # noqa: E402
from eventsourcing_spark.pipeline.quality import skyline_quality_length  # noqa: E402
from eventsourcing_spark.pipeline.retrieval import (  # noqa: E402
    bm25_topk,
    maxsim_hashed_retrieval,
)
from eventsourcing_spark.sketches import sketch_hll_sliding  # noqa: E402
from eventsourcing_spark.timeseries import (  # noqa: E402
    asof_tolerance_prior_error,
    m4_downsample,
    sliding_distinct_exact,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("timeseries-tour")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. M4 downsample (per-user hourly pixels)")
    m4_downsample(spark, SF_DIR).orderBy("user_id", "hour_idx").show(5)

    print("== 2. exact 24h sliding distinct vs HLL sketch")
    sliding_distinct_exact(spark, SF_DIR).orderBy("hour_idx").show(5)
    sketch_hll_sliding(spark, SF_DIR).orderBy("hr").show(5)

    print("== 3. tolerance as-of: latest error within 1h of each purchase")
    asof_tolerance_prior_error(spark, SF_DIR).orderBy("event_id").show(5)

    print("== 4. Kaplan-Meier churn survival (integer ppm)")
    kaplan_meier_daily(spark, SF_DIR).orderBy("day").show()

    print("== 5. BM25 top-20 and MaxSim hashed retrieval")
    bm25_topk(spark, SF_DIR).show(5)
    maxsim_hashed_retrieval(spark, SF_DIR).show(5)

    print("== 6. skyline: Pareto front of (n_chars, distinct-token quality)")
    skyline_quality_length(spark, SF_DIR).orderBy("doc_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
