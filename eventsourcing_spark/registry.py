"""Single import point that registers every gate query.

Importing this module populates ``eventsourcing_spark.queries.SPARK_QUERIES``
/ ``ORACLE_SQL`` with the full registry. ``__spark_entry__`` and the
tools (check_correctness, scale_audit, bench) all import here so a new
query module only needs to be added once.
"""

from __future__ import annotations

import eventsourcing_spark.analytics  # noqa: F401
import eventsourcing_spark.maintenance.gate  # noqa: F401
import eventsourcing_spark.pipeline.bpe  # noqa: F401
import eventsourcing_spark.pipeline.c4  # noqa: F401
import eventsourcing_spark.pipeline.chunking  # noqa: F401
import eventsourcing_spark.pipeline.clustering  # noqa: F401
import eventsourcing_spark.pipeline.curation  # noqa: F401
import eventsourcing_spark.pipeline.expectations  # noqa: F401
import eventsourcing_spark.pipeline.graph  # noqa: F401
import eventsourcing_spark.pipeline.html_extract  # noqa: F401
import eventsourcing_spark.pipeline.kll  # noqa: F401
import eventsourcing_spark.pipeline.linkage  # noqa: F401
import eventsourcing_spark.pipeline.mixing  # noqa: F401
import eventsourcing_spark.pipeline.multimodal  # noqa: F401
import eventsourcing_spark.pipeline.nb_classifier  # noqa: F401
import eventsourcing_spark.pipeline.normalize  # noqa: F401
import eventsourcing_spark.pipeline.pii  # noqa: F401
import eventsourcing_spark.pipeline.quality  # noqa: F401
import eventsourcing_spark.pipeline.queries  # noqa: F401
import eventsourcing_spark.pipeline.retrieval  # noqa: F401
import eventsourcing_spark.pipeline.ridge  # noqa: F401
import eventsourcing_spark.pipeline.setjoin  # noqa: F401
import eventsourcing_spark.pipeline.similarity  # noqa: F401
import eventsourcing_spark.pipeline.stylometry  # noqa: F401
import eventsourcing_spark.sketches  # noqa: F401
import eventsourcing_spark.timeseries  # noqa: F401
import eventsourcing_spark.tpch  # noqa: F401
from eventsourcing_spark.queries import ORACLE_SQL, SPARK_QUERIES

__all__ = ["ORACLE_SQL", "SPARK_QUERIES"]
