"""X13 — last-wins map merge (util/common.go:29-37).

Spark's ``map_concat`` throws on duplicate keys under the default
``spark.sql.mapKeyDedupPolicy=EXCEPTION``; the reference's MapMerge is
last-wins. This helper implements last-wins as a pure expression (fold
over entries), independent of session config — discriminator maps are
tiny, so the per-entry fold is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_merge(*maps: Column) -> Column:
    """Last-wins union of map columns: later arguments override earlier
    keys (util/common.go:29-37)."""
    entries = F.concat(*[F.map_entries(m) for m in maps])
    return F.aggregate(
        entries,
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != e.getField("key")),
            F.create_map(e.getField("key"), e.getField("value")),
        ),
    )
