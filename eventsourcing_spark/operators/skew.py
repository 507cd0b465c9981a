"""Skew-resistant aggregation: two-phase salted groupBy.

Hot keys (one aggregate receiving a large fraction of events — the
classic celebrity-stream problem) overload a single reducer in a plain
``groupBy``. Salting splits every key into ``salt`` sub-keys for a
partial aggregate, then combines the partials — the hot key's work
spreads over ``salt`` tasks and the second shuffle moves only
``keys × salt`` pre-aggregated rows.

AQE's skew-join handling covers *joins*; aggregation skew still needs
this pattern (or requires the aggregate to be algebraic, which is
exactly what the two-phase split exploits). Use for algebraic
aggregates only: sum/count/min/max and compositions (avg = sum+count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # combine counts by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """``aggs``: output_name -> (fn, input_col) with fn in
    sum/count/min/max. Semantically identical to
    ``df.groupBy(keys).agg(...)`` — verified by the oracle gate — but
    skew-immune."""
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        pfn, ffn = _ALGEBRAIC[fn]
        partial_exprs.append(pfn(col).alias(f"_p_{name}"))
        final_exprs.append(ffn(f"_p_{name}").alias(name))
    partial = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    ).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
