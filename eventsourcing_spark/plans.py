"""Physical-plan audit helpers — "is this the plan you'd want at 100 TB?"

The engine's efficiency story rests on plan *shape*: filters pushed to
the parquet scan, small sides broadcast, aggregation partials before the
shuffle, no cartesian blowups, python stages only where semantics demand
them. These helpers turn ``df.explain("formatted")`` into data so both
the test suite (tests/test_plans.py) and users can assert those
properties instead of eyeballing plan dumps.

Usage::

    from eventsourcing_spark.plans import plan_stats
    stats = plan_stats(df)
    assert stats["CartesianProduct"] == 0
    assert stats["Exchange"] <= 1            # one shuffle, no more
    assert stats["pushed_filters"]           # predicate reached the scan
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

# node kinds worth counting when judging a plan's scale behavior
_NODES = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Sort",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "WholeStageCodegen",
)


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text of a DataFrame, captured."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_nodes(plan: str, node: str) -> int:
    """Occurrences of a physical node, counted from the numbered detail
    section (the tree section would double-count)."""
    return len(re.findall(rf"\(\d+\) {node}\b", plan))


def plan_stats(df_or_plan: DataFrame | str) -> dict:
    """Summarize a physical plan for scale review.

    Returns node counts for every kind in ``_NODES`` plus:

    * ``pushed_filters`` — predicates that reached the parquet reader;
    * ``read_schemas`` — the pruned column sets actually scanned;
    * ``scans`` — number of file scans.
    """
    plan = (
        df_or_plan if isinstance(df_or_plan, str) else formatted_plan(df_or_plan)
    )
    stats: dict = {node: count_nodes(plan, node) for node in _NODES}
    stats["scans"] = len(re.findall(r"\(\d+\) Scan ", plan))
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            pushed.extend(p.strip() for p in m.group(1).split(","))
    stats["pushed_filters"] = pushed
    stats["read_schemas"] = re.findall(r"ReadSchema: (\S+)", plan)
    return stats


def audit(df: DataFrame, *, max_exchanges: int | None = None) -> list[str]:
    """Heuristic red flags for a plan headed to a large cluster.

    Returns human-readable warnings (empty list = clean):
    cartesian products, row-at-a-time python in the hot path, and —
    when ``max_exchanges`` is given — too many shuffles.
    """
    stats = plan_stats(df)
    warnings: list[str] = []
    if stats["CartesianProduct"]:
        warnings.append(
            f"{stats['CartesianProduct']} CartesianProduct node(s): O(n·m) at scale"
        )
    if stats["BatchEvalPython"]:
        warnings.append(
            f"{stats['BatchEvalPython']} row-at-a-time python stage(s): "
            "use Arrow-batched pandas UDFs"
        )
    if max_exchanges is not None and stats["Exchange"] > max_exchanges:
        warnings.append(
            f"{stats['Exchange']} exchanges (budget {max_exchanges}): "
            "look for a reusable partitioning or a broadcast"
        )
    return warnings
