"""In-process event bus routing — S14/X10 (store/eventbus.go:37-83).

The reference fans events out to subscribers whose kind pattern matches
exactly or by ``prefix*`` wildcard, through a middleware chain. In Spark
the same routing is a filter expression per subscriber applied inside a
``foreachBatch`` body; middleware = plain function composition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kind_match_expr(pattern: str, col: str = "kind") -> Column:
    """X10 — ``*``-suffix wildcard matcher (store/eventbus.go:61-83)."""
    if pattern.endswith("*"):
        return F.col(col).startswith(pattern[:-1])
    return F.col(col) == pattern


def kind_match_py(pattern: str, kind: str) -> bool:
    if pattern.endswith("*"):
        return kind.startswith(pattern[:-1])
    return kind == pattern


class EventBus:
    """Batch-oriented bus: subscribers receive the sub-frame matching
    their pattern. ``middleware`` wraps each handler (outermost first),
    mirroring store/eventbus.go:44-50."""

    def __init__(self) -> None:
        self._subs: list[tuple[str, Callable[[DataFrame], None]]] = []
        self._middleware: list[Callable] = []

    def use(self, mw: Callable) -> None:
        self._middleware.append(mw)

    def subscribe(self, pattern: str, handler: Callable[[DataFrame], None]) -> None:
        for mw in reversed(self._middleware):
            handler = mw(handler)
        self._subs.append((pattern, handler))

    def publish(self, events: DataFrame) -> None:
        for pattern, handler in self._subs:
            sub = events.filter(kind_match_expr(pattern))
            handler(sub)
