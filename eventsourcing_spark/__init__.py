"""eventsourcing_spark — a PySpark-native event-sourcing / CQRS analytics engine.

Re-expresses the semantics of the reference event-sourcing library
(an append-only event store + snapshots + filtered range queries + CDC
feeds + checkpointed projections) as idiomatic Spark: DataFrames for the
store and catch-up queries, Structured Streaming for the live phase, and
deterministic checkpoint/idempotency logic as stateful stream processing.

Design stance (SURVEY.md §7): one `events` table is the source of truth;
"store", "outbox", "feed" and "bus" collapse into DataFrame views and
streaming queries over it. Everything relational is declared through the
DataFrame API so Catalyst handles pushdown/pruning/join strategy; Python
UDFs appear only where semantics genuinely require them (generic event
folds, body scrubbers), always Arrow-batched.
"""

__version__ = "0.1.0"

from eventsourcing_spark.plans import audit, plan_stats  # noqa: F401
from eventsourcing_spark.session import get_spark  # noqa: F401
