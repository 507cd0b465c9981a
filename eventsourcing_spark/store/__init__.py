from eventsourcing_spark.store.event_store import (  # noqa: F401
    ConcurrentModificationError,
    EventStore,
    Filter,
)
