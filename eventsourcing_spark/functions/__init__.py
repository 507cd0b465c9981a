from eventsourcing_spark.functions.hashing import (  # noqa: F401
    calc_partition,
    fnv1a_32,
    fnv1a_32_py,
    split_predicate,
)
from eventsourcing_spark.functions.ulid import (  # noqa: F401
    UlidGenerator,
    ulid_millis,
    ulid_offset,
    ulid_random,
    ulid_time_only,
    ulid_time_only_py,
    ulid_timestamp,
)
