from eventsourcing_spark.projection.checkpoints import (  # noqa: F401
    Checkpoints,
    CheckpointStore,
)
from eventsourcing_spark.projection.projector import Meta, Projector  # noqa: F401
