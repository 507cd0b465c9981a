"""Checkpoint store + dual idempotency rule (projection/checkpoints.go).

The reference's exactly-once-effect contract (C2):

* catch-up: reject any event with ``id <= checkpoint.event_id`` —
  monotonic IDs make the highest seen ID a complete summary
  (checkpoints.go:75-91);
* live: reject when ``id <= switch threshold`` (events already covered
  by catch-up, C3) OR ``sequence <= checkpoint.sequence`` per bus
  partition (checkpoints.go:58-74); with no bus sequence, the monotonic
  event ID per partition serves the same role;
* the checkpoint is persisted together with the read-model update — in
  Spark, both writes live in the same ``foreachBatch`` body.

Keys mirror the reference: ``"<name>-<partition>"`` and ``"<name>"``
(checkpoints.go:70-127). Storage is a tiny parquet KV (a Delta table on
a real lakehouse); state is driver-cached — checkpoint tables are
O(partitions), never O(data).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsourcing_spark.schema import CHECKPOINT_SCHEMA


class CheckpointStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self._dir = os.path.join(base_dir, "checkpoints")
        self._cache: dict[str, tuple[str | None, int | None]] = {}
        self._load()

    def _load(self) -> None:
        if os.path.isdir(self._dir) and any(
            not n.startswith((".", "_")) for n in os.listdir(self._dir)
        ):
            for r in (
                self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self._dir).collect()
            ):
                self._cache[r.key] = (r.event_id, r.sequence)

    def reload(self) -> None:
        """Re-read persisted state, dropping the in-memory view. A
        driver that waited on the catch-up lease MUST reload before
        filtering: its constructor-time cache predates the lease
        holder's token writes, and filtering against that stale view
        re-applies everything the winner already handled."""
        self._cache.clear()
        self._load()

    def get(self, key: str) -> tuple[str | None, int | None]:
        return self._cache.get(key, (None, None))

    def put(
        self, key: str, event_id: str | None = None, sequence: int | None = None
    ) -> None:
        old_id, old_seq = self.get(key)
        self._cache[key] = (
            event_id if event_id is not None else old_id,
            sequence if sequence is not None else old_seq,
        )
        self._persist()

    def put_many(self, items: dict[str, tuple[str | None, int | None]]) -> None:
        for k, (eid, seq) in items.items():
            old_id, old_seq = self.get(k)
            self._cache[k] = (
                eid if eid is not None else old_id,
                seq if seq is not None else old_seq,
            )
        self._persist()

    def _persist(self) -> None:
        rows = [(k, v[0], v[1]) for k, v in sorted(self._cache.items())]
        df = self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(self._dir)

    def as_dataframe(self) -> DataFrame:
        rows = [(k, v[0], v[1]) for k, v in sorted(self._cache.items())]
        return self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA)


class Checkpoints:
    """Per-projection view over the KV, with the C2 rejection filters."""

    def __init__(self, store: CheckpointStore, name: str):
        self.store = store
        self.name = name

    # -- keys (checkpoints.go:70-127, projection/types.go:56-58) ------------
    def _split_key(self, split: int) -> str:
        return f"{self.name}:catchup#{split}"

    def _partition_key(self, partition: int) -> str:
        return f"{self.name}-{partition}"

    def _switch_key(self) -> str:
        return self.name

    # -- catch-up rule -------------------------------------------------------
    def catchup_after(self, splits: int) -> dict[int, str]:
        """Resume point per split; global restart uses min across splits
        ("min — if max we would potentially miss events",
        projection/projection.go:294-317)."""
        return {
            s: (self.store.get(self._split_key(s))[0] or "") for s in range(splits)
        }

    def _saved_split_tokens(self) -> list[tuple[int, str]]:
        prefix = f"{self.name}:catchup#"
        return [
            (int(k[len(prefix):]), v[0])
            for k, v in self.store._cache.items()
            if k.startswith(prefix) and v[0]
        ]

    def filter_catchup(self, df: DataFrame, split_col: str = "split") -> DataFrame:
        """Reject ``id <= saved event_id`` for the row's split (C2 catch-up)."""
        tokens = self._saved_split_tokens()
        if not tokens:
            return df
        tok = self.store.spark.createDataFrame(
            tokens, "split int, _saved_id string"
        )
        return (
            df.join(F.broadcast(tok), on=split_col, how="left")
            .filter(
                F.col("_saved_id").isNull() | (F.col("id") > F.col("_saved_id"))
            )
            .drop("_saved_id")
        )

    def record_catchup(self, max_ids: dict[int, str]) -> None:
        self.store.put_many(
            {self._split_key(s): (eid, None) for s, eid in max_ids.items() if eid}
        )

    # -- switch (C3) ---------------------------------------------------------
    def record_switch(self, until_id: str) -> None:
        self.store.put(self._switch_key(), event_id=until_id)

    def switch_threshold(self) -> str | None:
        return self.store.get(self._switch_key())[0]

    # -- live rule -----------------------------------------------------------
    def filter_live(self, df: DataFrame, partition_col: str = "partition") -> DataFrame:
        """Reject ``id <= switch threshold`` OR already-processed position
        per partition (sequence when present, else monotonic id)."""
        threshold = self.switch_threshold()
        if threshold:
            df = df.filter(F.col("id") > threshold)
        prefix = f"{self.name}-"
        saved = [
            (int(k[len(prefix):]), v[0], v[1])
            for k, v in self.store._cache.items()
            if k.startswith(prefix) and k[len(prefix):].isdigit()
        ]
        if saved:
            tok = self.store.spark.createDataFrame(
                saved, "partition int, _saved_id string, _saved_seq long"
            )
            has_seq = "sequence" in df.columns
            df = df.join(F.broadcast(tok), on=partition_col, how="left")
            keep = F.col("_saved_id").isNull() | (F.col("id") > F.col("_saved_id"))
            if has_seq:
                keep = keep & (
                    F.col("_saved_seq").isNull()
                    | (F.col("sequence") > F.col("_saved_seq"))
                )
            df = df.filter(keep).drop("_saved_id", "_saved_seq")
        return df

    def record_live(self, positions: dict[int, tuple[str | None, int | None]]) -> None:
        """Persist (event_id, sequence) per partition with the read-model
        update (checkpoints.go:43-52)."""
        self.store.put_many(
            {self._partition_key(p): pos for p, pos in positions.items()}
        )
