"""File-backed Sinker: an executable bus for the sink/forward/consume loop.

Completes S11/S12 beyond frame shaping: the reference actually publishes
messages to a broker partition and tracks a resume token per partition
(``Sinker`` interface, sink/sink.go:15-19; NATS implementation
sink/nats/sink.go:112-174; forwarder restart via the min resume token).
No broker ships in this container, so the broker here is a directory —
one JSONL file per partition, append-only, exactly a JetStream subject's
shape — which makes the full catch-up→switch→live e2e of
test/integration/nats/e2e_nats_proj_test.go:51-187 executable as a
pytest.

Pieces:

* :class:`FileSinker` — ``sink()`` publishes a bounded event batch
  (message JSON per line, partition = CalcPartition(hash, n), the NATS
  routing of sink/nats/sink.go:146) and records the partition's max
  event id as its resume token; ``resume_tokens()`` returns the last
  token per partition (the ResumeTokens iteration of
  sink/nats/sink.go:112-137 — last-wins == max-merge because event ids
  are monotonic ULIDs). ``puts`` counts KV writes (MockKVStore.Puts()
  parity for the e2e assertions).
* :class:`EventForwarder` — the EventForwarderWorker analog: polls the
  store feed from the sinker's tokens (global low-watermark = min over
  partitions, per-partition redelivery suppressed by the token — the
  restart rule of the reference's feed resume) and sinks what's new.
* :func:`bus_messages` — consumer view: the partition files parsed back
  to Message columns (sink/sink.go:93-116 decode) + partition, ready
  for ``Projector.live_batch`` (which accepts a pre-assigned partition
  column — bus consumers know their partition, store replays derive it).

Scale note: ``sink()`` collects one bounded forwarder batch (the
reference forwards one feed page at a time through a single worker —
same cardinality); the consumer path is a plain distributed read. The
broker-IO body is the ONLY thing to swap for `writeStream.format(
"kafka")` on a real cluster — frame, routing, tokens, and the e2e
protocol are identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventsourcing_spark.streaming.sink import (
    message_json,
    parse_messages,
    to_messages,
)


class FileSinker:
    def __init__(self, root: str, topic: str, partitions: int):
        self.root = root
        self.topic = topic
        self.partitions = partitions
        self.dir = os.path.join(root, topic)
        os.makedirs(self.dir, exist_ok=True)
        self._tokens_path = os.path.join(self.dir, "_tokens.json")
        self.puts = 0  # KV put counter (MockKVStore.Puts())

    # ------------------------------------------------------------- publish
    def sink(self, events: DataFrame) -> int:
        """Publish a bounded batch: route, append per partition, record
        resume tokens. Returns the number of messages published."""
        framed = to_messages(events, self.partitions).withColumn(
            "value", message_json()
        )
        rows = (
            framed.select("partition", "id", "value").orderBy("id").collect()
        )
        if not rows:
            return 0
        by_part: dict[int, list] = {}
        for r in rows:
            by_part.setdefault(int(r.partition), []).append(r)
        for p, batch in sorted(by_part.items()):
            with open(self._partition_path(p), "a", encoding="utf-8") as f:
                for r in batch:
                    f.write(r.value + "\n")
            self.put_token(p, max(r.id for r in batch))
        return len(rows)

    def _partition_path(self, p: int) -> str:
        return os.path.join(self.dir, f"partition={p}.jsonl")

    # ------------------------------------------------------------- tokens
    def resume_tokens(self) -> dict[int, str]:
        if not os.path.exists(self._tokens_path):
            return {}
        with open(self._tokens_path, encoding="utf-8") as f:
            return {int(k): v for k, v in json.load(f).items()}

    def put_token(self, partition: int, token: str) -> None:
        tokens = self.resume_tokens()
        tokens[partition] = token
        with open(self._tokens_path, "w", encoding="utf-8") as f:
            json.dump({str(k): v for k, v in sorted(tokens.items())}, f)
        self.puts += 1

    def close(self) -> None:  # Sinker.Close() — nothing buffered here
        pass


class EventForwarder:
    """Store-feed → sinker pump (integration EventForwarderWorker)."""

    def __init__(self, store, sinker: FileSinker):
        self.store = store
        self.sinker = sinker

    def forward_once(self) -> int:
        """One poll: read events past the sinker's low-watermark, drop
        per-partition redeliveries, publish. Returns messages sent."""
        tokens = self.sinker.resume_tokens()
        ev = self.store.events()
        if len(tokens) == self.sinker.partitions and tokens:
            low = min(tokens.values())
            ev = ev.filter(F.col("id") > low)
        if tokens:
            # per-partition suppression: an event already recorded for
            # its partition is a redelivery (the overlap window between
            # the low-watermark and each partition's own token)
            from eventsourcing_spark.functions.hashing import calc_partition

            tok_df = self.store.spark.createDataFrame(
                [(int(p), t) for p, t in tokens.items()],
                "partition int, tok string",
            )
            ev = (
                ev.withColumn(
                    "partition",
                    calc_partition(
                        F.col("aggregate_id_hash"), self.sinker.partitions
                    ),
                )
                .join(F.broadcast(tok_df), "partition", "left")
                .filter(F.col("tok").isNull() | (F.col("id") > F.col("tok")))
                .drop("partition", "tok")
            )
        return self.sinker.sink(ev)


def bus_messages(spark: SparkSession, sinker: FileSinker) -> DataFrame:
    """Consumer view of the file bus: Message columns + partition.
    Empty bus → empty frame with the right schema."""
    paths = [
        os.path.join(sinker.dir, n)
        for n in sorted(os.listdir(sinker.dir))
        if n.startswith("partition=")
    ]
    if not paths:
        raw = spark.createDataFrame([], "value string, partition int")
        return parse_messages(raw, keep=("partition",))
    raw = spark.read.text(paths).withColumn(
        "partition",
        F.regexp_extract(F.input_file_name(), r"partition=(\d+)", 1).cast("int"),
    )
    return parse_messages(raw, keep=("partition",))
