"""End-to-end tour of the engine. Run: python examples/quickstart.py

Walks the full lifecycle on a throwaway store:
  1. OLTP writes through Repository (conflict-checked, auto-snapshot)
  2. bulk ingest of an analytic backlog
  3. catch-up → switch → live projection with exactly-once dedup
  4. streaming windowed analytics + stateful fold
  5. maintenance: GDPR forget, copy-replace migration, compaction
  6. training-data ops on the driver's document/embedding tables
"""

from __future__ import annotations

import json
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from eventsourcing_spark import get_spark
from eventsourcing_spark.maintenance import compact_events, forget, migrate_in_place
from eventsourcing_spark.projection import CheckpointStore, Projector
from eventsourcing_spark.projection.projector import events_file_stream
from eventsourcing_spark.store import EventStore
from eventsourcing_spark.store.repository import Repository

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

HANDLERS = {
    "AccountCreated": lambda s, k, b: {"status": "OPEN", "balance": b["money"], "owner": b["owner"]},
    "MoneyDeposited": lambda s, k, b: {**s, "balance": s["balance"] + b["money"]},
    "MoneyWithdrawn": lambda s, k, b: {**s, "balance": s["balance"] - b["money"]},
}


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="es_quickstart_")
    store = EventStore(spark, base, snapshot_threshold=3)

    # 1 — OLTP lifecycle
    repo = Repository(store, "Account", HANDLERS, lambda: {"status": "", "balance": 0, "owner": ""})
    repo.create("acc-1", [("AccountCreated", {"money": 100, "owner": "Paulo"})], created_at=T0)
    repo.update("acc-1", lambda s: [("MoneyDeposited", {"money": 30})], created_at=T0 + timedelta(seconds=1))
    agg = repo.update("acc-1", lambda s: [("MoneyWithdrawn", {"money": 15})], created_at=T0 + timedelta(seconds=2))
    print(f"1. repository: balance={agg.state['balance']} v{agg.version} "
          f"(snapshot at threshold: {store.snapshots().count()})")

    # 2 — bulk ingest 100k events
    backlog = (
        spark.range(100_000)
        .withColumn("aggregate_id", F.concat(F.lit("bulk-"), (F.col("id") % 1000).cast("string")))
        .withColumn("aggregate_kind", F.lit("Account"))
        .withColumn("kind", F.lit("MoneyDeposited"))
        .withColumn("body", F.concat(F.lit('{"money":'), (F.col("id") % 9).cast("string"), F.lit("}")))
        .withColumn("created_at", F.timestamp_millis(F.lit(1704067200000) + F.col("id")))
        .select("aggregate_id", "aggregate_kind", "kind", "body", "created_at")
    )
    store.bulk_import(backlog, assign_versions=True)
    print(f"2. bulk ingest: store now holds {store.events().count()} events")

    # 3 — projection: catch-up then live
    balances: dict[str, int] = {}

    def handler(df, meta):
        if meta.kind == "switch":
            return
        money = F.get_json_object(F.col("body").cast("string"), "$.money").cast("long")
        delta = F.when(F.col("kind") == "MoneyWithdrawn", -money).otherwise(money)
        for r in df.groupBy("aggregate_id").agg(F.sum(delta).alias("d")).collect():
            balances[r.aggregate_id] = balances.get(r.aggregate_id, 0) + (r.d or 0)

    projector = Projector(store, "balances", handler, CheckpointStore(spark, base), splits=8)
    projector.project(now=T0 + timedelta(hours=1))
    store.append("acc-1", "Account", [("MoneyDeposited", {"money": 5})],
                 expected_version=3, created_at=T0 + timedelta(hours=2))
    q = (projector.live_stream_writer(events_file_stream(store))
         .option("checkpointLocation", base + "/cp").trigger(availableNow=True).start())
    q.awaitTermination(120)
    print(f"3. projection: {len(balances)} read-model keys; acc-1 = {balances['acc-1']} "
          "(catch-up events deduped, live event applied)")

    # 4 — maintenance
    forget(store, "acc-1", kinds=("AccountCreated",),
           event_scrubber=lambda k, b: {**b, "owner": ""})
    migrate_in_place(
        store, 1, "Account", ("AccountCreated",),
        lambda evs: [("AccountCreated_V2",
                      {**b, "owner": {"name": b.get("owner", "")}}) if k == "AccountCreated" else (k, b)
                     for k, b in evs],
        new_aggregate_kind="Account_V2", now=T0 + timedelta(days=1),
    )
    compact_events(store)
    scrubbed = json.loads(bytes(
        store.events_raw().filter((F.col("aggregate_id") == "acc-1")
                                  & (F.col("kind") == "AccountCreated")).first().body))
    print(f"4. maintenance: forget scrubbed owner={scrubbed['owner']!r}; "
          f"migration left {store.events().filter(F.col('kind') == 'AccountCreated_V2').count()} _V2 rows; compacted")

    # 5 — training-data ops on the driver datasets
    from eventsourcing_spark.pipeline.queries import dedup_exact, knn_topk_dot
    sf = "/root/testdata/sf0.001"
    dups = dedup_exact(spark, sf).filter("n_copies > 1").count()
    knn = knn_topk_dot(spark, sf).count()
    print(f"5. pipeline: {dups} duplicate doc groups; {knn} knn rows at sf0.001")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
