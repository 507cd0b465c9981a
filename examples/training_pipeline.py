"""The training-data path end-to-end. Run: python examples/training_pipeline.py

Takes the driver's raw document corpus to training-ready shards the way a
100 TB pipeline would, each stage a declarative DataFrame op:

  1. curate()    — dedup → quality gate → train split → sequence packing,
                   composed as ONE logical plan (no intermediate corpora)
  2. mixing      — temperature source rebalance + domain caps (deterministic,
                   md5-threshold, reproducible across runs and engines)
  3. export      — shard-partitioned parquet in a deterministic shuffle
                   order (no global sort; file sizes bounded at the writer)
  4. embeddings  — int8 quantization of the embedding column for ANN serving
  5. curriculum  — easy-to-hard global training order in rank-contiguous
                   shards, via the distributed zip-with-index (never a
                   single-partition window)

Every decision is content-keyed (md5 of stable ids), so re-running the
pipeline — or re-partitioning its input — reproduces byte-identical
splits, samples, and shard order.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eventsourcing_spark import get_spark
from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline import export
from eventsourcing_spark.pipeline.curation import curate
from eventsourcing_spark.queries import SPARK_QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    print(f"corpus: {docs.count()} docs from {SF}")

    # 1. composed curation: one plan, two keyed shuffles, zero intermediates
    packed = curate(docs)
    print(f"curate(): {packed.count()} packed training sequences")

    # 2. mixing: what the rebalanced corpus looks like per source
    mix = SPARK_QUERIES["mixture_weighted_sample"](spark, SF)
    kept, total = mix.agg(F.sum("n_kept"), F.sum("n_docs")).first()
    print(f"temperature mixing keeps {kept}/{total} docs "
          f"(smallest language kept whole, dominant one downsampled ~sqrt)")
    capped = SPARK_QUERIES["domain_cap_topk"](spark, SF)
    print(f"domain cap retains {capped.count()} docs across "
          f"{capped.select('source').distinct().count()} sources")

    # 3. sharded export in deterministic shuffle order
    out = os.path.join(tempfile.mkdtemp(), "shards")
    export.export_documents(spark, SF, out, max_records_per_file=1000)
    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    back = export.read_training_shards(spark, out)
    print(f"exported {back.count()} docs into {len(shards)} shard dirs at {out}")

    # 4. embedding compression for the ANN serving index
    quant = SPARK_QUERIES["emb_int8_quantize"](spark, SF)
    print(f"int8-quantized {quant.count()} embedding vectors "
          f"(per-vector symmetric scale, |q| <= 127)")

    # 5. curriculum ordering — a global quality order WITHOUT a global
    # sort: distributed rank (range partition + broadcast offsets), then
    # rank-contiguous shard ids a training launcher reads in sequence
    cur = SPARK_QUERIES["curriculum_shard_order"](spark, SF)
    rows = cur.orderBy("shard_id").collect()
    print(f"curriculum: {len(rows)} shards, quality envelopes "
          f"{[(r.shard_id, r.q_first, r.q_last) for r in rows[:3]]} ...")

    spark.stop()


if __name__ == "__main__":
    main()
