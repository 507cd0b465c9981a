"""Similarity search three ways. Run: python examples/similarity_search.py

The same top-k neighbor question answered by the engine's three search
paths over the driver's embeddings table, with measured recall of the
approximate paths against the exact one:

  1. knn_topk_dot  — brute-force baseline: one Arrow-batched numpy int64
                     matmul over the full scan (exact, O(N) per query)
  2. ann_lsh_topk  — hyperplane-LSH buckets: one shuffle on the bucket id,
                     search only within the query's bucket
  3. ann_ivf_topk  — IVF: seeded codebook, queries probe their nprobe=2
                     nearest cells and scan only those inverted lists

All three share the integer quantization contract (round(x*1000) as
int64), so scores are bit-identical where candidate sets overlap, and
recall differences are purely candidate-generation effects — exactly
the knob (bands / cells / nprobe) a 100 TB deployment tunes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark import get_spark
from eventsourcing_spark.pipeline.queries import knn_topk_dot
from eventsourcing_spark.pipeline.similarity import (
    ann_ivf_topk,
    ann_lsh_multiprobe,
    ann_lsh_topk,
)


def pair_set(rows, max_rank):
    return {(r.query_id, r.neighbor_id) for r in rows if r.rank <= max_rank}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("similarity-search")
    spark.sparkContext.setLogLevel("ERROR")

    exact = knn_topk_dot(spark, sf_dir).collect()
    lsh = ann_lsh_topk(spark, sf_dir).collect()
    multi = ann_lsh_multiprobe(spark, sf_dir).collect()
    ivf = ann_ivf_topk(spark, sf_dir).collect()

    k = 3  # both ANN paths keep top-3 per query
    exact_q = {r.query_id for r in exact}
    print(f"queries: {sorted(exact_q)}  (exact keeps top-10, ANN top-{k})")
    print(f"{'method':10s} {'pairs':>6s} {'recall@3 vs exact':>18s}")
    gold = pair_set(exact, k)
    for name, rows in (("lsh", lsh), ("lsh-multi", multi), ("ivf", ivf)):
        # ANN paths answer for every vector; score them on the exact
        # baseline's query set only
        got = {p for p in pair_set(rows, k) if p[0] in exact_q}
        recall = len(got & gold) / len(gold)
        print(f"{name:10s} {len(got):6d} {recall:18.2f}")

    # Measured lesson: on the driver's UNclustered uniform vectors the
    # true neighbors' buckets sit at Hamming distance 2-4 (median 3)
    # from the query bucket, so single-probe LSH misses them all and
    # Hamming-1 multi-probe (Lv et al., VLDB'07) widens candidates but
    # still misses — hyperplane LSH only wins when similarity is high
    # enough that most bits agree (the near-dup regime, cf.
    # emb_neardup_pairs). IVF's data-adaptive codebook with nprobe=2
    # recovers full recall, which is why large-scale ANN defaults to
    # IVF-family indexes for search and keeps LSH for dedup blocking.

    # where they agree, the integer scores are identical by construction
    exact_scores = {(r.query_id, r.neighbor_id): r.dot for r in exact}
    for name, rows in (("lsh", lsh), ("lsh-multi", multi), ("ivf", ivf)):
        mismatches = [
            r for r in rows
            if (r.query_id, r.neighbor_id) in exact_scores
            and exact_scores[(r.query_id, r.neighbor_id)] != r.dot
        ]
        assert not mismatches, f"{name}: quantized scores diverged"
    print("shared-pair scores bit-identical across all three paths")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
