"""Invariants for chunking, BPE pair counting, funnel, and k-means.

The DuckDB oracle gate pins exact values at sf0.01; these pin the
structural properties at smoke scale: chunk tiling covers every
character with the declared overlap, pair counts match a Python
recount on a sample, the funnel is monotonically narrowing, and
k-means assignment is a total partition whose inertia does not
increase across Lloyd rounds.
"""

from __future__ import annotations

import pytest

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.chunking import CHUNK_SIZE, CHUNK_STRIDE
from eventsourcing_spark.pipeline.clustering import ITERS, K, _assign, _quant, _update
from eventsourcing_spark.queries import SPARK_QUERIES

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_chunks_tile_documents(spark):
    chunks = SPARK_QUERIES["chunk_documents"](spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = len(docs[doc_id])
        # contiguous indexes from 0; starts stride apart
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r["chunk_start"] == r["chunk_idx"] * CHUNK_STRIDE
            assert r["chunk_len"] == min(CHUNK_SIZE, n - r["chunk_start"])
        # full coverage: last chunk reaches the end, no start beyond the text
        last = rows[-1]
        assert last["chunk_start"] < n <= last["chunk_start"] + CHUNK_SIZE
        # consecutive chunks overlap by size - stride
        assert all(
            rows[i + 1]["chunk_start"] - rows[i]["chunk_start"] == CHUNK_STRIDE
            for i in range(len(rows) - 1)
        )


def test_bpe_pairs_match_python_recount(spark):
    got = {
        r["pair"]: r["n_pair"]
        for r in SPARK_QUERIES["bpe_merge_pairs"](spark, SF).collect()
    }
    counts: dict[str, int] = {}
    for r in load_table(spark, SF, "documents").collect():
        for tok in r["text"].lower().split(" "):
            for i in range(len(tok) - 1):
                p = tok[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert got == dict(top)


def test_funnel_is_monotone(spark):
    row = SPARK_QUERIES["funnel_conversion"](spark, SF).collect()[0]
    assert row["n_viewed"] >= row["n_clicked_after_view"] >= row["n_purchased_after_click"]
    assert row["n_purchased_after_click"] > 0  # 5 event types over years of data
    assert row["sum_view_to_click_ms"] >= row["n_clicked_after_view"]  # strictly-after ⇒ ≥1ms each


def test_kmeans_partitions_and_contracts(spark):
    out = SPARK_QUERIES["kmeans_clusters"](spark, SF).collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert 1 <= len(out) <= K
    assert all(r["inertia_scaled"] >= 0 for r in out)


def test_kmeans_inertia_non_increasing(spark):
    """True inertia (d/c² summed) must not increase across Lloyd rounds."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv")).withColumn(
        "xx",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    seeds = q.orderBy("vec_id").limit(K).collect()
    cents = [(cid, [int(v) for v in r["qv"]], 1) for cid, r in enumerate(seeds)]
    inertias = []
    for it in range(ITERS):
        assigned = _assign(q, cents)
        by_c = {c[0]: c[2] for c in cents}
        rows = assigned.groupBy("cid").agg(F.sum("d").alias("sd")).collect()
        inertias.append(sum(r["sd"] / by_c[r["cid"]] ** 2 for r in rows))
        if it < ITERS - 1:
            cents = _update(assigned)
    assert inertias == sorted(inertias, reverse=True) or all(
        a >= b - 1e-6 for a, b in zip(inertias, inertias[1:])
    )


def test_bpe_apply_compression_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.chunking import bpe_apply_merges

    r = bpe_apply_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert r.count() == docs.count()
    # merges only ever shrink: n_words <= n_subwords <= n_chars
    bad = r.filter(
        (F.col("n_subwords") > F.col("n_chars"))
        | (F.col("n_subwords") < F.col("n_words"))
        | (F.col("compression_ppm") < 0)
        | (F.col("compression_ppm") >= 1_000_000)
    )
    assert bad.count() == 0


def test_oov_rate_bounds_and_vocab_covers_common(spark, sf_dir):
    from pyspark.sql import functions as F

    from eventsourcing_spark.pipeline.chunking import oov_rate_topk_vocab

    r = oov_rate_topk_vocab(spark, sf_dir)
    assert r.filter(F.col("n_oov") > F.col("n_tok")).count() == 0
    assert r.filter((F.col("oov_ppm") < 0) | (F.col("oov_ppm") > 1_000_000)).count() == 0


def test_running_distinct_types_monotone_final(spark, sf_dir):
    from pyspark.sql import functions as F

    from eventsourcing_spark.analytics import running_distinct_types
    from eventsourcing_spark.io import load_table

    r = running_distinct_types(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # final value per user equals the true distinct-type count
    final = r.groupBy("user_id").agg(F.max("distinct_types_seen").alias("got"))
    truth = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("want")
    )
    assert final.join(truth, "user_id").filter(F.col("got") != F.col("want")).count() == 0
    assert r.filter(F.col("distinct_types_seen") < 1).count() == 0
