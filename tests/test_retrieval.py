"""Invariants for sparse retrieval, random projection, and histograms."""

from __future__ import annotations

import eventsourcing_spark.analytics  # noqa: F401 — registers value_histogram
from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.retrieval import PROJ_DIMS, PROJ_PLANES, QUERY_TERMS, TOP_DOCS
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_retrieval_scores_match_python(spark):
    rows = SPARK_QUERIES["term_match_retrieval"](spark, SF).collect()
    assert len(rows) == TOP_DOCS
    docs = load_table(spark, SF, "documents").collect()
    n = len(docs)
    tf: dict[int, dict[str, int]] = {}
    for d in docs:
        counts: dict[str, int] = {}
        for w in d["text"].lower().split(" "):
            if w in QUERY_TERMS:
                counts[w] = counts.get(w, 0) + 1
        if counts:
            tf[d["doc_id"]] = counts
    df = {t: sum(1 for c in tf.values() if t in c) for t in QUERY_TERMS}
    scores = {
        doc: sum(c * (n - df[t]) for t, c in counts.items())
        for doc, counts in tf.items()
    }
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_DOCS]
    assert [(r["doc_id"], r["score"]) for r in rows] == expected
    assert all(1 <= r["n_terms_hit"] <= len(QUERY_TERMS) for r in rows)


def test_random_projection_shape_and_recount(spark):
    rows = SPARK_QUERIES["emb_random_projection"](spark, SF).collect()
    emb = {r["vec_id"]: r["embedding"] for r in load_table(spark, SF, "embeddings").collect()}
    assert len(rows) == len(emb) * PROJ_DIMS
    sample = [r for r in rows if r["vec_id"] == min(emb)]
    q = [round(x * 1000) for x in emb[min(emb)]]
    for r in sample:
        assert r["val"] == sum(a * b for a, b in zip(q, PROJ_PLANES[r["dim"]]))


def test_histogram_partitions_events(spark):
    rows = SPARK_QUERIES["value_histogram"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    total = round(sum(r["bucket_sum"] for r in rows), 2)
    exact = round(sum(r["value"] for r in ev.select("value").collect()), 2)
    assert abs(total - exact) < 0.05
    assert all(r["bucket"] >= 0 for r in rows)


def test_ann_rerank_two_stage_invariants(spark):
    from collections import defaultdict

    from eventsourcing_spark.pipeline.retrieval import (
        RERANK_K,
        RERANK_PROBES,
        RERANK_SHORTLIST,
    )

    rows = SPARK_QUERIES["ann_rerank_pipeline"](spark, SF).collect()
    per_probe = defaultdict(list)
    for r in rows:
        per_probe[r["probe_id"]].append(r)
    assert set(per_probe) == set(range(RERANK_PROBES))
    for probe, rs in per_probe.items():
        assert len(rs) == RERANK_K
        rs.sort(key=lambda r: r["final_rank"])
        assert [r["final_rank"] for r in rs] == list(range(1, RERANK_K + 1))
        # rerank order = exact score desc (ties by candidate id asc)
        keys = [(-r["exact_score"], r["candidate_id"]) for r in rs]
        assert keys == sorted(keys)
        assert all(1 <= r["stage1_rank"] <= RERANK_SHORTLIST for r in rs)
        assert all(r["candidate_id"] != probe for r in rs)


def test_mmr_picks_are_diverse_and_monotone(spark):
    from collections import defaultdict

    from eventsourcing_spark.pipeline.retrieval import MMR_K, MMR_PROBES

    rows = SPARK_QUERIES["mmr_diversify_topk"](spark, SF).collect()
    per_probe = defaultdict(list)
    for r in rows:
        per_probe[r["probe_id"]].append(r)
    assert set(per_probe) == set(range(MMR_PROBES))
    for _, rs in per_probe.items():
        rs.sort(key=lambda r: r["pick_order"])
        assert [r["pick_order"] for r in rs] == list(range(1, MMR_K + 1))
        assert len({r["candidate_id"] for r in rs}) == MMR_K
        # first pick is pure-relevance argmax; subsequent marginal scores
        # can only shrink (max_sim to the selected set is non-decreasing)
        assert rs[0]["max_sim"] == 0
        assert rs[0]["mmr_score"] == 7 * rs[0]["rel_score"]
        mmr = [r["mmr_score"] for r in rs]
        assert all(a >= b for a, b in zip(mmr, mmr[1:]))
