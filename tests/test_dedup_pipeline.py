"""Structural properties of the LSH dedup family (pipeline.queries).

The DuckDB oracle gate checks exact values at sf0.01; these tests pin
the *invariants* that make the operators correct dedup machinery, at
smoke scale so the suite stays fast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from eventsourcing_spark.pipeline.queries import MAX_BUCKET
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    return {
        name: SPARK_QUERIES[name](spark, SF)
        for name in (
            "dedup_lsh_pairs",
            "dedup_lsh_clusters",
            "dedup_components",
            "dedup_exact",
        )
    }


def test_pairs_are_ordered_and_unique(frames):
    pairs = frames["dedup_lsh_pairs"]
    assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_clusters_point_to_smaller_keeper(frames):
    clusters = frames["dedup_lsh_clusters"]
    assert clusters.filter(F.col("member") <= F.col("keeper")).count() == 0


def test_components_are_transitive_fixpoint(frames):
    comp = frames["dedup_components"].cache()
    clusters = frames["dedup_lsh_clusters"]
    # label can only point down
    assert comp.filter(F.col("component") > F.col("doc_id")).count() == 0
    # every edge's endpoints share a component (fixpoint reached)
    member_comp = comp.withColumnRenamed("doc_id", "member").withColumnRenamed(
        "component", "member_comp"
    )
    keeper_comp = comp.withColumnRenamed("doc_id", "keeper").withColumnRenamed(
        "component", "keeper_comp"
    )
    violations = (
        clusters.join(member_comp, "member")
        .join(keeper_comp, "keeper")
        .filter(F.col("member_comp") != F.col("keeper_comp"))
    )
    assert violations.count() == 0
    # a component's id is one of its members (the minimum one)
    roots = comp.select(F.col("component").alias("doc_id")).distinct()
    all_docs = comp.select("doc_id")
    assert roots.join(all_docs, "doc_id", "left_anti").count() == 0


def test_exact_dupes_land_in_one_component(frames, spark):
    # docs with identical text (exact dedup groups) must be in the same
    # connected component: identical text ⇒ identical minhash ⇒ same bucket
    from eventsourcing_spark.io import load_table

    docs = load_table(spark, SF, "documents")
    text_groups = docs.groupBy("text").agg(
        F.collect_set("doc_id").alias("ids")
    ).filter(F.size("ids") > 1)
    exploded = text_groups.select(F.explode("ids").alias("doc_id"), "text")
    joined = exploded.join(frames["dedup_components"], "doc_id")
    n_comp_per_text = joined.groupBy("text").agg(
        F.countDistinct("component").alias("n")
    )
    assert n_comp_per_text.filter(F.col("n") > 1).count() == 0


def test_bucket_cap_is_respected(spark):
    # no pair may originate from a bucket larger than MAX_BUCKET — the
    # pairs query must stay sub-quadratic on duplicate mega-families
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.pipeline.queries import _bands

    docs = load_table(spark, SF, "documents")
    sizes = _bands(docs).groupBy("band_id", "band_key").count()
    big = sizes.filter(F.col("count") > MAX_BUCKET).count()
    small_pairs = SPARK_QUERIES["dedup_lsh_pairs"](spark, SF).count()
    # sanity: caps exist in this corpus AND pairs were still produced
    assert small_pairs > 0
    # upper bound: sum over capped buckets of k*(k-1)/2
    cap_bound = (
        sizes.filter(F.col("count") <= MAX_BUCKET)
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
        or 0
    )
    assert small_pairs <= cap_bound
    assert big >= 0  # mega-buckets allowed to exist; they go to clusters


def test_cluster_rep_is_best_quality_member(spark):
    from eventsourcing_spark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    reps = SPARK_QUERIES["cluster_rep_selection"](spark, sf).collect()
    assert reps
    assert len({r["cluster_id"] for r in reps}) == len(reps)
    for r in reps:
        assert r["n_members"] >= 2
        # representative belongs to its own cluster's id range
        assert r["rep_doc_id"] >= r["cluster_id"]


def test_minhash_estimator_tracks_true_jaccard(spark):
    from eventsourcing_spark.pipeline.queries import MH_EST_K
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["minhash_jaccard_estimate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    errs = []
    for r in rows:
        assert 0 <= r["n_match"] <= MH_EST_K
        assert r["est_ppm"] == r["n_match"] * 1_000_000 // MH_EST_K
        assert 0 <= r["true_ppm"] <= 1_000_000
        errs.append(abs(r["est_ppm"] - r["true_ppm"]))
    # K=16 permutations: std error ~1/4; the MEAN error over candidate
    # pairs should be well inside that envelope
    assert sum(errs) / len(errs) < 250_000


def test_simhash_hamming_pairs_complete_at_radius_one(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in SPARK_QUERIES["dedup_simhash"](spark, sf).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in SPARK_QUERIES["simhash_hamming_pairs"](spark, sf).collect()
    }
    # brute-force ground truth over all pairs
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 1:
                want[(a, b)] = h
    assert got == want  # probe scheme is lossless at radius 1


def test_lsh_sweep_monotone_banding_tradeoff(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = {
        r["config"]: r
        for r in SPARK_QUERIES["lsh_parameter_sweep"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"b4r1", "b2r2", "b1r4"}
    # same truth set for every config
    assert len({r["n_true"] for r in rows.values()}) == 1
    for r in rows.values():
        assert 0 <= r["n_hit"] <= min(r["n_candidates"], r["n_true"]) or (
            r["n_candidates"] == 0 and r["n_hit"] == 0
        )
    # more bands / fewer rows per band => superset candidate keys =>
    # at least as many candidates (cap effects aside, which only shrink
    # the finer configs further — so the inequality is safe)
    assert rows["b1r4"]["n_candidates"] <= rows["b2r2"]["n_candidates"]
