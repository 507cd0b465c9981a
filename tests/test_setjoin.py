"""Prefix-filtered set-similarity join: lossless vs brute force, and the
filter actually prunes the candidate space."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.setjoin import (
    JACCARD_PERMILLE,
    setjoin_prefix_jaccard,
)


def _shingles(docs):
    words = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    return words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], '_', t[i + 1]))"
            )
        ).alias("tok"),
    ).distinct()


def test_matches_bruteforce_exactly(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = _shingles(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    brute = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
        .filter(
            F.lit(1000) * F.col("inter")
            >= JACCARD_PERMILLE
            * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
    )
    want = {(r.doc_a, r.doc_b) for r in brute.collect()}
    got = {(r.doc_a, r.doc_b) for r in setjoin_prefix_jaccard(spark, sf_dir).collect()}
    assert got == want  # prefix filtering loses nothing, adds nothing


def test_jaccard_values_meet_threshold(spark, sf_dir):
    for r in setjoin_prefix_jaccard(spark, sf_dir).collect():
        assert r.jaccard_permille >= JACCARD_PERMILLE
        assert r.doc_a < r.doc_b
        assert 0 < r.inter <= r.un
