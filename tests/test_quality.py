"""Semantic invariants for pipeline/quality.py (oracle pins exact values;
these pin the properties that must survive any refactor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.quality import (
    SAMPLE_K,
    SCORE_HI,
    SCORE_LO,
    ZIPF_TOPK,
    doc_bigram_repetition,
    per_group_bottomk_sample,
    quality_linear_score,
    zipf_rank_freq,
)


def test_bigram_counts_consistent(spark, sf_dir):
    rep = doc_bigram_repetition(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tok")
    )
    joined = rep.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("n_bigrams") != F.col("n_tok") - 1)
        | (F.col("n_distinct_bigrams") > F.col("n_bigrams"))
        | (F.col("top_bigram_n") < 1)
        | (F.col("dup_bigram_ppm") < 0)
        | (F.col("dup_bigram_ppm") >= 1_000_000)
    )
    assert bad.count() == 0
    assert rep.count() == docs.count()


def test_quality_class_matches_score(spark, sf_dir):
    rows = quality_linear_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.score >= SCORE_HI:
            assert r.quality_class == "high"
        elif r.score >= SCORE_LO:
            assert r.quality_class == "mid"
        else:
            assert r.quality_class == "low"


def test_zipf_monotone(spark, sf_dir):
    rows = zipf_rank_freq(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, ZIPF_TOPK + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r.zipf_c == r.rank * r.freq for r in rows)


def test_bottomk_sample_exact_count_and_deterministic(spark, sf_dir):
    sample = per_group_bottomk_sample(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r.lang: r.n
        for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {lang: min(SAMPLE_K, n) for lang, n in sizes.items()}
    # reproducible regardless of physical layout: recompute from a
    # differently-partitioned source and compare the exact id set
    ids_a = {(r.lang, r.doc_id) for r in sample.collect()}
    shuffled = docs.repartition(7, "doc_id")
    shuffled.createOrReplaceTempView("documents_shuffled")
    h = shuffled.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("hkey")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    ids_b = {
        (r.lang, r.doc_id)
        for r in h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .collect()
    }
    assert ids_a == ids_b


def test_perplexity_buckets_ordered_within_lang(spark):
    from collections import defaultdict

    from eventsourcing_spark.pipeline.quality import PPL_BUCKETS
    from eventsourcing_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["perplexity_bucket_partition"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang = defaultdict(list)
    for r in rows:
        assert 1 <= r["bucket"] <= PPL_BUCKETS
        assert r["min_fam"] <= r["max_fam"]
        by_lang[r["lang"]].append(r)
    for _, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        # quantile boundaries are monotone: bucket b's ceiling never
        # exceeds bucket b+1's floor
        for a, b in zip(rs, rs[1:]):
            assert a["max_fam"] <= b["min_fam"]
        # ntile balance: sizes differ by at most 1
        sizes = [r["n_docs"] for r in rs]
        assert max(sizes) - min(sizes) <= 1


def test_langid_confusion_diagonal_dominates(spark):
    from collections import defaultdict

    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["langid_confusion_matrix"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_true = defaultdict(dict)
    for r in rows:
        by_true[r["lang"]][r["lang_pred"]] = r
    for lang, preds in by_true.items():
        assert sum(p["share_of_true_ppm"] for p in preds.values()) >= 999_000
        # the stopword voter is at least better than random for its
        # own class when the class exists in the marker table
        if lang in ("en", "es", "de", "fr") and lang in preds:
            assert preds[lang]["share_of_true_ppm"] >= 250_000
