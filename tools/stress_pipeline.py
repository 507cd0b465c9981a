"""Scale stress drive for the training-data pipeline.

The driver's sf0.1 corpus is 5k docs / 2k vectors — small enough that
per-query fixed overhead dominates (BASELINE.md §5). This tool
manufactures a REPLICA× larger corpus from the driver data (each doc
copied with a distinct suffix token and shifted id, so every document
gains REPLICA−1 true near-duplicates; embeddings copied with shifted
ids) and times the operators whose cost actually grows with corpus
size: minhash/LSH dedup, connected components, the composed curation
plan, decontamination, KNN vs IVF ANN, and the sharded export writer.

The near-dup replication is deliberately adversarial for LSH: every
band bucket holds ≥REPLICA colliding docs, so candidate generation hits
its per-bucket caps and the keeper-star clustering path — the mega-
family behavior that matters at 100 TB — rather than the sparse
small-bucket happy path.

Usage:  python tools/stress_pipeline.py [replicas] [sf_dir]
Prints one timing table (best-of-two, noop-sink materialization).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline import export
from eventsourcing_spark.registry import SPARK_QUERIES  # imports every module
from eventsourcing_spark.session import get_spark

STRESS_QUERIES = (
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_lsh_clusters",
    "dedup_components",
    "dedup_simhash",
    "exact_substring_dedup",
    "html_extract_stats",
    "c4_line_filters",
    "gopher_repetition_flags",
    "text_normalize_endstate",
    "text_winnow_fingerprints",
    "gopher_quality_flags",
    "boilerplate_ngrams",
    "contamination_overlap",
    "curation_pipeline",
    "mixture_weighted_sample",
    "shuffle_shard_assign",
    "emb_int8_quantize",
    "knn_topk_dot",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "emb_neardup_pairs",
    "emb_random_projection",
    "kmeans_clusters",
    "pagerank_neardup",
    "link_prediction_ra",
    "graph_kcore",
    "bpe_learn_merges",
    "media_avi_demux_stats",
    "corpus_fingerprint",
    # event-analytics family over the replicated events table
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "sketch_bloom_membership",
    "bitmap_distinct_users",
    "sessionize_events",
    "asof_prior_error",
    "asof_next_error",
    "cusum_changepoint",
    "trend_user_value",
    "cohort_retention",
    "locf_hourly_series",
    # round 4: distributed-rank rewrites — cost must grow ~linearly,
    # never concentrate (the replaced global windows would serialize here)
    "quality_vs_dup_deciles",
    "sorted_neighborhood_pairs",
    "rfm_segmentation",
    "global_value_percentiles_rank",
    "curriculum_shard_order",
    "vocab_coverage_thresholds",
    # round 4: stream-keyed audits (scale with the streams axis)
    "ingestion_order_audit",
    "interarrival_burstiness",
    "backfill_gap_days",
    # round 5: modality-complete near-dup (doc_id-derived media — id
    # shifts create NEW clusters, so the media corpus truly grows) + PII
    "media_phash_neardup_pairs",
    "media_audio_fingerprint_neardup",
    "media_video_framehash_neardup",
    "pii_detection_stats",
    "pii_redaction_endstate",
    # round 5b: community/eval/keyword families — the graph trio must
    # track the edge count (bucketed LSH candidates), the doc-corpus
    # audits must stay ~linear, and the events pair grows on the
    # streams axis (coalition lattice / item domain stay fixed)
    "label_propagation_communities",
    "community_modularity",
    "degree_assortativity",
    "dedup_calibration_pr",
    "rake_keyword_phrases",
    "dup_quality_auc",
    "maxscore_pruning_audit",
    "shapley_attribution",
    "apriori_triple_itemsets",
    # round 7: classifier stage + URL dedup — training is token/gram
    # grain (must track corpus linearly), scoring is map-only, and the
    # URL census is one keyed aggregate
    "nb_quality_train",
    "nb_quality_score",
    "langid_ngram_classify",
    "url_canonical_dedup",
    # round 8: exact ridge (sufficient-statistic training must stay one
    # aggregation pass), KLL sketch (global rank + map-only classifier),
    # pixel resize (per-image bounded work, map-only)
    "ridge_quality_train",
    "ridge_quality_score",
    "ridge_quality_sse",
    "kll_quantile_sketch",
    "media_resize_pixels",
    "media_audio_downsample",
    "split_neardup_leakage",
    "ks_quality_by_source",
    "sequence_packing_audit",
    "zipf_slope_tokens",
    "revenue_gini_concentration",
    "rrf_fusion_topk",
    "hard_negative_mining",
    "doc_embedding_coverage",
    "session_bounce_rate",
    "tfidf_topk_terms_per_source",
    "source_vocab_jaccard",
    # round 8 wave 3: record linkage + boundary dedup + FSM conformance
    "fs_linkage_weights",
    "stitch_truncation_pairs",
    "unpivot_event_matrix",
    "process_conformance_audit",
    # round 8 wave 4: exact calibration, mutual-NN mining, rank agreement
    "isotonic_calibration_pav",
    "mutual_nn_margin_pairs",
    "model_rank_spearman",
    # round 8 wave 6: KN bigram LM, density clustering
    "kneser_ney_bits",
    "dbscan_embeddings",
    # round 8 wave 7: absorbing-chain funnel, stylometry
    "markov_absorption_funnel",
    "burrows_delta_sources",
    # round 8 wave 8: distributed bootstrap, Welch test
    "poisson_bootstrap_ci",
    "welch_t_value",
    # round 8 wave 9: ANOVA, Mann-Whitney
    "anova_f_value",
    "mann_whitney_u",
    # round 8 wave 10: Dirichlet QL retrieval, Fleiss kappa
    "dirichlet_ql_topk",
    "fleiss_kappa_raters",
    # round 9: rank-based k-group + paired-binary tests
    "kruskal_wallis_values",
    "mcnemar_raters",
    # round 12: the ANN/retrieval 100x evidence gap (VERDICT r11 #3) —
    # bucket-sizing rules (similarity.py) must keep these sublinear
    "ann_rerank_pipeline",
    "pq_adc_topk",
    "bm25_topk",
    "build_postings_lists",
)


def build_stress_dir(
    spark,
    sf_dir: str,
    replicas: int,
    skew_fraction: float = 0.0,
    event_skew_fraction: float = 0.0,
) -> str:
    out = tempfile.mkdtemp(prefix="stress_sf_")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    n_docs = docs.count()
    n_vecs = emb.count()
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    copies = spark.range(replicas).withColumnRenamed("id", "copy")
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # distinct suffix token per copy → true near-duplicates, not
            # byte-identical rows (exercises LSH banding + verification)
            F.concat_ws(" ", "text", F.concat(F.lit("v"), F.col("copy"))).alias(
                "text"
            ),
            "lang",
            "source",
            (F.col("n_chars") + 3).alias("n_chars"),
        )
    )
    if skew_fraction > 0:
        # Zipf-adversarial mode (VERDICT r10 #5): collapse a fixed
        # fraction of the corpus onto ONE byte-identical text (a real
        # document's body), so every key derived from content — LSH
        # band buckets, winnowing anchors, n-grams, component labels —
        # has one value owning ~skew_fraction of all rows. Real 100 TB
        # corpora are Zipfian; the uniform replication above never
        # makes a single key dominate.
        mod = max(2, round(1 / skew_fraction))
        hot_text = docs.orderBy("doc_id").first()["text"]
        big_docs = big_docs.select(
            "doc_id",
            F.when(F.col("doc_id") % mod == 0, F.lit(hot_text))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            F.when(F.col("doc_id") % mod == 0, F.lit(len(hot_text)))
            .otherwise(F.col("n_chars"))
            .alias("n_chars"),
        )
    big_emb = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * n_vecs).alias("vec_id"),
        "embedding",
        "label",
    )
    # events: each copy shifts ids AND users, so streams multiply (the
    # per-key row count stays constant — what grows at 100 TB is the
    # number of streams, not one stream's length)
    big_ev = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * n_users).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    if event_skew_fraction > 0:
        # aggregation-skew mode (VERDICT r11 #4): ONE user owns
        # ~event_skew_fraction of ALL events, so every user_id-keyed
        # aggregate/rank/join has a single dominant key — the Zipf
        # shape the uniform replication (constant per-key row count)
        # never produces on the events axis.
        emod = max(2, round(1 / event_skew_fraction))
        big_ev = big_ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % emod == 0, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
    # customer: shifted keys with regenerated names (the TPC-H name IS a
    # function of the key), same nation/segment/balance marginals — the
    # linkage blocks grow linearly in rows per nation
    cust = load_table(spark, sf_dir, "customer")
    n_cust = cust.count()
    big_cust = cust.crossJoin(copies).select(
        (F.col("c_custkey") + F.col("copy") * n_cust).alias("c_custkey"),
        F.format_string(
            "Customer#%09d", F.col("c_custkey") + F.col("copy") * n_cust
        ).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    big_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    big_emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    big_ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    big_cust.write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))
    return out


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # optional query-name filter: stress only the named queries
    only = set(sys.argv[3:])
    unknown = only - set(STRESS_QUERIES)
    if unknown:
        # a typo must fail loudly, not print a successful 0-query run
        print(
            f"unknown stress queries: {sorted(unknown)}; "
            f"known: {sorted(STRESS_QUERIES)}",
            file=sys.stderr,
        )
        return 2
    queries = (
        [q for q in STRESS_QUERIES if q in only] if only
        else list(STRESS_QUERIES)
    )
    spark = get_spark("stress-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    stress_dir = build_stress_dir(spark, sf_dir, replicas)
    n_docs = spark.read.parquet(os.path.join(stress_dir, "documents.parquet")).count()
    n_vecs = spark.read.parquet(os.path.join(stress_dir, "embeddings.parquet")).count()
    print(f"stress corpus: {n_docs} docs, {n_vecs} vectors ({replicas}x {sf_dir})")
    print(f"{'query':28s} {'best(s)':>8s} {'runs':>12s}")

    total = 0.0
    for name in queries:
        times = []
        for _ in range(2):
            t0 = time.time()
            SPARK_QUERIES[name](spark, stress_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        total += min(times)
        print(f"{name:28s} {min(times):8.2f} {str([round(t, 2) for t in times]):>12s}")

    t0 = time.time()
    if only:
        print(f"\ntotal best-of-two: {total:.1f}s over {len(queries)} queries at {n_docs} docs")
        shutil.rmtree(stress_dir, ignore_errors=True)
        return 0
    export.export_documents(
        spark, stress_dir, os.path.join(stress_dir, "shards"), max_records_per_file=10000
    )
    t_export = time.time() - t0
    print(f"{'export_training_shards':28s} {t_export:8.2f}")
    print(f"\ntotal best-of-two: {total:.1f}s over {len(queries)} queries "
          f"+ {t_export:.1f}s export at {n_docs} docs")
    shutil.rmtree(stress_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
