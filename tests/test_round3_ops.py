"""Cross-query invariants for the round-3 operator additions — each new
query's exact values are pinned by its DuckDB oracle; these assert the
relationships BETWEEN operators that the oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.analytics import (
    coengagement_matrix,
    decayed_engagement_score,
    hourly_type_correlation,
    kaplan_meier_daily,
    ks_statistic_values,
    session_length_histogram,
    stl_lite_daily_revenue,
)
from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.chunking import cdc_chunk_boundaries
from eventsourcing_spark.pipeline.queries import (
    chi2_lang_terms,
    dedup_exact,
    exact_substring_dedup,
    trigram_lm_interpolated,
)
from eventsourcing_spark.pipeline.quality import skyline_quality_length
from eventsourcing_spark.pipeline.retrieval import (
    boolean_and_retrieval,
    hashed_doc_embedding,
    maxsim_hashed_retrieval,
    ranking_eval_rr_dcg,
    AND_TERMS,
    HASH_EMB_DIMS,
    MAXSIM_TERMS,
)
from eventsourcing_spark.sketches import (
    bitmap_and_popcount,
    cms_join_cardinality,
    histogram_quantile_estimate,
)
from eventsourcing_spark.queries import sessionize_events, state_as_of_day


def test_bitmap_and_matches_coengagement(spark, sf_dir):
    """Bitmap word-AND popcount and the distinct self-join compute the
    same intersection sizes — two plans, one truth."""
    bm = bitmap_and_popcount(spark, sf_dir).select("type_a", "type_b", "n_both")
    co = coengagement_matrix(spark, sf_dir).select(
        "type_a", "type_b", F.col("n_both").alias("co_both")
    )
    j = bm.join(co, ["type_a", "type_b"], "full")
    assert j.filter(
        F.coalesce("n_both", F.lit(-1)) != F.coalesce("co_both", F.lit(-1))
    ).count() == 0


def test_histogram_quantile_brackets_exact_median(spark, sf_dir):
    """The 64-bin estimate must land within one bin width of the exact
    interpolated median."""
    est = {r["event_type"]: r["p50_est_cents"]
           for r in histogram_quantile_estimate(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["p50"] * 100
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("p50"))
        .collect()
    }
    binw = 10_000 // 64
    for t, e in est.items():
        assert abs(e - exact[t]) <= binw + 1, (t, e, exact[t])


def test_boolean_and_requires_every_term(spark, sf_dir):
    docs = boolean_and_retrieval(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    j = docs.join(d, "doc_id")
    for t in AND_TERMS:
        assert j.filter(~F.col("text").contains(t)).count() == 0
    assert docs.filter(F.col("min_tf") < 1).count() == 0


def test_exact_dup_docs_share_all_windows(spark, sf_dir):
    """Documents that are byte-identical (dedup_exact families) must
    co-occur in every one of their substring-window families."""
    fams = dedup_exact(spark, sf_dir).filter(F.col("n_copies") > 1)
    if fams.count() == 0:
        return
    wins = exact_substring_dedup(spark, sf_dir)
    # each multi-copy family's docs are > 1, so every window of that
    # text must appear in a family with n_docs > 1 — spot-check count
    assert wins.filter(F.col("n_docs") < 2).count() == 0


def test_decayed_score_bounds(spark, sf_dir):
    s = decayed_engagement_score(spark, sf_dir)
    assert s.filter(F.col("decayed_score") > F.col("n_events") * 1_000_000).count() == 0
    assert s.filter(F.col("decayed_score") < 0).count() == 0


def test_skyline_is_nondominated(spark, sf_dir):
    sky = skyline_quality_length(spark, sf_dir).collect()
    pts = [(r["n_chars"], r["q"]) for r in sky]
    for i, (x1, y1) in enumerate(pts):
        for j, (x2, y2) in enumerate(pts):
            if i != j:
                assert not (x2 >= x1 and y2 >= y1 and (x2 > x1 or y2 > y1))


def test_ks_and_r2_are_bounded(spark, sf_dir):
    ks = ks_statistic_values(spark, sf_dir).first()
    assert 0 <= ks["d_ppm"] <= 1_000_000
    r = hourly_type_correlation(spark, sf_dir).first()
    assert 0 <= r["r2_ppm"] <= 1_000_000


def test_kaplan_meier_monotone(spark, sf_dir):
    rows = sorted(
        kaplan_meier_daily(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows[0]["s_ppm"] <= 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b["s_ppm"] <= a["s_ppm"]
    # everyone at risk on the first churn day
    assert rows[0]["n_at_risk"] == sum(r["churned"] for r in rows)


def test_chi2_terms_positive_and_ranked(spark, sf_dir):
    t = chi2_lang_terms(spark, sf_dir)
    assert t.filter(F.col("chi2_milli") <= 0).count() == 0
    assert t.filter(F.col("rank") > 5).count() == 0


def test_ndcg_bounded_and_ideal_dominates(spark, sf_dir):
    r = ranking_eval_rr_dcg(spark, sf_dir).first()
    assert 0 < r["ndcg_ppm"] <= 1_000_000
    assert r["idcg_scaled"] >= r["dcg_scaled"]


def test_maxsim_bounds(spark, sf_dir):
    rows = maxsim_hashed_retrieval(spark, sf_dir).collect()
    k = len(MAXSIM_TERMS)
    for r in rows:
        assert -16 * k <= r["maxsim_score"] <= 16 * k


def test_hashed_embedding_parity(spark, sf_dir):
    """|dim value| ≤ distinct token count, and parity matches: val and
    n_tokens have the same parity (sum of ±1 over n tokens)."""
    emb = hashed_doc_embedding(spark, sf_dir)
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(
                F.array_distinct(
                    F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
                )
            ).alias("nt"),
        )
    )
    j = emb.join(d, "doc_id")
    assert j.filter(F.abs("val") > F.col("nt")).count() == 0
    assert j.filter((F.col("val") + F.col("nt")) % 2 != 0).count() == 0
    assert emb.groupBy("doc_id").count().filter(
        F.col("count") != HASH_EMB_DIMS
    ).count() == 0


def test_sessions_histogram_totals(spark, sf_dir):
    h = session_length_histogram(spark, sf_dir)
    total_events = load_table(spark, sf_dir, "events").count()
    assert h.agg(F.sum("n_events_total")).first()[0] == total_events
    n_sessions = h.agg(F.sum("n_sessions")).first()[0]
    by_user = sessionize_events(spark, sf_dir).agg(F.sum("n_sessions")).first()[0]
    assert n_sessions == by_user


def test_state_as_of_subset_of_full_fold(spark, sf_dir):
    pre = state_as_of_day(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    full = ev.groupBy("user_id").agg(F.count("*").alias("n_full"))
    j = pre.join(full, "user_id")
    assert j.filter(F.col("n_events") > F.col("n_full")).count() == 0


def test_cms_join_upper_bounds_truth(spark, sf_dir):
    r = cms_join_cardinality(spark, sf_dir).first()
    assert r["cms_estimate"] >= r["true_card"]
    assert r["overestimate_ppm"] >= 0


def test_stl_trend_window_guard(spark, sf_dir):
    t = stl_lite_daily_revenue(spark, sf_dir)
    n = t.count()
    # exactly the 3 boundary days on each side lack a full 7-day frame
    assert t.filter(F.col("trend_cents").isNull()).count() == min(6, n)


def test_cdc_chunks_vs_length(spark, sf_dir):
    c = cdc_chunk_boundaries(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    j = c.join(d, "doc_id")
    # can't have more boundaries than windows
    assert j.filter(F.col("n_boundaries") > F.col("n") - 7).count() == 0


def test_trigram_positions_count(spark, sf_dir):
    tri = trigram_lm_interpolated(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")) - 2
        ).alias("expect"),
    ).filter(F.col("expect") > 0)
    j = tri.join(d, "doc_id")
    assert j.filter(F.col("n_trigrams") != F.col("expect")).count() == 0
