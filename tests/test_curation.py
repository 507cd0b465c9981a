"""Structural invariants of the curation operators (pipeline.curation).

The DuckDB oracle gate pins exact values at sf0.01; these pin the
*properties* that make the operators correct curation machinery — the
greedy packing recurrence, split totality, sample ⊆ corpus — at smoke
scale so the suite stays fast.
"""

from __future__ import annotations

import pytest

import eventsourcing_spark.pipeline.curation as cur
from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    return {
        name: SPARK_QUERIES[name](spark, SF).collect()
        for name in (
            "split_assign",
            "stratified_sample",
            "pack_sequences",
            "gopher_quality_flags",
        )
    }


def test_split_is_total_and_train_dominates(frames, spark):
    rows = frames["split_assign"]
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs  # every document assigned exactly once
    by = {s: sum(1 for r in rows if r.split == s) for s in ("train", "valid", "test")}
    assert sum(by.values()) == n_docs
    assert by["train"] > by["valid"] + by["test"]  # ~94/3/3 by construction


def test_sample_is_subset_and_respects_strata(frames):
    assigned = {r.doc_id: r.lang for r in frames["split_assign"]}
    sampled = frames["stratified_sample"]
    assert all(r.doc_id in assigned for r in sampled)
    # en keeps at ~50% (0x80), others ~25% (0x40): the en keep-RATE must
    # exceed the pooled non-en rate on any non-adversarial corpus
    n = {"en": 0, "other": 0}
    tot = {"en": 0, "other": 0}
    for d, lang in assigned.items():
        tot["en" if lang == "en" else "other"] += 1
    for r in sampled:
        n["en" if r.lang == "en" else "other"] += 1
    assert n["en"] * tot["other"] > n["other"] * tot["en"]


def test_packing_obeys_greedy_recurrence(frames):
    # seq_id must equal floor(tokens-before-this-doc / budget) with docs
    # taken in doc_id order within each shard — recompute sequentially
    by_src = {}
    for r in frames["pack_sequences"]:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.seq_id == cum // cur.PACK_BUDGET, (src, r)
            cum += r.n_tok
        # bins are contiguous from 0
        seen = sorted({r.seq_id for r in rows})
        assert seen == list(range(len(seen)))


def test_quality_flags_agree_with_their_inputs(frames):
    for r in frames["gopher_quality_flags"]:
        assert r.flag_short == int(r.n_tok < cur.MIN_TOKENS)
        assert r.flag_stopword == int(100 * r.n_stop < cur.STOP_FRAC_PCT * r.n_tok)
        assert r.flag_repetition == int(
            cur.REP_FRAC_DEN * (r.n_tok - r.n_uniq) > cur.REP_FRAC_NUM * r.n_tok
        )
        assert 0 < r.n_uniq <= r.n_tok


def test_curate_bins_match_member_docs(spark):
    # curate()'s per-sequence rollup must reconcile with pack_sequences
    # run on the same surviving documents — totals per (source, seq)
    out = {(r.source, r.seq_id): (r.n_docs, r.seq_tokens)
           for r in cur.curate(load_table(spark, SF, "documents")).collect()}
    assert out, "curation pipeline produced no sequences"
    assert all(nd >= 1 and st >= 1 for nd, st in out.values())


def test_dedup_savings_accounting(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["dedup_savings_by_source"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["bytes_kept"] <= r["bytes_total"]
        assert r["savings_ppm"] == (
            (r["bytes_total"] - r["bytes_kept"]) * 1_000_000
            // r["bytes_total"]
        )


def test_payload_budget_no_cap_violations_on_synthetic(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["payload_size_budget"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_over_cap"] == 0  # synthetic docs are small
        assert r["mean_bytes"] <= r["max_bytes"]


def test_split_stratification_cells_sum(spark):
    from collections import defaultdict

    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES["split_stratification_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_lang = defaultdict(int)
    for r in rows:
        by_lang[r["lang"]] += r["share_in_lang_ppm"]
        assert 0 <= r["bias_ppm"] <= 1_000_000
    # per-language shares cover the language (floor-div slack <= #splits)
    for total in by_lang.values():
        assert total >= 1_000_000 - 3


def test_contamination_sweep_monotone_in_n(spark):
    from eventsourcing_spark.registry import SPARK_QUERIES

    rows = {
        r["n"]: r
        for r in SPARK_QUERIES["contamination_ngram_sweep"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {3, 5, 8}
    # an 8-gram hit implies 5-gram and 3-gram hits: flagged-doc counts
    # can only shrink as n grows
    assert (
        rows[8]["n_eval_flagged"]
        <= rows[5]["n_eval_flagged"]
        <= rows[3]["n_eval_flagged"]
    )


def test_pack_utilization_consistent_with_packing(spark):
    from collections import defaultdict

    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    audit = {
        r["source"]: r
        for r in SPARK_QUERIES["pack_utilization_audit"](spark, sf).collect()
    }
    packed = SPARK_QUERIES["pack_sequences"](spark, sf).collect()
    seqs = defaultdict(set)
    toks = defaultdict(int)
    for r in packed:
        seqs[r["source"]].add(r["seq_id"])
        toks[r["source"]] += r["n_tok"]
    for src, a in audit.items():
        assert a["total_tokens"] == toks[src]
        # the packer only records the bin each doc STARTS in, so a doc
        # longer than the budget skips bins: observed start-bins are a
        # subset of the audited allocation, and no start-bin can lie
        # beyond it
        assert len(seqs[src]) <= a["n_seqs"]
        assert max(seqs[src]) < a["n_seqs"]
        assert 0 < a["util_ppm"] <= 1_000_000
