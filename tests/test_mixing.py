"""Structural invariants of the mixing/export operators (pipeline.mixing).

The DuckDB oracle gate pins exact values at sf0.01; these pin the
properties that make each operator correct mixing machinery — cap
bounds, temperature monotonicity, shard-position contiguity, quantizer
range — at smoke scale so the suite stays fast.
"""

from __future__ import annotations

import math

import pytest

import eventsourcing_spark.pipeline.mixing as mix
from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    return {
        name: SPARK_QUERIES[name](spark, SF).collect()
        for name in (
            "mixture_weighted_sample",
            "domain_cap_topk",
            "shuffle_shard_assign",
            "blocklist_scrub",
            "emb_int8_quantize",
        )
    }


def test_temperature_mixing_flattens_the_distribution(frames):
    rows = frames["mixture_weighted_sample"]
    assert all(0 <= r.n_kept <= r.n_docs for r in rows)
    # the smallest source keeps ~everything (rate 1 − 1/16^6)
    smallest = min(rows, key=lambda r: r.n_docs)
    assert smallest.n_kept == smallest.n_docs
    # expected kept ≈ sqrt(n_min·n_s): check every source is within a
    # generous binomial tolerance of the temperature target
    n_min = smallest.n_docs
    for r in rows:
        target = math.sqrt(n_min * r.n_docs)
        assert abs(r.n_kept - target) <= 4 * math.sqrt(target) + 2, r


def test_domain_cap_bounds_every_source(frames, spark):
    rows = frames["domain_cap_topk"]
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.cap_rank)
    docs = load_table(spark, SF, "documents")
    source_sizes = {
        r.source: r["count"] for r in docs.groupBy("source").count().collect()
    }
    for source, ranks in per_source.items():
        assert len(ranks) <= mix.DOMAIN_CAP
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == min(mix.DOMAIN_CAP, source_sizes[source])


def test_shuffle_shards_partition_the_corpus_contiguously(frames, spark):
    rows = frames["shuffle_shard_assign"]
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs  # a permutation: every doc placed once
    per_shard: dict[str, list] = {}
    for r in rows:
        assert len(r.shard) == mix.SHARD_HEX_CHARS
        per_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in per_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_blocklist_scrub_accounting_is_consistent(frames):
    rows = frames["blocklist_scrub"]
    assert sum(r.total_hits for r in rows) > 0  # corpus does contain the terms
    for r in rows:
        assert r.docs_flagged >= 0 and r.total_hits >= r.docs_flagged
        # every hit removes exactly len('spark')==len('table')==5 chars
        assert r.chars_removed == 5 * r.total_hits


def test_int8_quantizer_range_and_scale(frames, spark):
    rows = frames["emb_int8_quantize"]
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n_vecs
    for r in rows:
        # the max-|x| element quantizes to ±127, so |q|max = 127 exactly
        assert -127 <= r.q_max <= 127
        assert r.q_l1 >= 127
        assert r.q_l1 >= abs(r.q_sum)
        assert r.scale_q > 0
