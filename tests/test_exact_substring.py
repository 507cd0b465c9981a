"""ExactSubstr winnowing guarantee: a duplicated span of length >=
SUBSTR_W + SUBSTR_SEL - 1 is caught at EVERY cross-document alignment
— the exact miss class of the old stride-10 sampler (which only caught
spans whose offsets agreed mod 10)."""

from __future__ import annotations

import duckdb

from eventsourcing_spark.pipeline.queries import SUBSTR_SEL, SUBSTR_W
from eventsourcing_spark.registry import ORACLE_SQL, SPARK_QUERIES

GUARANTEE = SUBSTR_W + SUBSTR_SEL - 1  # 65


def _mk_corpus(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _fillers(n, seed):
    # Deterministic non-repeating filler that shares no 50-gram across
    # docs (distinct per-doc alphabet soup keyed by seed).
    import hashlib

    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def test_planted_span_caught_at_every_alignment_residue(spark, tmp_path):
    span = ("the quick brown fox jumps over the lazy dog " * 2)[:GUARANTEE]
    assert len(span) == GUARANTEE, len(span)
    rows = [(0, "src0", _fillers(7, "a0") + span + _fillers(40, "a1"))]
    # Doc 0 holds the span at offset 7; docs 1..10 at offsets 0..9 —
    # every alignment-delta residue mod 10 (the old sampler caught only
    # delta % 10 == 0, i.e. one of these).
    for off in range(10):
        rows.append(
            (
                off + 1,
                "src1",
                _fillers(off, f"b{off}") + span + _fillers(35, f"c{off}"),
            )
        )
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    # At least one family must span doc 0 and ALL ten planted docs:
    # winnowing selects by content, so every copy of the span picks the
    # same anchors. (Families from filler can't exist by construction.)
    assert fams, "no duplicate family found at all"
    best = max(fams, key=lambda r: r.n_docs)
    assert best.n_docs == 11, fams
    assert best.first_doc == 0

    # Engine agreement on the planted corpus (not just TPC-H data).
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf}/documents.parquet/*.parquet')"
    )
    oracle = sorted(con.sql(ORACLE_SQL["exact_substring_dedup"]).fetchall())
    got = sorted((r.window_hash, r.n_docs, r.first_doc) for r in fams)
    assert got == [(a, int(b), int(c)) for a, b, c in oracle]


def test_below_guarantee_spans_may_still_match_but_never_false_positive(
    spark, tmp_path
):
    # Two docs sharing NOTHING 50 chars long -> zero families.
    rows = [
        (0, "src0", _fillers(200, "x")),
        (1, "src0", _fillers(200, "y")),
    ]
    sf = _mk_corpus(spark, tmp_path, rows)
    assert SPARK_QUERIES["exact_substring_dedup"](spark, sf).count() == 0


def test_short_doc_degenerate_window(spark, tmp_path):
    # Docs shorter than W + SEL - 1 but >= W: a single global-min anchor
    # per doc; identical docs still pair up.
    txt = _fillers(55, "z")
    rows = [(0, "src0", txt), (1, "src0", txt)]
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    assert len(fams) >= 1 and all(r.n_docs == 2 for r in fams)
