"""ExactSubstr exactness at the Lee et al. 50-char threshold: a
duplicated span of length >= SUBSTR_W = 50 is caught at EVERY
cross-document alignment (round 7 closed the 65→50 gap: stage-1
winnowing of 35-char windows guarantees candidates at 50, stage-2
verifies with full 50-char windows over candidates only), and every
reported family is a verbatim 50-char match (no false positives)."""

from __future__ import annotations

import duckdb

from eventsourcing_spark.pipeline.queries import (
    SUBSTR_CAND,
    SUBSTR_SEL,
    SUBSTR_W,
)
from eventsourcing_spark.registry import ORACLE_SQL, SPARK_QUERIES

# stage-1 candidate guarantee must sit exactly at the match length
assert SUBSTR_CAND + SUBSTR_SEL - 1 == SUBSTR_W


def _mk_corpus(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _fillers(n, seed):
    # Deterministic non-repeating filler that shares no 35-gram across
    # docs (distinct per-doc alphabet soup keyed by seed).
    import hashlib

    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def _assert_parity(spark, sf, fams):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf}/documents.parquet/*.parquet')"
    )
    oracle = sorted(con.sql(ORACLE_SQL["exact_substring_dedup"]).fetchall())
    got = sorted((r.window_hash, r.n_docs, r.first_doc) for r in fams)
    assert got == [(a, int(b), int(c)) for a, b, c in oracle]


def test_planted_50char_span_caught_at_every_alignment_residue(
    spark, tmp_path
):
    """THE paper bar: exactly-50-char spans, planted at offsets 0..9 on
    one side vs offset 7 on the other — every alignment-delta residue.
    The old 65-guarantee form provably missed some of these."""
    span = ("the quick brown fox jumps over the lazy dog " * 2)[:SUBSTR_W]
    assert len(span) == SUBSTR_W == 50
    rows = [(0, "src0", _fillers(7, "a0") + span + _fillers(40, "a1"))]
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
    assert fams, "no duplicate family found at all"
    # The planted span is exactly one 50-char window; stage 2 reports it
    # as one family spanning doc 0 and ALL ten planted docs.
    best = max(fams, key=lambda r: r.n_docs)
    assert best.n_docs == 11, fams
    assert best.first_doc == 0
    _assert_parity(spark, sf, fams)


def test_longer_span_still_caught_everywhere(spark, tmp_path):
    # Regression for the old guarantee class too (65+ chars).
    span = ("portable water proof speaker with huge battery life " * 2)[:80]
    rows = [(0, "src0", _fillers(3, "p") + span + _fillers(30, "q"))]
    for off in range(8):
        rows.append(
            (off + 1, "src1",
             _fillers(off, f"r{off}") + span + _fillers(20, f"s{off}"))
        )
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    best = max(fams, key=lambda r: r.n_docs)
    assert best.n_docs == 9
    _assert_parity(spark, sf, fams)


def test_49char_span_is_not_reported(spark, tmp_path):
    """Exactness from below: a 49-char shared span contains no 50-char
    shared window, so it must NOT produce a family (it may produce
    stage-1 candidates — the 35-char scale sees it — but stage 2's
    full-window verify rejects it)."""
    span = ("zebra crossing near the old lighthouse today " * 2)[:49]
    rows = [
        (0, "src0", _fillers(11, "m") + span + _fillers(60, "n")),
        (1, "src1", _fillers(4, "o") + span + _fillers(60, "p")),
    ]
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    assert fams == [], fams
    _assert_parity(spark, sf, fams)


def test_no_shared_content_no_false_positive(spark, tmp_path):
    rows = [
        (0, "src0", _fillers(200, "x")),
        (1, "src0", _fillers(200, "y")),
    ]
    sf = _mk_corpus(spark, tmp_path, rows)
    assert SPARK_QUERIES["exact_substring_dedup"](spark, sf).count() == 0


def test_short_doc_degenerate_window(spark, tmp_path):
    # Docs shorter than CAND + SEL - 1 but >= W: a single global-min
    # stage-1 anchor per doc; identical docs still pair up and stage 2
    # reports every shared 50-window.
    txt = _fillers(55, "z")
    rows = [(0, "src0", txt), (1, "src0", txt)]
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    assert len(fams) == 55 - 50 + 1 and all(r.n_docs == 2 for r in fams)
    _assert_parity(spark, sf, fams)


def test_byte_identical_docs_fold_to_text_grain(spark, tmp_path):
    """Round-8 text-grain fold: byte-identical documents are folded to
    one representative before the window stages, but the output still
    counts every COPY (n_docs sums multiplicities) and first_doc is the
    global minimum doc_id across copies."""
    span = ("winter evening settles down with smell of steaks " * 2)[
        :SUBSTR_W
    ]
    assert len(span) == SUBSTR_W
    base = _fillers(3, "z") + span + _fillers(30, "q")
    rows = [
        (5, "src0", base),
        (9, "src0", base),  # exact copy of doc 5
        (2, "src1", base),  # exact copy, smallest doc_id
        (7, "src2", _fillers(11, "r") + span + _fillers(22, "s")),
    ]
    sf = _mk_corpus(spark, tmp_path, rows)
    fams = SPARK_QUERIES["exact_substring_dedup"](spark, sf).collect()
    best = max(fams, key=lambda r: r.n_docs)
    assert best.n_docs == 4  # three byte-identical copies + one near
    assert best.first_doc == 2
    _assert_parity(spark, sf, fams)
