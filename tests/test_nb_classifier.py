"""NB classifier family: the fixed-point log2 kernel is bit-identical
across Python/Spark/DuckDB and accurate; the NB train/score machinery
actually learns when the data carries signal (the gate corpus's lang
labels are noise, so learning is proven here on separable corpora)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from eventsourcing_spark.pipeline.nb_classifier import (
    ILOG_F,
    ilog2_duck,
    ilog2_py,
    ilog2_spark,
)

SAMPLE_XS = [1, 2, 3, 7, 10, 100, 12345, 999999, 2**31, 2**40 + 12345]


def test_ilog2_py_accuracy_and_monotonicity():
    prev = -1
    for x in range(1, 4000):
        v = ilog2_py(x)
        assert v >= prev, f"non-monotone at {x}"
        prev = v
        assert abs(v - (2**ILOG_F) * math.log2(x)) < 2
    # domain edges
    assert ilog2_py(1) == 0
    assert ilog2_py(2**62) == 62 * 2**ILOG_F


def test_ilog2_duck_regression_struct_reduce_bug():
    """Pin the DuckDB 1.0.0 list_reduce bug workaround: the 5-row
    VALUES context where a STRUCT accumulator returned wrong values
    10/10 (854 → 11130329 instead of 10211129; cross-row accumulator
    contamination). The packed-BIGINT form must be exact here and over
    a wide sweep, on repeated trials."""
    con = duckdb.connect()
    for _ in range(5):
        rows = con.sql(
            f"SELECT x, {ilog2_duck('x')} FROM (VALUES (854), (937),"
            " (943), (896), (910)) t(x)"
        ).fetchall()
        for x, il in rows:
            assert il == ilog2_py(x), (x, il)
    rows = con.sql(
        f"SELECT x, {ilog2_duck('x')} FROM range(1, 20001) t(x)"
    ).fetchall()
    assert all(il == ilog2_py(x) for x, il in rows)


def test_ilog2_engines_match_python(spark):
    exprs = ", ".join(
        f"({ilog2_spark(str(x))}) AS v{i}" for i, x in enumerate(SAMPLE_XS)
    )
    srow = spark.sql(f"SELECT {exprs}").first()
    dexprs = ", ".join(
        f"({ilog2_duck(str(x))}) AS v{i}" for i, x in enumerate(SAMPLE_XS)
    )
    con = duckdb.connect()  # keep alive: a temp connection is GC'd mid-chain
    drow = con.sql(f"SELECT {dexprs}").fetchone()
    for i, x in enumerate(SAMPLE_XS):
        expect = ilog2_py(x)
        assert srow[i] == expect, f"spark ilog({x})"
        assert drow[i] == expect, f"duckdb ilog({x})"


GOOD_TEXT = "the quick brown fox jumps of the lazy dog and a story to tell"
BAD_TEXT = "aaaa bbbb aaaa bbbb aaaa"
EN_TEXT = "the quick brown fox jumps over the lazy sleeping dog"
DE_TEXT = "der schnelle braune fuchs springt ueber den faulen hund"


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture()
def quality_corpus(tmp_path):
    """Good = stopword-rich prose, bad = repetitive shouting; both
    classes present in BOTH the train (even doc_id) and eval halves,
    with identical vocabularies across halves — fully learnable."""
    rows = [
        (i, GOOD_TEXT if i % 4 in (0, 1) else BAD_TEXT, "en",
         f"s{i % 3}", 0)
        for i in range(60)
    ]
    return _write_docs(tmp_path, rows)


@pytest.fixture()
def langid_corpus(tmp_path):
    """Two languages with disjoint vocabularies, both present in both
    halves of the train/eval split."""
    rows = [
        (i, EN_TEXT if i % 4 in (0, 1) else DE_TEXT,
         "en" if i % 4 in (0, 1) else "de", f"s{i % 3}", 0)
        for i in range(60)
    ]
    return _write_docs(tmp_path, rows)


def test_nb_quality_learns_separable_signal(spark, quality_corpus):
    import eventsourcing_spark.registry as reg

    out = reg.SPARK_QUERIES["nb_quality_score"](
        spark, quality_corpus
    ).toPandas()
    assert len(out) == 60
    # the weak label split the corpus as designed
    assert set(out.label_good) == {0, 1}
    # decision rule is exactly the sign of the score
    assert (out.pred_good == (out.score_fx >= 0).astype(int)).all()
    ev = out[out.is_train == 0]
    acc = (ev.pred_good == ev.label_good).mean()
    assert acc == 1.0, f"separable quality signal not learned: {acc}"


def test_langid_learns_disjoint_vocabularies(spark, langid_corpus):
    import eventsourcing_spark.registry as reg

    cm = reg.SPARK_QUERIES["langid_ngram_classify"](
        spark, langid_corpus
    ).toPandas()
    total = cm.n_docs.sum()
    correct = cm[cm.lang == cm.pred_lang].n_docs.sum()
    assert total == 30  # held-out half
    assert correct == total, cm.to_string()


def _assert_gate_parity(spark, sf_dir, names):
    import eventsourcing_spark.registry as reg

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for q in names:
        sdf = reg.SPARK_QUERIES[q](spark, sf_dir).toPandas()
        odf = con.sql(reg.ORACLE_SQL[q]).df()
        scols = sorted(sdf.columns)
        assert scols == sorted(odf.columns), q
        s = sdf[scols].sort_values(by=scols, ignore_index=True)
        d = odf[scols].sort_values(by=scols, ignore_index=True)
        for c in scols:
            assert list(s[c].astype(str)) == list(d[c].astype(str)), (
                f"{q}.{c} diverges"
            )


ALL_NB = (
    "nb_quality_train",
    "nb_quality_score",
    "langid_ngram_train",
    "langid_ngram_classify",
    "langid_nb_calibration_ece",
    "nb_quality_pr_curve",
    "nb_quality_calibration_ece",
    "nb_quality_hashed_score",
)


def test_nb_gate_parity_on_quality_corpus(spark, quality_corpus):
    """Oracle parity on corpora the driver never generates — catches
    formulation drift the fixed testdata can't reach (single-language
    corpus, all-one-class grams, unseen-token default)."""
    _assert_gate_parity(spark, quality_corpus, ALL_NB)


def test_nb_gate_parity_on_langid_corpus(spark, langid_corpus):
    _assert_gate_parity(spark, langid_corpus, ALL_NB)
