"""Exact ridge training: the distributed Cramer/long-division solve
equals an arbitrary-precision rational replay, and on a separable
corpus the learned scorer actually separates."""

from __future__ import annotations

from fractions import Fraction

from eventsourcing_spark.pipeline.quality import (
    SCORE_LO,
    STOPWORDS,
    W_MWL,
    W_STOP,
    W_TOK,
    W_UNIQ,
)
from eventsourcing_spark.pipeline.ridge import (
    FMAX,
    FRAC_BITS,
    PRED_T,
    RIDGE_LAMBDA,
    _weights_df,
)

DOCS_SCHEMA = "doc_id long, text string, lang string"


def _py_feats(text):
    if text is None:
        return 0, 0, 0
    ws = text.lower().split(" ")
    nt = len(ws)
    f1 = min(nt // 16, FMAX)
    f2 = (len(set(ws)) * FMAX) // nt
    f3 = (sum(1 for w in ws if w in STOPWORDS) * FMAX) // nt
    return f1, f2, f3


def _py_label(text):
    ws = text.lower().split(" ")
    nt = len(ws)
    score = (
        W_TOK * nt
        + W_MWL * (sum(len(w) for w in ws) * 10 // nt)
        + W_STOP * (sum(1 for w in ws if w in STOPWORDS) * 1000 // nt)
        + W_UNIQ * (len(set(ws)) * 1000 // nt)
    )
    return 1 if score >= SCORE_LO else 0


def _py_solve(rows):
    """Exact rational ridge solve over (text,) training rows, emitted
    as the same trunc-toward-zero fixed point the engines produce."""

    xs, ys = [], []
    for text in rows:
        f1, f2, f3 = _py_feats(text)
        xs.append((1, f1, f2, f3))
        ys.append(_py_label(text))
    d = 4
    A = [[RIDGE_LAMBDA if i == j else 0 for j in range(d)] for i in range(d)]
    b = [0] * d
    for x, y in zip(xs, ys):
        for i in range(d):
            b[i] += x[i] * y
            for j in range(d):
                A[i][j] += x[i] * x[j]

    def det(m):
        # exact integer Bareiss elimination (fraction-free)
        m = [row[:] for row in m]
        n = len(m)
        prev = 1
        sign = 1
        for k in range(n - 1):
            if m[k][k] == 0:
                swap = next(
                    (r for r in range(k + 1, n) if m[r][k] != 0), None
                )
                if swap is None:
                    return 0
                m[k], m[swap] = m[swap], m[k]
                sign = -sign
            for i in range(k + 1, n):
                for j in range(k + 1, n):
                    m[i][j] = (m[k][k] * m[i][j] - m[i][k] * m[k][j]) // prev
            prev = m[k][k]
        return sign * m[-1][-1]

    dA = det(A)
    assert dA > 0
    ws = []
    for i in range(d):
        Ai = [row[:] for row in A]
        for r in range(d):
            Ai[r][i] = b[r]
        num = det(Ai)
        w = Fraction(num, dA) * (1 << FRAC_BITS)
        # trunc toward zero
        ws.append(int(w) if w >= 0 else -int(-w))
    return len(rows), ws


CORPUS = [
    "the quick brown fox jumps over a lazy dog of the morning and then "
    "some more varied words appear here to make this document long",
    "spam spam spam spam spam spam spam spam spam spam spam spam",
    "a thoughtful essay about the nature of things and the reasons to "
    "care with many distinct tokens and a healthy mix of the usual",
    "zz zz zz zz zz zz zz",
    "short",
    "the cat and the dog went to a house of friends and told stories "
    "of a distant land to all of the gathered crowd in the town",
    "buy buy buy buy buy now now now now now",
    "an analysis of trade flows between regions shows that the growth "
    "of exports depends on the mix of goods and the price of inputs",
]


def test_weights_match_exact_rational_solve(spark, tmp_path):
    sf = str(tmp_path / "sf")
    rows = [(i, t, "en") for i, t in enumerate(CORPUS * 8)]
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    got = _weights_df(spark, sf).first()
    train_texts = [t for i, t, _ in rows if i % 2 == 0]
    n, ws = _py_solve(train_texts)
    assert got.n_train == n
    assert [got.w0_fx, got.w1_fx, got.w2_fx, got.w3_fx] == ws


def test_scorer_separates_separable_corpus(spark, tmp_path):
    """On a corpus where quality is genuinely feature-expressible, the
    learned scorer's held-out predictions agree with the weak label
    far better than the majority prior."""
    from eventsourcing_spark.pipeline.ridge import ridge_quality_score

    good = (
        "the story of a small town and the people of the valley told "
        "with care and a wide mix of distinct interesting words indeed"
    )
    bad = "junk junk junk junk junk junk junk junk"
    sf = str(tmp_path / "sf")
    rows = []
    for i in range(200):
        base = good if i % 2 == (i // 2) % 2 else bad  # mix across halves
        rows.append((i, f"{base} tail{i % 7}", "en"))
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    scored = ridge_quality_score(spark, sf).filter("is_train = 0").collect()
    agree = sum(1 for r in scored if r.pred_good == r.label_good)
    assert agree / len(scored) >= 0.9
    # threshold constant sanity: 0.5 in 20-bit fixed point
    assert PRED_T == 1 << (FRAC_BITS - 1)
