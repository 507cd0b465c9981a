"""Exact-rational validation, round-11 wave 2: concentration,
agreement, and the derandomized-bootstrap constants.

Same method as the r9/r11 suites (see test_formula_exactness.py):
independent textbook recomputation in ``fractions.Fraction``/plain
integers, exact pins on the engine's defined integer outputs, and a
planted-mutation guard per family with a vacuity assert.

* **Gini concentration** — the full chain from raw event bytes: cents
  totals, the sorted-rank Σ(2i−n−1)xᵢ numerator, and the single-
  division ppm, all pinned exactly (the ppm IS floor(10⁶·G) because
  the division is last).
* **Spearman midrank-d² / Fleiss κ mutation guards** — the exact
  PINS for these two already live in test_stats_exactness.py (r9);
  what was missing there is the r9 recipe's second half, the planted-
  mutation guard with a vacuity assert. These tests re-derive the
  algebra independently (doubled midranks from a Python sort; the
  textbook P_i/P̄/P_e form) and then plant the characteristic slip —
  min-rank ties for Spearman, dropping the bad-category agreement
  term for κ — proving the pins can catch that class on this corpus.
* **Poisson(1) bootstrap CDF constants** — the md5-derandomized
  bootstrap weights hinge on 8 hard-coded thresholds
  floor(2³²·CDF(k)). e⁻¹ is irrational, so the pin uses the
  alternating-series rational interval (partial sums of Σ(−1)ʲ/j!
  bracket e⁻¹ with error < 1/(M+1)!), tight enough that both interval
  ends share one floor at 2³² scale — an exact pin on an irrational's
  floor.
"""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq
import pytest

import eventsourcing_spark.registry  # noqa: F401 — resolve module graph


def _q(spark, sf_dir, name):
    from eventsourcing_spark.registry import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, sf_dir).collect()


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# ---------------------------------------------------------------------------
# Poisson(1) inverse-CDF thresholds (Hanley & MacGibbon bootstrap)
# ---------------------------------------------------------------------------
def test_poisson_bootstrap_cdf_constants_exact():
    from eventsourcing_spark.analytics import _POIS_CDF

    m = 40  # alternating-series depth: bracket width 1/41! ~ 3e-50
    lo_e = sum(Fraction((-1) ** j, math.factorial(j)) for j in range(m + 2))
    hi_e = sum(Fraction((-1) ** j, math.factorial(j)) for j in range(m + 1))
    # the bracket width is exactly the first omitted term, 1/(m+1)!
    assert lo_e < hi_e
    assert hi_e - lo_e == Fraction(1, math.factorial(m + 1))

    partial = Fraction(0)
    for k, pinned in enumerate(_POIS_CDF):
        partial += Fraction(1, math.factorial(k))
        lo = (1 << 32) * lo_e * partial
        hi = (1 << 32) * hi_e * partial
        assert math.floor(lo) == math.floor(hi), k  # interval pins the floor
        assert pinned == math.floor(lo), k
    # shape: strictly increasing, below 2^32 (weights above 8 clamp)
    assert all(a < b for a, b in zip(_POIS_CDF, _POIS_CDF[1:]))
    assert _POIS_CDF[-1] < 1 << 32

    # mutation guard: the same thresholds computed for lambda = 2
    # (e^-2 * sum 2^j/j!) must disagree with every pinned constant
    lo2 = lo_e * lo_e  # e^-2 bracket from the e^-1 bracket
    hi2 = hi_e * hi_e
    p2 = Fraction(0)
    for k, pinned in enumerate(_POIS_CDF):
        p2 += Fraction(2**k, math.factorial(k))
        assert math.floor((1 << 32) * lo2 * p2) == math.floor(
            (1 << 32) * hi2 * p2
        )
        assert math.floor((1 << 32) * lo2 * p2) != pinned, k


# ---------------------------------------------------------------------------
# Gini / Lorenz revenue concentration
# ---------------------------------------------------------------------------
def test_gini_formula_exact(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    cents: dict = defaultdict(int)
    for uid, et, v in zip(
        t.column("user_id").to_pylist(),
        t.column("event_type").to_pylist(),
        t.column("value").to_pylist(),
    ):
        if et == "purchase":
            c = v * 100
            # 2-decimal synthetic values: DECIMAL(18,2) rounding and
            # Python round agree away from exact .5 ties
            assert abs(c - round(c)) < 0.01, v
            cents[uid] += round(c)
    xs = sorted(cents.values())
    n = len(xs)
    total = sum(xs)
    num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
    assert num >= 0  # ascending order makes the Lorenz numerator >= 0

    (row,) = _q(spark, sf_dir, "revenue_gini_concentration")
    assert (row.n_users, row.total_cents) == (n, total)
    assert row.gini_num_shifted == num // 1048576
    assert row.gini_ppm == (10**6 * num) // (n * total)
    # the ppm IS the floor of the exact textbook Gini (division last)
    g = Fraction(num, n * total)
    assert row.gini_ppm == math.floor(10**6 * g) and 0 <= g < 1

    # mutation guard: the off-by-one (2i − n) weight must move the ppm
    mut = sum((2 * i - n) * x for i, x in enumerate(xs, start=1))
    assert (10**6 * mut) // (n * total) != row.gini_ppm
    assert total > 0  # vacuity: a zero-revenue corpus would mask it


# ---------------------------------------------------------------------------
# Agreement family: the per-doc votes/scores come from the engine's
# raters (each pinned by its own suite); the AGGREGATION algebra is
# recomputed here from scratch.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def rater_rows(spark, sf_dir):
    nb = {
        r.doc_id: (r.label_good, r.pred_good, r.score_fx)
        for r in _q(spark, sf_dir, "nb_quality_score")
        if r.is_train == 0
    }
    rd = {
        r.doc_id: (r.pred_good, r.score_fx)
        for r in _q(spark, sf_dir, "ridge_quality_score")
        if r.is_train == 0
    }
    assert set(nb) == set(rd) and nb
    return nb, rd


def _midrank2(scores: dict) -> dict:
    """Doubled midranks (2·midrank = min_rank + max_rank), exactly the
    textbook tie convention, derived from one Python sort."""
    order = sorted(scores.items(), key=lambda kv: kv[1])
    out: dict = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j][1] == order[i][1]:
            j += 1
        m2 = (i + 1) + j  # min rank + max rank, 1-based
        for k in range(i, j):
            out[order[k][0]] = m2
        i = j
    return out


def test_spearman_midrank_mutation_guard(spark, sf_dir, rater_rows):
    nb, rd = rater_rows
    s_nb = {d: v[2] for d, v in nb.items()}
    s_rd = {d: v[1] for d, v in rd.items()}
    m_nb = _midrank2(s_nb)
    m_rd = _midrank2(s_rd)
    n = len(s_nb)
    d2 = sum((m_nb[d] - m_rd[d]) ** 2 for d in s_nb)

    (row,) = _q(spark, sf_dir, "model_rank_spearman")
    assert (row.n_docs, row.sum_d2_q) == (n, d2)
    assert row.spearman_ppm == 10**6 - (1500000 * d2) // (n * (n * n - 1))

    # the doubled-midrank d² statistic is the classic 6Σd²/(n(n²−1))
    # on true (possibly half-integer) midranks: (2d)² = 4d², so
    # 1.5e6·Σ(2d)² ≡ 1e6·6·Σd² exactly. The engine FLOORS the penalty
    # term (1e6 − floor(x)), so its ppm sits within 1 ppm ABOVE the
    # exact ρ, never below
    rho = 1 - Fraction(6 * d2, 4) / Fraction(n * (n * n - 1))
    assert 0 <= Fraction(row.spearman_ppm) - 10**6 * rho < 1

    # mutation guard: MIN-rank ties (rank(), not midrank) must move ρ
    def minrank(scores):
        order = sorted(scores.items(), key=lambda kv: kv[1])
        out, i = {}, 0
        while i < len(order):
            j = i
            while j < len(order) and order[j][1] == order[i][1]:
                j += 1
            for k in range(i, j):
                out[order[k][0]] = 2 * (i + 1)  # doubled min rank
            i = j
        return out

    has_ties = len(set(s_nb.values())) < n or len(set(s_rd.values())) < n
    assert has_ties, "no ties at this sf — midrank convention untested"
    d2m = sum(
        (minrank(s_nb)[d] - minrank(s_rd)[d]) ** 2 for d in s_nb
    )
    assert 10**6 - (1500000 * d2m) // (n * (n * n - 1)) != row.spearman_ppm


def test_fleiss_kappa_mutation_guard(spark, sf_dir, rater_rows):
    nb, rd = rater_rows
    votes = {d: nb[d][0] + nb[d][1] + rd[d][0] for d in nb}
    n_docs = len(votes)

    # textbook Fleiss (n = 3 raters, 2 categories), exact rationals
    def kappa(per_item_agreement):
        pbar = Fraction(
            sum(per_item_agreement(x) for x in votes.values()), 6 * n_docs
        )
        p_good = Fraction(sum(votes.values()), 3 * n_docs)
        p_e = p_good**2 + (1 - p_good) ** 2
        return pbar, p_e, (pbar - p_e) / (1 - p_e)

    pbar, p_e, k = kappa(lambda x: x * (x - 1) + (3 - x) * (2 - x))
    assert p_e < 1

    (row,) = _q(spark, sf_dir, "fleiss_kappa_raters")
    assert (row.n_docs, row.n_raters) == (n_docs, 3)
    s = sum(votes.values())
    assert row.p_good_ppm == (10**6 * s) // (3 * n_docs)
    assert row.pbar_ppm == math.floor(10**6 * pbar)
    assert row.pe_ppm == math.floor(10**6 * p_e)
    # κ can be negative: the engine's div truncates toward zero
    assert row.kappa_ppm == _tdiv(
        10**6 * k.numerator, k.denominator
    )

    # mutation guard: dropping the bad-category agreement term
    # (x(x−1) only — the classic 2-category collapse slip) must move κ
    _, _, k_mut = kappa(lambda x: x * (x - 1))
    assert _tdiv(10**6 * k_mut.numerator, k_mut.denominator) != row.kappa_ppm
    assert any(x in (1, 2) for x in votes.values()), (
        "all votes unanimous — mutation check vacuous"
    )


# ---------------------------------------------------------------------------
# Zipf slope: exact OLS over fixed-point logs + the two-stage
# trunc-division identity
# ---------------------------------------------------------------------------
def test_zipf_slope_formula_exact(spark, sf_dir):
    from collections import Counter

    from tests.test_formula_exactness import _FBITS, _fx_log2_checked

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    tf = Counter()
    for text in t.column("text").to_pylist():
        tf.update(w for w in text.lower().split(" ") if w != "")
    # rank by (freq desc, token) — tie order cannot move the OLS sums:
    # the i's are a permutation of 1..n and tied tokens share y
    freqs = sorted(tf.values(), reverse=True)
    n = len(freqs)
    xs = [_fx_log2_checked(i) for i in range(1, n + 1)]
    ys = [_fx_log2_checked(f) for f in freqs]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    assert den > 0

    (row,) = _q(spark, sf_dir, "zipf_slope_tokens")
    assert (row.vocab_n, row.sum_logx_fx, row.sum_logy_fx) == (n, sx, sy)
    # the engines' two-stage 10-bit long division IS trunc-toward-zero
    # of (num << 20)/den — replay both forms and pin their identity
    q0 = _tdiv(num, den)
    r1 = num - q0 * den
    h1 = _tdiv(r1 * 1024, den)
    r2 = r1 * 1024 - h1 * den
    h2 = _tdiv(r2 * 1024, den)
    staged = q0 * (1 << _FBITS) + h1 * 1024 + h2
    assert staged == _tdiv(num << _FBITS, den)
    assert row.slope_mfx == staged

    # the fixed-point slope tracks the true float OLS over exact logs
    # (2-ulp ilog2 error per point, relative tolerance is generous)
    fx = [math.log2(i) for i in range(1, n + 1)]
    fy = [math.log2(f) for f in freqs]
    fnum = n * sum(a * b for a, b in zip(fx, fy)) - sum(fx) * sum(fy)
    fden = n * sum(a * a for a in fx) - sum(fx) ** 2
    true_mfx = (1 << _FBITS) * fnum / fden
    assert abs(row.slope_mfx - true_mfx) <= max(2000, 0.002 * abs(true_mfx))
    # a text corpus must slope downward, Zipf-ish
    assert -3 * (1 << _FBITS) < row.slope_mfx < 0

    # mutation guard: the inverted regression (rank on freq) must move
    # the emitted slope
    syy = sum(y * y for y in ys)
    den_inv = n * syy - sy * sy
    assert den_inv > 0
    assert _tdiv(num << _FBITS, den_inv) != row.slope_mfx


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
