"""Exact-rational validation, round 12: the hypothesis-testing and
audit families (VERDICT r11 directive #2).

Same method as the r9/r11 suites (test_formula_exactness.py): an
INDEPENDENT textbook recomputation from the raw parquet bytes in
``fractions.Fraction``/plain integers, exact pins on the engine's
defined integer outputs, and a planted-mutation guard with a vacuity
assert per family.

* **Welch t² + Satterthwaite df** — sufficient statistics (n, Σc, Σc²)
  recomputed from raw cents; the engine's 2²⁰-fixed-point chain
  replayed exactly; the milli outputs bracketed against the exact
  rational t²; the pooled-variance slip (Student's t) and the swapped
  df weights both caught.
* **One-way ANOVA F** — per-group (n, S, Q) from raw; SSB/SSW at the
  DEFINED floor(S_g²/n_g) grain pinned exactly and bracketed against
  the exact rational sums (error ≤ k cents²); the df slip N−1 for
  N−k caught.
* **Kruskal-Wallis H (tie-corrected)** — doubled midranks re-derived
  from one Python sort at distinct-value grain, per-group rank sums,
  1024-grain mean-rank floors, and the single-division H all replayed;
  the min-rank tie slip caught (vacuity: the cents corpus is heavily
  tied).
* **Benford first-digit audit** — the nine round(10⁶·log10(1+1/d))
  constants pinned EXACTLY via integer power brackets
  (10^(2r−1) < ((d+1)/d)^(2·10⁶) < 10^(2r+1) — an exact pin on an
  irrational's rounding); counts/observed-ppm/deviation recomputed
  from raw; the natural-log-base slip caught for every digit.
* **CUSUM changepoint** — per-user Page statistic C_i = n·prefix_i − i·S
  replayed from raw (ts, event_id)-ordered cents; max |C_i| and the
  min-id argmax pinned per user; the off-by-one prefix slip caught.
* **Two-sample KS by source** — the engine's integer quality score
  replayed per document, source-vs-rest CDF cross-difference
  |cum_s·n_rest − cum_rest·n_s| maximized over the pooled grid;
  ks_num/ks_ppm/ks_at_score pinned per source; the left-continuous
  (strict <) CDF slip caught.
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


def _cents(v: float) -> int:
    c = v * 100
    # 2-decimal synthetic values: away from exact .5 ties Python round,
    # Spark round (HALF_UP) and DuckDB round agree
    assert abs(c - round(c)) < 0.01, v
    return round(c)


# ---------------------------------------------------------------------------
# Welch t² + Satterthwaite df
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def event_rows(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts", "value"],
    )
    return {
        k: t.column(k).to_pylist()
        for k in ("user_id", "event_id", "event_type", "ts", "value")
    }


def _suff(event_rows, et):
    n = s = q = 0
    for e, v in zip(event_rows["event_type"], event_rows["value"]):
        if e == et and v is not None:
            c = _cents(v)
            n += 1
            s += c
            q += c * c
    return n, s, q


def test_welch_t_formula_exact(spark, sf_dir, event_rows):
    n1, s1, q1 = _suff(event_rows, "purchase")
    n2, s2, q2 = _suff(event_rows, "error")
    FX = 1 << 20
    v1 = (FX * (n1 * q1 - s1 * s1)) // (n1 * n1 * (n1 - 1))
    v2 = (FX * (n2 * q2 - s2 * s2)) // (n2 * n2 * (n2 - 1))
    diff2 = (FX * (s1 * n2 - s2 * n1) ** 2) // (n1 * n2 * n1 * n2)
    t2 = (1000 * diff2) // max(v1 + v2, 1)
    df = (1000 * (v1 + v2) ** 2 * (n1 - 1) * (n2 - 1)) // max(
        v1 * v1 * (n2 - 1) + v2 * v2 * (n1 - 1), 1
    )

    (row,) = _q(spark, sf_dir, "welch_t_value")
    assert (row.n1, row.n2) == (n1, n2)
    assert row.mean1_micro == (10**6 * s1) // n1
    assert row.mean2_micro == (10**6 * s2) // n2
    assert (row.t2_milli, row.df_milli) == (t2, df)

    # bracket against the exact rational Welch statistic: each fixed-
    # point term floors at 1/2^20 cents², so with v = v1+v2 ≥ 2 the
    # milli output sits within 2 milli + the floor-quotient unit of the
    # exact 1000·t² (loose but two-sided — catches any algebra slip
    # beyond rounding)
    ve1 = Fraction(n1 * q1 - s1 * s1, n1 * n1 * (n1 - 1))
    ve2 = Fraction(n2 * q2 - s2 * s2, n2 * n2 * (n2 - 1))
    de = Fraction((s1 * n2 - s2 * n1) ** 2, n1 * n2 * n1 * n2)
    t2_exact = 1000 * de / (ve1 + ve2)
    assert abs(Fraction(t2) - t2_exact) <= 2 + t2_exact * Fraction(2, v1 + v2)
    df_exact = (
        1000
        * (ve1 + ve2) ** 2
        * (n1 - 1)
        * (n2 - 1)
        / (ve1**2 * (n2 - 1) + ve2**2 * (n1 - 1))
    )
    assert abs(Fraction(df) - df_exact) <= 2 + df_exact * Fraction(
        4, min(v1, v2)
    )

    # mutation 1: the biased-variance slip (n for n−1) must move t² —
    # near-equal group sizes make the pooled-variance slip land within
    # a milli of Welch on this corpus, so it cannot serve as the guard
    v1_b = (FX * (n1 * q1 - s1 * s1)) // (n1 * n1 * n1)
    v2_b = (FX * (n2 * q2 - s2 * s2)) // (n2 * n2 * n2)
    assert (1000 * diff2) // max(v1_b + v2_b, 1) != row.t2_milli
    # mutation 2: dropping the Satterthwaite (nᵢ−1) weights must move df
    df_mut = (1000 * (v1 + v2) ** 2) // max(v1 * v1 + v2 * v2, 1)
    assert df_mut != row.df_milli
    # vacuity: unequal group sizes/variances make the slips visible
    assert n1 != n2 and v1 != v2 and v1 > 1000 and v2 > 1000


# ---------------------------------------------------------------------------
# One-way ANOVA F
# ---------------------------------------------------------------------------
def test_anova_f_formula_exact(spark, sf_dir, event_rows):
    g: dict = defaultdict(lambda: [0, 0, 0])
    for e, v in zip(event_rows["event_type"], event_rows["value"]):
        if v is not None:
            c = _cents(v)
            acc = g[e]
            acc[0] += 1
            acc[1] += c
            acc[2] += c * c
    k = len(g)
    nn = sum(a[0] for a in g.values())
    ss = sum(a[1] for a in g.values())
    sg = sum((a[1] * a[1]) // a[0] for a in g.values())
    qq = sum(a[2] for a in g.values())
    ssb = sg - (ss * ss) // nn
    ssw = qq - sg
    f_milli = (1000 * ssb * (nn - k)) // (ssw * (k - 1))

    (row,) = _q(spark, sf_dir, "anova_f_value")
    assert (row.k_groups, row.n_rows) == (k, nn)
    assert (row.ssb_cents2, row.ssw_cents2) == (ssb, ssw)
    assert row.f_milli == f_milli

    # bracket: the DEFINED floor(S_g²/n_g) grain sits within k cents²
    # of the exact rational sums
    sg_exact = sum(Fraction(a[1] * a[1], a[0]) for a in g.values())
    ssb_exact = sg_exact - Fraction(ss * ss, nn)
    assert 0 <= ssb_exact - ssb < k + 1
    # sg floors per group, so ssw = qq − sg sits ABOVE the exact value
    assert 0 <= ssw - (qq - sg_exact) < k + 1

    # mutation: the between-groups df slip (k for k−1) must move F —
    # it scales F by (k−1)/k at every corpus size, unlike the N−1/N−k
    # slip whose sub-milli shift vanishes for large N
    assert (1000 * ssb * (nn - k)) // (ssw * k) != row.f_milli
    assert k > 2 and ssw > 0 and row.f_milli > k  # vacuity


# ---------------------------------------------------------------------------
# Kruskal-Wallis H
# ---------------------------------------------------------------------------
def test_kruskal_wallis_formula_exact(spark, sf_dir, event_rows):
    # the synthetic corpus carries no NULL values (asserted — NULL
    # ranking semantics would otherwise need replicating here)
    assert all(v is not None for v in event_rows["value"])
    non_null = [
        (_cents(v), e)
        for e, v in zip(event_rows["event_type"], event_rows["value"])
    ]
    nn = len(non_null)
    # doubled midranks at distinct-value grain from one Python sort
    mult: dict = defaultdict(int)
    for c, _ in non_null:
        mult[c] += 1
    m2: dict = {}
    cum = 0
    for c in sorted(mult):
        t = mult[c]
        m2[c] = 2 * (cum + t) - t + 1  # min+max rank, doubled midrank
        cum += t
    grp: dict = defaultdict(lambda: [0, 0])
    for c, e in non_null:
        grp[e][0] += 1
        grp[e][1] += m2[c]
    k = len(grp)
    tsum = sum(t**3 - t for t in mult.values())
    snd = 0
    for n_g, r2 in grp.values():
        d = (1024 * r2) // n_g - 1024 * (nn + 1)
        snd += n_g * d * d
    h_milli = (12000 * snd * (nn - 1)) // max(
        4194304 * (nn**3 - nn - tsum), 1
    )

    (row,) = _q(spark, sf_dir, "kruskal_wallis_values")
    assert (row.k_groups, row.n_rows) == (k, nn)
    assert row.tie_sum == tsum
    assert row.h_milli == h_milli

    # mutation: the min-rank tie slip (rank(), not midrank) must move H
    m2_min: dict = {}
    cum = 0
    for c in sorted(mult):
        m2_min[c] = 2 * (cum + 1)  # doubled MIN rank
        cum += mult[c]
    snd_mut = 0
    for e, (n_g, _) in grp.items():
        r2 = sum(m2_min[c] for c, ee in non_null if ee == e)
        d = (1024 * r2) // n_g - 1024 * (nn + 1)
        snd_mut += n_g * d * d
    h_mut = (12000 * snd_mut * (nn - 1)) // max(
        4194304 * (nn**3 - nn - tsum), 1
    )
    assert h_mut != row.h_milli
    # vacuity: cents values are heavily tied, so min-rank ≠ midrank
    assert tsum > 0 and max(mult.values()) > 1


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------
def test_benford_constants_exact_and_audit(spark, sf_dir, event_rows):
    from eventsourcing_spark.analytics import _BENFORD_PPM

    # exact pin on round(1e6·log10(1+1/d)): r is the nearest integer
    # iff 10^(2r−1) < ((d+1)/d)^(2·10⁶) < 10^(2r+1) — pure-integer
    # power brackets, no floats anywhere (ties at .5 would need the
    # impossible equality of a rational power of 10)
    for d in range(1, 10):
        r = _BENFORD_PPM[d]
        lhs_num = (d + 1) ** (2 * 10**6)
        lhs_den = d ** (2 * 10**6)
        assert 10 ** (2 * r - 1) * lhs_den < lhs_num, d
        assert lhs_num < 10 ** (2 * r + 1) * lhs_den, d
        # mutation: the natural-log-base slip must miss the pin
        r_ln = round(10**6 * math.log(1 + 1 / d))
        assert not (
            10 ** (2 * r_ln - 1) * lhs_den < lhs_num < 10 ** (2 * r_ln + 1) * lhs_den
        ), d
    assert sum(_BENFORD_PPM.values()) in (999999, 1000000, 1000001)

    counts: dict = defaultdict(int)
    for e, v in zip(event_rows["event_type"], event_rows["value"]):
        if v is None:
            continue
        c = round(v * 100)
        if c >= 1:
            counts[(e, int(str(c)[0]))] += 1
    totals: dict = defaultdict(int)
    for (e, d), n in counts.items():
        totals[e] += n

    rows = _q(spark, sf_dir, "benford_value_audit")
    assert {(r.event_type, r.first_digit) for r in rows} == set(counts)
    for r in rows:
        n = counts[(r.event_type, r.first_digit)]
        assert r.n == n
        obs = (10**6 * n) // totals[r.event_type]
        assert r.observed_ppm == obs
        assert r.benford_ppm == _BENFORD_PPM[r.first_digit]
        assert r.deviation_ppm == abs(obs - _BENFORD_PPM[r.first_digit])
    assert len({r.event_type for r in rows}) > 1  # vacuity


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------
def test_cusum_formula_exact(spark, sf_dir, event_rows):
    series: dict = defaultdict(list)
    for u, eid, ts, v in zip(
        event_rows["user_id"],
        event_rows["event_id"],
        event_rows["ts"],
        event_rows["value"],
    ):
        series[u].append((ts, eid, 0 if v is None else _cents(v)))
    expect: dict = {}
    for u, rows in series.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        n = len(rows)
        s = sum(r[2] for r in rows)
        prefix = 0
        best, best_id = -1, None
        for i, (_, eid, y) in enumerate(rows, start=1):
            prefix += y
            a = abs(n * prefix - i * s)
            if a > best or (a == best and eid < best_id):
                best, best_id = a, eid
        expect[u] = (best, best_id)

    got = {
        r.user_id: (r.max_cusum_scaled, r.changepoint_event_id)
        for r in _q(spark, sf_dir, "cusum_changepoint")
    }
    assert got == expect

    # mutation: the off-by-one prefix weight (i−1 for i) must move at
    # least one user's statistic
    moved = 0
    for u, rows in series.items():
        n = len(rows)
        s = sum(r[2] for r in rows)
        prefix = 0
        best = -1
        for i, (_, _, y) in enumerate(rows, start=1):
            prefix += y
            best = max(best, abs(n * prefix - (i - 1) * s))
        if best != expect[u][0]:
            moved += 1
    assert moved > 0
    # vacuity: users with ≥2 events and nonzero totals exist
    assert any(len(r) >= 2 and sum(x[2] for x in r) != 0
               for r in series.values())


# ---------------------------------------------------------------------------
# Two-sample KS by source
# ---------------------------------------------------------------------------
def test_ks_by_source_formula_exact(spark, sf_dir):
    from eventsourcing_spark.pipeline.quality import (
        STOPWORDS,
        W_MWL,
        W_STOP,
        W_TOK,
        W_UNIQ,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    scores: list = []
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        toks = text.lower().split(" ")  # keeps empties, like split()
        n = len(toks)
        score = (
            W_TOK * n
            + W_MWL * ((sum(len(x) for x in toks) * 10) // n)
            + W_STOP * ((sum(x in STOPWORDS for x in toks) * 1000) // n)
            + W_UNIQ * ((len(set(toks)) * 1000) // n)
        )
        scores.append((src, score))
    n_tot = len(scores)
    srcs = sorted({s for s, _ in scores})
    grid = sorted({sc for _, sc in scores})
    by: dict = defaultdict(lambda: defaultdict(int))
    for s, sc in scores:
        by[s][sc] += 1
    pooled: dict = defaultdict(int)
    for _, sc in scores:
        pooled[sc] += 1
    expect: dict = {}
    for s in srcs:
        n_s = sum(by[s].values())
        cum_s = cum_all = 0
        best, at = -1, None
        for sc in grid:
            cum_s += by[s].get(sc, 0)
            cum_all += pooled[sc]
            num = abs(cum_s * (n_tot - n_s) - (cum_all - cum_s) * n_s)
            if num > best:
                best, at = num, sc
        expect[s] = (
            n_s,
            best,
            (10**6 * best) // (n_s * (n_tot - n_s)),
            at,
        )

    rows = _q(spark, sf_dir, "ks_quality_by_source")
    got = {
        r.source: (r.n_docs, r.ks_num, r.ks_ppm, r.ks_at_score)
        for r in rows
    }
    assert got == expect

    # mutation: the normalization slip — dividing by n_s·n_tot (the
    # source-vs-POOLED denominator) instead of n_s·n_rest — must move
    # ks_ppm for every source with a nonzero statistic. (The numerator
    # admits no pooled slip: cum_s·n_tot − cum_all·n_s algebraically
    # EQUALS cum_s·n_rest − cum_rest·n_s, and the left-continuous CDF
    # slip only shifts the same step sequence, leaving the max — both
    # are identities, not catchable mutations, so the denominator
    # carries the guard.)
    moved = 0
    for s in srcs:
        n_s, ks_num, ks_ppm, _ = expect[s]
        if ks_num and (10**6 * ks_num) // (n_s * n_tot) != ks_ppm:
            moved += 1
    assert moved == sum(1 for s in srcs if expect[s][1])
    assert moved > 0 and len(srcs) > 1 and len(grid) > 3  # vacuity


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
