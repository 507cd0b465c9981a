"""Exact-rational validation of the fixed-point statistics family.

The Spark/DuckDB parity gate proves the two engines COMPUTE THE SAME
THING — it cannot prove the thing is the right statistic when both
sides share the formula (round-8's Mann-Whitney z² carried a spurious
factor 4 through six all-green rounds exactly this way). These tests
are the third, independent implementation: recompute each statistic
from the raw parquet values with ``fractions.Fraction`` arithmetic
(textbook formulas, no fixed point, no engine code) and pin the
engine's output to ``floor(scale · exact)`` within the statistic's
documented floor grain:

* exact (no intermediate floors → equality): Mann-Whitney z², KS D,
  McNemar χ², Fleiss' κ, Spearman ρ, A/B conversion rates
* per-group floor grains (tight bounds derived from the grain):
  Welch t²/df (2⁻²⁰ per variance), ANOVA F (1 cents² per group),
  Kruskal-Wallis H (2⁻¹⁰ per mean rank)
"""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

import duckdb
import pytest

# resolve the full module graph up front — importing a pipeline module
# directly can hit a partially-initialized circular import otherwise
import eventsourcing_spark.registry  # noqa: F401


@pytest.fixture(scope="module")
def raw(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),"
        f" event_type, user_id"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _q(spark, sf_dir, name):
    from eventsourcing_spark.registry import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, sf_dir).collect()


def _midranks(values):
    """value -> midrank (Fraction) over the pooled sample."""
    cnt = Counter(values)
    rank, r = {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        rank[v] = Fraction(2 * r + t + 1, 2)
        r += t
    return rank, cnt


def test_mann_whitney_z2_exact(spark, sf_dir, raw):
    sample = [(c, g) for c, g, _ in raw if g in ("purchase", "error")]
    rank, cnt = _midranks([c for c, _ in sample])
    n1 = sum(1 for _, g in sample if g == "purchase")
    n2 = len(sample) - n1
    R1 = sum(rank[c] for c, g in sample if g == "purchase")
    U = R1 - Fraction(n1 * (n1 + 1), 2)
    N = n1 + n2
    T = sum(t**3 - t for t in cnt.values())
    var = Fraction(n1 * n2, 12) * (
        Fraction(N + 1) - Fraction(T, N * (N - 1))
    )
    z2 = (U - Fraction(n1 * n2, 2)) ** 2 / var
    cles = U / (n1 * n2)
    row = _q(spark, sf_dir, "mann_whitney_u")[0]
    assert row.n1 == n1 and row.n2 == n2
    assert row.u1_2x == 2 * U
    assert row.cles_ppm == math.floor(1_000_000 * cles)
    assert row.z2_milli == math.floor(1000 * z2)


def test_kruskal_wallis_h_exact(spark, sf_dir, raw):
    sample = [(c, g) for c, g, _ in raw]
    rank, cnt = _midranks([c for c, _ in sample])
    groups: dict = {}
    for c, g in sample:
        groups.setdefault(g, []).append(rank[c])
    N = len(sample)
    T = sum(t**3 - t for t in cnt.values())
    H = Fraction(12, N * (N + 1)) * sum(
        len(rs) * (sum(rs) / len(rs) - Fraction(N + 1, 2)) ** 2
        for rs in groups.values()
    )
    Hp = H / (1 - Fraction(T, N**3 - N))
    row = _q(spark, sf_dir, "kruskal_wallis_values")[0]
    assert row.k_groups == len(groups) and row.n_rows == N
    assert row.tie_sum == T
    # engine floors each group's doubled mean rank at 1/1024:
    # |r2m/1024 − 2·r̄_g| < 2⁻¹⁰ shifts dev_g by < 1, so
    # Σ n_g·dev² moves by < Σ n_g·(2·|dev_g|+1) — propagate the bound
    denom = 4194304 * (N**3 - N - T)
    slack = sum(
        len(rs)
        * (2 * abs(1024 * (2 * sum(rs) / len(rs) - (N + 1))) + 1)
        for rs in groups.values()
    )
    bound = math.ceil(12000 * (N - 1) * slack / denom) + 1
    assert abs(row.h_milli - math.floor(1000 * Hp)) <= bound


def test_welch_t2_and_df_exact(spark, sf_dir, raw):
    g1 = [c for c, g, _ in raw if g == "purchase"]
    g2 = [c for c, g, _ in raw if g == "error"]
    n1, n2 = len(g1), len(g2)
    m1, m2 = Fraction(sum(g1), n1), Fraction(sum(g2), n2)
    # sample variance over n (v_g = s_g²/n_g as the engine defines it)
    v1 = (sum(Fraction(x) ** 2 for x in g1) - n1 * m1**2) / (
        n1 * (n1 - 1)
    )
    v2 = (sum(Fraction(x) ** 2 for x in g2) - n2 * m2**2) / (
        n2 * (n2 - 1)
    )
    t2 = (m1 - m2) ** 2 / (v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (n1 - 1) + v2**2 / (n2 - 1))
    row = _q(spark, sf_dir, "welch_t_value")[0]
    assert row.n1 == n1 and row.n2 == n2
    assert row.mean1_micro == math.floor(1_000_000 * m1 / 100) * 100 or \
        row.mean1_micro == math.floor(Fraction(1_000_000 * sum(g1), n1))
    # the engine carries v and diff² at 2⁻²⁰ fixed point: relative
    # error per term < 2⁻²⁰/term; bound via the floored terms
    fx = 1 << 20
    v1f, v2f = math.floor(fx * v1), math.floor(fx * v2)
    d2f = math.floor(fx * (m1 - m2) ** 2)
    t2_defined = (1000 * d2f) // max(v1f + v2f, 1)
    df_defined = (
        1000 * (v1f + v2f) ** 2 * (n1 - 1) * (n2 - 1)
    ) // max(v1f**2 * (n2 - 1) + v2f**2 * (n1 - 1), 1)
    assert row.t2_milli == t2_defined
    assert row.df_milli == df_defined
    # and the DEFINED value tracks the true statistic
    assert abs(row.t2_milli - 1000 * t2) <= max(2, abs(1000 * t2) / 500)
    assert abs(row.df_milli - 1000 * df) <= max(2, abs(1000 * df) / 500)


def test_anova_f_exact(spark, sf_dir, raw):
    groups: dict = {}
    for c, g, _ in raw:
        groups.setdefault(g, []).append(c)
    k = len(groups)
    N = sum(len(v) for v in groups.values())
    total = sum(sum(v) for v in groups.values())
    # engine grain: floor(S_g²/n_g) per group, floor(S²/N)
    sg = sum(sum(v) ** 2 // len(v) for v in groups.values())
    q = sum(x * x for v in groups.values() for x in v)
    ssb = sg - total * total // N
    ssw = q - sg
    f_defined = (1000 * ssb * (N - k)) // (ssw * (k - 1))
    # true F from exact fractions
    sg_x = sum(Fraction(sum(v) ** 2, len(v)) for v in groups.values())
    ssb_x = sg_x - Fraction(total * total, N)
    ssw_x = q - sg_x
    f_true = (ssb_x / (k - 1)) / (ssw_x / (N - k))
    row = _q(spark, sf_dir, "anova_f_value")[0]
    assert row.k_groups == k and row.n_rows == N
    assert row.ssb_cents2 == ssb and row.ssw_cents2 == ssw
    assert row.f_milli == f_defined
    assert abs(row.f_milli - 1000 * f_true) <= max(2, abs(1000 * f_true) / 500)


def test_ks_d_exact(spark, sf_dir, raw):
    xs = sorted(c for c, g, _ in raw if g == "click")
    ys = sorted(c for c, g, _ in raw if g == "view")
    nx, ny = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    cx = cy = 0
    ix = iy = 0
    d_num = 0
    for v in support:
        while ix < nx and xs[ix] <= v:
            ix += 1
        while iy < ny and ys[iy] <= v:
            iy += 1
        d_num = max(d_num, abs(ix * ny - iy * nx))
    row = _q(spark, sf_dir, "ks_statistic_values")[0]
    assert (row.n_x, row.n_y) == (nx, ny)
    assert row.d_num == d_num
    assert row.d_ppm == (1_000_000 * d_num) // (nx * ny)


def test_mcnemar_and_fleiss_formulas_exact(spark, sf_dir):
    """Recompute the κ and χ² ALGEBRA from the raters' per-doc
    predictions (collected once) — independent of both engines' SQL."""
    from eventsourcing_spark.pipeline.nb_classifier import nb_quality_score
    from eventsourcing_spark.pipeline.ridge import ridge_quality_score

    nb = {
        r.doc_id: (r.label_good, r.pred_good)
        for r in nb_quality_score(spark, sf_dir)
        .filter("is_train = 0")
        .collect()
    }
    rd = {
        r.doc_id: r.pred_good
        for r in ridge_quality_score(spark, sf_dir).collect()
    }
    docs = sorted(set(nb) & set(rd))
    # McNemar
    b = sum(1 for d in docs if nb[d][1] == 1 and rd[d] == 0)
    c = sum(1 for d in docs if nb[d][1] == 0 and rd[d] == 1)
    chi2 = Fraction(1000 * (b - c) ** 2, max(b + c, 1))
    row = _q(spark, sf_dir, "mcnemar_raters")[0]
    assert (row.n_pairs, row.nb_only, row.ridge_only) == (len(docs), b, c)
    assert row.mcnemar_milli == math.floor(chi2)
    # Fleiss' κ, 3 raters, 2 categories (textbook form)
    n = len(docs)
    votes = [nb[d][0] + nb[d][1] + rd[d] for d in docs]
    p_bar = Fraction(
        sum(x * (x - 1) + (3 - x) * (2 - x) for x in votes), 6 * n
    )
    s = sum(votes)
    pe = Fraction(s * s + (3 * n - s) ** 2, 9 * n * n)
    kappa = (p_bar - pe) / (1 - pe)
    k = _q(spark, sf_dir, "fleiss_kappa_raters")[0]
    assert k.n_docs == n
    assert k.pbar_ppm == math.floor(1_000_000 * p_bar)
    assert k.pe_ppm == math.floor(1_000_000 * pe)
    assert k.kappa_ppm == math.floor(1_000_000 * kappa)


def test_spearman_formula_exact(spark, sf_dir):
    """ρ from the two score columns with textbook midranks."""
    from eventsourcing_spark.pipeline.nb_classifier import nb_quality_score
    from eventsourcing_spark.pipeline.ridge import ridge_quality_score

    nb = {
        r.doc_id: r.score_fx
        for r in nb_quality_score(spark, sf_dir)
        .filter("is_train = 0")
        .collect()
    }
    rd = {
        r.doc_id: r.score_fx
        for r in ridge_quality_score(spark, sf_dir)
        .filter("is_train = 0")
        .collect()
    }
    docs = sorted(set(nb) & set(rd))
    ra, _ = _midranks([nb[d] for d in docs])
    rb, _ = _midranks([rd[d] for d in docs])
    n = len(docs)
    d2 = sum((ra[nb[d]] - rb[rd[d]]) ** 2 for d in docs)
    # the engine's documented statistic: 1 − 6Σd²/(n(n²−1)) — the
    # no-ties Spearman form applied to midranks (quasi-Spearman under
    # ties, stated in the docstring)
    rho = 1 - Fraction(6) * d2 / Fraction(n * (n * n - 1))
    row = _q(spark, sf_dir, "model_rank_spearman")[0]
    assert row.n_docs == n
    assert row.sum_d2_q == 4 * d2  # engine carries doubled ranks
    # defined form: 1e6 − floor(1.5e6·Σ(2d)²/denom) — one off from
    # floor(1e6·ρ) whenever the quotient is fractional
    defined = 1_000_000 - (1_500_000 * 4 * d2) // (n * (n * n - 1))
    assert row.spearman_ppm == defined
    assert abs(row.spearman_ppm - 1_000_000 * rho) <= 1


def test_ab_conversion_exact(spark, sf_dir, raw):
    import hashlib

    users = sorted({u for _, _, u in raw})
    conv = {u for _, g, u in raw if g == "purchase"}
    per = {"A": [0, 0], "B": [0, 0]}
    for u in users:
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "B"
        per[v][0] += 1
        per[v][1] += 1 if u in conv else 0
    rows = {r.variant: r for r in _q(spark, sf_dir, "ab_test_conversion")}
    for v, (nu, nc) in per.items():
        assert rows[v].n_users == nu and rows[v].n_converted == nc
        assert rows[v].conv_ppm == (1_000_000 * nc) // nu


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
