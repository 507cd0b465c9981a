"""The two mathematical claims isotonic_calibration_pav stands on.

The gate query (pipeline/nb_classifier.py::isotonic_calibration_pav)
computes the isotonic regression NOT by the sequential pool-adjacent-
violators loop but by the minimax identity

    fit[k] = max_{i<=k} min_{j>=k} mean(y over buckets i..j)

carried entirely in integer fraction keys floor(num*SCALE/den). That is
only correct if (1) the minimax identity equals sequential PAV, and
(2) flooring the fraction keys commutes with the min/max lattice ops so
the integer pipeline emits exactly floor(SCALE * fit). The oracle
replays the same formula, so the DuckDB gate alone can't catch an
error in the IDENTITY itself — these property tests pin it against the
textbook algorithm over exact rationals (no Spark needed).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

SCALE = 10**12


def pav_sequential(cnt: list[int], pos: list[int]) -> list[Fraction]:
    """Textbook pool-adjacent-violators over (weight, mean) blocks."""
    blocks: list[tuple[int, int]] = []  # (cnt, pos)
    for c, p in zip(cnt, pos):
        blocks.append((c, p))
        while len(blocks) >= 2:
            c2, p2 = blocks[-1]
            c1, p1 = blocks[-2]
            if Fraction(p1, c1) <= Fraction(p2, c2):
                break
            blocks[-2:] = [(c1 + c2, p1 + p2)]
    # blocks cover contiguous runs; rebuild per-bucket values
    vals: list[Fraction] = []
    i = 0
    for c, p in blocks:
        # count how many original buckets this block absorbed by
        # consuming their weights
        w = 0
        start = i
        while w < c:
            w += cnt[i]
            i += 1
        vals.extend([Fraction(p, c)] * (i - start))
    return vals


def pav_minimax(cnt: list[int], pos: list[int]) -> list[Fraction]:
    b = len(cnt)
    pre_p = [0]
    pre_c = [0]
    for c, p in zip(cnt, pos):
        pre_p.append(pre_p[-1] + p)
        pre_c.append(pre_c[-1] + c)

    def avg(i: int, j: int) -> Fraction:  # buckets i..j inclusive
        return Fraction(pre_p[j + 1] - pre_p[i], pre_c[j + 1] - pre_c[i])

    return [
        max(min(avg(i, j) for j in range(k, b)) for i in range(k + 1))
        for k in range(b)
    ]


def pav_intkeys(cnt: list[int], pos: list[int]) -> list[int]:
    """The gate query's integer pipeline: floor keys, then min/max."""
    b = len(cnt)
    pre_p = [0]
    pre_c = [0]
    for c, p in zip(cnt, pos):
        pre_p.append(pre_p[-1] + p)
        pre_c.append(pre_c[-1] + c)

    def key(i: int, j: int) -> int:
        return (pre_p[j + 1] - pre_p[i]) * SCALE // (pre_c[j + 1] - pre_c[i])

    return [
        max(min(key(i, j) for j in range(k, b)) for i in range(k + 1))
        for k in range(b)
    ]


bins = st.lists(
    st.tuples(st.integers(1, 25), st.integers(0, 25)).map(
        lambda t: (t[0], min(t[1], t[0]))
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(bins)
def test_minimax_equals_sequential_pav(data):
    cnt = [c for c, _ in data]
    pos = [p for _, p in data]
    seq = pav_sequential(cnt, pos)
    mm = pav_minimax(cnt, pos)
    assert seq == mm


@settings(max_examples=300, deadline=None)
@given(bins)
def test_integer_keys_are_floor_of_exact_fit(data):
    cnt = [c for c, _ in data]
    pos = [p for _, p in data]
    exact = pav_minimax(cnt, pos)
    keys = pav_intkeys(cnt, pos)
    # floor commutes with min/max, so the integer pipeline must emit
    # exactly floor(SCALE * fit) — and therefore the query's ppm output
    # is floor(1e6 * fit) via the nested-floor identity
    assert keys == [(f.numerator * SCALE) // f.denominator for f in exact]
    for k, f in zip(keys, exact):
        assert k // 10**6 == (f.numerator * 10**6) // f.denominator


@settings(max_examples=200, deadline=None)
@given(bins)
def test_fit_is_monotone(data):
    cnt = [c for c, _ in data]
    pos = [p for _, p in data]
    mm = pav_minimax(cnt, pos)
    assert all(a <= b for a, b in zip(mm, mm[1:]))
