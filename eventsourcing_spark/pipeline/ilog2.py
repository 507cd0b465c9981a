"""Fixed-point integer base-2 logarithm kernel.

The classic repeated-squaring binary-digit algorithm (Majithia & Levan
1973; the CORDIC-family schoolbook method): normalize the mantissa to
[2^S, 2^(S+1)) with S = 28 fraction bits, then 20 rounds of "square;
if >= 2, emit bit and halve" in pure BIGINT ops. Both engines run the
SAME integer recurrence, so ``ilog2_fx(x) ~= floor(2^20 * log2 x)`` is
bit-identical by construction — no libm/StrictMath transcendental ever
runs, which is what makes log-space scores value-hash-comparable
across engines. Measured error < 1 fixed-point ulp over 1..5000 and at
2^31..2^40; valid domain 1 <= x < 2^63 (mantissa squaring peaks at
2^58).

A leaf module on purpose (round 10): the kernel's consumers span
nb_classifier, quality, retrieval, ridge and the streaming twins, and
housing it inside nb_classifier created a quality <-> nb_classifier
import cycle that made module import order-dependent. nb_classifier
re-exports every name so existing import sites keep working.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Fixed-point integer log2 kernel (shared by every NB query).
# ---------------------------------------------------------------------------
ILOG_S = 28  # mantissa fraction bits (m² ≤ 2^58 < 2^63)
ILOG_F = 20  # output fraction bits: ilog2_fx(x) ≈ floor(2^20 · log2 x)
_P2S = 1 << ILOG_S
_P2S1 = 1 << (ILOG_S + 1)
_P2F = 1 << ILOG_F


def ilog2_spark(x: str) -> str:
    """Spark SQL fragment: fixed-point log2 of integer expression ``x``
    (1 ≤ x < 2^63) via 20 repeated-squaring rounds in exact BIGINT."""
    b = f"(length(bin({x})) - 1)"
    m0 = (
        f"CASE WHEN {b} >= {ILOG_S}"
        f" THEN shiftright(CAST({x} AS BIGINT), {b} - {ILOG_S})"
        f" ELSE shiftleft(CAST({x} AS BIGINT), {ILOG_S} - {b}) END"
    )
    return (
        f"({b} * CAST({_P2F} AS BIGINT) + "
        f"aggregate(sequence(1, {ILOG_F}),"
        f" named_struct('m', {m0}, 'r', CAST(0 AS BIGINT)),"
        f" (a, z) -> CASE WHEN (a.m * a.m) div {_P2S} >= {_P2S1}"
        f" THEN named_struct('m', shiftright((a.m * a.m) div {_P2S}, 1),"
        f" 'r', a.r * 2 + 1)"
        f" ELSE named_struct('m', (a.m * a.m) div {_P2S}, 'r', a.r * 2) END,"
        f" a -> a.r))"
    )


def ilog2_duck(x: str) -> str:
    """DuckDB twin of ``ilog2_spark`` — the same integer recurrence
    with the (m, r) state PACKED into one BIGINT accumulator
    (``acc = m·2^F + r``; m ≤ 2^29 and r < 2^20 so acc < 2^50).

    Why packed and not a struct accumulator: DuckDB 1.0.0's
    ``list_reduce`` with a STRUCT-typed accumulator returns
    context-dependent WRONG values — the same scalar input computes
    correctly in one query shape and garbage in another (reproduced
    10/10 on a 5-row VALUES list: 854 → 11130329 instead of 10211129,
    plus an impossible 4.7e9² overflow, i.e. cross-row accumulator
    contamination in the vectorized lambda). The BIGINT-packed form is
    correct 10/10 in the failing context and over a 1..20000 sweep.
    list_reduce has no init arg, so the packed seed is prepended and
    the list elements are ignored."""
    b = f"(length(bin({x})) - 1)"
    m0 = (
        f"CASE WHEN {b} >= {ILOG_S}"
        f" THEN ({x})::BIGINT >> ({b} - {ILOG_S})"
        f" ELSE ({x})::BIGINT << ({ILOG_S} - {b}) END"
    )
    mm = f"(((a >> {ILOG_F}) * (a >> {ILOG_F})) >> {ILOG_S})"
    step = (
        f"CASE WHEN {mm} >= {_P2S1}"
        f" THEN (({mm} >> 1) << {ILOG_F}) + (a & {_P2F - 1}) * 2 + 1"
        f" ELSE ({mm} << {ILOG_F}) + (a & {_P2F - 1}) * 2 END"
    )
    return (
        f"({b} * {_P2F} + (list_reduce("
        f"list_concat([({m0}) << {ILOG_F}],"
        f" list_transform(generate_series(1, {ILOG_F}), i -> 0::BIGINT)),"
        f" (a, z) -> {step}) & {_P2F - 1}))"
    )


def ilog2_py(x: int) -> int:
    """Pure-python reference of the same recurrence (tests)."""
    assert 1 <= x < 1 << 63
    b = x.bit_length() - 1
    m = (x >> (b - ILOG_S)) if b >= ILOG_S else (x << (ILOG_S - b))
    r = 0
    for _ in range(ILOG_F):
        m = (m * m) >> ILOG_S
        if m >= _P2S1:
            m >>= 1
            r = r * 2 + 1
        else:
            r = r * 2
    return b * _P2F + r
