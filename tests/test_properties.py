"""Property-based tests (hypothesis) for the scalar primitives.

The reference has no property tests (SURVEY §5.6); these extend the
golden vectors with randomized coverage of the parity-critical
primitives — ULID codec round-trips and FNV column/Python agreement.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from eventsourcing_spark.functions.hashing import fnv1a_32_py
from eventsourcing_spark.functions.ulid import (
    _decode_py,
    _encode_py,
    ulid_millis_py,
    ulid_py,
)

ASCII = st.text(alphabet=string.printable, max_size=64)


@given(ms=st.integers(min_value=0, max_value=(1 << 48) - 1),
       entropy=st.integers(min_value=0, max_value=(1 << 80) - 1))
def test_ulid_roundtrip(ms, entropy):
    u = ulid_py(ms, entropy)
    assert len(u) == 26
    assert ulid_millis_py(u) == ms
    assert _decode_py(u[10:]) == entropy


@given(a=st.integers(min_value=0, max_value=(1 << 48) - 1),
       b=st.integers(min_value=0, max_value=(1 << 48) - 1))
def test_ulid_order_embeds_time_order(a, b):
    # zero-entropy ULIDs sort exactly like their timestamps
    ua, ub = ulid_py(a, 0), ulid_py(b, 0)
    assert (ua < ub) == (a < b)


@given(s=ASCII)
def test_fnv_stays_in_int32_positive_range(s):
    h = fnv1a_32_py(s)
    assert 0 <= h <= 0x7FFFFFFF


@settings(max_examples=20, deadline=None)
@given(strings=st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + "-_", max_size=40),
    min_size=1, max_size=20, unique=True,
))
def test_fnv_column_matches_python_on_random_ascii(spark, strings):
    from eventsourcing_spark.functions.hashing import fnv1a_32

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    for row in df.select("s", fnv1a_32("s").alias("h")).collect():
        assert row.h == fnv1a_32_py(row.s), row.s


@settings(max_examples=20, deadline=None)
@given(pairs=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=(1 << 48) - 1),
        st.integers(min_value=0, max_value=(1 << 80) - 1),
    ),
    min_size=1, max_size=20,
))
def test_ulid_millis_column_matches_python(spark, pairs):
    from eventsourcing_spark.functions.ulid import ulid_millis

    df = spark.createDataFrame(
        [(ulid_py(ms, ent),) for ms, ent in pairs], "id string"
    )
    for row in df.select("id", ulid_millis("id").alias("ms")).collect():
        assert row.ms == ulid_millis_py(row.id)


# ---------------------------------------------------------------------------
# As-of joins vs a brute-force python reference on random tiny frames.
# Catches frame/tie/null mistakes the fixed scenarios can't enumerate.
# ---------------------------------------------------------------------------

_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=20),   # ts (small range → ties)
    ),
    min_size=0, max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(lrows=_asof_rows, rrows=_asof_rows)
def test_asof_directions_match_bruteforce(spark, lrows, rrows):
    import datetime as dt

    from eventsourcing_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    def ts(t):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=t)

    left = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(lrows)],
        "k long, ts timestamp, lid long",
    )
    # unique (key, ts) on the right — the operator contract
    seen, runiq = set(), []
    for k, t in rrows:
        if (k, t) not in seen:
            seen.add((k, t))
            runiq.append((k, t))
    right = spark.createDataFrame(
        [(k, ts(t), k * 1000 + t) for k, t in runiq],
        "k long, ts timestamp, rv long",
    )

    back = {
        r.lid: r.rv
        for r in asof_join_backward(
            left, right, ["k"], "ts", "ts", ["rv"]
        ).collect()
    }
    fwd = {
        r.lid: r.rv
        for r in asof_join_forward(
            left, right, ["k"], "ts", "ts", ["rv"]
        ).collect()
    }

    assert set(back) == set(range(len(lrows)))
    assert set(fwd) == set(range(len(lrows)))
    for i, (k, t) in enumerate(lrows):
        prior = [(tt, rv) for (kk, tt, rv) in
                 ((k2, t2, k2 * 1000 + t2) for k2, t2 in runiq)
                 if kk == k and tt <= t]
        nxt = [(tt, rv) for (kk, tt, rv) in
               ((k2, t2, k2 * 1000 + t2) for k2, t2 in runiq)
               if kk == k and tt >= t]
        assert back[i] == (max(prior)[1] if prior else None), (i, k, t)
        assert fwd[i] == (min(nxt)[1] if nxt else None), (i, k, t)


@given(
    n=st.integers(min_value=1, max_value=400),
    k=st.sampled_from([2, 3, 4, 7, 10, 16]),
)
@settings(max_examples=60, deadline=None)
def test_ntile_closed_form_matches_definition(n, k):
    """operators.ranking.ntile_expr's integer closed form must implement
    ANSI ntile sizing exactly: the first n % k tiles get n // k + 1 rows,
    the rest n // k — verified for every rank without Spark by evaluating
    the same arithmetic in Python."""

    def closed_form(r):
        base, rem = n // k, n % k
        cutoff = rem * (base + 1)
        if r <= cutoff:
            return 1 + (r - 1) // (base + 1)
        return 1 + rem + (r - cutoff - 1) // max(base, 1)

    # definition: assign ranks 1..n greedily into k tiles with ANSI sizes
    sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
    want, tile = [], 1
    for sz in sizes:
        want.extend([tile] * sz)
        tile += 1
    got = [closed_form(r) for r in range(1, n + 1)]
    assert got == want
