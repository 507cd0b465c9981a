"""Golden tests for the scalar-function layer (SURVEY.md §2.8 X1-X5).

FNV-1a vectors are the public test vectors of the algorithm; the ULID
vector is the canonical example from the ULID spec.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from eventsourcing_spark.functions import (
    UlidGenerator,
    calc_partition,
    fnv1a_32,
    fnv1a_32_py,
    split_predicate,
    ulid_millis,
    ulid_random,
    ulid_time_only,
    ulid_time_only_py,
    ulid_timestamp,
)
from eventsourcing_spark.functions.ulid import ulid_millis_py

# public FNV-1a 32-bit vectors (before sign-bit clearing)
FNV_VECTORS = {
    "": 0x811C9DC5,
    "a": 0xE40C292C,
    "foobar": 0xBF9CF968,
    "hello": 0x4F9F2CAB,
}


def test_fnv1a_py_golden():
    for s, want in FNV_VECTORS.items():
        assert fnv1a_32_py(s) == want & 0x7FFFFFFF, s


def test_fnv1a_column_matches_py(spark):
    strs = list(FNV_VECTORS) + ["01ARZ3NDEKTSV4RRFFQ69G5FAV", "Account", "abc-123"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = df.select("s", fnv1a_32("s").alias("h")).collect()
    for r in rows:
        assert r.h == fnv1a_32_py(r.s), r.s


def test_fnv1a_column_matches_py_non_ascii(spark):
    """Byte-level parity on non-ASCII ids (util/common.go:44 hashes raw
    bytes): the column fold must equal the UTF-8-byte Python twin for
    multibyte codepoints, not just ASCII."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # deterministic multilingual fixtures + property fuzz
    fixed = ["café", "naïve-id", "日本語", "Ωmega", "🚀rocket", "ümlaut", ""]
    df = spark.createDataFrame([(s,) for s in fixed], "s string")
    for r in df.select("s", fnv1a_32("s").alias("h")).collect():
        assert r.h == fnv1a_32_py(r.s), r.s

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=1,
                    max_codepoint=0x10FFF,
                    exclude_categories=("Cs",),  # no lone surrogates
                ),
                max_size=24,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def prop(strs):
        d = spark.createDataFrame([(s,) for s in strs], "s string")
        for r in d.select("s", fnv1a_32("s").alias("h")).collect():
            assert r.h == fnv1a_32_py(r.s), repr(r.s)

    prop()


def test_calc_partition(spark):
    df = spark.range(1).select(
        calc_partition(F.lit(7), 3).alias("a"),
        calc_partition(F.lit(7), 1).alias("b"),
        calc_partition(F.lit(12), 12).alias("c"),
    )
    row = df.first()
    assert (row.a, row.b, row.c) == (2, 1, 1)


def test_split_predicate(spark):
    df = spark.range(10).select(F.col("id").cast("int").alias("h"))
    got = df.filter(split_predicate("h", 4, [0, 2])).count()
    assert got == 5  # h mod 4 ∈ {0,2} over 0..9 → {0,2,4,6,8}
    # all-splits-selected shortcut keeps everything
    assert df.filter(split_predicate("h", 4, [0, 1, 2, 3])).count() == 10


# canonical ULID spec example; time part decodes to 2016-07-30T23:54:10.259Z
SPEC_ULID = "01ARZ3NDEKTSV4RRFFQ69G5FAV"
SPEC_MS = 1469922850259


def test_ulid_millis_py_golden():
    assert ulid_millis_py(SPEC_ULID) == SPEC_MS


def test_ulid_column_roundtrip(spark):
    t = datetime(2024, 5, 1, 12, 0, 0, 123000, tzinfo=timezone.utc)
    df = spark.createDataFrame([(SPEC_ULID, t)], "id string, ts timestamp")
    row = df.select(
        ulid_millis("id").alias("ms"),
        ulid_timestamp("id").alias("et"),
        ulid_time_only("ts").alias("boundary"),
        ulid_random("ts").alias("rand_id"),
    ).first()
    assert row.ms == SPEC_MS
    assert row.et == datetime.utcfromtimestamp(SPEC_MS / 1000)
    assert row.boundary == ulid_time_only_py(t)
    assert len(row.boundary) == 26
    assert len(row.rand_id) == 26
    # embedded time of generated ID round-trips
    assert ulid_millis_py(row.rand_id) == int(t.timestamp() * 1000)
    # boundary sorts before any real id of the same ms
    assert row.boundary < row.rand_id or row.rand_id[10:] == "0" * 16


def test_ulid_generator_monotonic():
    fixed = datetime(2024, 5, 1, tzinfo=timezone.utc)
    gen = UlidGenerator(after=fixed, now_fn=lambda: fixed)
    ids = [gen.new_id() for _ in range(1000)]
    assert ids == sorted(ids)
    assert len(set(ids)) == 1000
    # all at base+1ms (clock frozen): monotonic within a single millisecond
    assert ulid_millis_py(ids[0]) == int(fixed.timestamp() * 1000) + 1


def test_ulid_generator_after_plus_1ms():
    base = datetime(2024, 5, 1, tzinfo=timezone.utc)
    earlier = datetime(2024, 4, 30, tzinfo=timezone.utc)
    gen = UlidGenerator(after=base, now_fn=lambda: earlier)  # clock skew: now < after
    assert ulid_millis_py(gen.new_id()) == int(base.timestamp() * 1000) + 1


def test_ulid_offset_shifts_time_keeps_entropy(spark):
    from pyspark.sql import functions as F

    from eventsourcing_spark.functions import ulid_millis, ulid_offset

    df = spark.createDataFrame([(SPEC_ULID,)], "id string")
    row = df.select(
        ulid_millis("id").alias("ms"),
        ulid_offset("id", 60_000).alias("fwd"),
        ulid_offset("id", -60_000).alias("back"),
        F.substring("id", 11, 16).alias("entropy"),
    ).first()
    out = df.select(
        ulid_millis(ulid_offset("id", 60_000)).alias("fwd_ms"),
        ulid_millis(ulid_offset("id", -60_000)).alias("back_ms"),
    ).first()
    assert out.fwd_ms == row.ms + 60_000
    assert out.back_ms == row.ms - 60_000
    assert row.fwd[10:] == row.entropy and row.back[10:] == row.entropy
    assert len(row.fwd) == 26
    # ordering: shifting forward moves past the original
    assert row.fwd > SPEC_ULID > row.back


def test_split_balance_sums_to_corpus(spark):
    from eventsourcing_spark.io import load_table
    from eventsourcing_spark.registry import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["split_balance_profile"](spark, sf).collect()
    assert rows and len(rows) <= 12
    assert all(1 <= r["split_id"] <= 12 for r in rows)
    total = load_table(spark, sf, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    # FNV over ~150 streams: no split should be catastrophically hot
    assert max(r["balance_x1000"] for r in rows) < 4000


# ---------------------------------------------------------------------------
# Hilbert layout key (round 5): parity with the classic xy2d transform,
# and the locality property that distinguishes it from Z-order.
# ---------------------------------------------------------------------------


def _xy2d_ref(n, x, y):
    """The public-domain reference transform (Wikipedia "Hilbert curve"),
    implemented independently of the SQL generator under test."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_transform(spark):
    import random

    from eventsourcing_spark.functions.hashing import with_hilbert_key

    rnd = random.Random(11)
    pts = [(rnd.randrange(65536), rnd.randrange(65536)) for _ in range(500)]
    pts += [(0, 0), (0, 65535), (65535, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r.x, r.y): r.hkey for r in with_hilbert_key(df, "x", "y").collect()}
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(65536, x, y), (x, y)
    # bijectivity over the sampled points (distinct keys)
    assert len(set(got.values())) == len(got)


def test_hilbert_path_adjacency_beats_zorder(spark):
    """THE Hilbert property: consecutive keys are always one grid step
    apart (Manhattan distance 1), while Morton order takes seam jumps.
    Verified exhaustively on the full 32x32 grid through the Spark
    expression chain."""
    from eventsourcing_spark.functions.hashing import (
        morton_key_sql,
        with_hilbert_key,
    )

    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(grid, "x long, y long")
    rows = (
        with_hilbert_key(df, "x", "y", bits=5)
        .selectExpr("x", "y", "hkey", morton_key_sql("x", "y", 5) + " AS zkey")
        .collect()
    )
    # complete curve: keys are exactly 0..1023
    assert sorted(r.hkey for r in rows) == list(range(1024))
    by_h = sorted(rows, key=lambda r: r.hkey)
    assert all(
        abs(a.x - b.x) + abs(a.y - b.y) == 1 for a, b in zip(by_h, by_h[1:])
    )
    # Morton order on the same grid has seam jumps (so the property is
    # non-trivial and the comparison is meaningful)
    by_z = sorted(rows, key=lambda r: r.zkey)
    assert any(
        abs(a.x - b.x) + abs(a.y - b.y) > 1 for a, b in zip(by_z, by_z[1:])
    )
