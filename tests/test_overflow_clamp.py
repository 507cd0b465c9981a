"""The DECIMAL(38) overflow clamp: stats-driven floor-division of
centered deviations before squaring (acf_daily_revenue,
degree_assortativity).

The sf gate only ever exercises K = 1 (magnitudes far below the clamp
threshold), so these tests pin the two things the gate cannot:

1. the shift-floor identity (d + K·C) div K − C == floor(d / K) on
   BOTH engines, including negative d where truncation ≠ floor;
2. K > 1 end-to-end: a synthetic orders table with ~10¹⁶-cent days
   forces the clamp to engage, and Spark must still match DuckDB
   bit-for-bit (the pre-clamp form would overflow DECIMAL(38,0):
   Spark silently NULLs, DuckDB raises — the divergence the clamp
   exists to remove).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from eventsourcing_spark.registry import ORACLE_SQL, SPARK_QUERIES
from eventsourcing_spark.timeseries import ACF_DEV_CLAMP


# (d, k) pairs respecting the query invariant k·C ≥ |d| (k is always
# derived as 1 + max|d| div C, so the shifted operand is non-negative —
# the identity does NOT hold for arbitrary k, by design).
_RAW_DS = [-7, 7, -1, 0, -(10**15) - 1, 10**15 + 1, -(10**16), 10**16 - 3]
CASES = [(d, 1 + abs(d) // ACF_DEV_CLAMP) for d in _RAW_DS] + [
    (-7, 2),
    (7, 2),
    (0, 5),
]


def test_shift_floor_identity_spark(spark):
    C = ACF_DEV_CLAMP
    from decimal import Decimal

    rows = [(Decimal(d), k) for d, k in CASES]
    df = spark.createDataFrame(rows, "d decimal(38,0), k long")
    got = {
        (int(r.d), r.k): r.q
        for r in df.selectExpr(
            "d", "k",
            f"(d + cast(k as decimal(38,0)) * {C}) div k"
            f" - cast({C} as bigint) as q",
        ).collect()
    }
    for d, k in CASES:
        assert got[(d, k)] == d // k, (d, k)  # Python // is math floor


def test_shift_floor_identity_duckdb():
    C = ACF_DEV_CLAMP
    con = duckdb.connect()
    for d, k in CASES:
        q = con.sql(
            f"SELECT (CAST({d} AS HUGEINT) + CAST({k} AS HUGEINT) * {C})"
            f" // CAST({k} AS HUGEINT) - CAST({C} AS HUGEINT)"
        ).fetchone()[0]
        assert int(q) == d // k, (d, k)


@pytest.fixture()
def huge_orders_dir(spark, tmp_path):
    """A tiny orders table whose daily revenue (~10¹⁶ cents) forces the
    ACF clamp past K = 1 — the pre-clamp Σ(n·cents − S)² would pass
    10³⁸ here."""
    base = datetime.date(1995, 1, 1)
    rows = []
    for i in range(30):
        # Vary the level so deviations are large too (alternating
        # weeks). At ~3e17 cents/day, a single pre-clamp dev² =
        # (n·cents − S)² ≈ (6e19)² ≈ 4e39 already passes DECIMAL(38).
        price = 3.0e15 * (1 + (i % 7)) + i * 1.0e9
        rows.append((i, base + datetime.timedelta(days=i), price))
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_acf_clamp_engages_and_engines_agree(spark, huge_orders_dir):
    got = {
        r.lag_days: (r.n_pairs, r.acf_ppm)
        for r in SPARK_QUERIES["acf_daily_revenue"](
            spark, huge_orders_dir
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM read_parquet("
        f"'{huge_orders_dir}/orders.parquet/*.parquet')"
    )
    oracle = {
        int(lag): (int(n), int(ppm))
        for lag, n, ppm in con.sql(ORACLE_SQL["acf_daily_revenue"]).fetchall()
    }
    assert got == oracle
    # None of the outputs silently NULLed (the Spark overflow mode).
    assert all(ppm is not None for _, ppm in got.values())
    # Sanity that the clamp actually engaged: with 7 distinct ~1e14-1e15
    # levels over 30 days, max|n·cents − S| ≫ the 1e13 clamp.
    assert max(abs(ppm) for _, ppm in got.values()) <= 1_000_000
