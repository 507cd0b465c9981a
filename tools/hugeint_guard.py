"""Registry-wide guard against DuckDB HUGEINT oracle columns.

DuckDB promotes ``sum(BIGINT)`` (and arithmetic over it) to HUGEINT
(int128).  The driver's value-hash canonicalizes HUGEINT differently
than Spark's int64, so any oracle emitting a HUGEINT column hash-fails
even when the values are numerically identical (VERDICT r02 "What's
wrong" #1/#2).  This tool plans every oracle with ``DESCRIBE`` (no data
scan) and fails if any output column type contains HUGEINT — the fix is
always ``CAST(... AS BIGINT)`` in the oracle SQL.

Usage:  python tools/hugeint_guard.py [sf_dir]
Exit code 1 if any oracle emits HUGEINT/UHUGEINT.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.registry import ORACLE_SQL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name in sorted(ORACLE_SQL):
        sql = ORACLE_SQL[name]
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 — report, keep scanning
            bad += 1
            print(f"{name}: DESCRIBE failed: {str(exc)[:160]}")
            continue
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if huge:
            bad += 1
            print(f"{name}: {huge}")
    print(f"\n{bad} oracles with HUGEINT columns / {len(ORACLE_SQL)} total")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
