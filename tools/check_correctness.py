"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` twin in
DuckDB over the same parquet dir, then compares row count, column names,
and order-insensitive values. Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            bad = ~np.isclose(
                sv.astype(float), dv.astype(float), rtol=0, atol=0, equal_nan=True
            )
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"col {c}: {int(bad.sum())} exact-mismatches, first at row {i}: "
                    f"spark={sv[i]!r} duck={dv[i]!r} (diff={abs(float(sv[i]) - float(dv[i]))})"
                )
        else:
            neq = sv != dv
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={sv[i]!r} duck={dv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from eventsourcing_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only: {len(spark_pdf)})")
            continue
        try:
            # HUGEINT guard (VERDICT r02 #1): the driver's value-hash
            # canonicalizes DuckDB int128 differently than Spark int64,
            # so any HUGEINT oracle column is a latent hash-fail even
            # when values agree. DESCRIBE only plans — no data scan.
            desc = con.sql(f"DESCRIBE {oracles[name]}").fetchall()
            huge = [c for c, t, *_ in desc if "HUGEINT" in t.upper()]
            if huge:
                failures.append(name)
                print(f"FAIL  {name}: oracle emits HUGEINT columns {huge} "
                      f"— wrap in CAST(... AS BIGINT)")
                continue
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        dt = time.time() - t0
        if problems:
            failures.append(name)
            print(f"FAIL  {name} ({dt:.1f}s, {len(spark_pdf)} rows)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(spark_pdf)} rows)")

    print(f"\n{len(failures)} failures / {n_run} queries run"
          f" ({len(qs)} registered)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
