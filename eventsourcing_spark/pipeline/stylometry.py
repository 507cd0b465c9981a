"""Stylometry: Burrows' Delta between ingest sources — exact.

Burrows' Delta (Burrows 2002, "'Delta': a Measure of Stylistic
Difference") is the standard authorship/style distance: over the K most
frequent words, z-score each source's relative frequency and average
the absolute z-difference between two texts. Corpus curation uses it as
a style-drift radar — which sources write alike, which source's tone
shifted after a re-crawl.

Why this is exact here when Delta is usually float soup: the z-scores
collapse —

    |z_a − z_b| = |f_a − f_b| / σ_w

so only ONE division per (pair, word) survives, and every input to it
is integer:

* relative frequencies carry as fixed point: ``f_fx = (c << 30) div
  tot`` (per-source token totals divide exactly once, floor);
* population variance over the S sources is the integer
  ``S·Σf² − (Σf)²`` (DECIMAL(38,0)/HUGEINT — bound 20·2^60 ≈ 2.3e19);
* σ's square root is an INTEGER sqrt: float ``sqrt`` seeds (both
  engines round the same IEEE double), two Newton steps + down/up
  corrections land exactly at floor(√x) — deterministic because every
  step after the seed is integer arithmetic and the seed is within ±2
  of the root at this magnitude;
* each term is then ``floor(|Δf_fx|·S·2^20 / sd_fx)`` and the pair's
  Delta is the floor-scaled mean over K — a DEFINED integer statistic,
  division last per term, identical in both engines. Zero-variance
  words contribute 0 (no discriminative power) with K unchanged.

Scale shape: one token-grain aggregation (map-side combine over the
Zipf head), a K-row TakeOrdered vocabulary, an S×K grid (≤ 600 cells),
and pair arithmetic on that grid — everything after the token rollup is
model-grain. The corpus is scanned once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

DELTA_K = 30  # most-frequent-word panel (Burrows' classic 30-150 range)
F_BITS = 30  # relative-frequency fixed point
T_BITS = 20  # per-term output fixed point


def _isqrt_steps(x: str, cast, div: str) -> list[tuple[str, str]]:
    """(column, expression) chain computing floor(sqrt(x)) exactly.

    Float sqrt seeds within ±2 at the 2.3e19 bound; two integer Newton
    steps then two down-corrections and one up-correction pin the
    floor. ``cast`` lifts squarings above int64 (Spark DECIMAL(38,0);
    DuckDB HUGEINT natively). The y2 divisor is floored at 1: when
    x = 0 (zero-variance word) y1 = 0, and Spark 4's ANSI default would
    raise DIVIDE_BY_ZERO where DuckDB flows NULL into the downstream
    CASE — the guard lands both engines on sd_fx = 0 → term 0, and for
    x ≥ 1 it is inert (y0 ≥ 2 so y1 = (y0 + x div y0) div 2 ≥ 1)."""
    return [
        ("y0", f"CAST(sqrt(CAST({x} AS DOUBLE)) AS BIGINT) + 1"),
        ("y1", f"CAST((y0 + {x} {div} y0) {div} 2 AS BIGINT)"),
        (
            "y2",
            f"CAST((y1 + {x} {div} greatest(y1, 1)) {div} 2 AS BIGINT)",
        ),
        ("y3", f"CASE WHEN {cast('y2')} * y2 > {x} THEN y2 - 1 ELSE y2 END"),
        ("y4", f"CASE WHEN {cast('y3')} * y3 > {x} THEN y3 - 1 ELSE y3 END"),
        (
            "sd_fx",
            f"CAST(CASE WHEN {cast('(y4 + 1)')} * (y4 + 1) <= {x}"
            f" THEN y4 + 1 ELSE y4 END AS BIGINT)",
        ),
    ]


def _duck_isqrt_ctes() -> str:
    steps = _isqrt_steps("sd2", lambda e: e, "//")
    out = "ws0"
    ctes = []
    for i, (col, expr) in enumerate(steps):
        nxt = f"ws{i + 1}"
        ctes.append(f"{nxt} AS (SELECT *, {expr} AS {col} FROM {out})")
        out = nxt
    return ", ".join(ctes), out


_WS_CTES, _WS_FINAL = _duck_isqrt_ctes()

_DELTA_SQL = f"""
WITH tok AS (
    SELECT source, unnest(list_filter(
        string_split(lower(text), ' '), x -> x <> '')) AS w
    FROM documents
),
csw AS (SELECT source, w, count(*) AS c FROM tok GROUP BY source, w),
tots AS (SELECT source, sum(c) AS tot FROM csw GROUP BY source),
topw AS (
    SELECT w FROM (
        SELECT w, sum(c) AS cw FROM csw GROUP BY w
        ORDER BY cw DESC, w LIMIT {DELTA_K}
    )
),
grid AS (
    SELECT t.source, k.w,
           (coalesce(c.c, 0) << {F_BITS}) // t.tot AS f_fx
    FROM tots t
    CROSS JOIN topw k
    LEFT JOIN csw c ON c.source = t.source AND c.w = k.w
),
ns AS (SELECT count(*) AS s FROM tots),
ws0 AS (
    SELECT g.w,
           s.s * sum(g.f_fx * g.f_fx) - sum(g.f_fx) * sum(g.f_fx) AS sd2
    FROM grid g CROSS JOIN ns s GROUP BY g.w, s.s
),
{_WS_CTES},
terms AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CASE WHEN w.sd_fx > 0
                THEN (abs(a.f_fx - b.f_fx) * s.s << {T_BITS}) // w.sd_fx
                ELSE 0 END AS term_fx
    FROM grid a
    JOIN grid b ON a.w = b.w AND a.source < b.source
    JOIN {_WS_FINAL} w ON w.w = a.w
    CROSS JOIN ns s
)
SELECT source_a, source_b,
       CAST((1000 * sum(term_fx)) // ({DELTA_K} << {T_BITS}) AS BIGINT)
           AS delta_milli
FROM terms
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@query("burrows_delta_sources", _DELTA_SQL)
def burrows_delta_sources(spark, sf_dir):
    """All-pairs Burrows' Delta over the source dimension."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w"),
    )
    csw = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    tots = csw.groupBy("source").agg(F.sum("c").cast("long").alias("tot"))
    topw = (
        csw.groupBy("w")
        .agg(F.sum("c").alias("cw"))
        .orderBy(F.desc("cw"), F.asc("w"))
        .limit(DELTA_K)
        .select("w")
    )
    grid = (
        tots.crossJoin(F.broadcast(topw))
        .join(csw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr(
                f"(shiftleft(coalesce(c, 0), {F_BITS})) div tot"
            ).alias("f_fx"),
        )
        # consumed by the word-stats rollup AND both pair sides — the
        # S×K grid is ≤ 600 rows, materialize once
        .transform(materialize)
    )
    ns = tots.agg(F.count("*").cast("long").alias("s"))
    ws = (
        grid.crossJoin(F.broadcast(ns))
        .groupBy("w", "s")
        .agg(
            F.expr(
                "CAST(any_value(s) AS DECIMAL(38,0))"
                " * sum(CAST(f_fx AS DECIMAL(38,0)) * f_fx)"
                " - CAST(sum(f_fx) AS DECIMAL(38,0)) * sum(f_fx)"
            ).alias("sd2")
        )
    )
    for col, expr in _isqrt_steps(
        "sd2", lambda e: f"CAST({e} AS DECIMAL(38,0))", "div"
    ):
        ws = ws.withColumn(col, F.expr(expr))
    ws = ws.select("w", "s", "sd_fx")
    terms = (
        grid.alias("a")
        .join(F.broadcast(grid.alias("b")), "w")
        .filter(F.col("a.source") < F.col("b.source"))
        .join(F.broadcast(ws), "w")
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.expr(
                f"CASE WHEN sd_fx > 0 THEN"
                f" shiftleft(abs(a.f_fx - b.f_fx) * s, {T_BITS}) div sd_fx"
                f" ELSE 0 END"
            ).alias("term_fx"),
        )
    )
    return (
        terms.groupBy("source_a", "source_b")
        .agg(
            F.expr(
                f"CAST((1000 * sum(term_fx))"
                f" div (CAST({DELTA_K} AS BIGINT) << {T_BITS}) AS BIGINT)"
            ).alias("delta_milli")
        )
        .orderBy("source_a", "source_b")
    )
