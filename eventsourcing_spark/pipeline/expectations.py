"""Declarative data-quality expectations — the Deequ/Great-Expectations
stage of a production pipeline, expressed Spark-first.

A 100 TB ingest runs a *constraint suite* before anything downstream
trusts the data: completeness (null fraction), uniqueness (key
distinctness), domain membership, value bounds, cross-column
consistency, and referential integrity. The defining property of the
good implementation (Schelter et al., VLDB 2018 — Deequ's "unit tests
for data") is that ALL single-table constraints compile to ONE
conditional aggregate per table — the table is scanned once no matter
how many expectations are declared — and referential checks are
existence joins, not row comparisons.

This module declares a suite over the driver's tables and emits one
row per constraint: (table_name, check_name, observed_ppm, status).
observed_ppm is the constraint's satisfaction rate in truncating ppm
(1_000_000 = fully satisfied), so both engines agree bit-exactly and a
reviewer reads one uniform column. Plan shape per table: a single
partial+final aggregate (map-side combine, |constraints| output
cells); the orders↔lineitem referential check is one semi-join
aggregated to a count. Nothing here shuffles corpus-sized data on
anything but the one keyed existence probe.

Reference parity: none — engine surface from the task brief (the
reference has no relational/DQ surface); the payload-size and
snapshot-policy audits (analytics.py) are this suite's event-store
cousins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table
from eventsourcing_spark.queries import query

# ppm threshold a constraint must meet to pass; 1_000_000 = exact.
DQ_THRESHOLD_PPM = 1_000_000


def _ppm(cond):
    """Satisfaction rate of a boolean condition in truncating ppm."""
    return F.expr(f"(1000000 * sum(CASE WHEN {cond} THEN 1 ELSE 0 END)) div count(*)")


@query(
    "dq_expectation_suite",
    """
    WITH o AS (
        SELECT
          (1000000 * sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END))
            // count(*) AS complete_custkey,
          (1000000 * count(DISTINCT o_orderkey)) // count(*) AS unique_orderkey,
          (1000000 * sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                              THEN 1 ELSE 0 END)) // count(*) AS domain_status,
          (1000000 * sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END))
            // count(*) AS positive_totalprice
        FROM orders
    ),
    l AS (
        SELECT
          (1000000 * sum(CASE WHEN l_quantity BETWEEN 1 AND 50
                              THEN 1 ELSE 0 END)) // count(*) AS bounds_quantity,
          (1000000 * sum(CASE WHEN l_discount >= 0 AND l_discount <= 1
                              THEN 1 ELSE 0 END)) // count(*) AS bounds_discount
        FROM lineitem
    ),
    lref AS (
        SELECT (1000000 * sum(CASE WHEN o.o_orderkey IS NOT NULL
                                   THEN 1 ELSE 0 END)) // count(*) AS ref_ok
        FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
    ),
    d AS (
        SELECT
          (1000000 * sum(CASE WHEN text IS NOT NULL AND length(text) > 0
                              THEN 1 ELSE 0 END)) // count(*) AS complete_text,
          (1000000 * sum(CASE WHEN n_chars = length(text)
                              THEN 1 ELSE 0 END)) // count(*) AS consistent_n_chars
        FROM documents
    ),
    rows_out(table_name, check_name, observed_ppm) AS (
        SELECT 'orders', 'completeness:o_custkey', complete_custkey FROM o
        UNION ALL SELECT 'orders', 'uniqueness:o_orderkey', unique_orderkey FROM o
        UNION ALL SELECT 'orders', 'domain:o_orderstatus', domain_status FROM o
        UNION ALL SELECT 'orders', 'bound:o_totalprice>0', positive_totalprice FROM o
        UNION ALL SELECT 'lineitem', 'bound:l_quantity:1..50', bounds_quantity FROM l
        UNION ALL SELECT 'lineitem', 'bound:l_discount:0..1', bounds_discount FROM l
        UNION ALL SELECT 'lineitem', 'referential:l_orderkey->orders', ref_ok FROM lref
        UNION ALL SELECT 'documents', 'completeness:text', complete_text FROM d
        UNION ALL SELECT 'documents', 'consistency:n_chars=length(text)', consistent_n_chars FROM d
    )
    SELECT table_name, check_name,
           CAST(observed_ppm AS BIGINT) AS observed_ppm,
           CASE WHEN observed_ppm >= 1000000 THEN 'pass' ELSE 'fail' END AS status
    FROM rows_out
    """,
)
def dq_expectation_suite(spark, sf_dir):
    orders = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    lineitem = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    o = orders.agg(
        _ppm("o_custkey IS NOT NULL").alias("completeness:o_custkey"),
        F.expr(
            "(1000000 * count(DISTINCT o_orderkey)) div count(*)"
        ).alias("uniqueness:o_orderkey"),
        _ppm("o_orderstatus IN ('O', 'F', 'P')").alias("domain:o_orderstatus"),
        _ppm("o_totalprice > 0").alias("bound:o_totalprice>0"),
    )
    # Round 12 (scan-collapse): the bounds aggregate, the referential
    # total and the semi-join probe each scanned lineitem (3 fact-table
    # scans). One LEFT join against the distinct order-key set (a
    # marker column instead of a semi-join — keys are distinct'd, so no
    # row multiplication) lets a SINGLE aggregate emit bounds + the
    # referential ppm in-plan (no driver-side counts — a data-dependent
    # literal would make the plan vary with the data).
    li = (
        lineitem.select("l_quantity", "l_discount", "l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey"))
            .distinct()
            .withColumn("__ref_hit", F.lit(1)),
            "l_orderkey",
            "left",
        )
        .agg(
            _ppm("l_quantity BETWEEN 1 AND 50").alias("bound:l_quantity:1..50"),
            _ppm("l_discount >= 0 AND l_discount <= 1").alias(
                "bound:l_discount:0..1"
            ),
            _ppm("__ref_hit IS NOT NULL").alias(
                "referential:l_orderkey->orders"
            ),
        )
    )
    d = docs.agg(
        _ppm("text IS NOT NULL AND length(text) > 0").alias("completeness:text"),
        _ppm("n_chars = length(text)").alias("consistency:n_chars=length(text)"),
    )

    def unpivot(agg_df, table):
        cols = agg_df.columns
        pairs = ", ".join(f"'{c}', `{c}`" for c in cols)
        return agg_df.selectExpr(
            f"stack({len(cols)}, {pairs}) AS (check_name, observed_ppm)"
        ).select(F.lit(table).alias("table_name"), "check_name", "observed_ppm")

    out = (
        unpivot(o, "orders")
        .unionByName(unpivot(li, "lineitem"))
        .unionByName(unpivot(d, "documents"))
    )
    return out.select(
        "table_name",
        "check_name",
        F.col("observed_ppm").cast("long").alias("observed_ppm"),
        F.when(F.col("observed_ppm") >= DQ_THRESHOLD_PPM, "pass")
        .otherwise("fail")
        .alias("status"),
    )
