"""Extended TPC-H-shaped analytics over the driver tables.

The reference engine has no relational query surface beyond its fixed
operators (SURVEY.md §2: "no SQL parser, no optimizer"); these queries
document that the Spark engine gets the full relational algebra — semi
and anti joins, correlated scalar subqueries, outer-join aggregation,
OR-of-ANDs predicate pushdown — for free from Catalyst, and pin each
shape against a DuckDB oracle.

The driver's star schema omits ``partsupp`` and several classic columns
(l_commitdate, c_phone, p_container), so q4/q17/q21/q22 are adapted to
the available columns while keeping their defining operator shape.

Numeric discipline (same as eventsourcing_spark.queries): monetary
aggregates are summed as decimal(18,2) (exact, so Spark's parallel
partial aggregation cannot diverge from DuckDB's sequential sum) and
cast to double only at output; thresholds that compare against an
average are rewritten as exact cross-multiplications (qty*cnt < sum)
instead of float division.

Scale notes: every join broadcasts its dimension side; aggregations are
pushed below joins where legal (q15, q17, q18, q21 pre-aggregate
lineitem before joining), so the only big shuffles are keyed by
l_orderkey / l_partkey — exactly the co-partitioning a bucketed layout
would reuse at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import DEC, _dec, query

_TS = "timestamp"


def _lit_ts(s: str) -> F.Column:
    return F.lit(s).cast(_TS)


# ---------------------------------------------------------------------------
# q4 — order-priority checking: EXISTS(lineitem shipped after order date)
# → left-semi join, then count by priority.
# ---------------------------------------------------------------------------
@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _lit_ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _lit_ts("1996-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations: double nation join (supplier
# side + customer side), year bucketing. Nations broadcast twice.
# ---------------------------------------------------------------------------
@query(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
               AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _lit_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _lit_ts("1998-01-01 00:00:00"))
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    joined = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: LEFT OUTER join with an ON-clause
# filter, two-level aggregation.
# ---------------------------------------------------------------------------
@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    return (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q14 — promotion effect: conditional aggregation ratio. Both sums are kept
# exact-decimal; the single final division is double/double (identical
# operands in both engines → identical result).
# ---------------------------------------------------------------------------
@query(
    "tpch_q14_promo_effect",
    f"""
    SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
                 ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _lit_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _lit_ts("1996-02-01 00:00:00"))
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier: pre-aggregated revenue view + scalar-max selection.
# The revenue equality is compared in exact decimal, not double.
# ---------------------------------------------------------------------------
@query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC})))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _lit_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _lit_ts("1996-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias(
            "total_revenue"
        )
    )
    # scalar max joined back in exact decimal; broadcast of a 1-row frame
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q17 (adapted: brand-only, no p_container) — small-quantity revenue with a
# correlated per-part average. The avg comparison is cross-multiplied into
# exact decimal arithmetic: qty*5*cnt < sum(qty) ⟺ qty < 0.2*avg(qty).
# ---------------------------------------------------------------------------
@query(
    "tpch_q17_small_quantity",
    f"""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0 AS DOUBLE)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey,
             sum(CAST(l_quantity AS {DEC})) AS sum_qty,
             count(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND CAST(l_quantity AS {DEC}) * 5 * cnt_qty < sum_qty
    """,
)
def tpch_q17_small_quantity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    part_agg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(part_agg, li.l_partkey == F.col("agg_partkey"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers: HAVING on a pre-aggregation, then joins up
# the star. The heavy groupBy(l_orderkey) runs before any join.
# ---------------------------------------------------------------------------
@query(
    "tpch_q18_large_volume",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           epoch_ms(o_orderdate) AS orderdate_ms,
           o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(CAST(l_quantity AS {DEC})) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS {DEC})) > 250
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(250).cast(DEC))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_ms"
            ),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 (adapted: brand/size, no p_container) — disjunctive predicate across
# join sides; Catalyst extracts the common l_partkey=p_partkey conjunct so
# the join stays an equi-join with the OR-of-ANDs as a post-filter.
# ---------------------------------------------------------------------------
@query(
    "tpch_q19_disjunctive",
    f"""
    SELECT CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def tpch_q19_disjunctive(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")

    def arm(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (q >= q_lo)
            & (q <= q_hi)
        )

    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            arm("Brand#1", 15, 1, 21)
            | arm("Brand#2", 25, 10, 30)
            | arm("Brand#3", 35, 20, 40)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q21 (adapted: l_returnflag='R' as the "failed delivery" marker — the
# driver schema has no commit/receipt dates) — suppliers solely responsible
# for returned items on multi-supplier finished orders. The classic
# EXISTS/NOT-EXISTS pair over lineitem collapses into one per-order
# aggregation: distinct suppliers > 1 AND distinct returning suppliers = 1.
# ---------------------------------------------------------------------------
@query(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # ONE logical pass over lineitem replaces both correlated subqueries
    # AND the outer l1 scan: a qualifying order has exactly one returning
    # supplier, so that supplier's id and its row count fall out of the
    # per-order stats. Two-level aggregation instead of multiple
    # countDistinct: two distinct aggregates in one groupBy force an
    # Expand (3× row multiplication before the partial agg); pre-grouping
    # by (order, supplier) gets partial map-side combine on both levels
    # and measures ~30% faster on the same plan-shape at sf0.1.
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r_rows")
    )
    order_stats = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_suppliers"),
        F.count(F.when(F.col("r_rows") > 0, 1)).alias("n_r_suppliers"),
        F.max(F.when(F.col("r_rows") > 0, F.col("l_suppkey"))).alias("r_suppkey"),
        F.sum("r_rows").alias("n_r_rows"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    qual = order_stats.filter(
        (F.col("n_suppliers") > 1) & (F.col("n_r_suppliers") == 1)
    ).join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    return (
        qual.join(F.broadcast(supplier), F.col("r_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_r_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q22 (adapted: nation groups instead of phone prefixes; "no urgent orders"
# instead of "no orders" — the synthetic data has no order-less customers) —
# global-average threshold as exact cross-multiplication + anti join.
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# Grouping sets / rollup — absent from the reference (SURVEY §2.4 "declare,
# don't build"); pinned here to prove the engine inherits them. NULL group
# cells are disambiguated with grouping() flags so subtotal rows hash
# identically in both engines.
# ---------------------------------------------------------------------------
@query(
    "rollup_revenue",
    f"""
    SELECT coalesce(l_returnflag, '*') AS returnflag,
           coalesce(l_linestatus, '*') AS linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("linestatus"),
            "g_rf",
            "g_ls",
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Window-function battery over the event stream: ranking, offset, and
# distribution functions in one per-key ordered pass (single shuffle on the
# stream key — the W1/W2 frame generalized).
# ---------------------------------------------------------------------------
@query(
    "window_rank_functions",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT)
             AS value_rank,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    WHERE event_type = 'view'
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def window_rank_functions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wv).cast("bigint").alias("value_rank"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.sum(F.col("value").cast(DEC)).over(wrun).cast("double").alias(
            "running_value"
        ),
    )


@query(
    "tpch_q22_global_sales_opportunity",
    f"""
    SELECT c_nationkey AS nation, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN (
      SELECT sum(CAST(c_acctbal AS {DEC})) AS bal_sum, count(*) AS bal_cnt
      FROM customer WHERE c_acctbal > 0.0
    ) avg_bal ON CAST(c_acctbal AS {DEC}) * bal_cnt > bal_sum
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_nationkey
    ORDER BY nation
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("bal_sum"), F.count("*").alias("bal_cnt")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# The driver schema has no partsupp table, so q2/q9/q11/q16/q20 derive the
# part-supplier relation from lineitem: "supply" = the distinct
# (l_partkey, l_suppkey) pairs, with min(l_extendedprice) standing in for
# ps_supplycost and shipped quantity for ps_availqty. Each query keeps its
# defining operator shape (correlated min subquery, 8-way join, global
# HAVING threshold, count-distinct with NOT IN, nested semi-joins).
# ---------------------------------------------------------------------------
def _supply(spark, sf_dir):
    """Distinct part-supplier pairs with exact-decimal min cost."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(_dec("l_extendedprice")).alias("ps_supplycost"))


_SUPPLY_SQL = f"""
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(CAST(l_extendedprice AS {DEC})) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
"""


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier: correlated scalar-min subquery decorrelated
# into a per-part aggregate joined back on exact-decimal cost equality.
# Supplier/nation/region dims broadcast; the only big shuffle is the
# supply-pair aggregation keyed by (l_partkey, l_suppkey).
# ---------------------------------------------------------------------------
@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eligible AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM supply
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    min_cost AS (
      SELECT ps_partkey AS mc_partkey, min(ps_supplycost) AS mc_cost
      FROM eligible GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM eligible
    JOIN part ON p_partkey = ps_partkey
    JOIN min_cost ON ps_partkey = mc_partkey AND ps_supplycost = mc_cost
    WHERE p_size BETWEEN 10 AND 25 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = _supply(spark, sf_dir).join(
        F.broadcast(dims), F.col("ps_suppkey") == dims.s_suppkey
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "LARGE")
    )
    # the decorrelated per-part min is a window over ONE pass of the
    # supply aggregation (a self-join against a groupBy-min would scan
    # and aggregate lineitem twice); the broadcast part filter runs
    # below the window so only surviving parts are ranked
    w_min = Window.partitionBy("ps_partkey")
    return (
        eligible.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .withColumn("mc_cost", F.min("ps_supplycost").over(w_min))
        .filter(F.col("ps_supplycost") == F.col("mc_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q8 — national market share: 8-way join (nation twice), conditional-sum
# ratio per year. Both sums stay exact decimal; the single final division
# is double/double with identical operands in both engines.
# ---------------------------------------------------------------------------
@query(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
                / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
               AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _lit_ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _lit_ts("1997-01-01 00:00:00"))
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nations = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_nations), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    nat_vol = F.when(F.col("nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(nat_vol).cast("double") / F.sum(volume).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit (adapted: cost = p_retailprice · l_quantity in
# place of ps_supplycost): LIKE-filtered part broadcast, profit summed as
# exact decimal, grouped by supplier nation × order year.
# ---------------------------------------------------------------------------
@query(
    "tpch_q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
               - CAST(p_retailprice AS {DEC}) * CAST(l_quantity AS {DEC}) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q11 — important stock (adapted: part value = Σ l_quantity·p_retailprice
# over one nation's suppliers): per-part aggregate vs a global-total scalar,
# compared by exact cross-multiplication (value·1000 > total) instead of a
# float fraction.
# ---------------------------------------------------------------------------
@query(
    "tpch_q11_important_stock",
    f"""
    WITH stock AS (
      SELECT l_partkey AS ps_partkey,
             sum(CAST(l_quantity AS {DEC}) * CAST(p_retailprice AS {DEC})) AS val
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT ps_partkey, CAST(val AS DOUBLE) AS part_value
    FROM stock
    JOIN (SELECT sum(val) AS total FROM stock) t ON val * 1000 > total
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    supp_in_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    stock = (
        li.join(F.broadcast(supp_in_nation), li.l_suppkey == F.col("s_suppkey"),
                "left_semi")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_dec("l_quantity") * _dec("p_retailprice")).alias("val"))
    )
    total = stock.agg(F.sum("val").alias("total"))
    return (
        stock.join(F.broadcast(total))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select("ps_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# q12 — shipping-delay priority classes (adapted: l_returnflag stands in for
# l_shipmode, lateness = shipped ≥ 60 days after order date): join +
# conditional counts, all-integer arithmetic.
# ---------------------------------------------------------------------------
@query(
    "tpch_q12_ship_priority_classes",
    """
    SELECT l_returnflag AS shipclass,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_ship_priority_classes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _lit_ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _lit_ts("1997-01-01 00:00:00"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


# ---------------------------------------------------------------------------
# q16 — supplier count by part attributes (adapted: the NOT IN "complaints"
# exclusion drops suppliers with negative account balance): distinct supply
# pairs + broadcast anti-join + count-distinct rollup.
# ---------------------------------------------------------------------------
@query(
    "tpch_q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_count(spark, sf_dir):
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(complaints),
                   pairs.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q20 — promotion-candidate suppliers (adapted: "excess stock" = more than
# half of a part's shipped quantity came in 1997): nested semi-join chain
# with the threshold as exact decimal cross-multiplication (2·qty97 > total).
# ---------------------------------------------------------------------------
@query(
    "tpch_q20_excess_stock_suppliers",
    f"""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                        THEN CAST(l_quantity AS {DEC})
                        ELSE CAST(0 AS {DEC}) END) AS qty_1997,
               sum(CAST(l_quantity AS {DEC})) AS qty_total
        FROM lineitem GROUP BY l_partkey, l_suppkey
      ) ps
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND qty_1997 * 2 > qty_total
    )
    ORDER BY s_name
    """,
)
def tpch_q20_excess_stock_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    in_1997 = (F.col("l_shipdate") >= _lit_ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _lit_ts("1998-01-01 00:00:00")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.when(in_1997, _dec("l_quantity")).otherwise(F.lit(0).cast(DEC)))
        .alias("qty_1997"),
        F.sum(_dec("l_quantity")).alias("qty_total"),
    )
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    candidates = (
        ps.join(F.broadcast(small_parts),
                ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .filter(F.col("qty_1997") * 2 > F.col("qty_total"))
        .select("ps_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(F.broadcast(candidates),
                      supplier.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# CUBE — the full 2^k grouping-set lattice (ROLLUP's big sibling,
# rollup_revenue above pins the hierarchical prefix sets). One pass,
# grouping() flags disambiguate NULL group cells exactly as there.
# ---------------------------------------------------------------------------
@query(
    "cube_volume",
    f"""
    SELECT coalesce(l_returnflag, '*') AS returnflag,
           coalesce(l_linestatus, '*') AS linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_volume(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("linestatus"),
            "g_rf",
            "g_ls",
            "sum_qty",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Monthly revenue with year-over-year delta. The YoY lookup is a key-shifted
# self-join of the *aggregated* month table (≤ one row per month) rather than
# lag(12) — gap-safe, and the join side is trivially broadcast. The pattern
# (aggregate first, then window/join over the tiny result) is the scalable
# form: the shuffle moves ~100 rows however large the fact table is.
# ---------------------------------------------------------------------------
@query(
    "monthly_revenue_yoy",
    f"""
    WITH m AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
               sum(CAST(o_totalprice AS {DEC})) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(cur.ym AS BIGINT) AS ym,
           CAST(cur.rev AS DOUBLE) AS revenue,
           CAST(prev.rev AS DOUBLE) AS prev_year_revenue,
           CAST(cur.rev - coalesce(prev.rev, 0) AS DOUBLE) AS yoy_delta
    FROM m cur LEFT JOIN m prev ON prev.ym = cur.ym - 12
    """,
)
def monthly_revenue_yoy(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("ym")
    m = orders.groupBy(ym).agg(F.sum(_dec("o_totalprice")).alias("rev"))
    prev = m.select(
        (F.col("ym") + 12).alias("ym_next"), F.col("rev").alias("prev_rev")
    )
    return m.join(
        F.broadcast(prev), m.ym == prev.ym_next, "left"
    ).select(
        F.col("ym").cast("long").alias("ym"),
        F.col("rev").cast("double").alias("revenue"),
        F.col("prev_rev").cast("double").alias("prev_year_revenue"),
        (F.col("rev") - F.coalesce(F.col("prev_rev"), F.lit(0).cast(DEC)))
        .cast("double")
        .alias("yoy_delta"),
    )


# ---------------------------------------------------------------------------
# Join fan-out profile: the lines-per-order distribution. This is the
# statistic a planner (or a human sizing a 100 TB join) reads to predict
# join multiplicity and skew — two cheap aggregations, the second over
# the already-tiny distinct-fanout domain.
# ---------------------------------------------------------------------------
@query(
    "join_fanout_profile",
    """
    WITH f AS (
        SELECT l_orderkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM f GROUP BY n_lines
    """,
)
def join_fanout_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    return f.groupBy(F.col("n_lines").cast("long").alias("n_lines")).agg(
        F.count("*").cast("long").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Per-segment account-balance quartiles: ntile *partitioned* by market
# segment (bounded per-partition sort), with a total tie order so bucket
# boundaries are engine-identical; rollup emits the quartile summary.
# ---------------------------------------------------------------------------
@query(
    "customer_balance_quartiles",
    f"""
    WITH q AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer
    )
    SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(max(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS sum_bal
    FROM q GROUP BY c_mktsegment, quartile
    """,
)
def customer_balance_quartiles(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    q = cust.select(
        "c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )
    return q.groupBy(
        "c_mktsegment", F.col("quartile").cast("long").alias("quartile")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


# ---------------------------------------------------------------------------
# Order-priority mix per year with within-year share: the composition
# trend report. Fact table shuffles once on (year, priority); the year
# totals are a tiny agg broadcast back — never a window over the facts.
# ---------------------------------------------------------------------------
@query(
    "priority_mix_by_year",
    """
    WITH c AS (
        SELECT year(o_orderdate) AS yr, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    t AS (SELECT yr, sum(n) AS yr_total FROM c GROUP BY yr)
    SELECT CAST(c.yr AS BIGINT) AS yr, c.o_orderpriority,
           CAST(c.n AS BIGINT) AS n,
           CAST(t.yr_total AS BIGINT) AS yr_total,
           CAST(c.n * 1000000 // t.yr_total AS BIGINT) AS share_ppm
    FROM c JOIN t USING (yr)
    """,
)
def priority_mix_by_year(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(
        F.year("o_orderdate").alias("yr"), "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    t = c.groupBy("yr").agg(F.sum("n").alias("yr_total"))
    return c.join(F.broadcast(t), "yr").select(
        F.col("yr").cast("long").alias("yr"),
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("yr_total").cast("long").alias("yr_total"),
        F.expr("CAST(n * 1000000 div yr_total AS BIGINT)").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS — the general grouping lattice (rollup_revenue
# and cube_volume are the two fixed shapes; this is the mixed form a
# reporting layer actually emits: (year, priority) detail + each
# one-dimension margin + grand total, tagged by grouping_id so the
# consumer can route rows without NULL-sniffing). One pass, one
# exchange: Spark expands the sets map-side exactly like rollup/cube.
# ---------------------------------------------------------------------------


@query(
    "grouping_sets_kpis",
    """
    SELECT year(o_orderdate) AS o_year, o_orderpriority,
           CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                            (year(o_orderdate)), (o_orderpriority), ())
    """,
)
def grouping_sets_kpis(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return orders.groupingSets(
        [["o_year", "o_orderpriority"], ["o_year"], ["o_orderpriority"], []],
        "o_year",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Seasonal revenue index — month-of-year revenue vs the all-months
# mean, the classic seasonality profile (complements the YoY view of
# monthly_revenue_yoy with a cross-year seasonal average). Index is
# ppm-scaled: 1,000,000 = an average month. Integer end-to-end: cents
# rollup, then two tiny window sums over the 12-row frame.
# ---------------------------------------------------------------------------


@query(
    "seasonal_revenue_index",
    """
    WITH m AS (
        SELECT month(o_orderdate) AS moy,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders GROUP BY month(o_orderdate)
    )
    SELECT CAST(moy AS BIGINT) AS month_of_year,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents * 1000000 * (SELECT count(*) FROM m)
                // (SELECT sum(cents) FROM m) AS BIGINT) AS seasonal_ppm
    FROM m
    """,
)
def seasonal_revenue_index(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.month("o_orderdate").alias("moy")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
        F.count("*").alias("n_orders"),
    )
    w = Window.partitionBy(F.lit(1))
    return m.select(
        F.col("moy").cast("long").alias("month_of_year"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("cents").cast("long").alias("revenue_cents"),
        F.expr(
            "cents * 1000000 * (count(*) OVER (PARTITION BY 1))"
            " div (sum(cents) OVER (PARTITION BY 1))"
        )
        .cast("long")
        .alias("seasonal_ppm"),
    )


# ---------------------------------------------------------------------------
# Nation revenue share — the reporting rollup between q5's filtered
# volume and a raw GROUP BY: per nation, order revenue (via customer),
# its share of the region in ppm, and its rank within the region. Two
# broadcast dimension hops, one keyed rollup, two windows over the
# 25-row nation frame.
# ---------------------------------------------------------------------------


@query(
    "nation_revenue_share",
    """
    WITH nr AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents * 1000000 // sum(cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_in_region_ppm,
           CAST(row_number() OVER (PARTITION BY region
                ORDER BY cents DESC, nation) AS BIGINT) AS rank_in_region
    FROM nr
    """,
)
def nation_revenue_share(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nr = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
            F.count("*").alias("n_orders"),
        )
    )
    ws = Window.partitionBy("region")
    wr = Window.partitionBy("region").orderBy(F.desc("cents"), F.asc("nation"))
    return nr.select(
        "region",
        "nation",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("cents").cast("long").alias("revenue_cents"),
        F.expr("cents * 1000000").cast("long").alias("__num"),
        F.sum("cents").over(ws).alias("__den"),
        F.row_number().over(wr).cast("long").alias("rank_in_region"),
    ).select(
        "region",
        "nation",
        "n_orders",
        "revenue_cents",
        F.expr("__num div __den").cast("long").alias("share_in_region_ppm"),
        "rank_in_region",
    )


# ---------------------------------------------------------------------------
# Window distribution-function battery — the second half of the SQL
# window surface (window_rank_functions pins the ranking family):
# percent_rank, cume_dist, nth_value and first/last_value under an
# explicit frame, over the per-customer order sequence. percent_rank
# and cume_dist are emitted in exact ppm integer form (cross-multiplied
# definitions) so the oracle hash applies.
# ---------------------------------------------------------------------------
@query(
    "window_dist_functions",
    """
    WITH w AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               count(*) OVER (PARTITION BY o_custkey) AS n,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice, o_orderkey) AS rk,
               count(*) FILTER (WHERE TRUE) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd_n,
               first_value(o_orderkey) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS cheapest_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS priciest_order,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS second_cheapest
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(CASE WHEN n = 1 THEN 0
                ELSE ((rk - 1) * 1000000) // (n - 1) END AS BIGINT)
             AS percent_rank_ppm,
           CAST((cd_n * 1000000) // n AS BIGINT) AS cume_dist_ppm,
           CAST(cheapest_order AS BIGINT) AS cheapest_order,
           CAST(priciest_order AS BIGINT) AS priciest_order,
           CAST(second_cheapest AS BIGINT) AS second_cheapest
    FROM w
    """,
)
def window_dist_functions(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey")
    wo = wp.orderBy("o_totalprice", "o_orderkey")
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcd = wo.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.count("*").over(wp)
    rk = F.rank().over(wo)
    # cume_dist numerator: peers-inclusive running count (RANGE frame)
    cd_n = F.count("*").over(wcd)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        n.alias("__n"),
        rk.alias("__rk"),
        cd_n.alias("__cd"),
        F.first("o_orderkey").over(wfull).alias("cheapest_order"),
        F.last("o_orderkey").over(wfull).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_cheapest"),
    ).select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("__n") == 1, F.lit(0))
        .otherwise(F.expr("((__rk - 1) * 1000000) div (__n - 1)"))
        .cast("long")
        .alias("percent_rank_ppm"),
        F.expr("(__cd * 1000000) div __n").cast("long").alias("cume_dist_ppm"),
        F.col("cheapest_order").cast("long").alias("cheapest_order"),
        F.col("priciest_order").cast("long").alias("priciest_order"),
        F.col("second_cheapest").cast("long").alias("second_cheapest"),
    )


# ---------------------------------------------------------------------------
# Duplicate-order audit — the business-key dedup every billing pipeline
# runs (double-submitted invoices): orders sharing (custkey, orderdate)
# are duplicate suspects. One grouped aggregate on the
# compound business key; the keeper convention (min orderkey) matches
# dedup_exact. Emits only suspect groups — output is proportional to
# the anomaly rate, not the table.
# ---------------------------------------------------------------------------
@query(
    "duplicate_orders_audit",
    """
    SELECT o_custkey, o_orderdate,
           CAST(count(*) AS BIGINT) AS n_dupes,
           CAST(min(o_orderkey) AS BIGINT) AS keeper_order,
           CAST(max(o_orderkey) AS BIGINT) AS last_order
    FROM orders
    GROUP BY o_custkey, o_orderdate
    HAVING count(*) > 1
    """,
)
def duplicate_orders_audit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count("*").cast("long").alias("n_dupes"),
            F.min("o_orderkey").cast("long").alias("keeper_order"),
            F.max("o_orderkey").cast("long").alias("last_order"),
        )
        .filter(F.col("n_dupes") > 1)
    )


# ---------------------------------------------------------------------------
# Repeat-purchase cohorts — per first-order month cohort: size, share
# of customers who ordered again, and per-customer order depth. The
# customer-lifecycle twin of the events-side cohort_retention, on the
# orders table: one per-customer aggregate, one cohort rollup.
# ---------------------------------------------------------------------------
@query(
    "repeat_purchase_cohorts",
    """
    WITH c AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort_month,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT cohort_month,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) FILTER (WHERE n_orders >= 2) AS BIGINT) AS repeaters,
           CAST((count(*) FILTER (WHERE n_orders >= 2) * 1000000)
                // count(*) AS BIGINT) AS repeat_ppm,
           CAST(sum(n_orders) AS BIGINT) AS total_orders
    FROM c GROUP BY cohort_month
    """,
)
def repeat_purchase_cohorts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month"),
        F.count("*").alias("n_orders"),
    )
    return c.groupBy("cohort_month").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.count(F.when(F.col("n_orders") >= 2, 1)).cast("long").alias("repeaters"),
        F.expr(
            "cast((count(case when n_orders >= 2 then 1 end) * 1000000)"
            " div count(*) as bigint)"
        ).alias("repeat_ppm"),
        F.sum("n_orders").cast("long").alias("total_orders"),
    )


# ---------------------------------------------------------------------------
# Market concentration (HHI) — Herfindahl-Hirschman index of supplier
# revenue share within each nation, exact: HHI_ppm = Σ sᵢ² · 1e6 //
# (Σ sᵢ)² over revenue cents; the squared sums ride DECIMAL(38)/HUGEINT
# (the int128 discipline of hourly_type_correlation). One revenue
# aggregate keyed (nation, supplier), one concentration rollup.
# ---------------------------------------------------------------------------
@query(
    "market_concentration_hhi",
    """
    WITH rev AS (
        SELECT n.n_name AS nation, s.s_suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, s.s_suppkey
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST((sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) * 1000000)
                // (CAST(sum(cents) AS HUGEINT) * CAST(sum(cents) AS HUGEINT))
             AS BIGINT) AS hhi_ppm
    FROM rev GROUP BY nation
    """,
)
def market_concentration_hhi(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    return rev.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr(
            "cast((sum(cast(cents as decimal(38,0)) * cast(cents as decimal(38,0)))"
            " * 1000000) div (cast(sum(cents) as decimal(38,0))"
            " * cast(sum(cents) as decimal(38,0))) as bigint)"
        ).alias("hhi_ppm"),
    )


# ---------------------------------------------------------------------------
# Receivables aging — open-order value bucketed by days outstanding
# relative to the corpus max order date (deterministic as-of): the
# standard finance aging waterfall (0-30 / 31-60 / 61-90 / 90+). One
# broadcast scalar, one bucketed aggregate.
# ---------------------------------------------------------------------------
@query(
    "receivables_aging",
    """
    WITH mx AS (SELECT max(o_orderdate) AS asof FROM orders),
    aged AS (
        SELECT o_orderkey, o_totalprice,
               date_diff('day', o_orderdate, mx.asof) AS days_out
        FROM orders CROSS JOIN mx
        WHERE o_orderstatus <> 'F'
    )
    SELECT CASE WHEN days_out <= 30 THEN '0-30'
                WHEN days_out <= 60 THEN '31-60'
                WHEN days_out <= 90 THEN '61-90'
                ELSE '90+' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM aged GROUP BY 1
    """,
)
def receivables_aging(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("asof"))
    aged = (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(mx))
        .withColumn("days_out", F.datediff(F.col("asof"), F.col("o_orderdate")))
    )
    bucket = (
        F.when(F.col("days_out") <= 30, "0-30")
        .when(F.col("days_out") <= 60, "31-60")
        .when(F.col("days_out") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Order-size distribution — the fan-out histogram of lineitems per
# order (the degree profile that sizes the orders⋈lineitem join and
# catches fan-out regressions): one keyed count + one histogram
# rollup.
# ---------------------------------------------------------------------------
@query(
    "order_size_distribution",
    """
    WITH k AS (
        SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lineitems
    FROM k GROUP BY n_lines
    """,
)
def order_size_distribution(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    return k.groupBy("n_lines").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("n_lines").cast("long").alias("n_lineitems"),
    )
