"""Deterministic Lloyd k-means over the embeddings table.

An iterative algorithm expressed the way Spark MLlib's KMeans actually
runs at scale: centroids are tiny (k × dim) so each assignment round is
a *map-only* pass with the centroids inlined as literals (no join, no
shuffle on the big side); the only shuffle per round is the centroid
update — a ``groupBy(cid)`` with 64 per-dimension ``sum`` aggregates,
which combines map-side so the exchange carries k·dim longs per task,
independent of corpus size.  Three rounds → three scans, three tiny
shuffles, two k-row collects.  At 100 TB nothing in the loop grows with
the data except the embarrassingly parallel scan.

Exactness contract (this is the interesting part): the whole algorithm
is integer-exact, so it has a value-hash DuckDB oracle even though it is
iterative.  Centroids are kept as *rational* numbers — (element-wise
integer sum vector `s`, member count `c`) — never divided.  The squared
distance of quantized vector x to centroid (s, c) is compared in the
c²-scaled integer form

    d = c²·⟨x,x⟩ − 2c·⟨x,s⟩ + ⟨s,s⟩        (all int64, exact)

and the argmin across clusters orders by the double `d / c²` with cid as
tie-break (the division is one IEEE op on exactly-representable integers
< 2⁵³, so Spark and DuckDB compute the identical double).  Integer sums
make the centroid update order-independent, hence partition-count-
independent.  Seeds are the k smallest ``vec_id`` rows.

Output per cluster after 3 assignment rounds: member count and the
c²-scaled inertia (pure int64 sum — exact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import query

K = 8
ITERS = 3
DIM = 64

_Q = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


def _kmeans_oracle() -> str:
    parts = [
        f"""
    WITH qx AS (
        SELECT vec_id, {_Q} AS qv,
               CAST(list_dot_product({_Q}, {_Q}) AS BIGINT) AS xx
        FROM embeddings
    ),
    cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               qv AS s, CAST(1 AS BIGINT) AS c, xx AS ss
        FROM (SELECT vec_id, qv, xx FROM qx ORDER BY vec_id LIMIT {K})
    )"""
    ]
    for it in range(1, ITERS + 1):
        dist = (
            "ct.c*ct.c*qx.xx - 2*ct.c*CAST(list_dot_product(qx.qv, ct.s) AS BIGINT)"
            " + ct.ss"
        )
        parts.append(f"""
    a{it} AS (
        SELECT vec_id, qv, cid, d FROM (
            SELECT qx.vec_id, qx.qv, qx.xx, ct.cid, {dist} AS d,
                   row_number() OVER (PARTITION BY qx.vec_id
                       ORDER BY CAST({dist} AS DOUBLE) / (ct.c*ct.c), ct.cid
                   ) AS rn
            FROM qx CROSS JOIN cent{it - 1} ct
        ) WHERE rn = 1
    )""")
        if it < ITERS:
            parts.append(f"""
    cent{it} AS (
        SELECT g.cid, g.s, g.c,
               CAST(list_dot_product(g.s, g.s) AS BIGINT) AS ss
        FROM (
            SELECT cid, list(sv ORDER BY idx) AS s, max(cnt) AS c
            FROM (
                SELECT cid, idx, sum(val) AS sv, count(*) AS cnt
                FROM (SELECT cid, unnest(qv) AS val,
                             unnest(range(1, 1 + len(qv))) AS idx
                      FROM a{it})
                GROUP BY cid, idx
            ) GROUP BY cid
        ) g
    )""")
    parts.append(f"""
    SELECT cid, count(*) AS n_members, CAST(sum(d) AS BIGINT) AS inertia_scaled
    FROM a{ITERS} GROUP BY cid""")
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


def _quant(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _dot_lit(qcol, vec: list[int]):
    lit = F.array(*[F.lit(int(v)).cast("long") for v in vec])
    return F.aggregate(
        F.zip_with(qcol, lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q, cents):
    """Map-only argmin over inlined centroid literals (no join)."""
    choices = []
    for cid, s, c in cents:
        ss = sum(v * v for v in s)
        d = (
            F.lit(c * c).cast("long") * F.col("xx")
            - F.lit(2 * c).cast("long") * _dot_lit(F.col("qv"), s)
            + F.lit(ss).cast("long")
        )
        frac = d.cast("double") / F.lit(float(c * c))
        choices.append(F.struct(frac.alias("frac"), F.lit(cid).alias("cid"), d.alias("d")))
    best = F.array_min(F.array(*choices))
    return q.select(
        "vec_id", "qv", best["cid"].alias("cid"), best["d"].alias("d")
    )


def _update(assigned):
    """One tiny shuffle: k rows of (64 sums, count) via map-side combine."""
    rows = assigned.groupBy("cid").agg(
        *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(DIM)],
        F.count("*").alias("c"),
    ).collect()
    return sorted(
        (int(r["cid"]), [int(r[f"s{i}"]) for i in range(DIM)], int(r["c"]))
        for r in rows
    )


@query("kmeans_clusters", _kmeans_oracle())
def kmeans_clusters(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv")).withColumn(
        "xx",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    # The quantized projection is read by every assignment round and every
    # centroid update (2·ITERS − 1 passes). Persisting it is the standard
    # iterative-ML trade (MLlib KMeans does the same): one scan of the raw
    # table, then iterations run against the cached columnar projection,
    # spilling to disk if the cluster can't hold it.
    q = q.persist()
    seeds = q.orderBy("vec_id").limit(K).collect()
    cents = [(cid, [int(v) for v in r["qv"]], 1) for cid, r in enumerate(seeds)]
    assigned = None
    for it in range(ITERS):
        assigned = _assign(q, cents)
        if it < ITERS - 1:
            cents = _update(assigned)
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("d").cast("long").alias("inertia_scaled"),
    )
