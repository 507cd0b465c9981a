"""Mergeable cardinality / frequency sketches, deterministic across engines.

The reference counts things by replaying rows (projection/player.go's
count handlers); at 100 TB you count with sketches. The three classic
ones — KMV (k-minimum-values) for distinct counts, HyperLogLog for
distinct counts at fixed memory, count-min for per-key frequencies —
are implemented here as *pure DataFrame aggregations*:

* all hashing is ``md5`` (bit-identical in Spark and DuckDB), widened
  to a uint32 via ``conv(hex, 16, 10)`` / ``CAST('0x'||hex AS BIGINT)``;
* every estimator is evaluated in INTEGER arithmetic end-to-end —
  HLL's ``sum(2^-M_b)`` harmonic term is scaled by ``2^27`` so the
  registers sum as exact BIGINTs and the final estimate is one integer
  division. No float can round differently between engines, so the
  driver's value-hash gate applies to the *estimates*, not just the
  inputs.

Scale shape: each sketch is a ``groupBy().agg()`` — partial aggregation
IS the sketch merge (registers max-combine, counters add-combine), so
the map-side combine Spark already does is exactly the distributed
sketch union; no shuffle carries raw values, only O(registers) rows
per group. That is the whole point of sketches on a 1000-executor
cluster: the exact-distinct oracle columns computed alongside are the
part that would not survive 100 TB, included here only to let the gate
measure estimator error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

# ---------------------------------------------------------------------------
# Shared 32-bit hash: first 8 hex chars of md5, identical in both engines.
# ---------------------------------------------------------------------------


def _h32(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def _h32_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# KMV — k minimum values. Keep the k smallest distinct hash values per
# group; the k-th smallest h_k estimates density: n̂ = (k-1)·2^32 / h_k.
# (Bar-Yossef et al. 2002.) Exact-count fallback when the group has
# fewer than k distinct values (the sketch then IS the distinct set).
# ---------------------------------------------------------------------------

KMV_K = 32
_U32 = 1 << 32


@query(
    "sketch_kmv_distinct",
    f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, {_h32_sql("user_id")} AS h FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM pairs
    ),
    sk AS (
        SELECT event_type, max(h) AS h_k, count(*) AS n_in_sketch
        FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, count(*) AS n_exact FROM pairs GROUP BY event_type
    )
    SELECT sk.event_type AS event_type, ex.n_exact AS n_exact,
           CAST(CASE WHEN sk.n_in_sketch < {KMV_K} THEN ex.n_exact
                     ELSE ({KMV_K - 1} * {_U32}) // sk.h_k END AS BIGINT)
             AS kmv_estimate
    FROM sk JOIN ex ON sk.event_type = ex.event_type
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", _h32(F.col("user_id")).alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("h_k"), F.count("*").alias("n_in_sketch"))
    )
    exact = pairs.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    est = F.when(F.col("n_in_sketch") < KMV_K, F.col("n_exact")).otherwise(
        F.expr(f"({KMV_K - 1} * {_U32}) div h_k")
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            est.cast("long").alias("kmv_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# KMV sketch COMPOSITION — pairwise set-intersection estimation.
# The property that makes KMV the right sketch for audience-overlap /
# cross-corpus-contamination questions is that sketches COMBINE:
#   union sketch  = k smallest of S_A ∪ S_B   (τ = its k-th value)
#   Ĵ(A,B)       = |{h ∈ S_A ∩ S_B : h ≤ τ}| / k
#   |A∩B|^       = Ĵ · |A∪B|^,  |A∪B|^ = (k-1)·2³² / τ
# (Beyer et al., SIGMOD'07.) Everything below the per-type sketch is
# O(|types|²·k) driver-scale arithmetic: the single big-data pass is the
# distinct-(type, hash) aggregation; each sketch is ≤ k rows, and at
# 100 TB you'd persist the sketches and answer every pairwise overlap
# question without touching the corpus again — that is the operator
# being demonstrated. Estimates integer-exact, same contract as above;
# the exact intersection is computed alongside so the gate measures the
# estimator, small-set pairs fall back to exact (sketch = whole set).
# ---------------------------------------------------------------------------

_U32_ = 1 << 32


@query(
    "kmv_intersection_pairs",
    f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, {_h32_sql("user_id")} AS h FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM pairs
    ),
    sk AS (SELECT event_type, h FROM ranked WHERE rn <= {KMV_K}),
    tt AS (SELECT DISTINCT event_type FROM pairs),
    tp AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM tt a JOIN tt b ON a.event_type < b.event_type
    ),
    un AS (
        SELECT tp.ta, tp.tb, s.h FROM tp JOIN sk s ON s.event_type = tp.ta
        UNION
        SELECT tp.ta, tp.tb, s.h FROM tp JOIN sk s ON s.event_type = tp.tb
    ),
    unr AS (
        SELECT ta, tb, h,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM un
    ),
    tau AS (
        SELECT ta, tb, max(h) AS tau, count(*) AS k_used
        FROM unr WHERE rn <= {KMV_K} GROUP BY ta, tb
    ),
    com AS (
        SELECT t.ta, t.tb, count(*) AS n_common
        FROM tau t
        JOIN sk sa ON sa.event_type = t.ta AND sa.h <= t.tau
        JOIN sk sb ON sb.event_type = t.tb AND sb.h = sa.h
        GROUP BY t.ta, t.tb
    ),
    ex AS (
        SELECT t.ta, t.tb, count(*) AS n_exact
        FROM tp t
        JOIN pairs pa ON pa.event_type = t.ta
        JOIN pairs pb ON pb.event_type = t.tb AND pb.h = pa.h
        GROUP BY t.ta, t.tb
    )
    SELECT t.ta AS type_a, t.tb AS type_b,
           CAST(t.k_used AS BIGINT) AS k_used,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           CAST(CASE WHEN t.k_used < {KMV_K} THEN COALESCE(c.n_common, 0)
                     ELSE (COALESCE(c.n_common, 0)
                           * (({KMV_K - 1} * {_U32_}) // t.tau)) // {KMV_K}
                END AS BIGINT) AS inter_est,
           CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact
    FROM tau t
    LEFT JOIN com c ON c.ta = t.ta AND c.tb = t.tb
    LEFT JOIN ex e ON e.ta = t.ta AND e.tb = t.tb
    """,
)
def kmv_intersection_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # Round 12: the distinct-(type, hash) aggregation is THE one
    # big-data pass of this operator (module docstring above — "at
    # 100 TB you'd persist the sketches and answer every pairwise
    # overlap question without touching the corpus again"). The plan
    # previously re-derived it for every consumer — 18 full corpus
    # scans / 27 exchanges in one query plan. Materialize the distinct
    # pass once (linear state, the sketch-build input), and the
    # bounded frames below (sk ≤ k·|types|, tt ≤ |types|, tau ≤
    # |types|²) once each.
    pairs = (
        ev.select("event_type", _h32(F.col("user_id")).alias("h"))
        .distinct()
        .transform(materialize)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
        .transform(materialize)
    )
    tt = pairs.select("event_type").distinct()
    tp = (
        tt.alias("a")
        .join(tt.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
    )
    un = (
        tp.join(sk, sk["event_type"] == tp["ta"]).select("ta", "tb", "h")
        .union(tp.join(sk, sk["event_type"] == tp["tb"]).select("ta", "tb", "h"))
        .distinct()
    )
    wu = Window.partitionBy("ta", "tb").orderBy("h")
    tau = (
        un.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("ta", "tb")
        .agg(F.max("h").alias("tau"), F.count("*").alias("k_used"))
        .transform(materialize)
    )
    sa = sk.select(F.col("event_type").alias("ea"), F.col("h").alias("ha"))
    sb = sk.select(F.col("event_type").alias("eb"), F.col("h").alias("hb"))
    com = (
        tau.join(sa, (F.col("ea") == F.col("ta")) & (F.col("ha") <= F.col("tau")))
        .join(sb, (F.col("eb") == F.col("tb")) & (F.col("hb") == F.col("ha")))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_common"))
    )
    pa = pairs.select(F.col("event_type").alias("ea"), F.col("h").alias("ha"))
    pb = pairs.select(F.col("event_type").alias("eb"), F.col("h").alias("hb"))
    ex = (
        tp.join(pa, F.col("ea") == F.col("ta"))
        .join(pb, (F.col("eb") == F.col("tb")) & (F.col("hb") == F.col("ha")))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_exact"))
    )
    n_common = F.coalesce(F.col("n_common"), F.lit(0))
    est = F.when(F.col("k_used") < KMV_K, n_common).otherwise(
        F.expr(
            f"(coalesce(n_common, 0) * (({KMV_K - 1} * {_U32_}) div tau))"
            f" div {KMV_K}"
        )
    )
    return (
        tau.join(com, ["ta", "tb"], "left")
        .join(ex, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("k_used").cast("long").alias("k_used"),
            n_common.cast("long").alias("n_common"),
            est.cast("long").alias("inter_est"),
            F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog — m = 64 registers (p = 6 bucket bits, q = 26 rank bits).
# Register M_b = max over values of rho(w) (1 + leading zeros of the
# 26-bit remainder). The harmonic mean is evaluated integer-exactly:
# each register contributes 2^(27-M_b) ∈ BIGINT, empty registers 2^27,
# and n̂ = α·m²·2^27 / Σ  =  709·2^39 / (1000·Σ) as one integer division
# (α_64 = 0.709, Flajolet et al. 2007). The small-range linear-counting
# correction (n̂ ≤ 5/2·m with V empty registers → m·ln(m/V)) needs ln(),
# which can't be made bit-identical across engines as an *expression* —
# but m is fixed, so the 64 possible values are precomputed in Python
# and emitted as an identical literal CASE table on both sides.
# ---------------------------------------------------------------------------

import math

_HLL_P = 6
_HLL_M = 1 << _HLL_P          # 64 registers
_HLL_Q = 32 - _HLL_P          # 26 rank bits
_HLL_W = 1 << _HLL_Q          # 2^26
_HLL_SCALE = 1 << (_HLL_Q + 1)  # 2^27: weight of an empty register
# α·m²·2^27 scaled by 1000: 709 · 64² · 2^27 = 709 · 2^39
_HLL_NUM = 709 * (1 << 39)
# linear-counting lookup: V empty registers → round(m·ln(m/V))
_HLL_LC = {v: round(_HLL_M * math.log(_HLL_M / v)) for v in range(1, _HLL_M + 1)}


def _rho_sql() -> str:
    arms = " ".join(
        f"WHEN w >= {1 << (_HLL_Q - 1 - i)} THEN {i + 1}" for i in range(_HLL_Q)
    )
    return f"CASE {arms} ELSE {_HLL_Q + 1} END"


def _lc_sql(v_expr: str) -> str:
    arms = " ".join(f"WHEN {v} THEN {est}" for v, est in _HLL_LC.items())
    return f"CASE {v_expr} {arms} ELSE 0 END"


def hll_registers(df, group_cols, value_col):
    """HLL register frame ``group_cols + [b, m_b]`` for the values in
    ``value_col``. Mergeable: registers of a union = max-combine of the
    register frames — which is exactly what re-running this aggregation
    over a union (or a streaming micro-batch + stored registers) does.
    """
    rw = df.select(*group_cols, _h32(F.col(value_col)).alias("h")).select(
        *group_cols,
        F.expr(f"h div {_HLL_W}").alias("b"),
        (F.col("h") % _HLL_W).alias("w"),
    )
    rho = F.expr(_rho_sql())
    return rw.groupBy(*group_cols, "b").agg(F.max(rho).alias("m_b"))


def merge_hll_registers(*register_frames, group_cols):
    """Union register frames and max-combine — the distributed HLL merge."""
    out = register_frames[0]
    for other in register_frames[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "b").agg(F.max("m_b").alias("m_b"))


def hll_estimate(regs, group_cols):
    """Estimate per group from a register frame, integer-exact, with the
    literal-table linear-counting correction."""
    sums = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), F.lit(_HLL_Q + 1) - F.col("m_b")).cast("long"))
            + (F.lit(_HLL_M) - F.count("*")) * _HLL_SCALE
        ).alias("s"),
        (F.lit(_HLL_M) - F.count("*")).alias("v"),
    )
    est = sums.select(
        *group_cols,
        "v",
        F.expr(f"{_HLL_NUM} div (1000 * s)").cast("long").alias("raw_est"),
    )
    corrected = F.when(
        (F.col("raw_est") <= 5 * _HLL_M // 2) & (F.col("v") > 0),
        F.expr(_lc_sql("v")),
    ).otherwise(F.col("raw_est"))
    return est.select(*group_cols, corrected.cast("long").alias("hll_estimate"))


@query(
    "sketch_hll_distinct",
    f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, {_h32_sql("user_id")} AS h FROM events
    ),
    rw AS (
        SELECT event_type, h // {_HLL_W} AS b, h % {_HLL_W} AS w FROM pairs
    ),
    regs AS (
        SELECT event_type, b, max({_rho_sql()}) AS m_b
        FROM rw GROUP BY event_type, b
    ),
    sums AS (
        SELECT event_type,
               sum(CAST(power(2, {_HLL_Q + 1} - m_b) AS BIGINT))
                 + ({_HLL_M} - count(*)) * {_HLL_SCALE} AS s,
               {_HLL_M} - count(*) AS v
        FROM regs GROUP BY event_type
    ),
    est AS (
        SELECT event_type, v,
               CAST({_HLL_NUM} // (1000 * s) AS BIGINT) AS raw_est
        FROM sums
    ),
    ex AS (
        SELECT event_type, count(*) AS n_exact FROM pairs GROUP BY event_type
    )
    SELECT e.event_type AS event_type, ex.n_exact AS n_exact,
           CAST(CASE WHEN e.raw_est <= {5 * _HLL_M // 2} AND e.v > 0
                     THEN {_lc_sql("e.v")} ELSE e.raw_est END AS BIGINT)
             AS hll_estimate
    FROM est e JOIN ex ON e.event_type = ex.event_type
    """,
)
def sketch_hll_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id")
    est = hll_estimate(regs, ["event_type"])
    exact = (
        ev.select("event_type", _h32(F.col("user_id")).alias("h"))
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_exact"))
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_exact", "hll_estimate"
    )


# ---------------------------------------------------------------------------
# Count-min — depth 3 × width 64 counter matrix over per-user event
# counts; point query = min over the 3 depth rows (Cormode &
# Muthukrishnan 2005; always ≥ true count). Probed with the exact
# top-20 users so the gate hash covers true count AND estimate.
# ---------------------------------------------------------------------------

_CMS_D = 3
_CMS_W = 64


def _cms_bucket(d: int, col):
    salted = F.concat(F.lit(f"cms{d}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % _CMS_W
    )


def _cms_bucket_sql(d: int, expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('cms{d}:' || CAST({expr} AS VARCHAR)), 1, 8)"
        f" AS BIGINT) % {_CMS_W}"
    )


_CMS_DEPTHS_SQL = " UNION ALL ".join(
    f"SELECT {d} AS depth" for d in range(_CMS_D)
)


def cms_counters(df, value_col: str):
    """(depth, bucket, cnt) count-min counters over ``value_col``.

    One scan: stack the depth-bucket assignments row-wise, then ONE
    grouped count — the (depth,bucket) space is D×W cells, so the
    partial agg collapses each task's contribution to ≤D·W rows before
    the (tiny) exchange. This per-partition collapse IS the CMS merge;
    counter frames from disjoint inputs combine by per-cell addition.
    """
    with_buckets = df.select(F.col(value_col).alias("__v"))
    for d in range(_CMS_D):
        with_buckets = with_buckets.withColumn(
            f"b{d}", _cms_bucket(d, F.col("__v"))
        )
    stacked = with_buckets.select(
        F.expr(
            "stack({n}, {args}) as (depth, bucket)".format(
                n=_CMS_D,
                args=", ".join(f"{d}, b{d}" for d in range(_CMS_D)),
            )
        )
    )
    return stacked.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


@query(
    "sketch_cms_heavy_hitters",
    f"""
    WITH truec AS (
        SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id
    ),
    probes AS (
        SELECT user_id, true_n,
               row_number() OVER (ORDER BY true_n DESC, user_id) AS rnk
        FROM truec QUALIFY rnk <= 20
    ),
    counters AS (
        {" UNION ALL ".join(
            f'''SELECT {d} AS depth, {_cms_bucket_sql(d, "user_id")} AS bucket,
                       count(*) AS cnt
                FROM events GROUP BY 1, 2'''
            for d in range(_CMS_D)
        )}
    ),
    probe_buckets AS (
        {" UNION ALL ".join(
            f'''SELECT user_id, true_n, {d} AS depth,
                       {_cms_bucket_sql(d, "user_id")} AS bucket
                FROM probes'''
            for d in range(_CMS_D)
        )}
    )
    SELECT pb.user_id, pb.true_n, min(c.cnt) AS cms_estimate
    FROM probe_buckets pb
    JOIN counters c ON pb.depth = c.depth AND pb.bucket = c.bucket
    GROUP BY pb.user_id, pb.true_n
    """,
)
def sketch_cms_heavy_hitters(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id")

    truec = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    w = Window.orderBy(F.desc("true_n"), F.asc("user_id"))
    # Round 12: the D per-depth probe arms each replanned the whole
    # top-20 pipeline (3 extra corpus scans); the probe set is ≤ 20
    # rows — materialize it once.
    probes = (
        truec.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .drop("rnk")
        .transform(materialize)
    )
    pb = None
    for d in range(_CMS_D):
        arm = probes.select(
            "user_id",
            "true_n",
            F.lit(d).alias("depth"),
            _cms_bucket(d, F.col("user_id")).alias("bucket"),
        )
        pb = arm if pb is None else pb.unionByName(arm)
    return (
        pb.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom filter — set membership at fixed memory. 4 words × 62 usable
# bits (DuckDB's checked `<<` forbids shifts ≥ 63, so positions stay in
# 0..61; m = 248 bits). Hash family: Kirsch-Mitzenmacher double hashing
# (g_d = h1 + d·h2, "Less hashing, same performance", ESA'06) — ONE md5
# per value supplies both halves (hex chars 1-8 → h1, 9-16 → h2), so
# the D depths cost one hash invocation instead of D (md5 dominated the
# row cost; measured ~2× on the probe side). word_d = g_d % 4,
# bit_d = (g_d ÷ 4) % 62. Build = bit_or aggregate over per-row masks —
# partial-agg OR is the distributed Bloom merge, the same algebra as
# the HLL max-merge. Probe: AND over the 3 depths of (word & mask ≠ 0);
# one-sided like CMS (no false negatives; false positives counted
# against the exact set in the output). Everything is int64 bit math,
# so the false-positive COUNT itself is oracle-hashed.
# ---------------------------------------------------------------------------

_BF_WORDS = 4
_BF_BITS = 62
_BF_D = 3
_BF_PROBE_N = 200


def _bf_base_sql(expr: str) -> str:
    """SQL projecting h1/h2 from one md5 of the value (use in a CTE so
    the md5 evaluates once; mark it MATERIALIZED when referenced per
    depth)."""
    m = f"md5('bf:' || CAST({expr} AS VARCHAR))"
    return (
        f"CAST('0x' || substr({m}, 1, 8) AS BIGINT) AS h1, "
        f"CAST('0x' || substr({m}, 9, 8) AS BIGINT) AS h2"
    )


def _bf_word_sql(d: int) -> str:
    return f"((h1 + {d} * h2) % {_BF_WORDS})"


def _bf_mask_sql(d: int) -> str:
    return (
        f"(CAST(1 AS BIGINT) << "
        f"CAST(((h1 + {d} * h2) // {_BF_WORDS}) % {_BF_BITS} AS INT))"
    )


def _bf_with_h12(df: DataFrame, col_name: str) -> DataFrame:
    """Attach h1/h2 columns; the md5 is materialized by the first
    projection so every depth reuses it."""
    m = F.md5(F.concat(F.lit("bf:"), F.col(col_name).cast("string")))
    return df.withColumn("__m", m).select(
        "*",
        F.conv(F.substring("__m", 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("__m", 9, 8), 16, 10).cast("long").alias("h2"),
    ).drop("__m")


def _bf_word(d: int):
    return F.expr(f"(h1 + {d} * h2) % {_BF_WORDS}")


def _bf_mask(d: int):
    # F.shiftleft takes only a literal bit count; SQL shiftleft accepts an
    # expression, which the bit position is
    return F.expr(
        f"shiftleft(1L, cast(((h1 + {d} * h2) div {_BF_WORDS})"
        f" % {_BF_BITS} as int))"
    )


@query(
    "sketch_bloom_membership",
    f"""
    WITH base AS MATERIALIZED (
        SELECT event_type, {_bf_base_sql("user_id")} FROM events
    ),
    contrib AS (
        {" UNION ALL ".join(
            f'''SELECT event_type, {_bf_word_sql(d)} AS word,
                       {_bf_mask_sql(d)} AS mask
                FROM base'''
            for d in range(_BF_D)
        )}
    ),
    bf AS (
        SELECT event_type, word, bit_or(mask) AS bits
        FROM contrib GROUP BY event_type, word
    ),
    probes AS (SELECT range AS probe_id FROM range({_BF_PROBE_N})),
    pbase AS MATERIALIZED (
        SELECT probe_id, {_bf_base_sql("probe_id")} FROM probes
    ),
    probe_bits AS (
        {" UNION ALL ".join(
            f'''SELECT probe_id, {d} AS depth, {_bf_word_sql(d)} AS word,
                       {_bf_mask_sql(d)} AS mask
                FROM pbase'''
            for d in range(_BF_D)
        )}
    ),
    hits AS (
        SELECT t.event_type, pb.probe_id,
               CASE WHEN count(*) FILTER (WHERE (f.bits & pb.mask) != 0)
                    = {_BF_D} THEN 1 ELSE 0 END AS in_filter
        FROM probe_bits pb
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        LEFT JOIN bf f ON f.event_type = t.event_type AND f.word = pb.word
        GROUP BY t.event_type, pb.probe_id
    ),
    truth AS (
        SELECT DISTINCT event_type, user_id FROM events
    )
    SELECT h.event_type AS event_type,
           count(*) FILTER (WHERE h.in_filter = 1) AS n_pass,
           count(*) FILTER (WHERE tr.user_id IS NOT NULL) AS n_true,
           count(*) FILTER (WHERE h.in_filter = 1 AND tr.user_id IS NULL)
             AS n_false_pos,
           count(*) FILTER (WHERE h.in_filter = 0 AND tr.user_id IS NOT NULL)
             AS n_false_neg
    FROM hits h
    LEFT JOIN truth tr ON tr.event_type = h.event_type
                      AND tr.user_id = h.probe_id
    GROUP BY h.event_type
    """,
)
def sketch_bloom_membership(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    # Round 12 (scan-collapse): the filter build, the type spine and
    # the truth side each scanned events (3 corpus scans). bit_or is
    # idempotent, so building the filter from the DISTINCT (type, user)
    # rows inserts the same bits; truth/types are that same frame.
    # Materialized once (user-linear, the tu grain) — 1 scan.
    truth = ev.distinct().transform(materialize)
    # one md5 per row; the D depth arms explode from the same h1/h2 —
    # the double-hash point: no per-depth rescans, no per-depth hashing
    base = _bf_with_h12(truth, "user_id")
    arms = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                _bf_word(d).alias("word"),
                _bf_mask(d).alias("mask"),
            )
            for d in range(_BF_D)
        ]
    )
    contrib = base.select("event_type", F.explode(arms).alias("a")).select(
        "event_type", "a.word", "a.mask"
    )
    bf = contrib.groupBy("event_type", "word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )

    probes = spark.range(_BF_PROBE_N).select(F.col("id").alias("probe_id"))
    pb = (
        _bf_with_h12(probes, "probe_id")
        .select("probe_id", F.explode(arms).alias("a"))
        .select("probe_id", "a.depth", "a.word", "a.mask")
    )
    types = truth.select("event_type").distinct()
    hits = (
        pb.crossJoin(F.broadcast(types))
        .join(F.broadcast(bf), ["event_type", "word"], "left")
        .groupBy("event_type", "probe_id")
        .agg(
            F.when(
                F.count(
                    F.when(F.expr("(bits & mask) != 0"), 1)
                )
                == _BF_D,
                1,
            )
            .otherwise(0)
            .alias("in_filter")
        )
    )
    truth_probe = truth.withColumnRenamed("user_id", "probe_id")
    joined = hits.join(
        F.broadcast(truth_probe.withColumn("present", F.lit(1))),
        ["event_type", "probe_id"],
        "left",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.when(F.col("in_filter") == 1, 1)).alias("n_pass"),
        F.count(F.when(F.col("present") == 1, 1)).alias("n_true"),
        F.count(
            F.when((F.col("in_filter") == 1) & F.col("present").isNull(), 1)
        ).alias("n_false_pos"),
        F.count(
            F.when((F.col("in_filter") == 0) & (F.col("present") == 1), 1)
        ).alias("n_false_neg"),
    )


# ---------------------------------------------------------------------------
# HLL over time buckets — the hypertable × sketch composition: distinct
# users per hour, one 64-register sketch per bucket. This is the
# monitoring shape (distinct-per-window dashboards at 100 TB/day):
# buckets aggregate independently, REGISTERS roll up across buckets by
# max-merge — so an hourly register table answers daily/weekly distinct
# questions WITHOUT re-reading events (asserted by the merge law test
# and the streaming maintenance parity). Exact per-hour distinct counts
# are computed alongside for the gate's error measurement.
# ---------------------------------------------------------------------------


@query(
    "sketch_hll_hourly",
    f"""
    WITH pairs AS (
        SELECT DISTINCT epoch_ms(date_trunc('hour', ts)) AS bucket_hour,
               {_h32_sql("user_id")} AS h
        FROM events
    ),
    rw AS (
        SELECT bucket_hour, h // {_HLL_W} AS b, h % {_HLL_W} AS w FROM pairs
    ),
    regs AS (
        SELECT bucket_hour, b, max({_rho_sql()}) AS m_b
        FROM rw GROUP BY bucket_hour, b
    ),
    sums AS (
        SELECT bucket_hour,
               sum(CAST(power(2, {_HLL_Q + 1} - m_b) AS BIGINT))
                 + ({_HLL_M} - count(*)) * {_HLL_SCALE} AS s,
               {_HLL_M} - count(*) AS v
        FROM regs GROUP BY bucket_hour
    ),
    est AS (
        SELECT bucket_hour, v,
               CAST({_HLL_NUM} // (1000 * s) AS BIGINT) AS raw_est
        FROM sums
    ),
    ex AS (
        SELECT bucket_hour, count(*) AS n_exact FROM pairs GROUP BY bucket_hour
    )
    SELECT e.bucket_hour, ex.n_exact,
           CAST(CASE WHEN e.raw_est <= {5 * _HLL_M // 2} AND e.v > 0
                     THEN {_lc_sql("e.v")} ELSE e.raw_est END AS BIGINT)
             AS hll_estimate
    FROM est e JOIN ex ON e.bucket_hour = ex.bucket_hour
    """,
)
def sketch_hll_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_millis(F.date_trunc("hour", "ts")).alias("bucket_hour"),
        "user_id",
    )
    regs = hll_registers(ev, ["bucket_hour"], "user_id")
    est = hll_estimate(regs, ["bucket_hour"])
    exact = (
        ev.select("bucket_hour", _h32(F.col("user_id")).alias("h"))
        .distinct()
        .groupBy("bucket_hour")
        .agg(F.count("*").alias("n_exact"))
    )
    return est.join(exact, "bucket_hour").select(
        "bucket_hour", "n_exact", "hll_estimate"
    )


# ---------------------------------------------------------------------------
# Bitmap distinct — the EXACT complement of HLL for dense integer key
# spaces (the roaring-bitmap idea reduced to its algebra): map each key
# to bit (key % 62) of word (key // 62), bit_or the words per group,
# popcount and sum. Same merge properties as every sketch here (bit_or
# is commutative/associative/idempotent), but zero error — the right
# tool when the key domain is bounded (user ids, shard ids, enum
# values); HLL takes over when it isn't. Word count scales with the
# domain, not the row count: the shuffle carries O(domain/62) longs per
# group. 62 usable bits per word again (DuckDB checked `<<`).
# ---------------------------------------------------------------------------

_BM_BITS = 62


def _bm_words(max_key: int) -> int:
    return (max_key + _BM_BITS) // _BM_BITS


@query(
    "bitmap_distinct_users",
    f"""
    WITH m AS (
        SELECT event_type,
               user_id // {_BM_BITS} AS word,
               CAST(1 AS BIGINT) << CAST(user_id % {_BM_BITS} AS INT) AS mask
        FROM events
    ),
    words AS (
        SELECT event_type, word, bit_or(mask) AS bits
        FROM m GROUP BY event_type, word
    )
    SELECT event_type,
           CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct,
           count(*) AS n_words
    FROM words GROUP BY event_type
    """,
)
def bitmap_distinct_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    m = ev.select(
        "event_type",
        F.expr(f"user_id div {_BM_BITS}").alias("word"),
        F.expr(f"shiftleft(1L, cast(user_id % {_BM_BITS} as int))").alias("mask"),
    )
    words = m.groupBy("event_type", "word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(bits)")).cast("long").alias("n_distinct"),
        F.count("*").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) hashing — stable work assignment: owner(x) = argmax
# over nodes of md5(node:x). Removing a node moves ONLY that node's
# keys (1/N of them) — the minimal-disruption property that makes HRW /
# consistent hashing the standard for shard maps, cache routing, and
# the reference's own partition scheme generalized (util/common.go
# hashes to a FIXED partition count; HRW survives topology change).
# The query emits both the 8-node and 7-node assignments and counts the
# moved keys, so the minimal-disruption property itself is hash-checked.
# ---------------------------------------------------------------------------

HRW_NODES = [f"node{i}" for i in range(8)]


def _hrw_owner_sql(nodes: list[str], expr: str) -> str:
    weights = ", ".join(
        f"('{n}', CAST('0x' || substr(md5('{n}:' || CAST({expr} AS VARCHAR)),"
        f" 1, 8) AS BIGINT))"
        for n in nodes
    )
    # greatest-by-weight via a generated CASE over pairwise comparisons is
    # quadratic; instead sort a literal list of (node, weight) structs
    return (
        f"(SELECT n FROM (SELECT unnest([{weights}]) AS s)"
        f" t(s), LATERAL (SELECT s[1] AS n, s[2] AS w) ORDER BY w DESC, n LIMIT 1)"
    )


@query(
    "hrw_assignment_stability",
    f"""
    WITH docs_h AS (
        SELECT doc_id,
               {_hrw_owner_sql(HRW_NODES, "doc_id")} AS owner8,
               {_hrw_owner_sql(HRW_NODES[:-1], "doc_id")} AS owner7
        FROM documents
    )
    SELECT owner8, count(*) AS n_docs,
           CAST(sum(CASE WHEN owner8 != owner7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved_without_node7
    FROM docs_h GROUP BY owner8
    """,
)
def hrw_assignment_stability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def owner(nodes):
        pairs = F.array(
            *[
                F.struct(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{n}:"),
                                    F.col("doc_id").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("w"),
                    F.lit(n).alias("n"),
                )
                for n in nodes
            ]
        )
        # array_max over (weight, node) structs == ORDER BY w DESC tie n DESC;
        # tie-break must match the oracle's (w DESC, n ASC) — md5 collisions
        # across distinct salted strings don't occur in a 32-bit prefix at
        # this scale, so the node tie-break is unreachable; weight order
        # alone decides
        return F.array_max(pairs)["n"]

    withowners = docs.select(
        "doc_id",
        owner(HRW_NODES).alias("owner8"),
        owner(HRW_NODES[:-1]).alias("owner7"),
    )
    return withowners.groupBy("owner8").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("owner8") != F.col("owner7"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved_without_node7"),
    )


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join — the APPLICATION of the Bloom sketch that
# matters at 100 TB: a runtime filter. The selective build side (hot
# orders) compresses to 4 int64 words; the probe side tests membership
# MAP-SIDE before any join shuffle, so only pass rows (true matches +
# a counted false-positive tail) ever reach the exchange. Spark's AQE
# injects exactly this (spark.sql.optimizer.runtimeFilter.*); building
# it explicitly makes the pruning measurable — the output row reports
# the selectivity the filter achieved and the false-positive overhead.
# The single-row bloom frame rides a broadcast nested-loop join (1 row,
# zero cost); the exact hot-key join is broadcast hash. One lineitem
# scan, no shuffle at all before the final 1-row aggregate.
# ---------------------------------------------------------------------------

BLOOM_HOT_PRICE = 400000  # build-side predicate: o_totalprice above this


def _bf_word_pick_sql(d: int, pfx: str) -> str:
    w = _bf_word_sql(d)
    return (
        f"(CASE {w} WHEN 0 THEN {pfx}w0 WHEN 1 THEN {pfx}w1 "
        f"WHEN 2 THEN {pfx}w2 WHEN 3 THEN {pfx}w3 END)"
    )


@query(
    "bloom_semijoin_prune",
    f"""
    WITH hot AS MATERIALIZED (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {BLOOM_HOT_PRICE}
    ),
    hbase AS MATERIALIZED (
        SELECT {_bf_base_sql("o_orderkey")} FROM hot
    ),
    contrib AS (
        {" UNION ALL ".join(
            f'''SELECT {_bf_word_sql(d)} AS word,
                       {_bf_mask_sql(d)} AS mask FROM hbase'''
            for d in range(_BF_D)
        )}
    ),
    bf AS (
        SELECT
          {", ".join(
            f"bit_or(CASE WHEN word = {w} THEN mask ELSE 0 END) AS w{w}"
            for w in range(_BF_WORDS)
          )}
        FROM contrib
    ),
    lbase AS (
        SELECT l_orderkey, {_bf_base_sql("l_orderkey")} FROM lineitem
    ),
    probe AS (
        SELECT
          CASE WHEN {" AND ".join(
            f"({_bf_word_pick_sql(d, 'bf.')}"
            f" & {_bf_mask_sql(d)}) != 0"
            for d in range(_BF_D)
          )} THEN 1 ELSE 0 END AS in_filter,
          CASE WHEN h.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS is_hot
        FROM lbase l CROSS JOIN bf
        LEFT JOIN hot h ON h.o_orderkey = l.l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(in_filter) AS BIGINT) AS n_pass,
           CAST(sum(is_hot) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN in_filter = 1 AND is_hot = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST((sum(in_filter) * 1000000) // count(*) AS BIGINT) AS pass_ppm
    FROM probe
    """,
)
def bloom_semijoin_prune(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # The probe side evaluates two md5 hashes + d bit-tests per row —
    # CPU-dense per byte, so a single-file scan must not serialize it
    # (round-12 text-kernel rule; measured 2.4 s -> 1.7 s at sf0.1).
    # No-op on a real-scale scan, like every ensure_parallelism.
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    )
    hot = orders.filter(F.col("o_totalprice") > BLOOM_HOT_PRICE).select(
        "o_orderkey"
    )
    arms = F.array(
        *[
            F.struct(_bf_word(d).alias("word"), _bf_mask(d).alias("mask"))
            for d in range(_BF_D)
        ]
    )
    contrib = (
        _bf_with_h12(hot, "o_orderkey")
        .select(F.explode(arms).alias("a"))
        .select("a.word", "a.mask")
    )
    bf = contrib.agg(
        *[
            F.expr(f"bit_or(CASE WHEN word = {w} THEN mask ELSE 0 END)").alias(
                f"w{w}"
            )
            for w in range(_BF_WORDS)
        ]
    )
    tests = []
    for d in range(_BF_D):
        word = _bf_word(d)
        pick = (
            F.when(word == 0, F.col("w0"))
            .when(word == 1, F.col("w1"))
            .when(word == 2, F.col("w2"))
            .otherwise(F.col("w3"))
        )
        tests.append(pick.bitwiseAND(_bf_mask(d)) != 0)
    in_filter = tests[0]
    for t in tests[1:]:
        in_filter = in_filter & t
    probe = (
        _bf_with_h12(li, "l_orderkey")
        .crossJoin(F.broadcast(bf))
        .join(
            F.broadcast(hot.withColumn("is_hot", F.lit(1))),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .select(
            F.when(in_filter, 1).otherwise(0).alias("in_filter"),
            F.coalesce(F.col("is_hot"), F.lit(0)).alias("is_hot"),
        )
    )
    return probe.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("in_filter").cast("long").alias("n_pass"),
        F.sum("is_hot").cast("long").alias("n_true"),
        F.sum(
            F.when((F.col("in_filter") == 1) & (F.col("is_hot") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.expr("(sum(in_filter) * 1000000) div count(*)")
        .cast("long")
        .alias("pass_ppm"),
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct via register algebra — the payoff of keeping
# HOURLY HLL registers (sketch_hll_hourly): any wider window's distinct
# count is a max-merge of the per-hour register frames, NO re-scan of
# raw events. Here: trailing-6-hour distinct users for every hour with
# data. Spark side expresses the merge as a RANGE-frame window max per
# register lane (partition by b — 64 independent lanes, each a tiny
# ordered frame over |hours| rows); the raw table is scanned once to
# build the hourly registers and once more only for the exact-count
# audit column. At 100 TB the registers live in a table and this query
# never touches the events at all. Oracle states the identical merge as
# a bounded range join. Estimates integer-exact as everywhere else.
# ---------------------------------------------------------------------------

_SLIDE_H = 5  # 5 preceding + current = 6-hour window


@query(
    "sketch_hll_sliding",
    f"""
    WITH up AS (
        SELECT DISTINCT epoch_ms(ts) // 3600000 AS hr,
               {_h32_sql("user_id")} AS h
        FROM events
    ),
    hours AS (SELECT DISTINCT hr FROM up),
    rw AS (SELECT hr, h // {_HLL_W} AS b, h % {_HLL_W} AS w FROM up),
    regs AS (
        SELECT hr, b, max({_rho_sql()}) AS m_b FROM rw GROUP BY hr, b
    ),
    bs AS (SELECT DISTINCT b FROM regs),
    grid AS (SELECT ho.hr, bs.b FROM hours ho CROSS JOIN bs),
    sl AS (
        SELECT g.hr, g.b, max(r.m_b) AS m_b
        FROM grid g
        LEFT JOIN regs r
          ON r.b = g.b AND r.hr BETWEEN g.hr - {_SLIDE_H} AND g.hr
        GROUP BY g.hr, g.b
    ),
    live AS (SELECT hr, b, m_b FROM sl WHERE m_b IS NOT NULL),
    sums AS (
        SELECT hr,
               sum(CAST(power(2, {_HLL_Q + 1} - m_b) AS BIGINT))
                 + ({_HLL_M} - count(*)) * {_HLL_SCALE} AS s,
               {_HLL_M} - count(*) AS v
        FROM live GROUP BY hr
    ),
    est AS (
        SELECT hr, v,
               CAST({_HLL_NUM} // (1000 * s) AS BIGINT) AS raw_est
        FROM sums
    ),
    ex AS (
        SELECT ho.hr, count(DISTINCT u.h) AS n_exact
        FROM hours ho
        JOIN up u ON u.hr BETWEEN ho.hr - {_SLIDE_H} AND ho.hr
        GROUP BY ho.hr
    )
    SELECT e.hr AS hr, ex.n_exact AS n_exact,
           CAST(CASE WHEN e.raw_est <= {5 * _HLL_M // 2} AND e.v > 0
                     THEN {_lc_sql("e.v")} ELSE e.raw_est END AS BIGINT)
             AS hll_estimate
    FROM est e JOIN ex ON ex.hr = e.hr
    """,
)
def sketch_hll_sliding(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # Round 12: the distinct (hour, hash) frame feeds the hour spine,
    # the register build AND the exact-recount probe — 5 corpus scans +
    # 3 distinct shuffles without materialization. Distinct hour×user
    # grain, 2 ints — materialize it once.
    up = (
        ev.select(
            F.expr("unix_millis(ts) div 3600000").alias("hr"),
            _h32(F.col("user_id")).alias("h"),
        )
        .distinct()
        .transform(materialize)
    )
    hours = up.select("hr").distinct()
    regs = (
        up.select(
            "hr",
            F.expr(f"h div {_HLL_W}").alias("b"),
            (F.col("h") % _HLL_W).alias("w"),
        )
        .groupBy("hr", "b")
        .agg(F.max(F.expr(_rho_sql())).alias("m_b"))
    )
    bs = regs.select("b").distinct()
    grid = hours.crossJoin(F.broadcast(bs))
    g = grid.join(regs, ["hr", "b"], "left")
    w = (
        Window.partitionBy("b")
        .orderBy("hr")
        .rangeBetween(-_SLIDE_H, 0)
    )
    sl = g.select("hr", "b", F.max("m_b").over(w).alias("m_b")).filter(
        F.col("m_b").isNotNull()
    )
    est = hll_estimate(sl, ["hr"]).withColumnRenamed(
        "hll_estimate", "hll_estimate"
    )
    hr_lo = (F.col("u_hr") >= F.col("hr") - _SLIDE_H) & (
        F.col("u_hr") <= F.col("hr")
    )
    exact = (
        hours.join(
            up.select(F.col("hr").alias("u_hr"), "h"), hr_lo
        )
        .groupBy("hr")
        .agg(F.countDistinct("h").alias("n_exact"))
    )
    return est.join(exact, "hr").select("hr", "n_exact", "hll_estimate")


# ---------------------------------------------------------------------------
# HLL set operations — inclusion-exclusion over register merges:
# |A∩B|^ = n̂(A) + n̂(B) − n̂(A∪B), where the union estimate comes from
# max-merging the two register frames (exact sketch algebra, no data
# re-scan). The complement of kmv_intersection_pairs: KMV intersects
# by common-minima counting (unbiased, needs the hash sets), HLL by
# inclusion-exclusion (register-only — what you can do when only the
# 64-register summaries were kept). Negative differences clamp to 0 —
# the known failure mode for small overlaps, which is why the exact
# column rides along. Everything is the same integer estimator.
# ---------------------------------------------------------------------------


@query(
    "hll_intersection_pairs",
    f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, {_h32_sql("user_id")} AS h FROM events
    ),
    rw AS (
        SELECT event_type, h // {_HLL_W} AS b, h % {_HLL_W} AS w FROM pairs
    ),
    regs AS (
        SELECT event_type, b, max({_rho_sql()}) AS m_b
        FROM rw GROUP BY event_type, b
    ),
    tt AS (SELECT DISTINCT event_type FROM pairs),
    tp AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM tt a JOIN tt b ON a.event_type < b.event_type
    ),
    uregs AS (
        SELECT tp.ta, tp.tb, r.b, max(r.m_b) AS m_b
        FROM tp JOIN regs r ON r.event_type IN (tp.ta, tp.tb)
        GROUP BY tp.ta, tp.tb, r.b
    ),
    single_est AS (
        SELECT event_type,
               CAST(CASE WHEN raw_est <= {5 * _HLL_M // 2} AND v > 0
                         THEN {_lc_sql("v")} ELSE raw_est END AS BIGINT)
                 AS n_est
        FROM (
            SELECT event_type, v,
                   CAST({_HLL_NUM} // (1000 * s) AS BIGINT) AS raw_est
            FROM (
                SELECT event_type,
                       sum(CAST(power(2, {_HLL_Q + 1} - m_b) AS BIGINT))
                         + ({_HLL_M} - count(*)) * {_HLL_SCALE} AS s,
                       {_HLL_M} - count(*) AS v
                FROM regs GROUP BY event_type
            )
        )
    ),
    union_est AS (
        SELECT ta, tb,
               CAST(CASE WHEN raw_est <= {5 * _HLL_M // 2} AND v > 0
                         THEN {_lc_sql("v")} ELSE raw_est END AS BIGINT)
                 AS n_union
        FROM (
            SELECT ta, tb, v,
                   CAST({_HLL_NUM} // (1000 * s) AS BIGINT) AS raw_est
            FROM (
                SELECT ta, tb,
                       sum(CAST(power(2, {_HLL_Q + 1} - m_b) AS BIGINT))
                         + ({_HLL_M} - count(*)) * {_HLL_SCALE} AS s,
                       {_HLL_M} - count(*) AS v
                FROM uregs GROUP BY ta, tb
            )
        )
    ),
    ex AS (
        SELECT t.ta, t.tb, count(*) AS n_exact
        FROM tp t
        JOIN pairs pa ON pa.event_type = t.ta
        JOIN pairs pb ON pb.event_type = t.tb AND pb.h = pa.h
        GROUP BY t.ta, t.tb
    )
    SELECT u.ta AS type_a, u.tb AS type_b,
           sa.n_est AS est_a, sb.n_est AS est_b, u.n_union AS est_union,
           CAST(greatest(sa.n_est + sb.n_est - u.n_union, 0) AS BIGINT)
             AS inter_est,
           CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact
    FROM union_est u
    JOIN single_est sa ON sa.event_type = u.ta
    JOIN single_est sb ON sb.event_type = u.tb
    LEFT JOIN ex e ON e.ta = u.ta AND e.tb = u.tb
    """,
)
def hll_intersection_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # Round 12: the distinct (type, hash) frame feeds the registers, the
    # type list (both self-join sides) and both exact-intersection probe
    # sides — 12 corpus scans + 7 distinct shuffles without
    # materialization. It is the sketch input state (distinct user-type
    # grain, 2 ints) — materialize it once.
    pairs = (
        ev.select("event_type", _h32(F.col("user_id")).alias("h"))
        .distinct()
        .transform(materialize)
    )
    # hll_registers hashes its value column; hashing the already-hashed
    # column would diverge from the oracle — build registers directly
    # from the shared hash instead.
    regs = (
        pairs.select(
            "event_type",
            F.expr(f"h div {_HLL_W}").alias("b"),
            (F.col("h") % _HLL_W).alias("w"),
        )
        .groupBy("event_type", "b")
        .agg(F.max(F.expr(_rho_sql())).alias("m_b"))
        # ≤ |types| × 64 registers at any corpus size; three consumers
        # (two union-merge sides + the single-type estimates)
        .transform(materialize)
    )
    tt = pairs.select("event_type").distinct()
    tp = (
        tt.alias("a")
        .join(tt.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
    )
    uregs = (
        tp.join(regs, regs["event_type"] == tp["ta"]).select("ta", "tb", "b", "m_b")
        .union(
            tp.join(regs, regs["event_type"] == tp["tb"]).select(
                "ta", "tb", "b", "m_b"
            )
        )
        .groupBy("ta", "tb", "b")
        .agg(F.max("m_b").alias("m_b"))
    )
    single = hll_estimate(regs, ["event_type"])
    union = hll_estimate(uregs, ["ta", "tb"]).withColumnRenamed(
        "hll_estimate", "n_union"
    )
    pa = pairs.select(F.col("event_type").alias("ea"), F.col("h").alias("ha"))
    pb = pairs.select(F.col("event_type").alias("eb"), F.col("h").alias("hb"))
    ex = (
        tp.join(pa, F.col("ea") == F.col("ta"))
        .join(pb, (F.col("eb") == F.col("tb")) & (F.col("hb") == F.col("ha")))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_exact"))
    )
    sa = single.select(
        F.col("event_type").alias("ta"), F.col("hll_estimate").alias("est_a")
    )
    sb = single.select(
        F.col("event_type").alias("tb"), F.col("hll_estimate").alias("est_b")
    )
    return (
        union.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .join(ex, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "est_a",
            "est_b",
            F.col("n_union").alias("est_union"),
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("n_union"), F.lit(0)
            )
            .cast("long")
            .alias("inter_est"),
            F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
        )
    )


# ---------------------------------------------------------------------------
# CMS join-cardinality estimate — the sketch composition behind
# optimizer cardinality guessing (AMS/F2-style): |A ⋈_u B| = Σ_u
# cA(u)·cB(u), upper-bounded by the inner product of the two streams'
# count-min rows at any depth (min over depths = tightest bound;
# Cormode & Muthukrishnan §4.2). Both sketches reuse the registry's
# md5 CMS family, so the estimate — and the exact error it incurs vs
# the true join size — is integer-reproducible in the oracle. At scale
# each sketch is a (depth·width)-cell aggregate (192 cells here)
# regardless of corpus size; the true-size branch exists only for the
# audit and would be dropped in production.
# ---------------------------------------------------------------------------


@query(
    "cms_join_cardinality",
    f"""
    WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
    ca AS (
        {" UNION ALL ".join(
            f'''SELECT {d} AS depth, {_cms_bucket_sql(d, "user_id")} AS bucket,
                       count(*) AS c
                FROM a GROUP BY 2'''
            for d in range(_CMS_D)
        )}
    ),
    cb AS (
        {" UNION ALL ".join(
            f'''SELECT {d} AS depth, {_cms_bucket_sql(d, "user_id")} AS bucket,
                       count(*) AS c
                FROM b GROUP BY 2'''
            for d in range(_CMS_D)
        )}
    ),
    est AS (
        SELECT ca.depth, sum(ca.c * cb.c) AS ip
        FROM ca JOIN cb ON ca.depth = cb.depth AND ca.bucket = cb.bucket
        GROUP BY ca.depth
    ),
    truth AS (
        SELECT coalesce(sum(ta.c * tb.c), 0) AS t FROM
        (SELECT user_id, count(*) AS c FROM a GROUP BY user_id) ta
        JOIN (SELECT user_id, count(*) AS c FROM b GROUP BY user_id) tb
        USING (user_id)
    )
    SELECT CAST(truth.t AS BIGINT) AS true_card,
           CAST(min(est.ip) AS BIGINT) AS cms_estimate,
           CAST(((min(est.ip) - truth.t) * 1000000) // truth.t AS BIGINT)
             AS overestimate_ppm
    FROM est CROSS JOIN truth
    GROUP BY truth.t
    """,
)
def cms_join_cardinality(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # Round 12 (was 8 corpus scans: one per depth arm per side via the
    # union-of-arms build, plus two more for the truth branch): ONE
    # corpus pass to the per-(user, side) count frame — the exact
    # sufficient statistic for both the sketches (bucket count = sum of
    # its users' counts) and the true join size. The frame is distinct-
    # user grain, 3 ints — materialize it once; every arm and the truth
    # branch derive from it with a `stack` (the one-pass all-depths
    # layout the registry's CMS builder already uses).
    uc = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .transform(materialize)
    )
    a = uc.filter(F.col("event_type") == "click").select("user_id", "c")
    b = uc.filter(F.col("event_type") == "purchase").select("user_id", "c")

    def cms(side: DataFrame) -> DataFrame:
        wb = side
        for d in range(_CMS_D):
            wb = wb.withColumn(f"b{d}", _cms_bucket(d, F.col("user_id")))
        stacked = wb.select(
            "c",
            F.expr(
                "stack({n}, {args}) as (depth, bucket)".format(
                    n=_CMS_D,
                    args=", ".join(f"{d}, b{d}" for d in range(_CMS_D)),
                )
            ),
        )
        return stacked.groupBy("depth", "bucket").agg(F.sum("c").alias("c"))

    est = (
        cms(a).alias("ca")
        .join(
            cms(b).alias("cb"),
            (F.col("ca.depth") == F.col("cb.depth"))
            & (F.col("ca.bucket") == F.col("cb.bucket")),
        )
        .groupBy(F.col("ca.depth"))
        .agg(F.sum(F.col("ca.c") * F.col("cb.c")).alias("ip"))
        .agg(F.min("ip").alias("cms_estimate"))
    )
    truth = (
        a.withColumnRenamed("c", "ca")
        .join(b.withColumnRenamed("c", "cb"), "user_id")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("t"))
    )
    return est.crossJoin(truth).select(
        F.col("t").cast("long").alias("true_card"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        F.expr("((cms_estimate - t) * 1000000) div t")
        .cast("long")
        .alias("overestimate_ppm"),
    )


# ---------------------------------------------------------------------------
# Bitmap-index intersection — the word-level AND that makes bitmap
# indexes the fastest audience-overlap structure there is: each type's
# user set is 62-bit words (bitmap_distinct_users' encoding); the
# intersection count of two types is Σ_word popcount(bits_a & bits_b).
# Same numbers coengagement_matrix derives by a distinct self-join —
# entirely different plan: one bitmap build (groupBy word = the index),
# then a word-keyed equi-join over ≤ |users|/62 rows per type. At
# 100 TB the bitmap build is the only corpus-size pass; every pairwise
# question after it costs |words| not |events|.
# ---------------------------------------------------------------------------


@query(
    "bitmap_and_popcount",
    f"""
    WITH m AS (
        SELECT event_type,
               user_id // {62} AS word,
               CAST(1 AS BIGINT) << CAST(user_id % {62} AS INT) AS mask
        FROM events
    ),
    words AS (
        SELECT event_type, word, bit_or(mask) AS bits
        FROM m GROUP BY event_type, word
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both,
           CAST(sum(bit_count(a.bits | b.bits)) AS BIGINT) AS n_either
    FROM words a JOIN words b
      ON a.word = b.word AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def bitmap_and_popcount(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.expr("user_id div 62").alias("word"),
        F.expr("shiftleft(1L, cast(user_id % 62 as int))").alias("mask"),
    )
    words = m.groupBy("event_type", "word").agg(
        F.expr("bit_or(mask)").alias("bits")
    )
    a, b = words.alias("a"), words.alias("b")
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.expr("bit_count(a.bits & b.bits)"))
            .cast("long")
            .alias("n_both"),
            F.sum(F.expr("bit_count(a.bits | b.bits)"))
            .cast("long")
            .alias("n_either"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram quantile estimator — the fixed-memory quantile sketch in
# its simplest mergeable form (64 equi-width bins; the shape Prometheus
# histogram_quantile / many monitoring pipelines use). Estimate = lower
# edge of the bin where the cumulative count crosses p·n, linearly
# interpolated *in integer micro-units of a bin*. Mergeable the same
# way CMS/HLL are (bins add); the exact interpolated percentile is
# computed alongside so the gate pins the estimator's error, and the
# whole thing — including the interpolation — is integer arithmetic.
# ---------------------------------------------------------------------------

_HQ_BINS = 64
_HQ_MAX_C = 10_000  # value ∈ [0, 100) → cents ∈ [0, 10000)


@query(
    "histogram_quantile_estimate",
    f"""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    b AS (
        SELECT event_type,
               least(cents * {_HQ_BINS} // {_HQ_MAX_C}, {_HQ_BINS - 1}) AS bin,
               count(*) AS n
        FROM c GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bin, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cn,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM b
    ),
    hit AS (
        SELECT event_type, bin, n, cn, total,
               row_number() OVER (PARTITION BY event_type ORDER BY bin) AS rk
        FROM cum WHERE cn * 2 >= total
    )
    SELECT event_type,
           CAST(total AS BIGINT) AS n,
           CAST(bin * ({_HQ_MAX_C} // {_HQ_BINS})
                + ((total - 2 * (cn - n)) * ({_HQ_MAX_C} // {_HQ_BINS}))
                  // (2 * n) AS BIGINT) AS p50_est_cents
    FROM hit WHERE rk = 1
    """,
)
def histogram_quantile_estimate(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    b = (
        ev.select("event_type", cents.alias("cents"))
        .groupBy(
            "event_type",
            F.least(
                F.expr(f"cents * {_HQ_BINS} div {_HQ_MAX_C}"),
                F.lit(_HQ_BINS - 1),
            ).alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wtot = Window.partitionBy("event_type")
    cum = b.select(
        "event_type",
        "bin",
        "n",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("n").over(wtot).alias("total"),
    )
    hit = (
        cum.filter(F.col("cn") * 2 >= F.col("total"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("bin")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    binw = _HQ_MAX_C // _HQ_BINS
    return hit.select(
        "event_type",
        F.col("total").cast("long").alias("n"),
        (
            F.col("bin") * binw
            + F.expr(
                f"((total - 2 * (cn - n)) * {binw}) div (2 * n)"
            )
        )
        .cast("long")
        .alias("p50_est_cents"),
    )
