"""Similarity extensions: SimHash, hyperplane LSH, exact cosine near-dup.

Determinism strategy (shared with pipeline.queries): every computation
that feeds the DuckDB oracle uses either md5 (identical in both
engines) or exact integer arithmetic on quantized embeddings
(round(x*1000) → int64). Cosine thresholds compare in cross-multiplied
integer form — ``cos ≥ 0.4  ⟺  25·dot² ≥ 4·‖a‖²·‖b‖² ∧ dot>0`` —
so no floating-point boundary can flip between engines (all terms stay
< 2^63 for 64-dim, |x|≤~30 inputs).

Scale shape: near-dup and ANN candidate generation goes through LSH
buckets sized FROM THE DATA, never all-pairs: band/bucket bit-widths are
computed at run time as ``band_bits = clamp(⌈log₂(n / target_occupancy)⌉,
4..13)`` via exact integer arithmetic in a broadcast one-row sizing frame
(``band_bits`` below), identically in the Spark plan and the
DuckDB oracle — so bucket occupancy tracks corpus growth instead of
collapsing (fixed 4-bit bands produced 0 surviving edges at 20×
replication; sized bands 1.3 M cap-bounded ones, BASELINE.md §6). Bands
slice a prefix of a 28-plane deterministic ±1 hyperplane pool whose
seeded literals are shared verbatim between both engines; the quadratic
verification join runs only within buckets, with an occupancy cap
refusing quadratic blow-up on degenerate keys.
"""

from __future__ import annotations

import random

import pandas as pd  # module-level: pandas_udf resolves annotations here

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

DIM = 64
N_PLANES = 8
# The signature pool is wider than any single consumer needs: band/bucket
# widths are derived from corpus size at run time (band_bits below) and
# slice a prefix of this pool. 28 planes = 2 bands × 13 bits max, or one
# 14-bit ANN bucket — enough for ~10⁶ vectors per LSH instance before
# the clamp engages. The first N_PLANES rows are the original 8-plane
# signature (same RNG stream), so any b≤4-bit band extraction is
# bit-identical to the historical fixed layout.
MAX_PLANES = 28
_rng = random.Random(20240813)
HYPERPLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(MAX_PLANES)
]

# --- data-driven LSH sizing (VERDICT r02 #3) -------------------------------
# The scale-safe rule bits ≈ log2(n / target_bucket) is WIRED into every
# hyperplane-LSH consumer, not just documented: band extraction reads its
# modulus from a 1-row broadcast computed off count(*), identically in
# Spark and in the DuckDB oracle (binary-digit-count arithmetic — no
# float log anywhere). Below the lo-clamp the layout equals the
# historical fixed one (4-bit bands / 8-bit ANN buckets), so small-corpus
# results are unchanged; past it, bucket count grows with the corpus and
# expected occupancy stays ≈ target — candidate generation remains linear
# (the BUCKET_CAP refusal then only fires on true mega-duplicate pileups,
# not on corpus growth).
TARGET_BUCKET = 100          # band-bucket expected occupancy target
BAND_BITS_MIN, BAND_BITS_MAX = 4, 13
# ANN probe-bucket expected occupancy: 8 matches the historical 256-
# bucket density at gate scale (n=2000 → 8 bits), so the per-bucket
# numpy matmul stays amortized over a real batch instead of paying
# grouped-UDF overhead per 2-row group; at 40k vectors the rule still
# widens to 13 bits. Recall: candidates/query ≈ target per probe, and
# the rerank stages verify exactly.
ANN_TARGET = 8
ANN_BITS_MIN, ANN_BITS_MAX = 8, 14


def band_bits(
    n: int, target: int = TARGET_BUCKET,
    lo: int = BAND_BITS_MIN, hi: int = BAND_BITS_MAX,
) -> int:
    """Bits per LSH band for an n-vector corpus: ceil(log2(ceil(n/target)))
    clamped to [lo, hi] — exact integer arithmetic (bit_length)."""
    m = max(1, -(-n // target))
    return min(hi, max(lo, (m - 1).bit_length()))


def _bits_sql(n_expr: str, target: int, lo: int, hi: int) -> str:
    """DuckDB twin of band_bits over a count expression (printf('%b')
    digit count = bit_length; no float log)."""
    return (
        f"least({hi}, greatest({lo}, length(printf('%b', "
        f"({n_expr} + {target} - 1) // {target} - 1))))"
    )


def _bits_col_sql(n_expr: str, target: int, lo: int, hi: int) -> str:
    """Spark-SQL twin of band_bits over a count expression."""
    return (
        f"least({hi}, greatest({lo}, length(bin(("
        f"{n_expr} + {target} - 1) div {target} - 1))))"
    )


def sizing_df(df, target: int, lo: int, hi: int):
    """1-row DataFrame {bits, p2} from df's row count — crossJoin it
    broadcast so the band modulus lives in the plan as a column, not a
    data-dependent literal (no plan-build job, no codegen churn)."""
    b = _bits_col_sql("n", target, lo, hi)
    return df.agg(F.count("*").alias("n")).select(
        F.expr(f"cast({b} as int)").alias("bits"),
        F.expr(f"cast(shiftleft(cast(1 as bigint), {b}) as bigint)").alias("p2"),
    )


def sizing_sql(table: str, target: int, lo: int, hi: int) -> str:
    """CTE body for the DuckDB twin of sizing_df: SELECT bits, p2."""
    b = _bits_sql("n", target, lo, hi)
    return (
        f"SELECT CAST({b} AS BIGINT) AS bits, "
        f"CAST(CAST(1 AS BIGINT) << {b} AS BIGINT) AS p2 "
        f"FROM (SELECT count(*) AS n FROM {table})"
    )


def _quant(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("long"))


def _quant_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


def _bucket_expr(qcol, n_planes: int = N_PLANES):
    """LSH bucket id: bit_j = sign(dot(v, h_j)); exact int arithmetic."""
    bits = []
    for j, plane in enumerate(HYPERPLANES[:n_planes]):
        lit = F.array(*[F.lit(v) for v in plane])
        dot = _dot64(qcol, lit)
        bits.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _bucket_arrow(qcol, n_planes: int = N_PLANES):
    """Arrow-batched twin of ``_bucket_expr`` — identical int64 values.

    The expression form evaluates n_planes higher-order aggregate lambdas
    per row (~0.3 ms/row interpreted); this one does a single n×64 @
    64×n_planes int64 matmul per Arrow batch. Quantization stays in the
    Spark expression layer (``_quant``) so round() semantics never leave
    the engine — the UDF touches only exact integers.
    """
    import numpy as np

    h = np.array(HYPERPLANES[:n_planes], dtype=np.int64)
    shifts = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("long")
    def bucket(qv: pd.Series) -> pd.Series:
        if not len(qv):
            return pd.Series([], dtype="int64")
        x = np.vstack(qv.to_numpy()).astype(np.int64)
        dots = x @ h.T
        return pd.Series(((dots > 0) * shifts).sum(axis=1))

    return bucket(qcol)


def _dot64(a, b):
    """Vectorized int64 dot of two array<long> columns (Arrow batch,
    one einsum) — value-identical to the aggregate(zip_with(...)) HOF
    form it replaces, which evaluated an interpreted lambda per element
    per row."""
    import numpy as np

    @F.pandas_udf("long")
    def dot(x: pd.Series, y: pd.Series) -> pd.Series:
        if not len(x):
            return pd.Series([], dtype="int64")
        xa = np.vstack(x.to_numpy()).astype(np.int64)
        ya = np.vstack(y.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", xa, ya))

    return dot(a, b)


def _bucket_sql(qexpr: str, n_planes: int = N_PLANES) -> str:
    terms = []
    for j, plane in enumerate(HYPERPLANES[:n_planes]):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = f"list_dot_product({qexpr}, {lit})"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_DOT = (
    "CAST(list_dot_product({a}, {b}) AS BIGINT)"
)


def _ann_bucketed(emb):
    """(vec_id, qv, bucket, bits): quantized vectors with the
    corpus-sized ANN bucket id — the shared candidate-generation
    prologue. bits rides along for probe-mask construction."""
    sz = sizing_df(emb, ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    return q.crossJoin(F.broadcast(sz)).select(
        "vec_id",
        "qv",
        (_bucket_arrow(F.col("qv"), ANN_BITS_MAX) % F.col("p2")).alias("bucket"),
        "bits",
    )


# ---------------------------------------------------------------------------
# LSH bucket assignment (the IVF-style coarse quantizer).
# ---------------------------------------------------------------------------
@query(
    "ann_lsh_buckets",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, label, {_quant_sql("embedding")} AS qv FROM embeddings
    )
    SELECT vec_id, label,
           {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket
    FROM q CROSS JOIN szp
    """,
)
def ann_lsh_buckets(spark, sf_dir):
    """Coarse-quantizer view with corpus-sized bucket width: the 14-bit
    signature pool is reduced mod 2^bits, bits = clamp(log2(n/2), 8, 14)
    — 256 buckets at gate size (bit-identical to the historical 8-plane
    layout), growing with the corpus so occupancy stays ≈ ANN_TARGET."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    sz = sizing_df(emb, ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)
    q = emb.select("vec_id", "label", _quant(F.col("embedding")).alias("qv"))
    return q.crossJoin(F.broadcast(sz)).select(
        "vec_id",
        "label",
        (_bucket_arrow(F.col("qv"), ANN_BITS_MAX) % F.col("p2")).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Bucketed ANN: top-3 neighbors per query *within its LSH bucket* — the
# scale path (shuffle by bucket; no global cross join).
# ---------------------------------------------------------------------------
@query(
    "ann_lsh_topk",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    b AS (
        SELECT vec_id, qv, {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket
        FROM q CROSS JOIN szp
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DOT.format(a="a.qv", b="c.qv")} AS dot
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id != c.vec_id
        WHERE a.vec_id < 20
    )
    SELECT query_id, neighbor_id, dot,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 3
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Bucketed ANN via grouped-map pandas UDF: one shuffle on the LSH
    bucket, one numpy int64 matmul of the bucket's query rows against all
    bucket members, top-3 kept by a ranking window (tiny after bucket
    pruning). Same exact-integer contract as emb_neardup_pairs."""
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    b = _ann_bucketed(emb)

    def bucket_dots(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
            }
        )
        is_q = pdf["vec_id"] < 20
        if not is_q.any() or len(pdf) < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        qidx = np.flatnonzero(is_q.to_numpy())
        dots = m[qidx] @ m.T
        qid = np.repeat(ids[qidx], len(ids))
        nid = np.tile(ids, len(qidx))
        d = dots.ravel()
        keep = qid != nid
        return pd.DataFrame(
            {"query_id": qid[keep], "neighbor_id": nid[keep], "dot": d[keep]}
        )

    pairs = b.groupBy("bucket").applyInPandas(
        bucket_dots, "query_id long, neighbor_id long, dot long"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 3
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-duplicates: cos ≥ 0.4 (threshold chosen to fire on
# the synthetic unclustered vectors; the algebra is threshold-agnostic),
# verified EXACTLY in integers within LSH buckets.
# ---------------------------------------------------------------------------
@query(
    "emb_neardup_pairs",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    b AS (
        SELECT vec_id, qv,
               {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket,
               {_DOT.format(a="qv", b="qv")} AS nsq
        FROM q CROSS JOIN szp
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           {_DOT.format(a="a.qv", b="c.qv")} AS dot
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {_DOT.format(a="a.qv", b="c.qv")} > 0
      AND 25 * {_DOT.format(a="a.qv", b="c.qv")} * {_DOT.format(a="a.qv", b="c.qv")}
          >= 4 * a.nsq * c.nsq
    """,
)
def emb_neardup_pairs(spark, sf_dir):
    """Within-bucket all-pairs cosine check as a grouped-map pandas UDF:
    one shuffle on the LSH bucket, then a single numpy int64 Gram matrix
    per bucket — exact integer arithmetic (matches the oracle bit-for-bit;
    bounds: |q|≤~4000, 25·dot² ≤ 64²·4000⁴·25 ≪ 2⁶³) instead of a
    self-join that re-evaluates an interpreted per-element fold per pair.
    At scale the bucket is the unit of work; a bucket's members fit one
    Arrow batch by construction of the hyperplane LSH."""
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    b = _ann_bucketed(emb)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        gram = m @ m.T
        nsq = np.diag(gram)
        ia, ib = np.triu_indices(n, k=1)
        d = gram[ia, ib]
        keep = (d > 0) & (25 * d * d >= 4 * nsq[ia] * nsq[ib])
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "dot": d[keep]}
        )

    return b.groupBy("bucket").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long, dot long"
    )


# ---------------------------------------------------------------------------
# SimHash document fingerprints: 8-bit signature from token-md5 nibble
# votes — identical hex-string arithmetic in both engines.
# ---------------------------------------------------------------------------
def _simhash_votes_spark(toks):
    def vote_fn(p):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), p, 1) >= "8", 1
        ).otherwise(-1)

    bits = []
    for p in range(1, N_PLANES + 1):
        vote = F.aggregate(toks, F.lit(0), vote_fn(p))
        bits.append(F.when(vote > 0, F.lit(1 << (p - 1))).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _simhash_votes_sql() -> str:
    terms = []
    for p in range(1, N_PLANES + 1):
        vote = (
            "list_aggregate(list_transform(string_split(lower(text), ' '), "
            f"t -> CASE WHEN substr(md5(t), {p}, 1) >= '8' THEN 1 ELSE -1 END), 'sum')"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << (p - 1)} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "dedup_simhash",
    f"""
    SELECT doc_id, {_simhash_votes_sql()} AS simhash
    FROM documents
    """,
)
def dedup_simhash(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), " ")
    return docs.select("doc_id", _simhash_votes_spark(toks).alias("simhash"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-style counterpart to the hyperplane
# LSH above. Coarse quantizer: K seed centroids (the K lowest vec_ids — a
# deterministic codebook; production would Lloyd-iterate, which only moves
# the centroids, not the plan shape). Every vector joins its nearest
# centroid's cell by exact integer squared-L2 (‖v‖² − 2·v·c + ‖c‖²);
# queries probe the NPROBE nearest cells and scan only those inverted
# lists. At 100 TB the cell is the shuffle key and the codebook is a
# broadcast literal — no global pairwise work anywhere.
# ---------------------------------------------------------------------------
N_CELLS = 16
N_PROBE = 2
_CENT_SQL = f"SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {N_CELLS}"
_ASSIGN_SQL = f"""
      SELECT vec_id, qv, cid,
             CAST(row_number() OVER (
               PARTITION BY vec_id
               ORDER BY list_dot_product(qv, qv)
                        - 2 * list_dot_product(qv, cv)
                        + list_dot_product(cv, cv), cid) AS BIGINT) AS crank
      FROM q CROSS JOIN cent
"""


def _ivf_assign(spark, sf_dir, extra_cols=()):
    """(vec_id, qv, cid, crank[, *extra_cols]): every vector ranked
    against all centroids by exact integer squared-L2; crank=1 is the
    home cell, crank<=NPROBE the probe set. ``extra_cols`` (round 12)
    lets a caller carry vector attributes (e.g. label) through the
    assignment instead of re-scanning embeddings for a join-back."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select(
        "vec_id", _quant(F.col("embedding")).alias("qv"), *extra_cols
    )
    cent = (
        q.filter(F.col("vec_id") < N_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )

    _dot = _dot64

    dist = (
        _dot(F.col("qv"), F.col("qv"))
        - F.lit(2) * _dot(F.col("qv"), F.col("cv"))
        + _dot(F.col("cv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(dist.asc(), F.col("cid").asc())
    return (
        q.join(F.broadcast(cent))
        .select(
            "vec_id",
            "qv",
            "cid",
            F.row_number().over(w).cast("long").alias("crank"),
            *extra_cols,
        )
    )


@query(
    "ann_ivf_cells",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL})
    SELECT cid AS cell, count(*) AS n_vectors
    FROM assign WHERE crank = 1
    GROUP BY cid ORDER BY cid
    """,
)
def ann_ivf_cells(spark, sf_dir):
    """Inverted-list directory: cell sizes of the coarse quantizer (the
    skew diagnostic you'd watch before sizing cells at scale)."""
    return (
        _ivf_assign(spark, sf_dir)
        .filter(F.col("crank") == 1)
        .groupBy(F.col("cid").alias("cell"))
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


@query(
    "ann_ivf_topk",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL}),
    members AS (SELECT vec_id, qv, cid FROM assign WHERE crank = 1),
    probes AS (SELECT vec_id, qv, cid FROM assign
               WHERE crank <= {N_PROBE} AND vec_id < 20),
    pairs AS (
      SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id,
             {_DOT.format(a="p.qv", b="m.qv")} AS dot
      FROM probes p JOIN members m ON p.cid = m.cid AND p.vec_id != m.vec_id
    )
    SELECT query_id, neighbor_id, dot,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 3
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF probe search: queries visit their NPROBE nearest cells; one
    shuffle on the cell id co-locates each cell's inverted list with the
    probing queries, then a single numpy int64 matmul per cell scores
    them (same exact-integer contract as ann_lsh_topk)."""
    import numpy as np
    import pandas as pd

    # Round 12: members and probes both consume the assignment — the
    # whole centroid-distance + window pipeline (embeddings scanned
    # twice) replanned per branch. A row can be both a member (crank=1)
    # and a probe (crank<=NPROBE, vec_id<20), so the union is a per-row
    # 0..2-way fan-out of the SAME assignment row — emit the is_probe
    # flags with one explode instead of two branches. One embeddings
    # scan, one window, nothing materialized (an earlier localCheckpoint
    # variant wrote the vector payload N_PROBE times and measured slower
    # than the re-scan it saved).
    is_member = F.col("crank") == 1
    is_probe = (F.col("crank") <= N_PROBE) & (F.col("vec_id") < 20)
    flags = F.concat(
        F.when(is_member, F.array(F.lit(False))).otherwise(F.array()),
        F.when(is_probe, F.array(F.lit(True))).otherwise(F.array()),
    )
    tagged = (
        _ivf_assign(spark, sf_dir)
        .filter(F.col("crank") <= N_PROBE)
        .select("vec_id", "qv", "cid", F.explode(flags).alias("is_probe"))
    )

    def cell_dots(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
            }
        )
        probe = pdf[pdf["is_probe"]]
        member = pdf[~pdf["is_probe"]]
        if probe.empty or member.empty:
            return empty
        qids = probe["vec_id"].to_numpy()
        mids = member["vec_id"].to_numpy()
        qm = np.stack(probe["qv"].to_numpy()).astype(np.int64)
        mm = np.stack(member["qv"].to_numpy()).astype(np.int64)
        dots = qm @ mm.T
        qid = np.repeat(qids, len(mids))
        nid = np.tile(mids, len(qids))
        d = dots.ravel()
        keep = qid != nid
        return pd.DataFrame(
            {"query_id": qid[keep], "neighbor_id": nid[keep], "dot": d[keep]}
        )

    pairs = (
        tagged
        .groupBy("cid")
        .applyInPandas(cell_dots, "query_id long, neighbor_id long, dot long")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 3
    )


# ---------------------------------------------------------------------------
# Ensemble near-duplicate detection: embedding cosine AND lexical Jaccard
# verified on the same LSH-blocked candidate pairs (embeddings map 1:1 to
# documents in the synthetic corpus). Production dedup pipelines combine
# signals exactly like this — semantic (embedding) catches paraphrases,
# lexical catches boilerplate — and disagreement between the two flags is
# itself the interesting QA output.
# ---------------------------------------------------------------------------
@query(
    "dedup_ensemble",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    b AS (
        SELECT vec_id, qv,
               {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket,
               {_DOT.format(a="qv", b="qv")} AS nsq
        FROM q CROSS JOIN szp
    ),
    cand AS (
        SELECT a.vec_id AS doc_a, c.vec_id AS doc_b,
               {_DOT.format(a="a.qv", b="c.qv")} AS dot,
               a.nsq AS na, c.nsq AS nb
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
        FROM documents
    ),
    j AS (
        SELECT cand.doc_a, cand.doc_b, cand.dot,
               CASE WHEN cand.dot > 0
                         AND 25 * cand.dot * cand.dot >= 4 * cand.na * cand.nb
                    THEN 1 ELSE 0 END AS emb_dup,
               len(list_intersect(ta.ts, tb.ts)) AS n_common,
               len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))
                   AS n_union
        FROM cand
        JOIN toks ta ON cand.doc_a = ta.doc_id
        JOIN toks tb ON cand.doc_b = tb.doc_id
    )
    SELECT doc_a, doc_b, dot,
           CAST(n_common AS DOUBLE) / n_union AS jaccard,
           CAST(emb_dup AS BIGINT) AS emb_dup,
           CAST(CASE WHEN 2 * n_common > n_union THEN 1 ELSE 0 END AS BIGINT)
               AS lex_dup
    FROM j
    WHERE emb_dup = 1 OR 2 * n_common > n_union
    """,
)
def dedup_ensemble(spark, sf_dir):
    """Two-signal dedup verdict over LSH-blocked candidates.

    Candidate generation is the embedding LSH bucket join (one shuffle on
    the 256-way bucket key, numpy int64 Gram matrix per bucket — same
    shape as emb_neardup_pairs); the cosine verdict is decided inside the
    pandas UDF in exact integer arithmetic. Candidates then join to the
    token-set projection of ``documents`` (shuffle join on doc_id — at
    100 TB the candidate side is tiny relative to the corpus, so AQE
    broadcasts it) and the lexical verdict ``jaccard > 0.5`` is decided
    in exact integer cross-multiplied form ``2·|∩| > |∪|``. A pair
    survives if EITHER signal fires; both flags are returned so
    disagreements are queryable. Reference parity: dedup has no analogue
    in quintans/eventsourcing — this is training-pipeline surface."""
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    b = _ann_bucketed(emb)

    def bucket_cand(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
                "emb_dup": pd.Series(dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        gram = m @ m.T
        nsq = np.diag(gram)
        ia, ib = np.triu_indices(n, k=1)
        d = gram[ia, ib]
        dup = ((d > 0) & (25 * d * d >= 4 * nsq[ia] * nsq[ib])).astype(np.int64)
        return pd.DataFrame(
            {"doc_a": ids[ia], "doc_b": ids[ib], "dot": d, "emb_dup": dup}
        )

    cand = b.groupBy("bucket").applyInPandas(
        bucket_cand, "doc_a long, doc_b long, dot long, emb_dup long"
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("ts")
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    j = cand.join(ta, "doc_a").join(tb, "doc_b")
    common = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size("ts_a") + F.size("ts_b") - common
    lex_dup = F.when(F.lit(2) * common > union, F.lit(1)).otherwise(F.lit(0))
    return (
        j.select(
            "doc_a",
            "doc_b",
            "dot",
            (common.cast("double") / union).alias("jaccard"),
            F.col("emb_dup").cast("long").alias("emb_dup"),
            lex_dup.cast("long").alias("lex_dup"),
        )
        .filter((F.col("emb_dup") == 1) | (F.col("lex_dup") == 1))
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH ANN: each query searches its home bucket plus every
# Hamming-distance-1 bucket (one hyperplane bit flipped). Single-probe
# hyperplane LSH has poor recall on unclustered vectors — a true nearest
# neighbor that straddles any one hyperplane lands in a sibling bucket —
# and multi-probe is the standard fix (Lv et al., VLDB'07) that raises
# recall without adding hash tables. Cost model at 100 TB: the member
# side still shuffles ONCE on its home bucket; only the (tiny) query
# side replicates N_PLANES+1×, so the exchange volume is unchanged and
# the extra work is per-probed-bucket scoring, bounded by bucket size.
# A neighbor lives in exactly one home bucket and probe masks are
# distinct, so no candidate pair is generated twice.
# ---------------------------------------------------------------------------
@query(
    "ann_lsh_multiprobe",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    b AS (
        SELECT vec_id, qv,
               {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket, bits
        FROM q CROSS JOIN szp
    ),
    probes AS (
        -- Hamming-≤1 probe set over the *sized* bucket width: mask 0
        -- (home bucket) plus one single-bit flip per band bit. Fixed
        -- series + correlated WHERE because generate_series can't take
        -- a lateral column bound.
        SELECT vec_id, qv,
               xor(bucket, CASE WHEN u.j = 0 THEN CAST(0 AS BIGINT)
                           ELSE CAST(1 AS BIGINT) << (u.j - 1) END) AS bucket
        FROM b, unnest(generate_series(0, {ANN_BITS_MAX})) u(j)
        WHERE vec_id < 20 AND u.j <= bits
    ),
    pairs AS (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DOT.format(a="p.qv", b="c.qv")} AS dot
        FROM probes p JOIN b c
          ON p.bucket = c.bucket AND p.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, dot,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 3
    """,
)
def ann_lsh_multiprobe(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    # Round 12: the probe side and the candidate side both read the
    # bucketed frame — without materialization the quantize+bucket
    # Arrow stage (and its sizing scan) replans per branch. One row per
    # vector — the LSH index state any ANN system persists.
    b = _ann_bucketed(emb).transform(materialize)
    # mask list sized by the corpus-derived band width: [0] ++ one
    # single-bit flip per bucket bit (bits is a broadcast column, so the
    # probe count scales with the sizing rule, not a compile-time list)
    masks = F.expr(
        "concat(array(cast(0 as bigint)),"
        " transform(sequence(0, bits - 1),"
        " j -> shiftleft(cast(1 as bigint), j)))"
    )
    probes = b.filter(F.col("vec_id") < 20).select(
        "vec_id",
        "qv",
        F.explode(
            F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
        ).alias("bucket"),
    )
    pairs = (
        probes.alias("p")
        .join(
            b.alias("c"),
            (F.col("p.bucket") == F.col("c.bucket"))
            & (F.col("p.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _dot64(F.col("p.qv"), F.col("c.qv")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 3
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) encode — the vector-DB compression step
# beyond int8 (Jégou et al. 2011): split the 64-dim vector into M=8
# subspaces of 8 dims, pick the nearest of K=4 seeded centroids per
# subspace (integer squared-L2, ties to the lowest code), emit the
# 8-code word plus the total quantization error. 64 floats → 8 codes =
# 2 bits/dim here (toy K; production uses K=256 = 1 byte/subspace —
# same plan shape, bigger codebook). Assignment is map-only against
# literal codebooks, exactly like the k-means assignment stage; at
# serving time distances come from per-subspace lookup tables and never
# touch the raw vectors.
#
# Spark side uses higher-order array functions (transform/zip_with/
# aggregate over a literal codebook array) instead of an unrolled CASE
# chain: the unrolled form exceeded the JVM's 64 KB method limit, so
# whole-stage codegen failed to compile and execution silently fell
# back to interpreted mode — correct but the slow path at scale. The
# HOF form stays tiny regardless of M×K, which is exactly what matters
# when K grows to the production 256. The DuckDB oracle keeps the
# expanded arithmetic; both sides are exact int64, ties to the lowest
# code (array_position returns the FIRST index of the min).
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_SUBDIM = 8     # dims per subspace
PQ_K = 4          # centroids per subspace
_pq_rng = random.Random(20260814)
PQ_CODEBOOKS: list[list[list[int]]] = [
    [[_pq_rng.randint(-1500, 1500) for _ in range(PQ_SUBDIM)] for _ in range(PQ_K)]
    for _ in range(PQ_M)
]


def _pq_dist_sql(m: int, c: int, base: int) -> str:
    """Squared L2 of subspace m vs centroid c; base = engine's array origin."""
    terms = []
    for d in range(PQ_SUBDIM):
        idx = m * PQ_SUBDIM + d + base
        cb = PQ_CODEBOOKS[m][c][d]
        terms.append(f"(qv[{idx}] - ({cb})) * (qv[{idx}] - ({cb}))")
    return "(" + " + ".join(terms) + ")"


def _pq_exprs(base: int) -> tuple[list[str], str]:
    """Per-subspace code expressions + total-error expression."""
    codes, errs = [], []
    for m in range(PQ_M):
        ds = [_pq_dist_sql(m, c, base) for c in range(PQ_K)]
        mn = f"least({', '.join(ds)})"
        arms = " ".join(
            f"WHEN {ds[c]} = __mn{m} THEN {c}" for c in range(PQ_K)
        )
        codes.append(f"CASE {arms} END")
        errs.append(f"__mn{m}")
    return codes, " + ".join(errs)


def _pq_mins_sql(base: int) -> str:
    return ", ".join(
        f"least({', '.join(_pq_dist_sql(m, c, base) for c in range(PQ_K))})"
        f" AS __mn{m}"
        for m in range(PQ_M)
    )


_PQ_CODES_DUCK, _PQ_ERR_DUCK = _pq_exprs(base=1)


def _pq_all_dists(qv):
    """All PQ subspace distances in one Arrow pass: per row an M-list of
    K-lists of squared-L2 int64 distances (one broadcasted numpy diff
    per batch; replaces M×K interpreted HOF aggregates per row)."""
    import numpy as np

    cb = np.array(PQ_CODEBOOKS, dtype=np.int64)  # M×K×SUBDIM

    @F.pandas_udf("array<array<long>>")
    def dists(x: pd.Series) -> pd.Series:
        if not len(x):
            return pd.Series([], dtype="object")
        xa = np.vstack(x.to_numpy()).astype(np.int64)
        sub = xa.reshape(len(xa), PQ_M, 1, PQ_SUBDIM)
        d = ((sub - cb[None, :, :, :]) ** 2).sum(axis=3)  # n×M×K
        return pd.Series([row.tolist() for row in d])

    return dists(qv)


@query(
    "pq_encode",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    mins AS (
        SELECT vec_id, qv, {_pq_mins_sql(base=1)} FROM q
    )
    SELECT vec_id,
           {", ".join(f"CAST({c} AS BIGINT) AS code{m}"
                      for m, c in enumerate(_PQ_CODES_DUCK))},
           CAST({_PQ_ERR_DUCK} AS BIGINT) AS quant_err
    FROM mins
    """,
)
def pq_encode(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    # one Arrow pass computes the full M×K tensor; the per-subspace
    # arrays are cheap element_at projections of it
    d = q.select(
        "vec_id", _pq_all_dists(F.col("qv")).alias("dd")
    ).select(
        "vec_id",
        *[F.element_at("dd", m + 1).alias(f"d{m}") for m in range(PQ_M)],
    )
    err = F.array_min(F.col("d0"))
    for m in range(1, PQ_M):
        err = err + F.array_min(F.col(f"d{m}"))
    return d.select(
        "vec_id",
        *[
            (
                F.array_position(F.col(f"d{m}"), F.array_min(F.col(f"d{m}")))
                - 1
            )
            .cast("long")
            .alias(f"code{m}")
            for m in range(PQ_M)
        ],
        err.cast("long").alias("quant_err"),
    )


# ---------------------------------------------------------------------------
# PQ ADC search — asymmetric distance computation over the codes:
# approx dist(query, x) = Σ_m table_m[code_m(x)], where table_m[c] is
# the exact distance from the query's m-th subvector to centroid c.
# Here the per-pair CASE dispatch recomputes table entries inline (the
# plan-visible form of the lookup); a production kernel materializes
# each query's 8×K table once and the scan only gathers — same
# arithmetic, this shape keeps it oracle-checkable. Probes broadcast;
# candidates never leave their partition until the per-probe top-k.
# ---------------------------------------------------------------------------

PQ_PROBES = 5
PQ_TOPK = 5


def _adc_sql(base: int, pq: str, code_prefix: str) -> str:
    per_m = []
    for m in range(PQ_M):
        arms = " ".join(
            f"WHEN {c} THEN {_pq_dist_sql(m, c, base).replace('qv[', pq + '[')}"
            for c in range(PQ_K)
        )
        per_m.append(f"(CASE {code_prefix}{m} {arms} END)")
    return " + ".join(per_m)


@query(
    "pq_adc_topk",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    mins AS (
        SELECT vec_id, qv, {_pq_mins_sql(base=1)} FROM q
    ),
    codes AS (
        SELECT vec_id,
               {", ".join(f"CAST({c} AS BIGINT) AS code{m}"
                          for m, c in enumerate(_PQ_CODES_DUCK))}
        FROM mins
    ),
    probes AS (
        SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id < {PQ_PROBES}
    ),
    scored AS (
        SELECT p.probe_id, c.vec_id AS candidate_id,
               CAST({_adc_sql(base=1, pq="p.pq", code_prefix="c.code")}
                    AS BIGINT) AS adc_dist
        FROM probes p CROSS JOIN codes c
        WHERE c.vec_id != p.probe_id
    )
    SELECT probe_id, candidate_id, adc_dist,
           CAST(row_number() OVER (PARTITION BY probe_id
                ORDER BY adc_dist, candidate_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= {PQ_TOPK}
    """,
)
def pq_adc_topk(spark, sf_dir):
    from pyspark.sql import Window

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    qd = q.select("vec_id", _pq_all_dists(F.col("qv")).alias("dd"))
    codes = qd.select(
        "vec_id",
        *[
            (
                F.array_position(
                    F.element_at("dd", m + 1),
                    F.array_min(F.element_at("dd", m + 1)),
                )
                - 1
            )
            .cast("long")
            .alias(f"code{m}")
            for m in range(PQ_M)
        ],
    )
    # Each probe's 8×K distance table is materialized as array columns
    # once on the (broadcast) probe side; the big scan only gathers
    # table[code] per subspace — the real ADC access pattern.
    probes = qd.filter(F.col("vec_id") < PQ_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        *[
            F.element_at("dd", m + 1).alias(f"tbl{m}")
            for m in range(PQ_M)
        ],
    )
    adc = F.element_at("tbl0", (F.col("code0") + 1).cast("int"))
    for m in range(1, PQ_M):
        adc = adc + F.element_at(
            f"tbl{m}", (F.col(f"code{m}") + 1).cast("int")
        )
    scored = (
        codes.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("candidate_id"),
            adc.cast("long").alias("adc_dist"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("adc_dist", "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOPK)
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): semantic dedup inside coarse-quantizer
# cells. The paper drops all-but-one of each near-identical pair within a
# k-means cluster; the cluster-scale-safe form (same reasoning as
# dedup_lsh_clusters) is keeper-star: one keeper per cell (min vec_id),
# every member compared to the keeper only — linear in corpus, never
# quadratic in cell size. cos(v,k) >= 0.9 is evaluated in integer
# cross-multiplied form: dot > 0 AND 100·dot² >= 81·|v|²·|k|², exact in
# both engines on the ×1000-quantized vectors.
# ---------------------------------------------------------------------------
SEMDEDUP_NUM2, SEMDEDUP_DEN2 = 81, 100  # cos² threshold = 0.9²


@query(
    "semdedup_ivf",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL}),
    members AS (SELECT vec_id, qv, cid FROM assign WHERE crank = 1),
    k AS (SELECT cid, min(vec_id) AS keeper_id FROM members GROUP BY cid),
    kv AS (
        SELECT k.cid, k.keeper_id, m.qv AS kqv
        FROM k JOIN members m ON m.vec_id = k.keeper_id AND m.cid = k.cid
    ),
    d AS (
        SELECT m.vec_id, m.cid, kv.keeper_id,
               CAST(list_dot_product(m.qv, kv.kqv) AS BIGINT) AS dot,
               CAST(list_dot_product(m.qv, m.qv) AS BIGINT) AS n2v,
               CAST(list_dot_product(kv.kqv, kv.kqv) AS BIGINT) AS n2k
        FROM members m JOIN kv ON kv.cid = m.cid
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cell, keeper_id,
           CAST(CASE WHEN vec_id <> keeper_id AND dot > 0
                      AND {SEMDEDUP_DEN2} * dot * dot >= {SEMDEDUP_NUM2} * n2v * n2k
                 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
    FROM d
    """,
)
def semdedup_ivf(spark, sf_dir):
    """Keeper-star semantic dedup within IVF cells: each vector is
    compared to its cell's keeper (min vec_id) by exact integer cosine
    cross-multiplication. One broadcast of the ≤N_CELLS keeper set;
    the member side never self-joins, so the pass is linear in corpus
    size — the property that makes SemDeDup runnable at 100 TB."""
    # Round 12 (scan-collapse): members feeds three consumers (keeper
    # min-agg, the keeper-vector self-join, the distance pass) —
    # unmaterialized, each replayed the whole assignment (broadcast
    # join + window over the corpus), 6 embedding scans per plan.
    # One materialized assignment pass instead; the payload is copied
    # once (unlike the rejected ann_ivf_topk variant that wrote it
    # N_PROBE times).
    members = (
        _ivf_assign(spark, sf_dir).filter(F.col("crank") == 1).transform(materialize)
    )

    _dot = _dot64

    keepers = members.groupBy("cid").agg(F.min("vec_id").alias("keeper_id"))
    kv = keepers.join(
        members.select(F.col("vec_id").alias("keeper_id"), F.col("cid"), F.col("qv").alias("kqv")),
        ["cid", "keeper_id"],
    )
    d = members.join(F.broadcast(kv), "cid").select(
        "vec_id",
        "cid",
        "keeper_id",
        _dot(F.col("qv"), F.col("kqv")).alias("dot"),
        _dot(F.col("qv"), F.col("qv")).alias("n2v"),
        _dot(F.col("kqv"), F.col("kqv")).alias("n2k"),
    )
    dup = (
        (F.col("vec_id") != F.col("keeper_id"))
        & (F.col("dot") > 0)
        & (
            F.lit(SEMDEDUP_DEN2) * F.col("dot") * F.col("dot")
            >= F.lit(SEMDEDUP_NUM2) * F.col("n2v") * F.col("n2k")
        )
    )
    return d.select(
        "vec_id",
        F.col("cid").cast("long").alias("cell"),
        "keeper_id",
        dup.cast("long").alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Dimension-wise embedding statistics: the QA pass that catches dead or
# exploding dimensions before any index build. posexplode → one agg keyed
# by dimension (64 groups); all moments are exact integer sums over the
# ×1000-quantized values, so the variance numerator n·Σx²−(Σx)² is
# engine-identical.
# ---------------------------------------------------------------------------
@query(
    "emb_dimension_stats",
    f"""
    WITH x AS (
        SELECT g.i AS dim,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings CROSS JOIN generate_series(1, {DIM}) g(i)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(q * q) AS BIGINT) AS sumsq_q,
           CAST(min(q) AS BIGINT) AS min_q,
           CAST(max(q) AS BIGINT) AS max_q,
           CAST(count(*) * sum(q * q) - sum(q) * sum(q) AS BIGINT)
               AS var_numerator
    FROM x GROUP BY dim
    """,
)
def emb_dimension_stats(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    x = emb.select(
        F.posexplode(_quant(F.col("embedding"))).alias("pos", "q")
    ).select((F.col("pos") + 1).alias("dim"), "q")
    return x.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sumsq_q"),
        F.min("q").cast("long").alias("min_q"),
        F.max("q").cast("long").alias("max_q"),
        F.expr(
            "CAST(count(*) * sum(q * q) - sum(q) * sum(q) AS BIGINT)"
        ).alias("var_numerator"),
    )


# ---------------------------------------------------------------------------
# Inter-label centroid distances: the class-separability audit. Centroids
# are floor-quantized integer vectors (sum·1000 div n per dimension — the
# same trick that makes k-means oracle-exact), and the pairwise stage runs
# on the 10-label long form: |labels|²·DIM tiny rows, never touching the
# corpus again.
# ---------------------------------------------------------------------------
@query(
    "label_centroid_distances",
    f"""
    WITH x AS (
        SELECT label, g.i AS dim,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000) AS BIGINT) AS q
        FROM embeddings CROSS JOIN generate_series(1, {DIM}) g(i)
    ),
    c AS (
        SELECT label, dim,
               sum(q) * 1000 // count(*) AS cq
        FROM x GROUP BY label, dim
    )
    SELECT CAST(a.label AS BIGINT) AS label_a,
           CAST(b.label AS BIGINT) AS label_b,
           CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS dist2_q
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def label_centroid_distances(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    x = emb.select(
        "label", F.posexplode(_quant(F.col("embedding"))).alias("pos", "q")
    ).select("label", (F.col("pos") + 1).alias("dim"), "q")
    c = x.groupBy("label", "dim").agg(
        F.expr("sum(q) * 1000 div count(*)").alias("cq")
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").cast("long").alias("label_a"),
            F.col("b.label").cast("long").alias("label_b"),
        )
        .agg(
            F.sum(
                (F.col("a.cq") - F.col("b.cq")) * (F.col("a.cq") - F.col("b.cq"))
            )
            .cast("long")
            .alias("dist2_q")
        )
    )


# ---------------------------------------------------------------------------
# IVF cell ↔ label purity — the clustering-QA rollup run before trusting
# a coarse quantizer: per cell, the majority ground-truth label and the
# purity fraction. Low purity = cells cut across semantic groups = bad
# recall at serving time. Same assign plan as ann_ivf_cells (broadcast
# codebook, exact integer L2, one keyed exchange on the cell id); the
# purity rollup is two tiny aggregations over |cells| rows. Majority
# ties break to the lowest label — deterministic in both engines.
# ---------------------------------------------------------------------------


@query(
    "ivf_cell_label_purity",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL}),
    mem AS (
        SELECT a.cid, e.label FROM assign a
        JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.crank = 1
    ),
    lc AS (SELECT cid, label, count(*) AS c FROM mem GROUP BY cid, label),
    top AS (
        SELECT cid, label, c,
               row_number() OVER (PARTITION BY cid
                    ORDER BY c DESC, label) AS rn,
               sum(c) OVER (PARTITION BY cid) AS n
        FROM lc
    )
    SELECT cid AS cell, CAST(n AS BIGINT) AS n_vectors,
           CAST(label AS BIGINT) AS majority_label,
           CAST(c AS BIGINT) AS n_majority,
           CAST((c * 1000000) // n AS BIGINT) AS purity_ppm
    FROM top WHERE rn = 1
    """,
)
def ivf_cell_label_purity(spark, sf_dir):
    # Round 12 (scan-collapse): the label join-back re-scanned
    # embeddings (3rd scan); the assignment pass now carries label
    # through (extra_cols) — 2 scans, no vec-keyed join.
    mem = (
        _ivf_assign(spark, sf_dir, extra_cols=("label",))
        .filter(F.col("crank") == 1)
        .select("cid", "label")
    )
    lc = mem.groupBy("cid", "label").agg(F.count("*").alias("c"))
    wr = Window.partitionBy("cid").orderBy(F.desc("c"), F.asc("label"))
    wn = Window.partitionBy("cid")
    return (
        lc.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.sum("c").over(wn))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cid").alias("cell"),
            F.col("n").cast("long").alias("n_vectors"),
            F.col("label").cast("long").alias("majority_label"),
            F.col("c").cast("long").alias("n_majority"),
            F.expr("(c * 1000000) div n").cast("long").alias("purity_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Dimension-truncation recall — the Matryoshka-representation question
# (Kusupati et al. 2022): if serving truncates embeddings to the first
# 16 of 64 dims (4× cheaper scans, what ann_rerank_pipeline's stage 1
# banks on), how much of the true top-k survives? Per probe: exact
# top-k under the full dot vs top-k under the prefix dot, recall =
# |overlap|/k. All ranking integer-exact; the overlap count itself is
# what the oracle hashes. At scale both rankings are
# TakeOrderedAndProject over one scan — the scan is shared, scores are
# two HOF dots over the same array.
# ---------------------------------------------------------------------------

TRUNC_DIMS = 16
TRUNC_PROBES = 5
TRUNC_K = 10


@query(
    "dim_truncation_recall",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS probe_id, qv AS pqv FROM q
        WHERE vec_id < {TRUNC_PROBES}
    ),
    scored AS (
        SELECT p.probe_id, c.vec_id AS cid,
               CAST(list_dot_product(c.qv, p.pqv) AS BIGINT) AS full_dot,
               CAST(list_dot_product(c.qv[1:{TRUNC_DIMS}],
                                     p.pqv[1:{TRUNC_DIMS}]) AS BIGINT)
                 AS trunc_dot
        FROM q c CROSS JOIN probes p WHERE c.vec_id != p.probe_id
    ),
    rk AS (
        SELECT probe_id, cid,
               row_number() OVER (PARTITION BY probe_id
                    ORDER BY full_dot DESC, cid) AS fr,
               row_number() OVER (PARTITION BY probe_id
                    ORDER BY trunc_dot DESC, cid) AS tr
        FROM scored
    )
    SELECT probe_id, CAST({TRUNC_K} AS BIGINT) AS k,
           CAST(count(*) FILTER (WHERE fr <= {TRUNC_K} AND tr <= {TRUNC_K})
                AS BIGINT) AS n_overlap,
           CAST((count(*) FILTER (WHERE fr <= {TRUNC_K} AND tr <= {TRUNC_K})
                 * 1000000) // {TRUNC_K} AS BIGINT) AS recall_ppm
    FROM rk GROUP BY probe_id
    """,
)
def dim_truncation_recall(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    probes = q.filter(F.col("vec_id") < TRUNC_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )

    _dot = _dot64

    scored = (
        q.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cid"),
            _dot(F.col("qv"), F.col("pqv")).alias("full_dot"),
            _dot(
                F.slice("qv", 1, TRUNC_DIMS), F.slice("pqv", 1, TRUNC_DIMS)
            ).alias("trunc_dot"),
        )
    )
    wf = Window.partitionBy("probe_id").orderBy(F.desc("full_dot"), F.asc("cid"))
    wt = Window.partitionBy("probe_id").orderBy(F.desc("trunc_dot"), F.asc("cid"))
    rk = scored.select(
        "probe_id",
        F.row_number().over(wf).alias("fr"),
        F.row_number().over(wt).alias("tr"),
    )
    hit = F.when((F.col("fr") <= TRUNC_K) & (F.col("tr") <= TRUNC_K), 1).otherwise(0)
    return rk.groupBy("probe_id").agg(
        F.lit(TRUNC_K).cast("long").alias("k"),
        F.sum(hit).cast("long").alias("n_overlap"),
        F.expr(
            f"(sum(CASE WHEN fr <= {TRUNC_K} AND tr <= {TRUNC_K} THEN 1 ELSE 0 END)"
            f" * 1000000) div {TRUNC_K}"
        )
        .cast("long")
        .alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# SimHash Hamming-≤1 pairing — the web-scale near-dup LOOKUP (Manku,
# Jain & Das Sarma, WWW'07): instead of comparing signatures pairwise,
# each doc also registers its signature with every single bit flipped;
# any Hamming-distance-≤1 pair then collides on an EXACT key. The join
# is a plain equi-join on the probed signature — |docs|·(1+bits) probe
# rows, one shuffle, no quadratic candidate generation anywhere (the
# production trick for 64-bit signatures splits them into blocks; the
# 8-bit gate signature needs only the direct flips). Output pairs carry
# the exact Hamming distance (0 = identical signature, 1 = one flip).
# ---------------------------------------------------------------------------


@query(
    "simhash_hamming_pairs",
    f"""
    WITH sig AS (
        SELECT doc_id, {_simhash_votes_sql()} AS s FROM documents
    ),
    probes AS (
        SELECT doc_id, s, s AS probe FROM sig
        UNION ALL
        {" UNION ALL ".join(
            f"SELECT doc_id, s, xor(s, {1 << j}) AS probe FROM sig"
            for j in range(N_PLANES)
        )}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
        FROM probes a JOIN sig b
          ON a.probe = b.s AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 1
    """,
)
def simhash_hamming_pairs(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), " ")
    sig = docs.select(
        "doc_id", _simhash_votes_spark(toks).alias("s")
    )
    probes = sig.select(
        "doc_id",
        "s",
        F.explode(
            F.array(
                F.col("s"),
                *[
                    F.col("s").bitwiseXOR(F.lit(1 << j)).cast("long")
                    for j in range(N_PLANES)
                ],
            )
        ).alias("probe"),
    )
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    return (
        probes.join(b, probes["probe"] == b["sb"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.bit_count(F.col("s").bitwiseXOR(F.col("sb")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 1)
    )


# ---------------------------------------------------------------------------
# Embedding analogy — the word2vec parallelogram (Mikolov et al. 2013):
# target = v(a) − v(b) + v(c), return the top-k nearest by dot product
# (a, b, c excluded). Pure integer vector arithmetic on the quantized
# embeddings; the target is a broadcast literal-sized frame, the scan
# scores map-side, top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------

ANALOGY_A, ANALOGY_B, ANALOGY_C = 0, 1, 2
ANALOGY_K = 5


@query(
    "emb_analogy_topk",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    t AS (
        SELECT list_transform(range(1, {DIM} + 1),
                   i -> a.qv[i] - b.qv[i] + c.qv[i]) AS tv
        FROM q a, q b, q c
        WHERE a.vec_id = {ANALOGY_A} AND b.vec_id = {ANALOGY_B}
          AND c.vec_id = {ANALOGY_C}
    ),
    scored AS (
        SELECT e.vec_id, CAST(list_dot_product(e.qv, t.tv) AS BIGINT) AS dot
        FROM q e CROSS JOIN t
        WHERE e.vec_id NOT IN ({ANALOGY_A}, {ANALOGY_B}, {ANALOGY_C})
    )
    SELECT vec_id, dot,
           CAST(row_number() OVER (ORDER BY dot DESC, vec_id) AS BIGINT)
             AS rank
    FROM scored QUALIFY rank <= {ANALOGY_K}
    """,
)
def emb_analogy_topk(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    abc = (
        q.filter(F.col("vec_id").isin(ANALOGY_A, ANALOGY_B, ANALOGY_C))
        .groupBy()
        .agg(
            F.first(F.when(F.col("vec_id") == ANALOGY_A, F.col("qv")), True).alias("va"),
            F.first(F.when(F.col("vec_id") == ANALOGY_B, F.col("qv")), True).alias("vb"),
            F.first(F.when(F.col("vec_id") == ANALOGY_C, F.col("qv")), True).alias("vc"),
        )
        .select(
            F.zip_with(
                F.zip_with("va", "vb", lambda a, b: a - b),
                F.col("vc"),
                lambda ab, c: ab + c,
            ).alias("tv")
        )
    )
    scored = (
        q.filter(~F.col("vec_id").isin(ANALOGY_A, ANALOGY_B, ANALOGY_C))
        .crossJoin(F.broadcast(abc))
        .select(
            "vec_id",
            _dot64("qv", "tv").alias("dot"),
        )
    )
    w = Window.orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANALOGY_K)
    )


# ---------------------------------------------------------------------------
# IVF nprobe recall sweep — the IVF tuning curve (the coarse-quantizer
# analog of lsh_parameter_sweep): for nprobe ∈ {1, 2, 4}, what fraction
# of the TRUE top-k (brute force) does probing that many cells recover,
# and how many candidates were scanned to get it? recall/candidate
# count vs nprobe IS the serving-latency dial; this emits it from data.
# One assignment pass shared by all configs; truth is the broadcast
# brute-force top-k over the 5 probe vectors (audit-scale only).
# ---------------------------------------------------------------------------

IVF_SWEEP_PROBES = 5
IVF_SWEEP_K = 10
IVF_NPROBES = [1, 2, 4]


@query(
    "ivf_nprobe_recall_sweep",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL}),
    members AS (SELECT vec_id, qv, cid FROM assign WHERE crank = 1),
    probes AS (
        SELECT vec_id AS probe_id, qv AS pqv FROM q
        WHERE vec_id < {IVF_SWEEP_PROBES}
    ),
    truth AS (
        SELECT probe_id, vec_id FROM (
            SELECT p.probe_id, e.vec_id,
                   row_number() OVER (PARTITION BY p.probe_id
                        ORDER BY list_dot_product(e.qv, p.pqv) DESC,
                                 e.vec_id) AS rn
            FROM q e JOIN probes p ON e.vec_id != p.probe_id
        ) WHERE rn <= {IVF_SWEEP_K}
    ),
    {", ".join(f'''
    cand_{n} AS (
        SELECT DISTINCT pa.vec_id AS probe_id, m.vec_id
        FROM assign pa
        JOIN members m ON m.cid = pa.cid AND m.vec_id != pa.vec_id
        WHERE pa.crank <= {n} AND pa.vec_id < {IVF_SWEEP_PROBES}
    ),
    m_{n} AS (
        SELECT {n} AS nprobe,
               (SELECT count(*) FROM cand_{n}) AS n_candidates,
               (SELECT count(*) FROM cand_{n} c
                JOIN truth t ON t.probe_id = c.probe_id
                            AND t.vec_id = c.vec_id) AS n_hit
    )''' for n in IVF_NPROBES)}
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit * 1000000 // {IVF_SWEEP_PROBES * IVF_SWEEP_K}
                AS BIGINT) AS recall_ppm
    FROM ({" UNION ALL ".join(f"SELECT * FROM m_{n}" for n in IVF_NPROBES)})
    """,
)
def ivf_nprobe_recall_sweep(spark, sf_dir):
    assign = _ivf_assign(spark, sf_dir).transform(materialize)
    members = assign.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("mid"), F.col("cid")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    probes = q.filter(F.col("vec_id") < IVF_SWEEP_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )
    wt = Window.partitionBy("probe_id").orderBy(
        F.desc("dot"), F.asc("vec_id")
    )
    truth = (
        q.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            _dot64("qv", "pqv").alias("dot"),
        )
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= IVF_SWEEP_K)
        .select("probe_id", "vec_id")
        .transform(materialize)
    )
    out = []
    for n in IVF_NPROBES:
        pa = assign.filter(
            (F.col("crank") <= n) & (F.col("vec_id") < IVF_SWEEP_PROBES)
        ).select(F.col("vec_id").alias("probe_id"), "cid")
        cand = (
            pa.join(members, "cid")
            .filter(F.col("mid") != F.col("probe_id"))
            .select("probe_id", F.col("mid").alias("vec_id"))
            .distinct()
        )
        n_cand = cand.count()
        n_hit = cand.join(truth, ["probe_id", "vec_id"]).count()
        out.append(
            (
                n,
                n_cand,
                n_hit,
                n_hit * 1000000 // (IVF_SWEEP_PROBES * IVF_SWEEP_K),
            )
        )
    return spark.createDataFrame(
        out, "nprobe long, n_candidates long, n_hit long, recall_ppm long"
    )


# ---------------------------------------------------------------------------
# Embedding distance-distribution histogram — the calibration readout
# every cosine/dot threshold (near-dup 0.9, ensemble 0.4, SemDeDup…)
# should be picked FROM: the distribution of pairwise dot products over
# a deterministic stride sample of pairs (i, (i+STRIDE) mod N — one
# partner per vector, no quadratic blowup, reproducible at any
# parallelism). Bucketized integer dots, one self-join on the derived
# partner id, one rollup.
# ---------------------------------------------------------------------------

DIST_STRIDE = 37
DIST_BUCKET = 50_000  # dot-product units per histogram bucket


@query(
    "emb_distance_histogram",
    f"""
    WITH q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    n AS (SELECT count(*) AS n FROM q),
    pairs AS (
        SELECT a.vec_id,
               CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
        FROM q a
        JOIN n ON TRUE
        JOIN q b ON b.vec_id = (a.vec_id + {DIST_STRIDE}) % n.n
        WHERE a.vec_id != b.vec_id
    )
    SELECT CAST(CASE WHEN dot >= 0 THEN dot // {DIST_BUCKET}
                     ELSE -((-dot + {DIST_BUCKET} - 1) // {DIST_BUCKET}) END
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(dot) AS BIGINT) AS min_dot,
           CAST(max(dot) AS BIGINT) AS max_dot
    FROM pairs GROUP BY 1
    """,
)
def emb_distance_histogram(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    n = q.count()  # tiny scalar: partner id arithmetic needs the modulus
    a = q.select("vec_id", F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("pid"), F.col("qv").alias("qb"))
    pairs = (
        a.withColumn("pid", (F.col("vec_id") + DIST_STRIDE) % F.lit(n))
        .filter(F.col("vec_id") != F.col("pid"))
        .join(b, "pid")
        .select(
            _dot64("qa", "qb").alias("dot")
        )
    )
    # floor-toward-negative-infinity bucketing, exact for negative dots
    bucket = F.when(
        F.col("dot") >= 0, F.expr(f"dot div {DIST_BUCKET}")
    ).otherwise(
        -F.expr(f"(-dot + {DIST_BUCKET} - 1) div {DIST_BUCKET}")
    )
    return pairs.groupBy(bucket.cast("long").alias("bucket")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("dot").cast("long").alias("min_dot"),
        F.max("dot").cast("long").alias("max_dot"),
    )


# ---------------------------------------------------------------------------
# Gram (co-moment) matrix over the first 16 embedding dims — the
# sufficient statistic behind PCA/whitening/OPQ rotation at corpus
# scale. The 100 TB shape is the whole point: each Arrow batch reduces
# to a 16×16 partial matrix in one BLAS matmul inside mapInPandas
# (map-side combine — a million-row partition emits 136 rows), and the
# final groupBy sums 136-key partials. Quantized int64 arithmetic keeps
# the sum order-independent, so the result is identical at any
# partitioning (and to DuckDB's sequential sum). int64 headroom:
# |q| ≤ ~3e4 ⇒ per-row product ≤ 9e8 ⇒ ~1e9 rows before overflow;
# shard the sum into per-range partials beyond that.
# ---------------------------------------------------------------------------
GRAM_DIMS = 16


@query(
    "emb_gram_matrix",
    f"""
    WITH q AS (
        SELECT {_quant_sql("embedding[1:16]")} AS qv FROM embeddings
    )
    SELECT CAST(g1.i AS BIGINT) AS i, CAST(g2.j AS BIGINT) AS j,
           CAST(sum(qv[g1.i] * qv[g2.j]) AS BIGINT) AS dot
    FROM q, generate_series(1, {GRAM_DIMS}) g1(i),
         generate_series(1, {GRAM_DIMS}) g2(j)
    WHERE g1.i <= g2.j
    GROUP BY g1.i, g2.j
    """,
)
def emb_gram_matrix(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select(_quant(F.slice("embedding", 1, GRAM_DIMS)).alias("qv"))

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(GRAM_DIMS)
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
            g = a.T @ a
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "partial": g[iu]}
            )

    partials = q.mapInPandas(partial_gram, "i long, j long, partial long")
    return partials.groupBy("i", "j").agg(
        F.sum("partial").cast("long").alias("dot")
    )


# ---------------------------------------------------------------------------
# Triplet mining — hard-positive / hard-negative selection for metric
# learning (FaceNet-style): per anchor, the highest-similarity
# same-label candidate (hard positive is usually the LOWEST same-label;
# here we emit both ends of the scale: max-sim positive and max-sim
# negative — the margin pos−neg is the semi-hard criterion input).
# Anchors broadcast; one pass over candidates computes both sides'
# argmax with rank windows — the mining pass never self-joins the
# corpus.
# ---------------------------------------------------------------------------
TRIPLET_ANCHORS = 5


@query(
    "triplet_mining_margin",
    f"""
    WITH q AS (
        SELECT vec_id, label, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    anchors AS (
        SELECT vec_id AS aid, label AS alabel, qv AS aqv FROM q
        WHERE vec_id < {TRIPLET_ANCHORS}
    ),
    scored AS (
        SELECT a.aid, a.alabel, c.vec_id AS cid, c.label AS clabel,
               CAST(list_dot_product(c.qv, a.aqv) AS BIGINT) AS dot
        FROM q c CROSS JOIN anchors a WHERE c.vec_id != a.aid
    ),
    pos AS (
        SELECT aid, cid AS pos_id, dot AS pos_dot,
               row_number() OVER (PARTITION BY aid ORDER BY dot DESC, cid) AS r
        FROM scored WHERE clabel = alabel QUALIFY r = 1
    ),
    neg AS (
        SELECT aid, cid AS neg_id, dot AS neg_dot,
               row_number() OVER (PARTITION BY aid ORDER BY dot DESC, cid) AS r
        FROM scored WHERE clabel != alabel QUALIFY r = 1
    )
    SELECT p.aid AS anchor_id, p.pos_id, p.pos_dot, n.neg_id, n.neg_dot,
           CAST(p.pos_dot - n.neg_dot AS BIGINT) AS margin
    FROM pos p JOIN neg n USING (aid)
    """,
)
def triplet_mining_margin(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", "label", _quant(F.col("embedding")).alias("qv"))
    anchors = q.filter(F.col("vec_id") < TRIPLET_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alabel"),
        F.col("qv").alias("aqv"),
    )
    scored = (
        q.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            "alabel",
            F.col("vec_id").alias("cid"),
            F.col("label").alias("clabel"),
            _dot64("qv", "aqv").alias("dot"),
        )
    )
    # Round 12 (scan-collapse): pos and neg each replanned the scored
    # chain (4 embedding scans) and ran a row_number over a 5-partition
    # window (every candidate row sorted through 5 tasks — the skew
    # anti-pattern at scale), then re-joined on aid. The per-anchor
    # best row under (dot DESC, cid ASC) is max(struct(dot, -cid)) —
    # ties pick the smallest cid, exactly row_number's choice — so ONE
    # hash aggregate over scored computes both sides; the inner join's
    # "anchor must have both a pos and a neg" becomes a null filter.
    best = F.struct(F.col("dot"), (-F.col("cid")).alias("nc"))
    same = F.col("clabel") == F.col("alabel")
    agged = scored.groupBy("aid").agg(
        F.max(F.when(same, best)).alias("p"),
        F.max(F.when(~same, best)).alias("ng"),
    )
    return (
        agged.filter(F.col("p").isNotNull() & F.col("ng").isNotNull())
        .select(
            F.col("aid").alias("anchor_id"),
            (-F.col("p.nc")).alias("pos_id"),
            F.col("p.dot").alias("pos_dot"),
            (-F.col("ng.nc")).alias("neg_id"),
            F.col("ng.dot").alias("neg_dot"),
            (F.col("p.dot") - F.col("ng.dot")).cast("long").alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# LSH sizing advisor — the band-bits rule ("bits ≈ log₂(n / target
# bucket)") as a computable audit of the sizing that is now WIRED into
# every hyperplane-LSH consumer (sizing_df / sizing_sql): observed
# bucket occupancy at the *applied* band width next to the unclamped
# requirement. ceil(log₂) is computed exactly via binary-string length
# (length(bin(m−1)) — no float log anywhere), so the advisor itself
# passes the value-hash gate. saturated_buckets > 0 here means true
# duplicate pileups (content skew), not corpus growth.
# ---------------------------------------------------------------------------
ADVISOR_TARGET_CAP = TARGET_BUCKET


@query(
    "lsh_sizing_advisor",
    f"""
    WITH szp AS ({sizing_sql("embeddings", TARGET_BUCKET, BAND_BITS_MIN, BAND_BITS_MAX)}),
    bk AS (
        SELECT vec_id,
               {_bucket_sql(_quant_sql("embedding"), 2 * BAND_BITS_MAX)} AS bucket
        FROM embeddings
    ),
    bands AS (
        SELECT vec_id, 0 AS band, bucket % p2 AS bval FROM bk CROSS JOIN szp
        UNION ALL
        SELECT vec_id, 1 AS band, (bucket // p2) % p2 AS bval
        FROM bk CROSS JOIN szp
    ),
    occ AS (
        SELECT band, bval, count(*) AS c FROM bands GROUP BY band, bval
    ),
    n AS (SELECT count(*) AS nv FROM bk)
    SELECT CAST(n.nv AS BIGINT) AS n_vectors,
           CAST({ADVISOR_TARGET_CAP} AS BIGINT) AS target_cap,
           CAST(CASE WHEN n.nv <= {ADVISOR_TARGET_CAP} THEN 0
                ELSE length(printf('%b',
                     (n.nv + {ADVISOR_TARGET_CAP} - 1) // {ADVISOR_TARGET_CAP} - 1))
                END AS BIGINT) AS required_band_bits,
           (SELECT bits FROM szp) AS current_band_bits,
           CAST(max(occ.c) AS BIGINT) AS max_bucket,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(count(*) FILTER (WHERE occ.c > {ADVISOR_TARGET_CAP}) AS BIGINT)
             AS saturated_buckets
    FROM occ CROSS JOIN n
    GROUP BY n.nv
    """,
)
def lsh_sizing_advisor(spark, sf_dir):
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    sz = sizing_df(emb, TARGET_BUCKET, BAND_BITS_MIN, BAND_BITS_MAX)
    # Round 12 (scan-collapse): bk feeds both band arms and the count —
    # three replays of the Arrow bucket kernel plus the sizing scan
    # (6 embedding scans). The frame is four ints per vector (no
    # payload): one kernel pass, materialized.
    bk = (
        emb.select(
            "vec_id",
            _bucket_arrow(
                _quant(F.col("embedding")), 2 * BAND_BITS_MAX
            ).alias("bucket"),
        )
        .crossJoin(F.broadcast(sz))
        .transform(materialize)
    )
    bands = bk.select(
        "bits", F.lit(0).alias("band"), (F.col("bucket") % F.col("p2")).alias("bval")
    ).unionAll(
        bk.select(
            "bits",
            F.lit(1).alias("band"),
            F.expr("(bucket div p2) % p2").alias("bval"),
        )
    )
    occ = bands.groupBy("band", "bval").agg(
        F.count("*").alias("c"), F.any_value("bits").alias("bits")
    )
    n = bk.agg(F.count("*").alias("nv"))
    cap = ADVISOR_TARGET_CAP
    return occ.crossJoin(F.broadcast(n)).groupBy("nv").agg(
        F.max("c").alias("max_bucket"),
        F.count("*").alias("n_buckets_used"),
        F.count(F.when(F.col("c") > cap, 1)).alias("saturated_buckets"),
        F.any_value("bits").alias("bits"),
    ).select(
        F.col("nv").cast("long").alias("n_vectors"),
        F.lit(cap).cast("long").alias("target_cap"),
        F.when(F.col("nv") <= cap, F.lit(0))
        .otherwise(F.expr(f"length(bin((nv + {cap} - 1) div {cap} - 1))"))
        .cast("long")
        .alias("required_band_bits"),
        F.col("bits").cast("long").alias("current_band_bits"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.col("n_buckets_used").cast("long").alias("n_buckets_used"),
        F.col("saturated_buckets").cast("long").alias("saturated_buckets"),
    )


# ---------------------------------------------------------------------------
# Dedup-method calibration: precision/recall of the SimHash Hamming
# predictor against EXACT token-set Jaccard ground truth, measured on
# the MinHash-LSH candidate pool — the audit a production dedup stack
# runs before trusting a cheap signature as its kill rule (near-dup
# P/R methodology per Leskovec/Rajaraman/Ullman ch. 3's banding
# calibration). A SimHash threshold that looks fine on eyeballed
# samples can silently delete non-duplicates (precision) or leak
# templates (recall); this pins the confusion matrix as an
# oracle-checked number (measured here: ~43% precision / ~34% recall —
# the 8-bit signature is genuinely weak, which is the point of
# auditing before trusting it).
#
# Truth = Jaccard >= 0.7 cross-multiplied in integers (10·|A∩B| >=
# 7·|A∪B|); predictor = 8-bit SimHash Hamming <= 1 (bit_count(xor) in
# both engines). Recall is RELATIVE TO THE CANDIDATE POOL (pairs
# sharing a MinHash band, buckets capped like dedup_lsh_pairs) — the
# honest scope note: pairs no band catches are invisible here, which
# is what lsh_parameter_sweep measures instead.
#
# Scale shape: candidates come from the capped band join (linear,
# never all-pairs); token sets and signatures join in by doc key; the
# confusion matrix is one conditional aggregate. ppm ratios use
# truncating div with a greatest(..,1) zero guard.
# ---------------------------------------------------------------------------
from eventsourcing_spark.pipeline.queries import (  # noqa: E402
    MAX_BUCKET as _Q_MAX_BUCKET,
    _BANDS_SQL as _Q_BANDS_SQL,
)

CALIB_JACCARD_NUM, CALIB_JACCARD_DEN = 7, 10  # truth: J >= 0.7
CALIB_HAMMING_MAX = 1

@query(
    "dedup_calibration_pr",
    _Q_BANDS_SQL
    + f"""
    , sized AS (
        SELECT doc_id, band_id, band_key,
               count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sized a
        JOIN sized b ON a.band_key = b.band_key AND a.band_id = b.band_id
                    AND a.doc_id < b.doc_id
        WHERE a.bucket_n <= {_Q_MAX_BUCKET}
    ),
    sh AS (SELECT doc_id, {_simhash_votes_sql()} AS sh FROM documents),
    tk AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
        FROM documents
    ),
    scored AS (
        SELECT {CALIB_JACCARD_DEN} * len(list_intersect(ta.ts, tb.ts))
                 >= {CALIB_JACCARD_NUM} *
                    (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts)))
                 AS truth,
               bit_count(xor(sa.sh, sb.sh)) <= {CALIB_HAMMING_MAX} AS pred
        FROM cand c
        JOIN tk ta ON ta.doc_id = c.doc_a
        JOIN tk tb ON tb.doc_id = c.doc_b
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN NOT truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN NOT truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST((1000000 * sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END))
                // greatest(sum(CASE WHEN pred THEN 1 ELSE 0 END), 1) AS BIGINT)
             AS precision_ppm,
           CAST((1000000 * sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END))
                // greatest(sum(CASE WHEN truth THEN 1 ELSE 0 END), 1) AS BIGINT)
             AS recall_ppm
    FROM scored
    """,
)
def dedup_calibration_pr(spark, sf_dir):
    from eventsourcing_spark.pipeline.queries import _bands

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # Round 12: both sides of the band self-join read the banded frame —
    # materialize it once (doc x band grain, the LSH index state)
    # instead of re-running the minhash banding per side.
    sized = _bands(docs).withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band_id", "band_key")),
    ).transform(materialize)
    # corpus-scale self band-join: pin shuffle-merge — the banded side
    # descends from an explode whose size estimate does not grow with
    # the fan-out, so the estimator can hand a corpus-sized build to a
    # broadcast at exactly the scale where it dies (round-12 audit)
    cand = (
        sized.alias("a")
        .join(sized.hint("merge").alias("b"), ["band_id", "band_key"])
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.bucket_n") <= _Q_MAX_BUCKET)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    toks = F.split(F.lower(F.col("text")), " ")
    # One per-doc feature frame (simhash + distinct-token set — the
    # signature table a dedup pipeline persists), materialized once and
    # joined per pair side: was 4 joins over 4 re-derivations (the
    # simhash vote HOF ran twice over the corpus).
    feats = docs.select(
        "doc_id",
        _simhash_votes_spark(toks).alias("sh"),
        F.array_distinct(toks).alias("ts"),
    ).transform(materialize)
    scored = (
        cand.join(
            feats.select(F.col("doc_id").alias("doc_a"),
                         F.col("ts").alias("ts_a"),
                         F.col("sh").alias("sh_a")), "doc_a")
        .join(
            feats.select(F.col("doc_id").alias("doc_b"),
                         F.col("ts").alias("ts_b"),
                         F.col("sh").alias("sh_b")), "doc_b")
    )
    common = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size("ts_a") + F.size("ts_b") - common
    truth = (CALIB_JACCARD_DEN * common >= CALIB_JACCARD_NUM * union).alias(
        "truth"
    )
    pred = (F.expr("bit_count(sh_a ^ sh_b)") <= CALIB_HAMMING_MAX).alias("pred")
    flags = scored.select(truth, pred)

    def n_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return flags.agg(
        F.count("*").cast("long").alias("n_candidates"),
        n_if(F.col("truth") & F.col("pred")).alias("tp"),
        n_if(~F.col("truth") & F.col("pred")).alias("fp"),
        n_if(F.col("truth") & ~F.col("pred")).alias("fn"),
        n_if(~F.col("truth") & ~F.col("pred")).alias("tn"),
        F.expr(
            "(1000000 * sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END))"
            " div greatest(sum(CASE WHEN pred THEN 1 ELSE 0 END), 1)"
        ).alias("precision_ppm"),
        F.expr(
            "(1000000 * sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END))"
            " div greatest(sum(CASE WHEN truth THEN 1 ELSE 0 END), 1)"
        ).alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# Margin-based mutual-nearest-neighbor mining (Artetxe & Schwenk, ACL
# 2019 — the LASER bitext-mining criterion): a pair qualifies when each
# vector is the other's top-1 neighbor, scored by the margin between
# their dot and the mean of their top-K neighborhoods:
#
#     margin = 2·dot(a,b) / (mean_topK(a) + mean_topK(b))
#
# This is the standard recipe for mining aligned pairs (translation
# sentences, caption/image twins) out of two embedded corpora, and the
# "global punishes hubs" property is exactly why it beats a raw cosine
# threshold: a hub vector has a high top-K mean, so its margins deflate.
#
# Scale shape: the SAME LSH-bucket prologue as the ANN family (the
# production form runs mutual-kNN inside ANN candidates, never exact
# global kNN); one shuffle on the bucket, one int64 Gram per bucket,
# then the per-VECTOR stats frame (bounded by corpus, one row each)
# self-joins on the two top-1 pointers — an equi-join, no pair explode.
# All arithmetic is quantized-integer; the margin is emitted as
# floor(ppm) with the division LAST, so the oracle replays it exactly.
# ---------------------------------------------------------------------------
TOPK_NN = 4


@query(
    "mutual_nn_margin_pairs",
    f"""
    WITH szp AS ({sizing_sql("embeddings", ANN_TARGET, ANN_BITS_MIN, ANN_BITS_MAX)}),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    b AS (
        SELECT vec_id, qv, {_bucket_sql("qv", ANN_BITS_MAX)} % p2 AS bucket
        FROM q CROSS JOIN szp
    ),
    d0 AS (
        SELECT a.vec_id AS src, c.vec_id AS dst,
               {_DOT.format(a="a.qv", b="c.qv")} AS dot
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ),
    d AS (
        SELECT src, dst, dot,
               row_number() OVER (
                   PARTITION BY src ORDER BY dot DESC, dst
               ) AS rnk
        FROM d0
    ),
    stats AS (
        SELECT src AS vec_id,
               max(CASE WHEN rnk = 1 THEN dst END) AS top1_id,
               max(CASE WHEN rnk = 1 THEN dot END) AS top1_dot,
               sum(CASE WHEN rnk <= {TOPK_NN} THEN dot ELSE 0 END)
                   AS topk_sum,
               sum(CASE WHEN rnk <= {TOPK_NN} THEN 1 ELSE 0 END) AS k_eff
        FROM d GROUP BY src
    )
    SELECT a.vec_id AS vec_a, m.vec_id AS vec_b,
           CAST(a.top1_dot AS BIGINT) AS dot,
           CAST((2000000 * a.top1_dot * a.k_eff * m.k_eff)
                // (a.topk_sum * m.k_eff + m.topk_sum * a.k_eff)
                AS BIGINT) AS margin_ppm
    FROM stats a JOIN stats m
      ON a.top1_id = m.vec_id AND m.top1_id = a.vec_id
     AND a.vec_id < m.vec_id
    WHERE a.top1_dot > 0 AND a.topk_sum > 0 AND m.topk_sum > 0
    """,
)
def mutual_nn_margin_pairs(spark, sf_dir):
    """Mutual top-1 pairs with LASER margin scores over LSH buckets.

    Per bucket, one int64 Gram matrix yields every member's top-1
    neighbor and top-K dot sum (ties by ascending vec_id, exactly the
    oracle's rank order); mutuality is then a vector-grain equi-join on
    the two top-1 pointers. Emitted margin is
    floor(2e6·dot·k_a·k_b / (sum_a·k_b + sum_b·k_a)) — integer-exact.
    """
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    b = _ann_bucketed(emb)

    def bucket_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "top1_id": pd.Series(dtype="int64"),
                "top1_dot": pd.Series(dtype="int64"),
                "k_eff": pd.Series(dtype="int64"),
                "topk_sum": pd.Series(dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        gram = m @ m.T
        # composite sort key: dot DESC then local index ASC (ids are
        # sorted, so index order IS vec_id order); n-scaling keeps the
        # key exact in int64 (|dot|·n ≪ 2^63 at the bucket cap)
        key = gram * np.int64(n) - np.arange(n, dtype=np.int64)[None, :]
        # self-exclusion sentinel must survive the negation below —
        # np.iinfo.min negates to ITSELF (int64 wraparound) and would
        # rank the diagonal first
        np.fill_diagonal(key, np.int64(-(1 << 62)))
        order = np.argsort(-key, axis=1)
        rows = np.arange(n)
        k_eff = min(TOPK_NN, n - 1)
        top1 = order[:, 0]
        topk_sum = gram[rows[:, None], order[:, :k_eff]].sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "top1_id": ids[top1],
                "top1_dot": gram[rows, top1],
                "k_eff": np.full(n, k_eff, dtype=np.int64),
                "topk_sum": topk_sum,
            }
        )

    stats = b.groupBy("bucket").applyInPandas(
        bucket_stats,
        "vec_id long, top1_id long, top1_dot long, k_eff long, topk_sum long",
    )
    # Both sides of the mutuality self-join consume ``stats``; without a
    # materialization the whole bucket+Gram-matrix pandas pipeline runs
    # TWICE (plan audit round 12: two FlatMapGroupsInPandas subtrees, no
    # exchange reuse). The frame is vector-grain (5 longs per vec —
    # bounded linear state), so checkpoint once and join it to itself.
    stats = stats.transform(materialize)
    a = stats.alias("a")
    m2 = stats.alias("m")
    return (
        a.join(
            m2,
            (F.col("a.top1_id") == F.col("m.vec_id"))
            & (F.col("m.top1_id") == F.col("a.vec_id"))
            & (F.col("a.vec_id") < F.col("m.vec_id")),
        )
        .filter(
            (F.col("a.top1_dot") > 0)
            & (F.col("a.topk_sum") > 0)
            & (F.col("m.topk_sum") > 0)
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("m.vec_id").alias("vec_b"),
            F.col("a.top1_dot").cast("long").alias("dot"),
            F.expr(
                "(2000000 * a.top1_dot * a.k_eff * m.k_eff)"
                " div (a.topk_sum * m.k_eff + m.topk_sum * a.k_eff)"
            )
            .cast("long")
            .alias("margin_ppm"),
        )
    )
