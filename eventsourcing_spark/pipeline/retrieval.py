"""Sparse lexical retrieval + random-projection dimensionality reduction.

* ``term_match_retrieval`` — the inverted-index scoring shape behind
  BM25-class retrieval, with integer-exact weights so it can go through
  the value-hash oracle: for a fixed query-term set, each document
  scores ``Σ_t tf(t,d) · (N − df(t))`` — term frequency times an
  integer rarity weight (corpus size minus document frequency; the
  integer analogue of idf).  Plan shape at 100 TB: tokens explode
  map-side and are immediately filtered to the query terms (the
  "inverted-index probe" — candidate set shrinks before any shuffle),
  df is a tiny per-term aggregate broadcast back, the per-doc score is
  one partial-agg groupBy, and top-k is TakeOrderedAndProject.

* ``emb_random_projection`` — Johnson-Lindenstrauss-style reduction
  64 → 16 dims with a seeded ±1 projection matrix (Achlioptas 2001:
  database-friendly random projections).  Pure integer dot products on
  the quantized vectors (same determinism contract as
  ``pipeline.similarity``), emitted in long form (vec_id, dim, val) so
  the oracle compares scalars, map-only / zero shuffles.  This is the
  standard pre-step that makes downstream LSH/IVF cheaper at scale.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.pipeline.similarity import _dot64, _quant, _quant_sql
from eventsourcing_spark.queries import query

QUERY_TERMS = ["vector", "stream", "window", "merge", "scan"]
TOP_DOCS = 20

DIM = 64
PROJ_DIMS = 16
_rng = random.Random(20260813)
PROJ_PLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(PROJ_DIMS)
]

_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + "]"


@query(
    "term_match_retrieval",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, w, count(*) AS tf
        FROM toks
        WHERE list_contains({_TERMS_SQL}, w)
        GROUP BY doc_id, w
    ),
    df AS (
        SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w
    ),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT h.doc_id,
           CAST(sum(h.tf * (n.n - df.df)) AS BIGINT) AS score,
           CAST(count(*) AS BIGINT) AS n_terms_hit
    FROM hits h JOIN df USING (w) CROSS JOIN n
    GROUP BY h.doc_id
    ORDER BY score DESC, h.doc_id
    LIMIT {TOP_DOCS}
    """,
)
def term_match_retrieval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # tiny scalar, becomes a literal weight term
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w").isin(QUERY_TERMS))
    hits = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df = hits.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        hits.join(F.broadcast(df), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * (F.lit(n_docs) - F.col("df")))
            .cast("long")
            .alias("score"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_DOCS)


def _proj_sql() -> str:
    qv = _quant_sql("embedding")
    rows = []
    for j, plane in enumerate(PROJ_PLANES):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        rows.append(
            f"SELECT vec_id, {j} AS dim, "
            f"CAST(list_dot_product({qv}, {lit}) AS BIGINT) AS val "
            "FROM embeddings"
        )
    return " UNION ALL ".join(rows)


@query("emb_random_projection", _proj_sql())
def emb_random_projection(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    cols = []
    for plane in PROJ_PLANES:
        lit = F.array(*[F.lit(v) for v in plane])
        cols.append(
            _dot64("qv", lit)
        )
    # one pass computes all 16 projections, then unpivots in-task (explode
    # of a 16-element array — no UNION re-scan, still zero shuffles)
    return q.select(
        "vec_id", F.posexplode(F.array(*cols)).alias("dim", "val")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "val")


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion — the standard way to combine heterogeneous
# retrievers (Cormack, Clarke & Buettcher, SIGIR'09; the default hybrid
# dense+sparse fusion in modern RAG stacks): each ranking contributes
# 1/(K + rank) per document, K = 60. Here a lexical ranking (the
# term_match weights) fuses with a quality prior (longest documents
# first — the stand-in for whatever second retriever produces ranks);
# the point under test is the FUSION operator: two cheap rankings, a
# full-outer join on doc_id, and an integer-scaled score
# Σ 1_000_000 // (60 + rank). Missing-from-one-list documents get only
# the other list's contribution — the property that makes RRF robust.
#
# Scale shape: each input ranking is top-N via TakeOrderedAndProject
# (N = 100 candidates per retriever — fusion operates on shortlists,
# never corpora); the join is a tiny shortlist-to-shortlist full outer.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_POOL = 100


@query(
    "retrieval_rrf_fusion",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    df AS (
        SELECT w, count(DISTINCT doc_id) AS dfreq FROM toks
        WHERE w IN (SELECT unnest({_TERMS_SQL})) GROUP BY w
    ),
    n AS (SELECT count(*) AS nd FROM documents),
    lex AS (
        SELECT doc_id, sum(cnt * (nd - dfreq)) AS score
        FROM (
            SELECT t.doc_id, t.w, count(*) AS cnt FROM toks t
            WHERE t.w IN (SELECT unnest({_TERMS_SQL}))
            GROUP BY t.doc_id, t.w
        ) tf JOIN df ON tf.w = df.w CROSS JOIN n
        GROUP BY doc_id
    ),
    lex_rank AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM lex QUALIFY r <= {RRF_POOL}
    ),
    len_rank AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM documents QUALIFY r <= {RRF_POOL}
    ),
    fused AS (
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               coalesce(1000000 // ({RRF_K} + a.r), 0)
             + coalesce(1000000 // ({RRF_K} + b.r), 0) AS rrf_scaled
        FROM lex_rank a FULL OUTER JOIN len_rank b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rrf_scaled,
           CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id) AS BIGINT)
             AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {TOP_DOCS}
    """,
)
def retrieval_rrf_fusion(spark, sf_dir):
    # Round 12 (scan-collapse): n_docs was an EAGER count at plan-build
    # (its own corpus scan) and dfreq a second consumer of the tokenize
    # explode. tf is unique on (doc_id, w), so dfreq(w) = count(*) over
    # (partition by w) on tf — the same term-keyed rows the old
    # broadcast join carried; n_docs rides in as a 1-row broadcast.
    # 1 explode, no eager action.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w").isin(QUERY_TERMS))
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    lex = (
        tf.withColumn("dfreq", F.count("*").over(Window.partitionBy("w")))
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("cnt") * (F.col("n_docs") - F.col("dfreq"))
            ).alias("score")
        )
    )

    # shortlists via distributed TakeOrdered, then rank the tiny results
    lex_top = lex.orderBy(F.desc("score"), "doc_id").limit(RRF_POOL)
    lex_rank = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("r_a"),
    )
    len_top = docs.orderBy(F.desc("n_chars"), "doc_id").limit(RRF_POOL)
    len_rank = len_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), "doc_id"))
        .alias("r_b"),
    )
    fused = (
        lex_rank.join(len_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + r_a)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({RRF_K} + r_b)"), F.lit(0)
                )
            ).alias("rrf_scaled"),
        )
    )
    out_rank = Window.orderBy(F.desc("rrf_scaled"), "doc_id")
    return (
        fused.orderBy(F.desc("rrf_scaled"), "doc_id")
        .limit(TOP_DOCS)
        .select(
            "doc_id",
            "rrf_scaled",
            F.row_number().over(out_rank).cast("long").alias("fused_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy matching — per-probe top-k nearest documents by Levenshtein
# distance of 40-char prefixes (entity-resolution / spell-bridge shape;
# both engines implement the identical classic DP, so raw distances are
# hash-exact). Plan: the probe set (10 rows) BROADCASTS against the
# corpus — edit distance runs corpus-parallel in one map stage, then
# top-k per probe is a small partitioned window. At 100 TB you'd bound
# candidates first (q-gram or length blocking — same prefix-filter idea
# as pipeline/setjoin.py); the gate pins the exact-verification kernel
# those blockers feed.
# ---------------------------------------------------------------------------

FUZZY_PROBES = 10
FUZZY_PREFIX = 40
FUZZY_TOPK = 3


@query(
    "fuzzy_match_topk",
    f"""
    WITH pref AS (
        SELECT doc_id, substr(text, 1, {FUZZY_PREFIX}) AS p FROM documents
    ),
    probes AS (SELECT doc_id AS probe_id, p AS pp FROM pref
               WHERE doc_id < {FUZZY_PROBES}),
    scored AS (
        SELECT pr.probe_id, c.doc_id AS candidate_id,
               levenshtein(pr.pp, c.p) AS dist
        FROM probes pr JOIN pref c ON c.doc_id != pr.probe_id
    )
    SELECT probe_id, candidate_id, dist,
           CAST(row_number() OVER (PARTITION BY probe_id
                ORDER BY dist, candidate_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {FUZZY_TOPK}
    """,
)
def fuzzy_match_topk(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id", F.substring("text", 1, FUZZY_PREFIX).alias("p")
    )
    probes = (
        pref.filter(F.col("doc_id") < FUZZY_PROBES)
        .select(F.col("doc_id").alias("probe_id"), F.col("p").alias("pp"))
    )
    scored = (
        pref.crossJoin(F.broadcast(probes))
        .filter(F.col("doc_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("doc_id").alias("candidate_id"),
            F.levenshtein("pp", "p").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("dist", "candidate_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= FUZZY_TOPK)
    )


# ---------------------------------------------------------------------------
# Postings-list build — materializing the inverted index the probe
# queries (term_match_retrieval) assume: per term, document frequency
# and the SORTED posting list (deterministic ordered collect — the same
# array_sort idiom as top_event_paths, because collect_list order is
# undefined). Postings are emitted as an md5 over the comma-joined list
# so the gate hashes the exact list content at constant output width.
# At 100 TB the build is one explode + one shuffle on term, and the
# lists would be delta-encoded per bucket — the sort within each
# posting is what makes that compression and skip-scan merging work.
# ---------------------------------------------------------------------------
@query(
    "build_postings_lists",
    """
    WITH td AS (
        SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term, doc_id
        FROM documents WHERE length(text) > 0
    )
    SELECT term,
           count(*) AS df,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS postings_md5
    FROM td GROUP BY term
    """,
)
def build_postings_lists(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    td = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("term"), "doc_id"
    ).distinct()
    return td.groupBy("term").agg(
        F.count("*").alias("df"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            )
        ).alias("postings_md5"),
    )


# ---------------------------------------------------------------------------
# Two-stage ANN serving pipeline: approximate shortlist → exact rerank.
# The canonical vector-retrieval architecture (FAISS coarse+refine,
# DiskANN's PQ-then-full-precision pass): stage 1 scores EVERY candidate
# in the cheap 16-dim random-projection space (¼ the flops, ¼ the bytes
# moved) and keeps a per-probe shortlist; stage 2 re-scores only the
# shortlist with the exact 64-dim dot product.
#
# Scale shape — the part that matters at 100 TB: the stage-1 ranking
# shuffle carries (probe_id, candidate_id, approx_score) — 3 scalars per
# row, never the vectors; the shortlist (probes × 25 rows) is then
# joined BACK to the vector table for exact scoring, so full-precision
# vectors are only ever read for shortlist members (broadcast semi-join
# drives partition pruning on a bucketed-by-vec_id layout). Integer-
# exact both stages, ties to the lowest candidate id.
# ---------------------------------------------------------------------------

RERANK_PROBES = 3
RERANK_SHORTLIST = 25
RERANK_K = 5

_PV_SQL = "[" + ", ".join(
    "CAST(list_dot_product("
    + _quant_sql("embedding")
    + ", ["
    + ", ".join(str(v) for v in plane)
    + "]) AS BIGINT)"
    for plane in PROJ_PLANES
) + "]"


@query(
    "ann_rerank_pipeline",
    f"""
    WITH pv AS (SELECT vec_id, {_PV_SQL} AS pv FROM embeddings),
    q AS (
        SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS probe_id, pv AS ppv FROM pv
        WHERE vec_id < {RERANK_PROBES}
    ),
    s1 AS (
        SELECT p.probe_id, c.vec_id AS candidate_id,
               CAST(list_dot_product(c.pv, p.ppv) AS BIGINT) AS approx_score
        FROM pv c CROSS JOIN probes p WHERE c.vec_id != p.probe_id
    ),
    r1 AS (
        SELECT probe_id, candidate_id, approx_score,
               CAST(row_number() OVER (PARTITION BY probe_id
                    ORDER BY approx_score DESC, candidate_id) AS BIGINT)
                 AS stage1_rank
        FROM s1 QUALIFY stage1_rank <= {RERANK_SHORTLIST}
    ),
    s2 AS (
        SELECT r1.probe_id, r1.candidate_id, r1.approx_score, r1.stage1_rank,
               CAST(list_dot_product(cq.qv, pq.qv) AS BIGINT) AS exact_score
        FROM r1
        JOIN q cq ON cq.vec_id = r1.candidate_id
        JOIN q pq ON pq.vec_id = r1.probe_id
    )
    SELECT probe_id, candidate_id, approx_score, stage1_rank, exact_score,
           CAST(row_number() OVER (PARTITION BY probe_id
                ORDER BY exact_score DESC, candidate_id) AS BIGINT)
             AS final_rank
    FROM s2 QUALIFY final_rank <= {RERANK_K}
    """,
)
def ann_rerank_pipeline(spark, sf_dir):
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    pvcols = []
    for plane in PROJ_PLANES:
        lit = F.array(*[F.lit(v) for v in plane])
        pvcols.append(
            _dot64("qv", lit)
        )
    # Round 12: the probe slice and the candidate side both read pv —
    # materialize the projection index once (8 ints per vector — the
    # coarse-quantizer state a rerank pipeline persists) instead of
    # replanning the projection Arrow stage per branch.
    pv = q.select("vec_id", F.array(*pvcols).alias("pv")).transform(materialize)
    probes = pv.filter(F.col("vec_id") < RERANK_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("pv").alias("ppv")
    )
    s1 = (
        pv.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("candidate_id"),
            _dot64("pv", "ppv").alias("approx_score"),
        )
    )
    w1 = Window.partitionBy("probe_id").orderBy(
        F.desc("approx_score"), F.asc("candidate_id")
    )
    r1 = (
        s1.withColumn("stage1_rank", F.row_number().over(w1).cast("long"))
        .filter(F.col("stage1_rank") <= RERANK_SHORTLIST)
    )
    # exact vectors fetched only for shortlist members: broadcast the
    # tiny shortlist, let it semi-drive the vector-table join
    cq = q.select(F.col("vec_id").alias("candidate_id"), F.col("qv").alias("cqv"))
    pq = q.filter(F.col("vec_id") < RERANK_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )
    s2 = (
        cq.join(F.broadcast(r1), "candidate_id")
        .join(F.broadcast(pq), "probe_id")
        .select(
            "probe_id",
            "candidate_id",
            "approx_score",
            "stage1_rank",
            _dot64("cqv", "pqv").alias("exact_score"),
        )
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.desc("exact_score"), F.asc("candidate_id")
    )
    return (
        s2.withColumn("final_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("final_rank") <= RERANK_K)
    )


# ---------------------------------------------------------------------------
# MMR — Maximal Marginal Relevance diversified top-k (Carbonell &
# Goldstein, SIGIR'98): greedily pick argmax of
#   mmr(c) = 7·rel(c) − 3·max_{s ∈ selected} sim(c, s)      (λ = 0.7)
# over a per-probe shortlist, so the result set trades pure relevance
# for novelty. This is the standard last-step reranker for RAG context
# assembly and dedup-aware search UIs.
#
# Scale shape: the DISTRIBUTED work is shortlist generation (same plan
# as ann_rerank_pipeline — rank shuffle carries scalars only); the
# greedy loop is inherently sequential in k but runs per probe on ≤20
# candidates, so it parallelizes across probes via applyInPandas (one
# tiny Arrow batch per probe — millions of concurrent queries would
# each be one group). Integer-exact: rel and sim are int64 dots of the
# ×1000-quantized vectors, ties to the lowest candidate id.
#
# The DuckDB oracle unrolls the k greedy steps as generated CTEs
# (pick-1 … pick-5), each step joining the selected rows back for the
# max-sim term — same arithmetic, flat SQL.
# ---------------------------------------------------------------------------

MMR_PROBES = 3
MMR_POOL = 20
MMR_K = 5
MMR_LNUM, MMR_LDEN = 7, 3  # λ = 0.7 as integer weights


def _mmr_oracle_sql() -> str:
    dot = "CAST(list_dot_product({a}, {b}) AS BIGINT)"
    parts = [
        f"""
    q AS (SELECT vec_id, {_quant_sql("embedding")} AS qv FROM embeddings),
    probes AS (
        SELECT vec_id AS probe_id, qv AS pqv FROM q
        WHERE vec_id < {MMR_PROBES}
    ),
    rel AS (
        SELECT probe_id, cid, rel, qv FROM (
            SELECT p.probe_id, c.vec_id AS cid,
                   {dot.format(a="c.qv", b="p.pqv")} AS rel, c.qv,
                   row_number() OVER (PARTITION BY p.probe_id
                        ORDER BY {dot.format(a="c.qv", b="p.pqv")} DESC,
                                 c.vec_id) AS rn
            FROM q c CROSS JOIN probes p WHERE c.vec_id != p.probe_id
        ) WHERE rn <= {MMR_POOL}
    ),
    p1 AS (
        SELECT probe_id, cid, rel FROM (
            SELECT probe_id, cid, rel,
                   row_number() OVER (PARTITION BY probe_id
                        ORDER BY rel DESC, cid) AS rn
            FROM rel
        ) WHERE rn = 1
    )"""
    ]
    for i in range(2, MMR_K + 1):
        joins, excls, dots = [], [], []
        for j in range(1, i):
            joins.append(
                f"JOIN p{j} pj{j} ON pj{j}.probe_id = r.probe_id "
                f"JOIN rel s{j} ON s{j}.probe_id = r.probe_id "
                f"AND s{j}.cid = pj{j}.cid"
            )
            excls.append(f"r.cid != pj{j}.cid")
            dots.append(dot.format(a="r.qv", b=f"s{j}.qv"))
        greatest = dots[0] if len(dots) == 1 else f"GREATEST({', '.join(dots)})"
        parts.append(
            f"""
    m{i} AS (
        SELECT r.probe_id, r.cid, r.rel, {greatest} AS max_sim
        FROM rel r {' '.join(joins)}
        WHERE {' AND '.join(excls)}
    ),
    p{i} AS (
        SELECT probe_id, cid, rel, max_sim FROM (
            SELECT probe_id, cid, rel, max_sim,
                   row_number() OVER (PARTITION BY probe_id
                        ORDER BY {MMR_LNUM}*rel - {MMR_LDEN}*max_sim DESC,
                                 cid) AS rn
            FROM m{i}
        ) WHERE rn = 1
    )"""
        )
    selects = [
        f"SELECT probe_id, CAST(1 AS BIGINT) AS pick_order,"
        f" cid AS candidate_id, rel AS rel_score,"
        f" CAST(0 AS BIGINT) AS max_sim,"
        f" CAST({MMR_LNUM}*rel AS BIGINT) AS mmr_score FROM p1"
    ]
    for i in range(2, MMR_K + 1):
        selects.append(
            f"SELECT probe_id, CAST({i} AS BIGINT), cid, rel,"
            f" CAST(max_sim AS BIGINT),"
            f" CAST({MMR_LNUM}*rel - {MMR_LDEN}*max_sim AS BIGINT) FROM p{i}"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@query("mmr_diversify_topk", _mmr_oracle_sql())
def mmr_diversify_topk(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quant(F.col("embedding")).alias("qv"))
    probes = q.filter(F.col("vec_id") < MMR_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )
    scored = (
        q.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cid"),
            _dot64("qv", "pqv").alias("rel"),
            "qv",
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("rel"), F.asc("cid"))
    pool = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MMR_POOL
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("cid", ignore_index=True)
        vecs = np.array(pdf["qv"].tolist(), dtype=np.int64)
        rel = pdf["rel"].to_numpy(dtype=np.int64)
        cids = pdf["cid"].to_numpy(dtype=np.int64)
        n = len(pdf)
        picked: list[int] = []
        # max_sim over the SELECTED set only — None before the first
        # pick (sims can be negative, so a zero init would clamp them)
        max_sim = None
        out = []
        for order in range(1, MMR_K + 1):
            if max_sim is None:
                mmr = MMR_LNUM * rel
            else:
                mmr = MMR_LNUM * rel - MMR_LDEN * max_sim
            best, best_key = None, None
            for i in range(n):
                if i in picked:
                    continue
                key = (-int(mmr[i]), int(cids[i]))
                if best_key is None or key < best_key:
                    best, best_key = i, key
            out.append(
                (
                    int(pdf["probe_id"].iloc[0]),
                    order,
                    int(cids[best]),
                    int(rel[best]),
                    int(max_sim[best]) if max_sim is not None else 0,
                    int(mmr[best]),
                )
            )
            picked.append(best)
            sims = vecs @ vecs[best]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
        return pd.DataFrame(
            out,
            columns=[
                "probe_id",
                "pick_order",
                "candidate_id",
                "rel_score",
                "max_sim",
                "mmr_score",
            ],
        )

    schema = (
        "probe_id long, pick_order long, candidate_id long, "
        "rel_score long, max_sim long, mmr_score long"
    )
    return pool.groupBy("probe_id").applyInPandas(greedy, schema)


# ---------------------------------------------------------------------------
# BM25 retrieval (Robertson-Sparck Jones) in exact fixed-point form.
# k1 = 1.2, b = 0.75; idf is the integer rarity weight (N - df) that
# term_match_retrieval already pins, so the new machinery this query
# adds is the tf saturation / length normalization:
#
#   score(d) = Σ_t (N - df_t) · tf·(k1+1) / (tf + k1·(1-b) + k1·b·dl/avgdl)
#
# computed entirely in integers: avgdl is carried as avgdl_milli =
# (1000·Σdl)//N and the fraction is cross-multiplied by 10·avgdl_milli,
# giving the *defined* score
#
#   22000·(N-df)·tf·avgdl_milli // (10·avgdl_milli·tf + 3·avgdl_milli + 9000·dl)
#
# identical in both engines (// is truncating integer division in each).
# Magnitudes: numerator < 2.2e4·N·tf·avgdl_milli — fits int64 through
# ~1e8 docs; beyond that the (N - df) weight should move to a
# log-quantized idf (same plan shape, different literal weight).
#
# Plan at 100 TB: explode → filter to query terms map-side (inverted-
# index probe), df/N/avgdl are tiny broadcast scalars, one groupBy
# per doc, TakeOrdered top-k. No shuffle carries unfiltered tokens.
# ---------------------------------------------------------------------------
@query(
    "bm25_topk",
    f"""
    WITH stats AS (
        SELECT count(*) AS n,
               (1000 * sum(len(string_split(lower(text), ' ')))) // count(*)
                   AS avgdl_milli
        FROM documents
    ),
    toks AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS dl,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, any_value(dl) AS dl, w, count(*) AS tf
        FROM toks
        WHERE list_contains({_TERMS_SQL}, w)
        GROUP BY doc_id, w
    ),
    df AS (
        SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w
    )
    SELECT h.doc_id,
           CAST(sum(
               (22000 * (s.n - df.df) * h.tf * s.avgdl_milli)
               // (10 * s.avgdl_milli * h.tf + 3 * s.avgdl_milli + 9000 * h.dl)
           ) AS BIGINT) AS bm25_score,
           CAST(count(*) AS BIGINT) AS n_terms_hit
    FROM hits h JOIN df USING (w) CROSS JOIN stats s
    GROUP BY h.doc_id
    ORDER BY bm25_score DESC, h.doc_id
    LIMIT {TOP_DOCS}
    """,
)
def bm25_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks_col = F.split(F.lower("text"), " ")
    # Corpus stats stay a 1-row DataFrame broadcast into the plan (the
    # decayed_engagement_score pattern) rather than .first() literals:
    # data-dependent literals force a whole-stage-codegen recompile per
    # run and an extra eager job at plan-build time.
    stats = docs.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("(1000 * sum(size(split(lower(text), ' ')))) div count(*)")
        .alias("avgdl_milli"),
    )
    toks = docs.select(
        "doc_id",
        F.size(toks_col).alias("dl"),
        F.explode(toks_col).alias("w"),
    ).filter(F.col("w").isin(QUERY_TERMS))
    hits = toks.groupBy("doc_id", "w").agg(
        F.any_value("dl").alias("dl"), F.count("*").alias("tf")
    )
    # Round 12 (scan-collapse): df re-consumed hits, replanning the
    # tokenize explode (3 document scans). hits is unique on (doc_id,
    # w), so df(w) = count(*) over (partition by w) — a window on the
    # same term-keyed rows the old broadcast join shuffled. 2 scans
    # (1 explode + the narrow stats pass), no join.
    from pyspark.sql import Window

    hits = hits.withColumn(
        "df", F.count("*").over(Window.partitionBy("w"))
    )
    num = (
        F.lit(22000).cast("long")
        * (F.col("n") - F.col("df"))
        * F.col("tf")
        * F.col("avgdl_milli")
    )
    den = (
        F.lit(10).cast("long") * F.col("avgdl_milli") * F.col("tf")
        + F.lit(3) * F.col("avgdl_milli")
        + F.lit(9000) * F.col("dl")
    )
    scored = (
        hits.crossJoin(F.broadcast(stats))
        .withColumn("__num", num)
        .withColumn("__den", den)
        # `div` = exact int64 division (the double-division `/` would
        # round at ~2^53 and can land on the wrong side of the floor).
        .withColumn("__ts", F.expr("__num div __den"))
        .groupBy("doc_id")
        .agg(
            F.sum("__ts").cast("long").alias("bm25_score"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.desc("bm25_score"), "doc_id").limit(TOP_DOCS)


# ---------------------------------------------------------------------------
# Boolean AND retrieval — conjunctive postings intersection: documents
# containing EVERY query term. The distributed form of "walk the
# postings lists in parallel": explode → filter to the term set
# map-side (the same inverted-index probe as term_match_retrieval) →
# one groupBy(doc) HAVING distinct-terms = |query|. No join at all —
# intersection becomes a counting argument.
# ---------------------------------------------------------------------------
AND_TERMS = ["table", "scan", "merge"]
_AND_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in AND_TERMS) + "]"


@query(
    "boolean_and_retrieval",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, w, count(*) AS tf FROM toks
        WHERE list_contains({_AND_TERMS_SQL}, w)
        GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(min(tf) AS BIGINT) AS min_tf
    FROM hits
    GROUP BY doc_id
    HAVING count(*) = {len(AND_TERMS)}
    """,
)
def boolean_and_retrieval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w").isin(AND_TERMS))
    hits = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("total_tf"),
            F.min("tf").cast("long").alias("min_tf"),
            F.count("*").alias("__nt"),
        )
        .filter(F.col("__nt") == len(AND_TERMS))
        .drop("__nt")
    )


# ---------------------------------------------------------------------------
# Phrase match — exact adjacent-bigram search ("fast scan" as
# consecutive tokens), the positional-index operation boolean retrieval
# can't answer. Map-only: each doc's token array yields its adjacent
# bigrams via a 1-shifted zip; the count per doc is an aggregate over
# that array — no explode, no shuffle before the final filter.
# ---------------------------------------------------------------------------
PHRASE = ("fast", "scan")


@query(
    "phrase_match_count",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(
               list_transform(range(1, len(toks)),
                   i -> CASE WHEN toks[CAST(i AS INTEGER)] = '{PHRASE[0]}'
                              AND toks[CAST(i + 1 AS INTEGER)] = '{PHRASE[1]}'
                             THEN 1 END),
               x -> x IS NOT NULL)) AS BIGINT) AS n_phrase
    FROM t
    WHERE len(list_filter(
               list_transform(range(1, len(toks)),
                   i -> CASE WHEN toks[CAST(i AS INTEGER)] = '{PHRASE[0]}'
                              AND toks[CAST(i + 1 AS INTEGER)] = '{PHRASE[1]}'
                             THEN 1 END),
               x -> x IS NOT NULL)) > 0
    """,
)
def phrase_match_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.when((a == PHRASE[0]) & (b == PHRASE[1]), 1).otherwise(0),
    )
    n = F.aggregate(pairs, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (
        docs.select("doc_id", n.alias("n_phrase"))
        .filter(F.col("n_phrase") > 0)
    )


# ---------------------------------------------------------------------------
# Hashed-token MaxSim retrieval — late interaction (ColBERT's MaxSim
# operator) over feature-hashed token embeddings (Weinberger et al.
# 2009): each token's "embedding" is the ±1 vector of the low 16 md5
# bits, so sim(q, t) = 16 − 2·popcount(h_q XOR h_t) — exact integers,
# no learned weights needed to exercise the operator. Per doc:
# score = Σ_qterm max over the doc's distinct tokens of sim. The plan
# is the late-interaction shape at scale: one distinct-(doc, token)
# pass, per-row XOR/popcount against the (tiny, literal) query hashes,
# one groupBy(doc) with a max-aggregate per query term — no join.
# ---------------------------------------------------------------------------
import hashlib as _hashlib

MAXSIM_TERMS = ["vector", "stream", "window"]
_MAXSIM_H = {
    t: int(_hashlib.md5(t.encode()).hexdigest()[:8], 16) & 0xFFFF
    for t in MAXSIM_TERMS
}
MAXSIM_TOPK = 10


@query(
    "maxsim_hashed_retrieval",
    f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(list_filter(
            string_split(lower(text), ' '), x -> x <> '')) AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) & 65535 AS ht
        FROM toks
    ),
    sc AS (
        SELECT doc_id,
               {" + ".join(
                   f"max(16 - 2 * bit_count(xor(ht, {h})))"
                   for h in _MAXSIM_H.values()
               )} AS maxsim_score,
               count(*) AS n_distinct_tokens
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST(maxsim_score AS BIGINT) AS maxsim_score,
           CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens
    FROM sc
    ORDER BY maxsim_score DESC, doc_id
    LIMIT {MAXSIM_TOPK}
    """,
)
def maxsim_hashed_retrieval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("w"),
        )
        .distinct()
    )
    ht = F.expr(
        "cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % 65536"
    )
    h = toks.select("doc_id", ht.alias("ht"))
    aggs = [
        F.max(16 - 2 * F.expr(f"bit_count(ht ^ {hv})")).alias(f"m{i}")
        for i, hv in enumerate(_MAXSIM_H.values())
    ]
    sc = h.groupBy("doc_id").agg(*aggs, F.count("*").alias("n_distinct_tokens"))
    score = sum((F.col(f"m{i}") for i in range(1, len(_MAXSIM_H))), F.col("m0"))
    return (
        sc.select(
            "doc_id",
            score.cast("long").alias("maxsim_score"),
            F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        )
        .orderBy(F.desc("maxsim_score"), "doc_id")
        .limit(MAXSIM_TOPK)
    )


# ---------------------------------------------------------------------------
# Ranking evaluation — reciprocal-rank DCG (the integer-exact member of
# the DCG family: gain discount 1/rank instead of 1/log₂(rank+1), so
# the whole metric stays in ppm integers): over the term-match top-20,
# rel = n_terms_hit, DCG = Σ rel·1e6//rank, IDCG = the same with rels
# re-sorted descending, quality = DCG·1e6//IDCG. The eval is
# list-scale; only producing the ranking touches the corpus.
# ---------------------------------------------------------------------------


@query(
    "ranking_eval_rr_dcg",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, w, count(*) AS tf FROM toks
        WHERE list_contains({_TERMS_SQL}, w) GROUP BY doc_id, w
    ),
    df AS (SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w),
    n AS (SELECT count(*) AS n FROM documents),
    ranked AS (
        SELECT h.doc_id,
               sum(h.tf * (n.n - df.df)) AS score,
               count(*) AS rel,
               row_number() OVER (ORDER BY sum(h.tf * (n.n - df.df)) DESC,
                                  h.doc_id) AS rank
        FROM hits h JOIN df USING (w) CROSS JOIN n
        GROUP BY h.doc_id
        QUALIFY rank <= {TOP_DOCS}
    ),
    ideal AS (
        SELECT rel, row_number() OVER (ORDER BY rel DESC) AS irank
        FROM ranked
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST((SELECT sum(rel * 1000000 // rank) FROM ranked) AS BIGINT)
             AS dcg_scaled,
           CAST((SELECT sum(rel * 1000000 // irank) FROM ideal) AS BIGINT)
             AS idcg_scaled,
           CAST(((SELECT sum(rel * 1000000 // rank) FROM ranked) * 1000000)
                // (SELECT sum(rel * 1000000 // irank) FROM ideal)
             AS BIGINT) AS ndcg_ppm
    FROM ranked
    """,
)
def ranking_eval_rr_dcg(spark, sf_dir):
    from pyspark.sql import Window

    # Round 12 (scan-collapse): n_docs was an EAGER count at plan-build
    # (its own corpus scan), df a second consumer of the hits chain,
    # and ideal/dcg/idcg three consumers of `ranked` — 3-4 scans total.
    # Collapsed to one chain: hits is UNIQUE on (doc_id, w), so
    # df(w) = count(*) over (partition by w) — a window on the frame
    # the old df-join shuffled anyway; n_docs rides in as a 1-row
    # broadcast below the aggregate; irank chains as a second window
    # on the <= TOP_DOCS-row frame so one final aggregate emits
    # k/dcg/idcg together (tie-invariant: equal rel rows permute within
    # the same irank set, leaving the sum unchanged).
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w").isin(QUERY_TERMS))
    hits = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    scored = (
        hits.withColumn(
            "df", F.count("*").over(Window.partitionBy("w"))
        )
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * (F.col("n_docs") - F.col("df"))).alias("score"),
            F.count("*").alias("rel"),
        )
    )
    wr = Window.orderBy(F.desc("score"), "doc_id")
    wi = Window.orderBy(F.desc("rel"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_DOCS)
        .withColumn("irank", F.row_number().over(wi))
    )
    return ranked.agg(
        F.count("*").alias("k"),
        F.sum(F.expr("rel * 1000000 div rank")).alias("dcg_scaled"),
        F.sum(F.expr("rel * 1000000 div irank")).alias("idcg_scaled"),
    ).select(
        F.col("k").cast("long").alias("k"),
        F.col("dcg_scaled").cast("long").alias("dcg_scaled"),
        F.col("idcg_scaled").cast("long").alias("idcg_scaled"),
        F.expr("(dcg_scaled * 1000000) div idcg_scaled")
        .cast("long")
        .alias("ndcg_ppm"),
    )


# ---------------------------------------------------------------------------
# Feature-hashed document embedding — the hashing-trick featurizer
# (Weinberger et al. 2009) that turns text into fixed-width integer
# vectors with no vocabulary: dim j of a doc = Σ over distinct tokens
# of ±1 from md5 bit j. Map-only + one groupBy(doc); emitted long-form
# (doc, dim, val) so the oracle compares scalars. This is the zero-
# dependency analog of an embedding model — the output feeds the same
# similarity/LSH machinery as the `embeddings` table.
# ---------------------------------------------------------------------------
HASH_EMB_DIMS = 16


@query(
    "hashed_doc_embedding",
    f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(list_filter(
            string_split(lower(text), ' '), x -> x <> '')) AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hw
        FROM toks
    ),
    dims AS (
        SELECT doc_id, g.j AS dim,
               CASE WHEN (hw >> CAST(g.j AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS s
        FROM h, generate_series(0, {HASH_EMB_DIMS - 1}) g(j)
    )
    SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(sum(s) AS BIGINT) AS val
    FROM dims GROUP BY doc_id, dim
    """,
)
def hashed_doc_embedding(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("w"),
        )
        .distinct()
    )
    h = toks.select(
        "doc_id",
        F.expr("cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)").alias("hw"),
    )
    dims = h.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.when(
                        F.expr(f"(hw >> {j}) & 1 = 1"), F.lit(1)
                    ).otherwise(F.lit(-1))
                    for j in range(HASH_EMB_DIMS)
                ]
            )
        ).alias("dim", "s"),
    )
    return dims.groupBy("doc_id", F.col("dim").cast("long").alias("dim")).agg(
        F.sum("s").cast("long").alias("val")
    )


# ---------------------------------------------------------------------------
# RM3-style pseudo-relevance feedback — query expansion from the top-k
# retrieved documents (Lavrenko & Croft relevance models, the classic
# two-pass IR trick): rank by query-term frequency, take the FB_DOCS
# best, and surface the terms that dominate them as expansion
# candidates. Integer end to end (tf counts, rank tiebreaks on ids/
# tokens). Scale shape: pass 1 is the inverted-index probe (explode →
# filter to the term set map-side → groupBy doc); pass 2 re-tokenizes
# ONLY the feedback docs (a broadcast semi-join keeps the corpus scan's
# output pruned to FB_DOCS rows before the explode).
# ---------------------------------------------------------------------------
FB_DOCS = 5
FB_TERMS = 10


@query(
    "rm3_query_expansion",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    scored AS (
        SELECT doc_id, count(*) AS qtf FROM toks
        WHERE list_contains({_TERMS_SQL}, w)
        GROUP BY doc_id
    ),
    fb AS (
        SELECT doc_id FROM scored
        ORDER BY qtf DESC, doc_id LIMIT {FB_DOCS}
    ),
    fb_toks AS (
        SELECT t.doc_id, t.w FROM toks t JOIN fb USING (doc_id)
        WHERE NOT list_contains({_TERMS_SQL}, t.w) AND len(t.w) >= 3
    ),
    cand AS (
        SELECT w AS token,
               count(*) AS tf_feedback,
               count(DISTINCT doc_id) AS df_feedback
        FROM fb_toks GROUP BY w
    )
    SELECT token, CAST(tf_feedback AS BIGINT) AS tf_feedback,
           CAST(df_feedback AS BIGINT) AS df_feedback,
           CAST(row_number() OVER (ORDER BY tf_feedback DESC, token)
             AS BIGINT) AS rank
    FROM cand
    QUALIFY rank <= {FB_TERMS}
    """,
)
def rm3_query_expansion(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    scored = (
        toks.filter(F.col("w").isin(QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("qtf"))
    )
    fb = scored.orderBy(F.desc("qtf"), "doc_id").limit(FB_DOCS).select("doc_id")
    fb_toks = (
        toks.join(F.broadcast(fb), "doc_id", "left_semi")
        .filter(~F.col("w").isin(QUERY_TERMS) & (F.length("w") >= 3))
    )
    cand = fb_toks.groupBy(F.col("w").alias("token")).agg(
        F.count("*").cast("long").alias("tf_feedback"),
        F.countDistinct("doc_id").cast("long").alias("df_feedback"),
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.desc("tf_feedback"), F.asc("token"))
    return (
        cand.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= FB_TERMS)
    )


# ---------------------------------------------------------------------------
# MaxScore pruning audit (Turtle & Flood 1995; the WAND/MaxScore family
# every production engine — Lucene, Tantivy, PISA — uses to skip
# postings): with per-term score UPPER BOUNDS, terms whose cumulative
# bound cannot lift a document past the current top-k threshold are
# "non-essential" — their postings are never walked alone. This audit
# computes, for the standing query, exactly how much of the index that
# planning rule skips: per term, the exact BM25 upper bound (max
# per-posting score, same fixed-point arithmetic as bm25_topk), the
# MaxScore essential/non-essential split against the TRUE top-k
# threshold theta (the k-th best full score), and the corpus-wide
# share of postings skippable at this theta.
#
# Everything is exact int64 (bounds, theta, prefix sums, ppm with
# truncating div), so both engines agree bit-for-bit. Plan shape: the
# map-side inverted-index probe (explode -> filter) feeds one
# groupBy(doc,term); bounds are a |terms|-row aggregate; theta is a
# TakeOrdered(k); the prefix-sum window runs on the |terms|-row frame.
# At 100 TB nothing after the probe touches corpus-sized data.
# ---------------------------------------------------------------------------
MAXSCORE_K = 10


@query(
    "maxscore_pruning_audit",
    f"""
    WITH stats AS (
        SELECT count(*) AS n,
               (1000 * sum(len(string_split(lower(text), ' ')))) // count(*)
                   AS avgdl_milli
        FROM documents
    ),
    toks AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS dl,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, any_value(dl) AS dl, w, count(*) AS tf
        FROM toks
        WHERE list_contains({_TERMS_SQL}, w)
        GROUP BY doc_id, w
    ),
    dft AS (SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w),
    ts AS MATERIALIZED (
        SELECT h.doc_id, h.w,
               (22000 * (s.n - dft.df) * h.tf * s.avgdl_milli)
               // (10 * s.avgdl_milli * h.tf + 3 * s.avgdl_milli + 9000 * h.dl)
                 AS tscore
        FROM hits h JOIN dft USING (w) CROSS JOIN stats s
    ),
    theta AS (
        SELECT min(total) AS theta FROM (
            SELECT doc_id, sum(tscore) AS total FROM ts GROUP BY doc_id
            ORDER BY total DESC, doc_id LIMIT {MAXSCORE_K}
        )
    ),
    bounds AS MATERIALIZED (
        SELECT t.w, max(t.tscore) AS ub, count(*) AS df_postings
        FROM ts t GROUP BY t.w
    ),
    cum AS (
        SELECT w, ub, df_postings,
               sum(ub) OVER (ORDER BY ub, w) AS cum_ub,
               sum(df_postings) OVER (ORDER BY ub, w) AS cum_postings,
               sum(df_postings) OVER () AS total_postings
        FROM bounds
    )
    SELECT w AS term,
           CAST(df_postings AS BIGINT) AS df_postings,
           CAST(ub AS BIGINT) AS ub_score,
           CAST(cum_ub AS BIGINT) AS cum_ub_score,
           CASE WHEN cum_ub <= theta THEN 'non-essential'
                ELSE 'essential' END AS term_class,
           CAST(theta AS BIGINT) AS theta_score,
           CAST((1000000 * CASE WHEN cum_ub <= theta THEN cum_postings
                                ELSE 0 END) // total_postings AS BIGINT)
             AS skippable_upto_here_ppm
    FROM cum, theta
    ORDER BY ub_score, term
    """,
    bounded_window="every w-grain frame here is filtered to the fixed "
    "QUERY_TERMS literal set BEFORE aggregation (toks.filter(isin)), so "
    "the bounds frame and its global cum window hold <= |QUERY_TERMS| "
    "rows at any corpus size — the round-13 token-grain audit class "
    "does not apply to a query-term-filtered grain",
)
def maxscore_pruning_audit(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks_col = F.split(F.lower("text"), " ")
    stats = docs.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("(1000 * sum(size(split(lower(text), ' ')))) div count(*)")
        .alias("avgdl_milli"),
    )
    toks = docs.select(
        "doc_id",
        F.size(toks_col).alias("dl"),
        F.explode(toks_col).alias("w"),
    ).filter(F.col("w").isin(QUERY_TERMS))
    hits = toks.groupBy("doc_id", "w").agg(
        F.any_value("dl").alias("dl"), F.count("*").alias("tf")
    )
    dft = hits.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    ts = (
        hits.join(F.broadcast(dft), "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            F.expr(
                "(22000 * (n - df) * tf * avgdl_milli)"
                " div (10 * avgdl_milli * tf + 3 * avgdl_milli + 9000 * dl)"
            ).alias("tscore"),
        )
        .transform(materialize)  # feeds theta, bounds, and the totals
    )
    theta = (
        ts.groupBy("doc_id")
        .agg(F.sum("tscore").alias("total"))
        .orderBy(F.desc("total"), "doc_id")
        .limit(MAXSCORE_K)
        .agg(F.min("total").alias("theta"))
    )
    bounds = ts.groupBy("w").agg(
        F.max("tscore").alias("ub"), F.count("*").alias("df_postings")
    )
    w_ord = Window.orderBy("ub", "w")
    cum = bounds.select(
        "w",
        "ub",
        "df_postings",
        F.sum("ub").over(w_ord).alias("cum_ub"),
        F.sum("df_postings").over(w_ord).alias("cum_postings"),
        F.sum("df_postings").over(Window.partitionBy()).alias("total_postings"),
    )
    return (
        cum.crossJoin(F.broadcast(theta))
        .select(
            F.col("w").alias("term"),
            F.col("df_postings").cast("long").alias("df_postings"),
            F.col("ub").cast("long").alias("ub_score"),
            F.col("cum_ub").cast("long").alias("cum_ub_score"),
            F.when(F.col("cum_ub") <= F.col("theta"), "non-essential")
            .otherwise("essential")
            .alias("term_class"),
            F.col("theta").cast("long").alias("theta_score"),
            F.expr(
                "(1000000 * CASE WHEN cum_ub <= theta THEN cum_postings"
                " ELSE 0 END) div total_postings"
            ).alias("skippable_upto_here_ppm"),
        )
        .orderBy("ub_score", "term")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
# standard hybrid-retrieval combiner: rank the same candidate set under
# two independent strategies (here: exact quantized dot product, and
# 1-bit sign-agreement similarity — the binary-quantization retrieval
# path) and fuse with RRF(d) = Σ_s 1e6 div (K + rank_s(d)), K = 60.
# Integer-exact in both engines: ranks are deterministic row_numbers
# (score desc, id asc) and the fused score is integer division.
#
# Scale shape: the tiny query set broadcasts into one Arrow-batched
# numpy matmul per strategy (no shuffle of the embedding table); each
# ranking is a window keyed by query_id (per-query partitions, never
# SinglePartition); final top-k per query is a windowed filter over
# the fused frame.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_QUERIES = 3
RRF_TOPK = 10


@query(
    "rrf_fusion_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv,
               list_transform(embedding,
                   x -> CASE WHEN round(CAST(x AS DOUBLE) * 1000) >= 0
                        THEN 1 ELSE -1 END) AS qs
        FROM embeddings WHERE vec_id < {RRF_QUERIES}
    ),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               CAST(list_dot_product(qv,
                   list_transform(e.embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                 AS BIGINT) AS dot_score,
               CAST((list_dot_product(qs,
                   list_transform(e.embedding,
                       x -> CASE WHEN round(CAST(x AS DOUBLE) * 1000) >= 0
                            THEN 1 ELSE -1 END))
                   + len(qs)) // 2 AS BIGINT) AS sign_agree
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, dot_score, sign_agree,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_score DESC, neighbor_id)
                 AS rank_dot,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sign_agree DESC, neighbor_id)
                 AS rank_sign
        FROM pairs
    )
    SELECT query_id, neighbor_id,
           CAST(rank_dot AS BIGINT) AS rank_dot,
           CAST(rank_sign AS BIGINT) AS rank_sign,
           CAST(1000000 // ({RRF_K} + rank_dot)
                + 1000000 // ({RRF_K} + rank_sign) AS BIGINT) AS rrf_score,
           CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY 1000000 // ({RRF_K} + rank_dot)
                        + 1000000 // ({RRF_K} + rank_sign) DESC, neighbor_id)
             AS BIGINT) AS fused_rank
    FROM ranked
    QUALIFY fused_rank <= {RRF_TOPK}
    ORDER BY query_id, fused_rank
    """,
)
def rrf_fusion_topk(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion: exact-dot ranking ⊕
    1-bit sign-agreement ranking. Both strategy scores come from one
    numpy int64 matmul each (sign dot s satisfies agreements =
    (s + dim) / 2 exactly, since agree − disagree = s and
    agree + disagree = dim)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("long"),
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < RRF_QUERIES)
        .select("vec_id", quant.alias("qv"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    qmat = np.array([r.qv for r in qrows], dtype=np.int64)
    qsign = np.where(qmat >= 0, 1, -1).astype(np.int64)
    dim = qmat.shape[1]
    qids = F.array(*[F.lit(int(r.vec_id)).cast("long") for r in qrows])

    def _scores(ev: pd.Series) -> pd.Series:
        m = np.stack(ev.to_numpy()).astype(np.int64)
        dots = m @ qmat.T
        signs = np.where(m >= 0, 1, -1).astype(np.int64)
        agree = (signs @ qsign.T + dim) // 2
        # interleave: [dot_0, agree_0, dot_1, agree_1, ...]
        out = np.empty((m.shape[0], 2 * dots.shape[1]), dtype=np.int64)
        out[:, 0::2] = dots
        out[:, 1::2] = agree
        return pd.Series(list(out))

    _scores.__annotations__ = {"ev": pd.Series, "return": pd.Series}
    scores = F.pandas_udf(_scores, "array<long>")

    e = emb.select(F.col("vec_id").alias("neighbor_id"), quant.alias("ev"))
    pairs = (
        e.select(
            "neighbor_id", F.posexplode(scores(F.col("ev"))).alias("j", "v")
        )
        .withColumn("qi", F.expr("j div 2"))
        .withColumn("is_sign", F.expr("j % 2 = 1"))
        .groupBy("neighbor_id", "qi")
        .agg(
            F.max(F.when(~F.col("is_sign"), F.col("v"))).alias("dot_score"),
            F.max(F.when(F.col("is_sign"), F.col("v"))).alias("sign_agree"),
        )
        .select(
            F.element_at(qids, F.col("qi").cast("int") + 1).alias("query_id"),
            "neighbor_id",
            "dot_score",
            "sign_agree",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.desc("dot_score"), F.asc("neighbor_id")
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("sign_agree"), F.asc("neighbor_id")
    )
    ranked = pairs.withColumn(
        "rank_dot", F.row_number().over(wd).cast("long")
    ).withColumn("rank_sign", F.row_number().over(ws).cast("long"))
    rrf = F.expr(
        f"1000000 div ({RRF_K} + rank_dot)"
        f" + 1000000 div ({RRF_K} + rank_sign)"
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        ranked.withColumn("rrf_score", rrf.cast("long"))
        .withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .select(
            "query_id", "neighbor_id", "rank_dot", "rank_sign",
            "rrf_score", "fused_rank",
        )
        .orderBy("query_id", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Hard-example mining for contrastive embedding training: for each
# anchor vector, the HARD NEGATIVE (highest-dot vector with a DIFFERENT
# label — the impostor the model most confuses) and the HARD POSITIVE
# (lowest-dot vector with the SAME label — the in-class outlier), plus
# the (negative) margin between them. This is the mining step of
# triplet/InfoNCE pipelines (Schroff et al., FaceNet 2015).
#
# Shape: the anchor set is a query PARAMETER (tiny, collected once)
# broadcast into one Arrow-batched int64 matmul over the embedding
# table — the big side never shuffles rows; per-anchor argmax/argmin
# are two keyed aggregations at anchor grain. Exact quantized-integer
# dots, deterministic tie-breaks on vec_id.
# ---------------------------------------------------------------------------

HN_ANCHORS = 16


@query(
    "hard_negative_mining",
    f"""
    WITH q AS (
        SELECT vec_id AS anchor_id, label AS anchor_label,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id < {HN_ANCHORS}
    ),
    pairs AS (
        SELECT q.anchor_id, q.anchor_label, e.vec_id, e.label,
               CAST(list_dot_product(qv,
                   list_transform(e.embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                 AS BIGINT) AS dot
        FROM q JOIN embeddings e ON e.vec_id != q.anchor_id
    ),
    hn AS (
        -- deterministic argmax: pack (dot, vec_id) into one ordered
        -- BIGINT key (dot < 2^30, vec_id < 2^24)
        SELECT anchor_id,
               arg_min(vec_id, -dot * 16777216 + vec_id) AS hn_id,
               max(dot) AS hn_dot
        FROM pairs WHERE label != anchor_label GROUP BY anchor_id
    ),
    hp AS (
        SELECT anchor_id,
               arg_min(vec_id, dot * 16777216 + vec_id) AS hp_id,
               min(dot) AS hp_dot
        FROM pairs WHERE label = anchor_label GROUP BY anchor_id
    )
    SELECT q.anchor_id, CAST(q.anchor_label AS BIGINT) AS anchor_label,
           CAST(n.hn_id AS BIGINT) AS hard_negative_id,
           CAST(n.hn_dot AS BIGINT) AS hard_negative_dot,
           CAST(p.hp_id AS BIGINT) AS hard_positive_id,
           CAST(p.hp_dot AS BIGINT) AS hard_positive_dot,
           CAST(p.hp_dot - n.hn_dot AS BIGINT) AS margin
    FROM q JOIN hn n ON n.anchor_id = q.anchor_id
           JOIN hp p ON p.anchor_id = q.anchor_id
    ORDER BY q.anchor_id
    """,
)
def hard_negative_mining(spark, sf_dir):
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("long"),
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < HN_ANCHORS)
        .select("vec_id", "label", quant.alias("qv"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    qmat = np.array([r.qv for r in qrows], dtype=np.int64)
    qids = F.array(*[F.lit(int(r.vec_id)).cast("long") for r in qrows])
    qlabels = F.array(*[F.lit(int(r.label)).cast("long") for r in qrows])

    def _dots(ev: pd.Series) -> pd.Series:
        m = np.stack(ev.to_numpy()).astype(np.int64)
        return pd.Series(list(m @ qmat.T))

    _dots.__annotations__ = {"ev": pd.Series, "return": pd.Series}
    dots = F.pandas_udf(_dots, "array<long>")

    pairs = (
        emb.select("vec_id", "label", quant.alias("ev"))
        .select(
            "vec_id", "label",
            F.posexplode(dots(F.col("ev"))).alias("qi", "dot"),
        )
        .select(
            F.element_at(qids, F.col("qi") + 1).alias("anchor_id"),
            F.element_at(qlabels, F.col("qi") + 1).alias("anchor_label"),
            "vec_id", "label", "dot",
        )
        .filter(F.col("vec_id") != F.col("anchor_id"))
    )
    # Round 12 (scan-collapse): hn, hp and anchors were three consumers
    # of pairs, each re-running the Arrow matmul + posexplode over the
    # corpus (3 embedding scans). One hash aggregate computes both
    # extremes: the hardest negative under (dot DESC, vec_id ASC) is
    # max(struct(dot, -vec_id)), the hardest positive under (dot ASC,
    # vec_id ASC) is min(struct(dot, vec_id)) — identical tie-breaks to
    # the packed arg_min keys; the inner joins' "anchor must have both"
    # becomes a null filter. 1 scan, 1 python stage, 0 joins.
    hns = F.max(
        F.when(
            F.col("label") != F.col("anchor_label"),
            F.struct(F.col("dot"), (-F.col("vec_id")).alias("nv")),
        )
    )
    hps = F.min(
        F.when(
            F.col("label") == F.col("anchor_label"),
            F.struct(F.col("dot"), F.col("vec_id")),
        )
    )
    agged = pairs.groupBy("anchor_id").agg(
        F.first("anchor_label").alias("anchor_label"),
        hns.alias("hn"),
        hps.alias("hp"),
    )
    return (
        agged.filter(F.col("hn").isNotNull() & F.col("hp").isNotNull())
        .select(
            "anchor_id",
            "anchor_label",
            (-F.col("hn.nv")).cast("long").alias("hard_negative_id"),
            F.col("hn.dot").cast("long").alias("hard_negative_dot"),
            F.col("hp.vec_id").cast("long").alias("hard_positive_id"),
            F.col("hp.dot").cast("long").alias("hard_positive_dot"),
        )
        .select(
            "anchor_id",
            F.col("anchor_label").cast("long").alias("anchor_label"),
            "hard_negative_id",
            "hard_negative_dot",
            "hard_positive_id",
            "hard_positive_dot",
            (F.col("hard_positive_dot") - F.col("hard_negative_dot"))
            .cast("long")
            .alias("margin"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# Per-source salient terms — tf·rarity top-k, the integer-exact idf
# analogue term_match_retrieval established (weight = N − df, corpus
# size minus document frequency): the "what is this source about /
# what boilerplate does it inject" census run per ingest source.
# Shape: one (source, token) aggregate (map-side combine), one tiny
# token-grain df aggregate joined in (broadcast at gate scale, keyed
# shuffle at 100 TB), top-k per source via a rank window PARTITIONED BY
# SOURCE over term-grain rows — never a single partition.
# ---------------------------------------------------------------------------

TFIDF_TOPK = 5


@query(
    "tfidf_topk_terms_per_source",
    f"""
    WITH toks AS (
        SELECT source, doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS token
        FROM documents
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY token
    ),
    tf AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY source, token
    ),
    scored AS (
        SELECT t.source, t.token, t.tf, d.df,
               t.tf * (n.n_docs - d.df) AS weight
        FROM tf t JOIN df d ON d.token = t.token CROSS JOIN n
    ),
    ranked AS (
        SELECT source, token, tf, df, weight,
               row_number() OVER (PARTITION BY source
                                  ORDER BY weight DESC, token) AS rnk
        FROM scored
    )
    SELECT source, token, tf, df,
           CAST(weight AS BIGINT) AS weight,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TFIDF_TOPK}
    ORDER BY source, rnk
    """,
)
def tfidf_topk_terms_per_source(spark, sf_dir):
    # Round 12 (scan-collapse): df and tf each replanned the tokenize
    # explode (plus the n count — 3 corpus scans). One explode feeds a
    # (source, doc_id, token) count matrix; since source is functionally
    # determined by doc_id, df(token) = row count over (partition by
    # token) of that matrix (rows ARE distinct docs), and tf rolls up by
    # dropping the doc axis. The doc count joins as a 1-row broadcast
    # from a narrow second pass (count only, no explode).
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("token"),
    )
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    dt = toks.groupBy("source", "doc_id", "token").agg(
        F.count("*").cast("long").alias("tf_dt")
    )
    scored = (
        dt.withColumn(
            "df", F.count("*").over(Window.partitionBy("token")).cast("long")
        )
        .groupBy("source", "token")
        .agg(
            F.sum("tf_dt").cast("long").alias("tf"),
            F.max("df").alias("df"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "source", "token", "tf", "df",
            (F.col("tf") * (F.col("n_docs") - F.col("df"))).alias("weight"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("weight"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("source", "token", "tf", "df",
                F.col("weight").cast("long").alias("weight"), "rnk")
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (Zhai & Lafferty, SIGIR'01) — the
# language-modeling retrieval scorer, completing the classic trio
# alongside BM25 (probabilistic) and tf-idf (vector-space):
#
#     score(q, d) = Σ_w log P(w|d),
#     P(w|d) = (tf_wd + μ·cf_w/|C|) / (|d| + μ)
#
# With integer μ every per-term probability is the integer rational
# (tf_wd·|C| + μ·cf_w) / (|C|·(|d| + μ)), so the log runs through the
# shared fixed-point ilog2 kernel and the ranking is exact — the same
# division-free discipline as kneser_ney_bits, applied to retrieval.
#
# Scale shape: collection stats are one token aggregation; scoring
# joins the 5-term posting rows (keyed, term-filtered at the scan) to
# per-doc lengths, aggregates to doc grain, and the absent-term mass is
# closed-form (terms not in d contribute ilog2(μ·cf) − ilog2(|C|·(|d|+μ))
# — added arithmetically, never by exploding the full vocabulary).
# Top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
DIR_MU = 2000


def _dirichlet_oracle() -> str:
    from eventsourcing_spark.pipeline.nb_classifier import ilog2_duck

    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
    coll AS (SELECT count(*) AS csz FROM toks),
    cf AS (
        SELECT w, count(*) AS cf FROM toks
        WHERE list_contains({_TERMS_SQL}, w) GROUP BY w
    ),
    tf AS (
        SELECT doc_id, w, count(*) AS tf FROM toks
        WHERE list_contains({_TERMS_SQL}, w) GROUP BY doc_id, w
    ),
    -- per (doc, query-term) present-term bits MINUS the absent-term
    -- bits the closed form already charged for that term
    adj AS (
        SELECT t.doc_id,
               sum({ilog2_duck("t.tf * coll.csz + " + str(DIR_MU) + " * c.cf")}
                   - {ilog2_duck(str(DIR_MU) + " * c.cf")}) AS adj_fx
        FROM tf t JOIN cf c ON c.w = t.w CROSS JOIN coll
        GROUP BY t.doc_id
    ),
    base AS (
        SELECT d.doc_id, d.len,
               (SELECT sum({ilog2_duck(str(DIR_MU) + " * cf")}) FROM cf)
                   - {len(QUERY_TERMS)}
                     * {ilog2_duck("coll.csz * (d.len + " + str(DIR_MU) + ")")}
                   AS base_fx
        FROM dl d CROSS JOIN coll
    )
    SELECT doc_id,
           CAST(base_fx + coalesce(adj_fx, 0) AS BIGINT) AS score_fx,
           CAST(row_number() OVER (
               ORDER BY base_fx + coalesce(adj_fx, 0) DESC, doc_id
           ) AS BIGINT) AS rank
    FROM base LEFT JOIN adj USING (doc_id)
    QUALIFY rank <= {TOP_DOCS}
    """


@query("dirichlet_ql_topk", _dirichlet_oracle())
def dirichlet_ql_topk(spark, sf_dir):
    """Top-k docs by exact Dirichlet-smoothed query likelihood."""
    from eventsourcing_spark.pipeline.nb_classifier import ilog2_spark

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w"),
    )
    # Round 12 (was 6 corpus scans / 4 re-derivations of the explode):
    # * doc length is size(filter(split)) — map-only, no explode, no
    #   exchange; len >= 1 keeps exactly the docs the explode+groupBy
    #   form produced (a token-less doc had no rows to count);
    # * collection size is the sum of lengths — derived, not re-scanned;
    # * cf is the column sum of tf — derive it from the tiny per-doc
    #   term-frequency table instead of re-running the corpus explode
    #   (tf is ≤ |docs| x |QUERY_TERMS| rows of three ints, so
    #   materializing IT is free, where checkpointing the raw postings
    #   paid an eager barrier for no saved scan).
    dl = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).cast("long").alias("len"),
    ).filter(F.col("len") >= 1)
    coll = dl.agg(F.sum("len").cast("long").alias("csz"))
    qt = toks.filter(F.col("w").isin(QUERY_TERMS))
    tf = (
        qt.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .transform(materialize)
    )
    cf = tf.groupBy("w").agg(F.sum("tf").alias("cf"))
    adj = (
        tf.join(F.broadcast(cf), "w")
        .crossJoin(F.broadcast(coll))
        .select(
            "doc_id",
            F.expr(
                f"{ilog2_spark(f'tf * csz + {DIR_MU} * cf')}"
                f" - {ilog2_spark(f'{DIR_MU} * cf')}"
            ).alias("term_fx"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_fx").cast("long").alias("adj_fx"))
    )
    absent = cf.agg(
        F.expr(f"sum({ilog2_spark(f'{DIR_MU} * cf')})")
        .cast("long")
        .alias("absent_fx")
    )
    base = (
        dl.crossJoin(F.broadcast(coll))
        .crossJoin(F.broadcast(absent))
        .select(
            "doc_id",
            (
                F.col("absent_fx")
                - len(QUERY_TERMS)
                * F.expr(ilog2_spark(f"csz * (len + {DIR_MU})"))
            ).alias("base_fx"),
        )
    )
    # adj is DOC-grain (grows with the corpus) and explode-fed — pin
    # the merge join (round-12 Generate-fed broadcast audit)
    scored = base.join(adj.hint("merge"), "doc_id", "left").select(
        "doc_id",
        (F.col("base_fx") + F.coalesce("adj_fx", F.lit(0)))
        .cast("long")
        .alias("score_fx"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_fx"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score_fx"), F.asc("doc_id"))
        .limit(TOP_DOCS)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
