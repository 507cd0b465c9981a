"""Corpus mixing + export operators: the last mile before training shards.

Where :mod:`eventsourcing_spark.pipeline.curation` covers dedup→quality→
split→pack, this module covers how a 100 TB corpus is *composed and laid
out*: re-weighting sources (temperature sampling), capping dominant
domains, assigning a deterministic global shuffle order in shards, the
blocklist scrub every production pipeline runs, and int8 quantization of
embedding columns for ANN serving.

Distributed shape, per operator:

* **temperature mixing** — one tiny per-language aggregate (|langs| rows)
  broadcast back over the corpus; the keep decision is a per-row hash
  threshold, so the whole job is one map-side filter after a broadcast
  join. No shuffle of the big table, ever.
* **domain cap** — a window partitioned by ``source``: one shuffle keyed
  on the domain, each domain ranked independently (parallel across
  domains; a skewed mega-domain is bounded by the cap itself).
* **shuffle-shard assign** — shard = md5 prefix (map-only), position =
  row_number within shard: the "global shuffle" that training ingestion
  needs, expressed as |shards| independent sorts instead of one total
  order. At 100 TB this is exactly how you want it: no global sort, no
  driver bottleneck, and the shard id doubles as the output file key.
* **blocklist scrub** — pure per-row regex map + per-source rollup.
* **int8 quantize** — per-row higher-order-function arithmetic, no
  Python, no shuffle until the final small rollup.

Determinism contract (same as pipeline.curation): md5 hex-string
thresholds and exact integer arithmetic; the only doubles are IEEE
exactly-rounded ``sqrt``/``/``/``round`` shared bit-for-bit by Spark and
DuckDB. Reference parity: none — engine additions from the task brief
(quintans/eventsourcing has no relational surface, SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

# Temperature-mixing hash threshold scale: first 6 hex chars of md5 as a
# uniform in [0, 16^6); keep iff prefix < printf('%06x', floor(rate*16^6)).
HASH_SPACE = 16**6  # 16777216

DOMAIN_CAP = 20  # max docs kept per source in domain_cap_topk

SHARD_HEX_CHARS = 2  # 256 shuffle shards (would be 3-4 hex chars at 100 TB)

BLOCKLIST_PATTERN = "(spark|table)"  # demo blocklist; same regex in RE2/Java


# ---------------------------------------------------------------------------
# Temperature-weighted source mixing (α = 0.5).
# ---------------------------------------------------------------------------
@query(
    "mixture_weighted_sample",
    f"""
    WITH counts AS (
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ), rates AS (
        SELECT lang, n_docs,
               least(CAST(floor(sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE)
                                     / CAST(n_docs AS DOUBLE)) * {HASH_SPACE}) AS BIGINT),
                     {HASH_SPACE - 1}) AS thresh
        FROM counts
    )
    SELECT lang, max(n_docs) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept
    FROM (
        SELECT d.lang, r.n_docs,
               CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)
                         < printf('%06x', r.thresh)
                    THEN 1 ELSE 0 END AS kept
        FROM documents d JOIN rates r USING (lang)
    )
    GROUP BY lang
    """,
)
def mixture_weighted_sample(spark, sf_dir):
    """Temperature sampling (α=0.5): keep-rate per source is
    sqrt(n_min/n_s), so the smallest language keeps ~everything and a
    language 100× larger keeps ~10× the docs (not 100×) — the standard
    multinomial-temperature rebalance, made deterministic with an
    md5-prefix threshold instead of an RNG.

    Scale shape: two tiny aggregates over |sources| rows, broadcast back;
    the keep decision is map-side. The 100 TB table is scanned once and
    never shuffled. Both sqrt and / are IEEE exactly-rounded, so Spark
    and DuckDB agree bit-for-bit; floor()+integer hex formatting makes
    the threshold a string compare."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    # global min as a window over the |sources|-row aggregate: no second
    # scan of the big table (tiny single-partition window, not a re-agg)
    n_min = F.min("n_docs").over(Window.partitionBy(F.lit(1)))
    rates = counts.select(
        "lang",
        "n_docs",
        F.least(
            F.floor(
                F.sqrt(n_min.cast("double") / F.col("n_docs").cast("double"))
                * F.lit(HASH_SPACE)
            ).cast("bigint"),
            F.lit(HASH_SPACE - 1).cast("bigint"),
        ).alias("thresh"),
    )
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
    kept = F.when(prefix < F.format_string("%06x", F.col("thresh")), 1).otherwise(0)
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(F.max("n_docs").alias("n_docs"), F.sum(kept).alias("n_kept"))
    )


# ---------------------------------------------------------------------------
# Per-domain cap: keep at most DOMAIN_CAP docs per source.
# ---------------------------------------------------------------------------
@query(
    "domain_cap_topk",
    f"""
    SELECT doc_id, source, cap_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS cap_rank
        FROM documents
    ) WHERE cap_rank <= {DOMAIN_CAP}
    """,
)
def domain_cap_topk(spark, sf_dir):
    """Domain capping: every source contributes at most DOMAIN_CAP docs,
    preferring the longest (a crude quality prior; swap the ORDER BY for
    a real quality score in production). One shuffle keyed on source;
    each domain ranks independently, so a crawl dominated by one domain
    is cut to the cap instead of flooding the mixture."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("cap_rank"))
        .filter(F.col("cap_rank") <= DOMAIN_CAP)
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle, sharded.
# ---------------------------------------------------------------------------
@query(
    "shuffle_shard_assign",
    f"""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, {SHARD_HEX_CHARS}) AS shard,
           row_number() OVER (
               PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, {SHARD_HEX_CHARS})
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
    FROM documents
    """,
)
def shuffle_shard_assign(spark, sf_dir):
    """Training-order shuffle: shard = first {SHARD_HEX_CHARS} hex chars
    of md5(doc_id) (map-only), position = rank of the full md5 within
    the shard. Reading shards in order yields a reproducible pseudo-
    random permutation of the corpus WITHOUT a global sort: 256
    independent window sorts (16^4 at 100 TB), each the size of one
    output file. Content-keyed, so re-runs and re-partitions of the
    input never change the order."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.substring(h, 1, SHARD_HEX_CHARS)
    w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
    return docs.select(
        "doc_id", shard.alias("shard"), F.row_number().over(w).alias("pos")
    )


# ---------------------------------------------------------------------------
# Blocklist scrub: flag + redact + measure, per source.
# ---------------------------------------------------------------------------
@query(
    "blocklist_scrub",
    f"""
    SELECT source,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_flagged,
           CAST(sum(hits) AS BIGINT) AS total_hits,
           CAST(sum(len_before - len_after) AS BIGINT) AS chars_removed
    FROM (
        SELECT source,
               len(regexp_extract_all(text, '{BLOCKLIST_PATTERN}')) AS hits,
               length(text) AS len_before,
               length(regexp_replace(text, '{BLOCKLIST_PATTERN}', '', 'g'))
                   AS len_after
        FROM documents
    )
    GROUP BY source
    """,
)
def blocklist_scrub(spark, sf_dir):
    """Blocklist filtering: count and redact blocklisted terms per doc,
    roll up per source. Pure per-row regex map (JVM-side, whole-stage
    codegen) + one tiny aggregate — the cheapest possible shape for a
    full-corpus scrub pass. The alternation pattern behaves identically
    in Java regex (Spark) and RE2 (DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_count(F.col("text"), F.lit(BLOCKLIST_PATTERN))
    scrubbed = F.regexp_replace(F.col("text"), BLOCKLIST_PATTERN, "")
    per_doc = docs.select(
        "source",
        hits.alias("hits"),
        F.length("text").alias("len_before"),
        F.length(scrubbed).alias("len_after"),
    )
    return per_doc.groupBy("source").agg(
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).alias("docs_flagged"),
        F.sum("hits").cast("bigint").alias("total_hits"),
        F.sum(F.col("len_before") - F.col("len_after")).alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Int8 embedding quantization (symmetric, per-vector scale).
# ---------------------------------------------------------------------------
@query(
    "emb_int8_quantize",
    """
    SELECT vec_id,
           CAST(round(CAST(maxabs AS DOUBLE) * 1000000) AS BIGINT) AS scale_q,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qvec, q -> abs(q))) AS BIGINT) AS q_l1,
           list_max(qvec) AS q_max
    FROM (
        SELECT vec_id, maxabs,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127.0
                                   / CAST(maxabs AS DOUBLE)) AS BIGINT)) AS qvec
        FROM (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(x))) AS maxabs
            FROM embeddings
        )
    )
    """,
)
def emb_int8_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = max|x|, q_i = round(127·x_i/scale) ∈ [-127,127] — the
    compression step before shipping vectors to an ANN serving index
    (4× smaller, SIMD-friendly dot products). Pure higher-order-function
    arithmetic: no Python, no shuffle, fuses into the scan. The gate
    emits integer invariants (sum, L1, max, quantized scale) instead of
    the raw arrays to keep the oracle hash exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    with_scale = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    qvec = F.transform(
        F.col("embedding"),
        lambda x: F.round(
            x.cast("double") * F.lit(127.0) / F.col("maxabs").cast("double")
        ).cast("bigint"),
    )
    quant = with_scale.select(
        "vec_id",
        F.round(F.col("maxabs").cast("double") * F.lit(1000000)).cast("bigint").alias(
            "scale_q"
        ),
        qvec.alias("qvec"),
    )
    return quant.select(
        "vec_id",
        "scale_q",
        F.aggregate(
            "qvec", F.lit(0).cast("bigint"), lambda acc, q: acc + q
        ).alias("q_sum"),
        F.aggregate(
            "qvec", F.lit(0).cast("bigint"), lambda acc, q: acc + F.abs(q)
        ).alias("q_l1"),
        F.array_max("qvec").alias("q_max"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement — priority sampling (Duffield,
# Lund & Thorup 2007): per item draw u ~ U(0,1] (here the md5 hash,
# deterministic) and keep the k items with the smallest u/w. Inclusion
# probability is ∝ weight for the retained set; the whole draw is one
# TakeOrdered over a map-side expression — no shuffle of the corpus, no
# per-item state, and the same top-k under any partitioning.
#
# Cross-engine exactness: priority = CAST(h AS DOUBLE)/w is one IEEE
# division of exactly-representable integers (h < 2^32, w int) — Spark
# and DuckDB produce the identical double, same argument as the k-means
# d/c² ordering. Ties break on doc_id.
# ---------------------------------------------------------------------------

SAMPLE_K = 100


@query(
    "weighted_priority_sample",
    f"""
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (
               ORDER BY CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 1 AS DOUBLE) / n_chars, doc_id
           ) AS BIGINT) AS rank
    FROM documents
    WHERE n_chars > 0
    QUALIFY rank <= {SAMPLE_K}
    """,
)
def weighted_priority_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    prio = h.cast("double") / F.col("n_chars")
    # distributed top-k (TakeOrderedAndProject) over the corpus; the
    # global rank window runs only on the k survivors
    topk = (
        docs.select("doc_id", "n_chars", prio.alias("p"))
        .orderBy("p", "doc_id")
        .limit(SAMPLE_K)
    )
    w = Window.orderBy("p", "doc_id")
    return topk.select(
        "doc_id",
        "n_chars",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Temporal train/validation split with leakage audit — the time-based
# split every forecasting/recommendation pipeline needs (random splits
# leak future information): cut at a quantile day, then audit the
# entity overlap across the boundary (users appearing on both sides =
# cold-start vs warm-start composition, the number that decides whether
# offline metrics transfer). One pass for the cut (tiny agg), one keyed
# aggregate for per-user min/max day, everything after is counting.
# ---------------------------------------------------------------------------
SPLIT_DAY_OFFSET = 21  # train = first 21 days from the corpus start


@query(
    "temporal_split_audit",
    f"""
    WITH base AS (SELECT min(epoch_ms(ts) // 86400000) AS d0 FROM events),
    u AS (
        SELECT user_id,
               min(epoch_ms(ts) // 86400000) AS first_day,
               max(epoch_ms(ts) // 86400000) AS last_day,
               count(*) AS n
        FROM events GROUP BY user_id
    ),
    tagged AS (
        SELECT u.*, base.d0 + {SPLIT_DAY_OFFSET} AS cut FROM u CROSS JOIN base
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE last_day < cut) AS BIGINT)
             AS train_only_users,
           CAST(count(*) FILTER (WHERE first_day >= cut) AS BIGINT)
             AS valid_only_users,
           CAST(count(*) FILTER (WHERE first_day < cut AND last_day >= cut)
                AS BIGINT) AS straddling_users,
           CAST((count(*) FILTER (WHERE first_day < cut AND last_day >= cut)
                 * 1000000) // count(*) AS BIGINT) AS straddle_ppm
    FROM tagged
    """,
)
def temporal_split_audit(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_millis(ts) div 86400000")
    d0 = ev.agg(F.min(day).alias("d0"))
    u = ev.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
        F.count("*").alias("n"),
    )
    tagged = u.crossJoin(F.broadcast(d0)).withColumn(
        "cut", F.col("d0") + SPLIT_DAY_OFFSET
    )
    straddle = (F.col("first_day") < F.col("cut")) & (
        F.col("last_day") >= F.col("cut")
    )
    return tagged.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count(F.when(F.col("last_day") < F.col("cut"), 1))
        .cast("long")
        .alias("train_only_users"),
        F.count(F.when(F.col("first_day") >= F.col("cut"), 1))
        .cast("long")
        .alias("valid_only_users"),
        F.count(F.when(straddle, 1)).cast("long").alias("straddling_users"),
        F.expr(
            "cast((count(case when first_day < cut and last_day >= cut then 1 end)"
            " * 1000000) div count(*) as bigint)"
        ).alias("straddle_ppm"),
    )


# ---------------------------------------------------------------------------
# Curriculum shard ordering — easy-to-hard training order (Bengio et al.
# 2009 curriculum learning), materialized the way a 100 TB ingestion
# pipeline needs it: a GLOBAL order by difficulty (here: descending
# distinct-token quality, doc_id tiebreak) chopped into rank-contiguous
# shards of CURRICULUM_SHARD docs. The global order is the distributed
# zip-with-index (operators/ranking.py), never a single-partition
# window; shard id and in-shard position are integer arithmetic on the
# rank, and the emitted per-shard summary (count, quality envelope,
# boundary docs) is what a training launcher validates before reading.
# Shard quality ranges must be non-overlapping by construction — the
# oracle proves it by recomputing the same boundaries from a global
# row_number.
# ---------------------------------------------------------------------------
CURRICULUM_SHARD = 64


@query(
    "curriculum_shard_order",
    f"""
    WITH q AS (
        SELECT doc_id,
               len(list_distinct(list_filter(string_split(lower(text), ' '),
                                             t -> t <> ''))) * 1000 AS q
        FROM documents
    ),
    r AS (
        SELECT doc_id, q,
               row_number() OVER (ORDER BY q DESC, doc_id) AS rk
        FROM q
    )
    SELECT CAST((rk - 1) // {CURRICULUM_SHARD} AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(q) AS BIGINT) AS q_first,
           CAST(min(q) AS BIGINT) AS q_last,
           CAST(min(doc_id) FILTER (WHERE rk = (SELECT min(rk) FROM r r2
                WHERE (r2.rk - 1) // {CURRICULUM_SHARD} =
                      (r.rk - 1) // {CURRICULUM_SHARD})) AS BIGINT)
             AS first_doc,
           CAST(min(doc_id) FILTER (WHERE rk = (SELECT max(rk) FROM r r2
                WHERE (r2.rk - 1) // {CURRICULUM_SHARD} =
                      (r.rk - 1) // {CURRICULUM_SHARD})) AS BIGINT)
             AS last_doc
    FROM r
    GROUP BY 1
    """,
)
def curriculum_shard_order(spark, sf_dir):
    from eventsourcing_spark.operators.ranking import global_rank

    from eventsourcing_spark.io import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    q = docs.select(
        "doc_id", (F.size(F.array_distinct(toks)) * 1000).alias("q")
    )
    ranked = global_rank(q, F.desc("q"), F.asc("doc_id"))
    sharded = ranked.withColumn(
        "shard_id", F.expr(f"(rk - 1) div {CURRICULUM_SHARD}").cast("long")
    )
    return sharded.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max("q").cast("long").alias("q_first"),
        F.min("q").cast("long").alias("q_last"),
        F.min_by("doc_id", "rk").cast("long").alias("first_doc"),
        F.max_by("doc_id", "rk").cast("long").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score how
# target-like each document is as the importance ratio between a
# target distribution (here: the 'en' slice, standing in for a
# high-quality seed corpus) and the raw corpus, over HASHED n-gram
# features — the hashing trick makes the feature space a fixed 64
# buckets, so both distributions are one tiny aggregate. The published
# method multiplies per-feature probability ratios (log-sum); this
# integer-exact form scores each document by the token-count-weighted
# MEAN of per-bucket milli-ratios
#     w[b] = (cnt_target[b] * total_source * 1000)
#            // (cnt_source[b] * total_target)
# (ratio > 1000 = bucket over-represented in the target), which
# preserves the selection ORDER the ratio ranking induces while every
# division is a truncating integer op both engines replay bit-exactly.
# Plan shape: tokens explode map-side; the bucket histogram is a
# 64-row aggregate broadcast back; per-doc scores are one doc-keyed
# exchange; the audit rolls up to |sources| rows. At 100 TB the
# bucket table stays 64 rows — only the doc-keyed shuffle scales, and
# cnt*total products ride DECIMAL(38)/HUGEINT before the final BIGINT
# cast.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 64


@query(
    "dsir_importance_resample",
    f"""
    WITH toks AS (
        SELECT doc_id, source, lang, t.tok AS tok
        FROM documents,
             LATERAL (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                                x -> x <> '')) AS tok) t
    ),
    tb AS (
        SELECT doc_id, source, lang,
               CAST(('0x' || substr(md5(tok), 1, 4))::INTEGER % {DSIR_BUCKETS}
                    AS BIGINT) AS b
        FROM toks
    ),
    bt AS (
        SELECT b, count(*) AS cs,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        FROM tb GROUP BY b
    ),
    tots AS (SELECT sum(cs) AS ts, sum(ct) AS tt FROM bt),
    wts AS (
        SELECT b, CAST((ct * ts * 1000) // (cs * tt) AS BIGINT) AS wmilli
        FROM bt, tots
    ),
    dc AS (
        SELECT doc_id, source, b, count(*) AS dc FROM tb GROUP BY doc_id, source, b
    ),
    ds AS (
        SELECT doc_id, source,
               CAST(sum(dc * wmilli) // sum(dc) AS BIGINT) AS score_milli
        FROM dc JOIN wts USING (b) GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score_milli >= 1000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           CAST(sum(score_milli) // count(*) AS BIGINT) AS avg_score_milli,
           CAST(min(score_milli) AS BIGINT) AS min_score_milli,
           CAST(max(score_milli) AS BIGINT) AS max_score_milli
    FROM ds GROUP BY source
    """,
)
def dsir_importance_resample(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("tok"),
    ).withColumn(
        "b",
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
        % DSIR_BUCKETS,
    )
    # Round 12 (scan-collapse): bt (via tots AND wts) and dc each
    # replanned the tokenize explode — 3 corpus scans, 3 explodes. One
    # explode feeds the (doc, source, lang, bucket) count matrix; the
    # scalar totals ts/tt come from a second NARROW pass
    # (size(filter(split)) sums, no explode) broadcast below the
    # aggregate. Round 13 (ADVICE r12 #2): the bucket marginals cs/ct
    # were partition-by-b WINDOW sums over the doc-grain dc frame — but
    # DSIR_BUCKETS = 64, so the window shuffled the corpus-sized frame
    # into at most 64 partitions, capping parallelism at 64 regardless
    # of cluster size. dc is materialized once (doc-grain linear state)
    # and the 64-row marginal frame is aggregated from it and
    # broadcast-joined back — the corpus-grain exchange keyed on the
    # 64-value bucket axis is gone.
    tots = docs.agg(
        F.sum(
            F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
        ).alias("ts"),
        F.sum(
            F.when(
                F.col("lang") == "en",
                F.size(
                    F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
                ),
            ).otherwise(0)
        ).alias("tt"),
    )
    dc = toks.groupBy("doc_id", "source", "lang", "b").agg(
        F.count("*").alias("dc")
    ).transform(materialize)
    bt = dc.groupBy("b").agg(
        F.sum("dc").alias("cs"),
        F.sum(
            F.when(F.col("lang") == "en", F.col("dc")).otherwise(0)
        ).alias("ct"),
    )
    doc_score = (
        dc.join(F.broadcast(bt), "b")
        .crossJoin(F.broadcast(tots))
        .withColumn("wmilli", F.expr("(ct * ts * 1000) div (cs * tt)"))
        .groupBy("doc_id", "source")
        .agg(F.expr("sum(dc * wmilli) div sum(dc)").alias("score_milli"))
    )
    return doc_score.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score_milli") >= 1000, 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
        F.expr("sum(score_milli) div count(*)").alias("avg_score_milli"),
        F.min("score_milli").cast("long").alias("min_score_milli"),
        F.max("score_milli").cast("long").alias("max_score_milli"),
    )


# ---------------------------------------------------------------------------
# UniMax mixture allocation (Chung et al. 2023, "UniMax: Fairer and
# More Effective Language Sampling for Large-Scale Multilingual
# Pretraining"): given a total token budget, allocate it across
# languages as UNIFORMLY as possible subject to a per-language repeat
# cap (here 1.3 epochs) — the published fix for temperature sampling's
# over-repetition of low-resource languages. This is exact integer
# waterfilling in closed form: sort languages by cap ascending; the
# first index i* where the remaining budget spread over the remaining
# languages fits under cap_{i*} splits the table — everything before
# i* is capped, everything after shares floor((B - prefix)/(N-i*+1)),
# with the division remainder handed to the first `rem` uncapped
# languages in sort order so Σ allocation == budget EXACTLY
# (conservation is part of the oracle contract). Plan shape: one
# |langs|-row aggregate; the ordering window is aggregate-fed on the
# bounded lang domain; everything downstream is arithmetic on that
# tiny frame. At 100 TB only the first aggregate touches the corpus.
# ---------------------------------------------------------------------------
UNIMAX_CAP_NUM, UNIMAX_CAP_DEN = 13, 10  # 1.3 epochs per language


@query(
    "unimax_mixture_allocation",
    f"""
    WITH per_lang AS (
        SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS budget, count(*) AS n_src FROM per_lang),
    src AS (
        SELECT p.*, t.budget, t.n_src,
               p.n_tokens * {UNIMAX_CAP_NUM} // {UNIMAX_CAP_DEN} AS cap
        FROM per_lang p, tot t
    ),
    idxd AS (
        SELECT *, row_number() OVER (ORDER BY cap, lang) AS idx,
               coalesce(sum(cap) OVER (ORDER BY cap, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS p_prev
        FROM src
    ),
    flags AS (
        SELECT *, (budget - p_prev) <= cap * (n_src - idx + 1) AS lvl_ok
        FROM idxd
    ),
    istar AS (
        SELECT min(idx) AS istar, min_by(p_prev, idx) AS p_star
        FROM flags WHERE lvl_ok
    )
    SELECT lang, n_tokens,
           CAST(cap AS BIGINT) AS cap_tokens,
           CAST(CASE WHEN istar IS NULL OR idx < istar THEN cap
                     ELSE (budget - p_star) // (n_src - istar + 1)
                          + CASE WHEN idx - istar <
                                     (budget - p_star) % (n_src - istar + 1)
                                 THEN 1 ELSE 0 END
                END AS BIGINT) AS alloc_tokens,
           CAST((1000000 * (CASE WHEN istar IS NULL OR idx < istar THEN cap
                     ELSE (budget - p_star) // (n_src - istar + 1)
                          + CASE WHEN idx - istar <
                                     (budget - p_star) % (n_src - istar + 1)
                                 THEN 1 ELSE 0 END END)) // n_tokens
                AS BIGINT) AS epochs_ppm
    FROM flags, istar
    """,
)
def unimax_mixture_allocation(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    # cap/idx/p_prev depend only on per-lang token counts, so the global
    # window sits DIRECTLY on the |langs|-row aggregate output (bounded
    # lang domain — the audit's aggregate-fed whitelist).
    # Round 12 (scan-collapse): tot and istar were separate consumers of
    # the per-lang chain (4 corpus scans for one token rollup). budget /
    # n_src / istar / p_star are all aggregates OVER the |langs|-row
    # frame, so they become empty-partition WINDOW functions chained on
    # the same lineage: 1 scan, 0 joins. min_by(p_prev, idx) over the
    # lvl_ok rows = min(struct(idx, p_prev)) since idx is unique.
    ranked = per_lang.withColumn(
        "cap", F.expr(f"n_tokens * {UNIMAX_CAP_NUM} div {UNIMAX_CAP_DEN}")
    )
    w = Window.orderBy("cap", "lang")
    ranked = ranked.withColumn("idx", F.row_number().over(w)).withColumn(
        "p_prev",
        F.coalesce(
            F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    w_all = Window.partitionBy()
    src = ranked.withColumn(
        "budget", F.sum("n_tokens").over(w_all)
    ).withColumn("n_src", F.count("*").over(w_all))
    src = src.withColumn(
        "lvl_ok",
        (F.col("budget") - F.col("p_prev"))
        <= F.col("cap") * (F.col("n_src") - F.col("idx") + 1),
    )
    star = F.min(
        F.when(F.col("lvl_ok"), F.struct(F.col("idx"), F.col("p_prev")))
    ).over(w_all)
    src = src.withColumn("istar", star["idx"]).withColumn(
        "p_star", star["p_prev"]
    )
    return (
        src.withColumn("theta", F.expr("(budget - p_star) div (n_src - istar + 1)"))
        .withColumn("rem", F.expr("(budget - p_star) % (n_src - istar + 1)"))
        .withColumn(
            "allocation",
            F.when(
                F.col("istar").isNull() | (F.col("idx") < F.col("istar")),
                F.col("cap"),
            ).otherwise(
                F.col("theta")
                + F.when(
                    F.col("idx") - F.col("istar") < F.col("rem"), 1
                ).otherwise(0)
            ),
        )
        .select(
            "lang",
            "n_tokens",
            F.col("cap").cast("long").alias("cap_tokens"),
            F.col("allocation").cast("long").alias("alloc_tokens"),
            F.expr("(1000000 * allocation) div n_tokens").alias("epochs_ppm"),
        )
    )
