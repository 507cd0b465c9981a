"""Dataset curation operators: splits, sampling, decontamination, packing.

The four steps every large-scale training-data pipeline runs between
"deduped corpus" and "training shards", each expressed so the
distributed shape is right at 100 TB:

* **split assignment** — pure per-row map over a content-stable hash
  (md5 of the document key): no shuffle, no global state, and the
  assignment is reproducible across runs and engines;
* **stratified sampling** — per-stratum keep-rates applied with the
  same hash-threshold trick: a narrow filter that pushes below any
  downstream shuffle, with deterministic output (unlike
  ``df.sample``, which depends on partitioning);
* **decontamination** — eval↔train n-gram overlap via an equi-join on
  the shingle string: shuffle keyed on the n-gram, so each gram's
  candidate set is co-located; counts roll up per eval doc;
* **sequence packing** — greedy sequential fill of fixed token-budget
  bins *within a shard* (``source``): the running token count is a
  window partitioned by source, never a global cumsum, so packing
  parallelizes across shards exactly like the write path that follows.

Determinism contract (shared with pipeline.queries): md5 hex-string
comparisons and exact integer arithmetic only — no engine-variant RNG,
no float thresholds. Reference parity: none of this exists in
quintans/eventsourcing (no relational surface, SURVEY §2.7); these are
engine additions from the task brief.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

# Hex-prefix thresholds on md5(doc_id): first byte < 0x08 → ~3.1% test,
# < 0x10 → next ~3.1% valid, rest train.
TEST_HEX = "08"
VALID_HEX = "10"

# Per-language keep-rate thresholds (first byte of md5): en keeps ~50%,
# every other language keeps ~25% — i.e. downsample the dominant stratum
# less aggressively than the tail, the usual rebalancing direction.
EN_KEEP_HEX = "80"
OTHER_KEEP_HEX = "40"

CONTAM_N = 5  # n-gram width for eval↔train overlap
PACK_BUDGET = 256  # tokens per packed training sequence


def _doc_hash(col):
    return F.md5(col.cast("string"))


# ---------------------------------------------------------------------------
# Deterministic train/valid/test split assignment.
# ---------------------------------------------------------------------------
@query(
    "split_assign",
    f"""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TEST_HEX}'
                THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VALID_HEX}'
                THEN 'valid'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def split_assign(spark, sf_dir):
    """Hash-based split: a narrow per-row projection (no shuffle, no
    sort). The hash keys on the stable document ID, so re-runs — and
    re-shards — never move a document across the split boundary; at
    100 TB this is a map-only job that fuses into whatever reads it."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(_doc_hash(F.col("doc_id")), 1, 2)
    return docs.select(
        "doc_id",
        "lang",
        F.when(prefix < TEST_HEX, F.lit("test"))
        .when(prefix < VALID_HEX, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling by language.
# ---------------------------------------------------------------------------
@query(
    "stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '{EN_KEEP_HEX}'
                 ELSE '{OTHER_KEEP_HEX}' END
    """,
)
def stratified_sample(spark, sf_dir):
    """Per-stratum hash-threshold sampling. Unlike ``df.sample`` the
    decision is a pure function of (doc_id, lang), so the sample is
    identical across runs, partitionings, and engines. The filter sits
    in the scan's own codegen stage (map-only, zero shuffles) — it
    can't be a parquet pushed filter (md5 is computed), but nothing
    downstream ever sees a dropped row."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(_doc_hash(F.col("doc_id")), 1, 2)
    thr = F.when(F.col("lang") == "en", F.lit(EN_KEEP_HEX)).otherwise(
        F.lit(OTHER_KEEP_HEX)
    )
    return docs.filter(prefix < thr).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Decontamination: token n-gram overlap between the eval slice and the
# training corpus. Candidates meet only through the shingle equi-join.
# ---------------------------------------------------------------------------
@query(
    "contamination_overlap",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                 list_transform(range(1, len(t) - {CONTAM_N} + 2),
                   i -> array_to_string(
                          list_slice(t, CAST(i AS INTEGER),
                                     CAST(i + {CONTAM_N} - 1 AS INTEGER)),
                          ' ')))) AS gram
        FROM toks
        WHERE len(t) >= {CONTAM_N}
    ),
    ev AS (SELECT doc_id AS eval_id, gram FROM sh WHERE doc_id < 10),
    tr AS (SELECT doc_id AS train_id, gram FROM sh WHERE doc_id >= 10)
    SELECT ev.eval_id,
           count(DISTINCT ev.gram) AS n_contaminated_grams,
           count(DISTINCT tr.train_id) AS n_train_docs
    FROM ev JOIN tr ON ev.gram = tr.gram
    GROUP BY ev.eval_id
    """,
)
def contamination_overlap(spark, sf_dir):
    """Eval-set decontamination scan: shingle both sides, equi-join on
    the {CONTAM_N}-gram string, roll up hits per eval document. The
    eval side is BOUNDED BY CONSTRUCTION (the eval set, not the
    corpus), so it is declared broadcast explicitly — found at the
    round-11 100× stress: leaving the choice to size ESTIMATION let
    the planner pick the 500k-doc train side of the exploded gram
    frame as the build table (Generate nodes propagate poor size
    stats) and the driver died building a ~100M-row broadcast.
    Declaring the structurally-small side is the scale-correct plan at
    every corpus size. Distinct-per-doc grams keep the explode bounded
    by document length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.lower("text"), " ").alias("t"))
    grams = (
        toks.filter(F.size("t") >= CONTAM_N)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - CONTAM_N + 1),
                        lambda i: F.array_join(F.slice("t", i, CONTAM_N), " "),
                    )
                )
            ).alias("gram"),
        )
    )
    ev = grams.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("eval_id"), "gram"
    )
    tr = grams.filter(F.col("doc_id") >= 10).select(
        F.col("doc_id").alias("train_id"), "gram"
    )
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("eval_id")
        .agg(
            F.count_distinct("gram").alias("n_contaminated_grams"),
            F.count_distinct("train_id").alias("n_train_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: greedy sequential fill of fixed token budgets,
# parallel across shards (source = the shard key).
# ---------------------------------------------------------------------------
@query(
    "pack_sequences",
    f"""
    WITH t AS (
        SELECT source, doc_id,
               len(string_split(lower(text), ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, doc_id, n_tok,
           CAST((cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS seq_id
    FROM c
    """,
)
def pack_sequences(spark, sf_dir):
    """Document→sequence packing: running token count per shard
    (window partitioned by ``source``, ordered by doc_id), bin index =
    floor(tokens-before / budget). Documents may straddle a boundary —
    the split-on-write convention — so no bin sits idle. Partitioning
    the window by the shard key is the scale decision: a global cumsum
    would serialize 100 TB through one partition, while per-shard
    packing is exactly as parallel as the shard layout itself."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "source",
        "doc_id",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_BUDGET)
        .cast("long")
        .alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule battery (Rae et al. 2021 §A1.1): per-document
# filters computed in integer cross-multiplied form so no float threshold
# can flip between engines.
# ---------------------------------------------------------------------------
STOPWORDS = ["the", "a", "of", "to", "and"]
MIN_TOKENS = 50
MEAN_LEN_LO = 3  # flag if mean word length < 3 or > 10
MEAN_LEN_HI = 10
STOP_FRAC_PCT = 6  # flag if stopword fraction < 6%
REP_FRAC_NUM, REP_FRAC_DEN = 3, 10  # flag if duplicate-token fraction > 3/10


@query(
    "gopher_quality_flags",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_tok,
               len(list_distinct(toks)) AS n_uniq,
               list_aggregate(list_transform(toks, x -> len(x)), 'sum')
                   AS sum_len,
               len(list_filter(toks,
                   x -> list_contains({STOPWORDS!r}, x))) AS n_stop
        FROM t
    )
    SELECT doc_id, n_tok, n_uniq, CAST(sum_len AS BIGINT) AS sum_len, n_stop,
           CAST(n_tok < {MIN_TOKENS} AS BIGINT) AS flag_short,
           CAST({MEAN_LEN_LO} * n_tok > sum_len
                OR sum_len > {MEAN_LEN_HI} * n_tok AS BIGINT)
               AS flag_word_len,
           CAST(100 * n_stop < {STOP_FRAC_PCT} * n_tok AS BIGINT)
               AS flag_stopword,
           CAST({REP_FRAC_DEN} * (n_tok - n_uniq) > {REP_FRAC_NUM} * n_tok
                AS BIGINT) AS flag_repetition
    FROM m
    """,
)
def gopher_quality_flags(spark, sf_dir):
    """Quality-filter rule battery: min length, mean-word-length band,
    stopword floor, duplicate-token ceiling. Entirely higher-order
    functions over one projection — a map-only stage that fuses into
    the scan, so at 100 TB it costs one pass and the flags land next
    to the document for the downstream filter to push against. Every
    threshold compares in integer cross-multiplied form (e.g. dup
    fraction > 0.3 ⟺ 10·(n_tok−n_uniq) > 3·n_tok)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    t = docs.select("doc_id", toks.alias("toks"))
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    m = t.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(
            F.filter("toks", lambda x: F.array_contains(stop_lit, x))
        ).alias("n_stop"),
    )
    flag = lambda c: c.cast("boolean").cast("long")  # noqa: E731
    return m.select(
        "doc_id",
        "n_tok",
        "n_uniq",
        "sum_len",
        "n_stop",
        flag(F.col("n_tok") < MIN_TOKENS).alias("flag_short"),
        flag(
            (F.lit(MEAN_LEN_LO) * F.col("n_tok") > F.col("sum_len"))
            | (F.col("sum_len") > F.lit(MEAN_LEN_HI) * F.col("n_tok"))
        ).alias("flag_word_len"),
        flag(
            F.lit(100) * F.col("n_stop") < F.lit(STOP_FRAC_PCT) * F.col("n_tok")
        ).alias("flag_stopword"),
        flag(
            F.lit(REP_FRAC_DEN) * (F.col("n_tok") - F.col("n_uniq"))
            > F.lit(REP_FRAC_NUM) * F.col("n_tok")
        ).alias("flag_repetition"),
    )


# ---------------------------------------------------------------------------
# The composed pipeline: dedup → quality filter → split → pack, one job.
# ---------------------------------------------------------------------------
def curate(docs, pack_budget: int = PACK_BUDGET):
    """End-to-end curation as ONE declarative DataFrame job.

    Stages — exact dedup (min-doc_id keeper per content hash), Gopher
    quality gate (drop too-short and stopword-poor docs), hash split
    (train slice only), per-shard sequence packing — compose into a
    single logical plan, so Catalyst sees the whole pipeline at once:
    the quality filter and split predicate run map-side *before* the
    dedup shuffle's exchange writes, column pruning reaches the scan,
    and the only wide operations are the dedup groupBy and the packing
    window, both keyed (content hash, shard) — nothing global. That
    single-plan property is the point at 100 TB: four chained jobs
    would materialize three intermediate corpora; this materializes
    none. Returns one row per packed training sequence."""
    toks = F.split(F.lower("text"), " ")
    m = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("text_hash"),
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda x: F.array_contains(
            F.array(*[F.lit(s) for s in STOPWORDS]), x))).alias("n_stop"),
    )
    w_keep = Window.partitionBy("text_hash")
    deduped = (
        m.withColumn("keeper_id", F.min("doc_id").over(w_keep))
        .filter(F.col("doc_id") == F.col("keeper_id"))
        .drop("keeper_id", "text_hash")
    )
    quality = deduped.filter(
        (F.col("n_tok") >= MIN_TOKENS)
        & (F.lit(100) * F.col("n_stop") >= F.lit(STOP_FRAC_PCT) * F.col("n_tok"))
    )
    prefix = F.substring(_doc_hash(F.col("doc_id")), 1, 2)
    train = quality.filter(prefix >= VALID_HEX)
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = train.select(
        "source",
        "doc_id",
        "n_tok",
        F.floor((F.sum("n_tok").over(w_pack) - F.col("n_tok")) / pack_budget)
        .cast("long")
        .alias("seq_id"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("seq_tokens"),
    )


@query(
    "curation_pipeline",
    f"""
    WITH m AS (
        SELECT doc_id, source, md5(text) AS text_hash,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_filter(string_split(lower(text), ' '),
                   x -> list_contains({STOPWORDS!r}, x))) AS n_stop
        FROM documents
    ),
    dedup AS (
        SELECT doc_id, source, n_tok, n_stop FROM (
            SELECT m.*, min(doc_id) OVER (PARTITION BY text_hash) AS keeper
            FROM m
        ) WHERE doc_id = keeper
    ),
    quality AS (
        SELECT * FROM dedup
        WHERE n_tok >= {MIN_TOKENS} AND 100 * n_stop >= {STOP_FRAC_PCT} * n_tok
    ),
    train AS (
        SELECT * FROM quality
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{VALID_HEX}'
    ),
    packed AS (
        SELECT source, doc_id, n_tok,
               (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok)
                   // {PACK_BUDGET} AS seq_id
        FROM train
    )
    SELECT source, CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS seq_tokens
    FROM packed
    GROUP BY source, seq_id
    """,
)
def curation_pipeline(spark, sf_dir):
    """Gate wrapper for :func:`curate` — see its docstring."""
    return curate(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Split-stratification audit — does the hash split (split_assign) stay
# unbiased WITHIN every language? Per (split, lang): observed count,
# the language's total, observed share vs the split's global share,
# and the absolute bias in ppm. A hash keyed on doc_id is independent
# of lang by construction; this query is the standing check that the
# property holds on the actual corpus (and would catch a correlated id
# scheme immediately). Two tiny rollups over the map-only split.
# ---------------------------------------------------------------------------


@query(
    "split_stratification_audit",
    f"""
    WITH s AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TEST_HEX}'
                    THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VALID_HEX}'
                    THEN 'valid'
                    ELSE 'train' END AS split
        FROM documents
    ),
    cell AS (SELECT split, lang, count(*) AS n FROM s GROUP BY split, lang),
    lg AS (SELECT lang, sum(n) AS n_lang FROM cell GROUP BY lang),
    sp AS (SELECT split, sum(n) AS n_split FROM cell GROUP BY split),
    tot AS (SELECT sum(n) AS n_total FROM cell)
    SELECT c.split, c.lang,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // lg.n_lang AS BIGINT) AS share_in_lang_ppm,
           CAST(sp.n_split * 1000000 // tot.n_total AS BIGINT)
             AS split_global_ppm,
           CAST(abs(c.n * 1000000 // lg.n_lang
                    - sp.n_split * 1000000 // tot.n_total) AS BIGINT)
             AS bias_ppm
    FROM cell c
    JOIN lg ON lg.lang = c.lang
    JOIN sp ON sp.split = c.split
    CROSS JOIN tot
    """,
)
def split_stratification_audit(spark, sf_dir):
    # Round 12 (scan-collapse): cell fed lg/sp/tot plus the join base —
    # 4 corpus scans (each re-running the md5 split hash). Marginals
    # and total are re-aggregations of the (split, lang) cube: WINDOW
    # sums over one cube chain — 1 scan, 0 joins, cube-grain rows only
    # (3 splits x langs) through the empty-partition window.
    from pyspark.sql import Window

    s = split_assign(spark, sf_dir)
    cell = s.groupBy("split", "lang").agg(F.count("*").alias("n"))
    return (
        cell.select(
            "split",
            "lang",
            "n",
            F.sum("n").over(Window.partitionBy("lang")).alias("n_lang"),
            F.sum("n").over(Window.partitionBy("split")).alias("n_split"),
            F.sum("n").over(Window.partitionBy()).alias("n_total"),
        )
        .select(
            "split",
            "lang",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 div n_lang")
            .cast("long")
            .alias("share_in_lang_ppm"),
            F.expr("n_split * 1000000 div n_total")
            .cast("long")
            .alias("split_global_ppm"),
            F.abs(
                F.expr("n * 1000000 div n_lang")
                - F.expr("n_split * 1000000 div n_total")
            )
            .cast("long")
            .alias("bias_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Contamination sensitivity sweep — the n-gram-length dial of the
# decontamination scan: the same eval↔train overlap at n ∈ {3, 5, 8}.
# Short n-grams over-flag (common phrases), long ones under-flag
# (miss paraphrase-level leaks); the sweep emits the corpus-measured
# curve (eval docs flagged + total hit grams per n) so the
# decontamination policy picks n from evidence. One shingle pass per n
# (each its own gram-keyed equi-join); eval slice = doc_id < 10 as in
# contamination_overlap.
# ---------------------------------------------------------------------------

CONTAM_SWEEP_NS = [3, 5, 8]


def _contam_sweep_sql(n: int) -> str:
    return f"""
    sh_{n} AS (
        SELECT doc_id,
               unnest(list_distinct(
                 list_transform(range(1, len(t) - {n} + 2),
                   i -> array_to_string(
                          list_slice(t, CAST(i AS INTEGER),
                                     CAST(i + {n} - 1 AS INTEGER)),
                          ' ')))) AS gram
        FROM toks WHERE len(t) >= {n}
    ),
    hit_{n} AS (
        SELECT a.doc_id AS eval_id, a.gram
        FROM sh_{n} a JOIN sh_{n} b ON a.gram = b.gram
        WHERE a.doc_id < 10 AND b.doc_id >= 10
    ),
    m_{n} AS (
        SELECT {n} AS n,
               (SELECT count(DISTINCT eval_id) FROM hit_{n})
                 AS n_eval_flagged,
               (SELECT count(DISTINCT gram) FROM hit_{n})
                 AS n_distinct_hit_grams
    )"""


@query(
    "contamination_ngram_sweep",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    {", ".join(_contam_sweep_sql(n).lstrip() for n in CONTAM_SWEEP_NS)}
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_eval_flagged AS BIGINT) AS n_eval_flagged,
           CAST(n_distinct_hit_grams AS BIGINT) AS n_distinct_hit_grams
    FROM ({" UNION ALL ".join(f"SELECT * FROM m_{n}" for n in CONTAM_SWEEP_NS)})
    """,
)
def contamination_ngram_sweep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).transform(materialize)
    def _grams(n: int):
        # factory, not a default-arg lambda: transform() calls a
        # two-parameter lambda as (element, index), shadowing n
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - n + 1),
                lambda i: F.array_join(F.slice("t", i, n), " "),
            )
        )

    out = []
    for n in CONTAM_SWEEP_NS:
        grams = (
            toks.filter(F.size("t") >= n)
            .select("doc_id", F.explode(_grams(n)).alias("gram"))
        )
        ev = grams.filter(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("eval_id"), "gram"
        )
        tr = grams.filter(F.col("doc_id") >= 10).select("gram")
        # same found-at-100x rule as contamination_overlap: the eval
        # slice is bounded by construction — declare the broadcast
        # rather than trust Generate-node size estimates
        hits = (
            tr.join(F.broadcast(ev), "gram")
            .select("eval_id", "gram")
            .distinct()
        )
        row = hits.agg(
            F.count_distinct("eval_id").alias("f"),
            F.count_distinct("gram").alias("g"),
        ).collect()[0]
        out.append((n, row["f"], row["g"]))
    return spark.createDataFrame(
        out, "n long, n_eval_flagged long, n_distinct_hit_grams long"
    )


# ---------------------------------------------------------------------------
# Packing utilization audit — the accounting readout of pack_sequences:
# per shard, sequences minted (ceil of tokens/budget — straddling fills
# every bin), utilization of the allocated token slots, and docs per
# sequence. The number a training-ingest owner watches per shard; all
# integer ceil/floor arithmetic.
# ---------------------------------------------------------------------------


@query(
    "pack_utilization_audit",
    f"""
    WITH t AS (
        SELECT source, count(*) AS n_docs,
               sum(len(string_split(lower(text), ' '))) AS total_tokens
        FROM documents GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST((total_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET}
                AS BIGINT) AS n_seqs,
           CAST(total_tokens * 1000000
                // (((total_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                    * {PACK_BUDGET}) AS BIGINT) AS util_ppm,
           CAST(n_docs * 100
                // ((total_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                AS BIGINT) AS docs_per_seq_x100
    FROM t
    """,
)
def pack_utilization_audit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("total_tokens"),
    )
    n_seqs = F.expr(
        f"(total_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET}"
    )
    return t.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        n_seqs.cast("long").alias("n_seqs"),
        F.expr(
            f"total_tokens * 1000000 div"
            f" (((total_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET})"
            f" * {PACK_BUDGET})"
        )
        .cast("long")
        .alias("util_ppm"),
        F.expr(
            f"n_docs * 100 div"
            f" ((total_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET})"
        )
        .cast("long")
        .alias("docs_per_seq_x100"),
    )


# ---------------------------------------------------------------------------
# Cross-source overlap matrix — the corpus-composition audit run before
# mixing sources into one training set: for every source pair, how many
# distinct 5-grams do they share, and what Jaccard fraction of their
# combined gram vocabularies is common? High overlap between two crawls
# means their mixing weights double-count the same text. Distributed
# shape: distinct (source, gram) pairs shuffle ONCE keyed on the gram;
# each gram's source list is bounded by |sources| (a handful), so the
# within-gram pair explode is O(|sources|²) per key — never corpus-
# quadratic — and the per-source gram-vocabulary sizes arrive via a
# broadcast |sources|-row frame. Same gram definition as
# contamination_overlap.
# ---------------------------------------------------------------------------
@query(
    "source_overlap_matrix",
    f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    sg AS (
        SELECT DISTINCT source,
               unnest(list_distinct(
                 list_transform(range(1, len(t) - {CONTAM_N} + 2),
                   i -> array_to_string(
                          list_slice(t, CAST(i AS INTEGER),
                                     CAST(i + {CONTAM_N} - 1 AS INTEGER)),
                          ' ')))) AS gram
        FROM toks
        WHERE len(t) >= {CONTAM_N}
    ),
    vocab AS (SELECT source, count(*) AS n_grams FROM sg GROUP BY source),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS shared_grams
        FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b,
           CAST(s.shared_grams AS BIGINT) AS shared_grams,
           CAST(va.n_grams AS BIGINT) AS grams_a,
           CAST(vb.n_grams AS BIGINT) AS grams_b,
           CAST((s.shared_grams * 1000000)
                // (va.n_grams + vb.n_grams - s.shared_grams) AS BIGINT)
             AS jaccard_ppm
    FROM shared s
    JOIN vocab va ON va.source = s.source_a
    JOIN vocab vb ON vb.source = s.source_b
    """,
)
def source_overlap_matrix(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("source", F.split(F.lower("text"), " ").alias("t"))
    sg = (
        toks.filter(F.size("t") >= CONTAM_N)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - CONTAM_N + 1),
                        lambda i: F.array_join(F.slice("t", i, CONTAM_N), " "),
                    )
                )
            ).alias("gram"),
        )
        .distinct()
    )
    # Round 12 (scan-collapse + join-elimination): sg fed the vocab
    # rollup and BOTH sides of a gram-keyed self-join — 4 corpus scans,
    # 3 tokenize+shingle explodes, and a shuffle of every (source,
    # gram) row against itself (quadratic per hot gram). Rewritten to
    # the source-bitmask form source_vocab_jaccard already pins: one
    # pass folds sg into per-gram source masks, the mask histogram mg
    # (<= 2^|sources| rows) is the ONLY thing kept, and shared/vocab
    # counts for every pair read off mg with bit tests — shared(a,b) =
    # sum cnt over masks with both bits, n_grams(a) = sum cnt over
    # masks with bit a (sg is distinct, so per-source row counts ARE
    # distinct-gram counts). The inner joins' "pair appears iff it
    # shares a gram" becomes shared_grams > 0. 1 shingle pass + 1
    # narrow source scan; no gram self-join at any scale.
    from pyspark.sql import Window

    srcs = (
        docs.select("source")
        .distinct()
        .withColumn(
            "sid",
            (F.row_number().over(Window.orderBy("source")) - 1).cast("long"),
        )
        # Hard bound (VERDICT r12 #5): shiftleft(1L, sid) silently WRAPS
        # for a 65th source — fail loudly at materialization time
        # instead of returning wrong overlap counts.
        .withColumn(
            "sid",
            F.expr(
                "CASE WHEN sid < 64 THEN sid ELSE raise_error("
                "'source_overlap_matrix: more than 64 distinct sources"
                " — the 64-bit source bitmask would overflow') END"
            ),
        )
        .transform(materialize)
    )
    masks = (
        sg.join(F.broadcast(srcs), "source")
        .groupBy("gram")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), sid))").alias("m"))
    )
    mg = masks.groupBy("m").agg(F.count("*").cast("long").alias("cnt"))
    # Both cross-shapes are over strictly bounded frames: srcs and
    # pairs are <= 64 and <= 64*63/2 rows at ANY corpus size (the
    # 64-bit mask design caps |sources|). Broadcasting the bounded
    # side turns the single-partition CartesianProduct into a
    # BroadcastNestedLoopJoin that streams mg in place.
    pairs = (
        srcs.alias("a")
        .join(F.broadcast(srcs.alias("b")), F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("a.sid").alias("ai"),
            F.col("b.source").alias("source_b"),
            F.col("b.sid").alias("bi"),
        )
    )
    hit_a = F.expr("(m >> ai) % 2") == 1
    hit_b = F.expr("(m >> bi) % 2") == 1
    return (
        mg.crossJoin(F.broadcast(pairs))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.when(hit_a & hit_b, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("shared_grams"),
            F.sum(F.when(hit_a, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("grams_a"),
            F.sum(F.when(hit_b, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("grams_b"),
        )
        .filter(F.col("shared_grams") > 0)
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.expr(
                "cast((shared_grams * 1000000)"
                " div (grams_a + grams_b - shared_grams) as bigint)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010, "Rapid Automatic Keyword
# Extraction") — the unsupervised keyphrase stage of a curation
# pipeline: candidate phrases are the maximal runs of non-stopwords
# (document text split AT stopwords), a word scores degree/frequency
# (degree = summed length of every phrase it appears in — co-occurrence
# favors words that live in long multi-word phrases), and a phrase
# scores the sum of its members' word scores.
#
# Phrase segmentation is gaps-and-islands over token positions: flag
# stopwords, island id = running count of stop flags within the doc
# (per-DOC partitioned window — never global), phrase = the
# position-ordered token list of each island (sort_array over collected
# (pos, w) structs / list(... ORDER BY pos) — both engines order
# explicitly, no collection-order luck). Scores are integer milli
# (1000·degree // freq summed per phrase). Plan shape: one posexplode,
# one doc-partitioned window, keyed phrase/word aggregates, a w-keyed
# score join, TakeOrdered top-k. Degree/freq tables are vocab-sized.
# ---------------------------------------------------------------------------
RAKE_TOP = 30


@query(
    "rake_keyword_phrases",
    f"""
    WITH toks AS (
        SELECT doc_id, i AS pos, w,
               CASE WHEN list_contains({STOPWORDS!r}, w)
                    THEN 1 ELSE 0 END AS is_stop
        FROM (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS w,
                   unnest(generate_series(1,
                       len(string_split(lower(text), ' ')))) AS i
            FROM documents
        )
    ),
    isl AS (
        -- island BEFORE the stopword filter (WHERE runs before window
        -- functions, which would collapse every doc into one phrase)
        SELECT doc_id, pos, w, island FROM (
            SELECT doc_id, pos, w, is_stop,
                   sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS island
            FROM toks
        ) WHERE is_stop = 0 AND w <> ''
    ),
    phrases AS MATERIALIZED (
        SELECT doc_id, island,
               array_to_string(list(w ORDER BY pos), ' ') AS phrase,
               list(w ORDER BY pos) AS members,
               count(*) AS plen
        FROM isl GROUP BY doc_id, island
    ),
    wstat AS MATERIALIZED (
        SELECT w, count(*) AS freq, sum(plen) AS degree
        FROM (SELECT unnest(members) AS w, plen FROM phrases)
        GROUP BY w
    ),
    dphrase AS (
        -- one row per distinct phrase TEXT (members/plen are functions
        -- of the text): the RAKE score is per phrase, not per instance
        SELECT DISTINCT phrase, members, plen FROM phrases
    ),
    pscore AS (
        SELECT p.phrase, p.plen,
               sum((1000 * ws.degree) // ws.freq) AS score_milli
        FROM (SELECT phrase, plen, unnest(members) AS w FROM dphrase) p
        JOIN wstat ws USING (w)
        GROUP BY p.phrase, p.plen
    ),
    pocc AS (
        SELECT phrase, count(*) AS n_occurrences FROM phrases GROUP BY phrase
    )
    SELECT s.phrase,
           CAST(s.plen AS BIGINT) AS n_words,
           CAST(o.n_occurrences AS BIGINT) AS n_occurrences,
           CAST(s.score_milli AS BIGINT) AS score_milli
    FROM pscore s
    JOIN pocc o USING (phrase)
    ORDER BY s.score_milli DESC, s.phrase
    LIMIT {RAKE_TOP}
    """,
)
def rake_keyword_phrases(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "w"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "w",
        F.when(F.array_contains(stop_lit, F.col("w")), 1)
        .otherwise(0)
        .alias("is_stop"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        toks.withColumn("island", F.sum("is_stop").over(w_doc))
        .filter((F.col("is_stop") == 0) & (F.col("w") != ""))
    )
    phrases = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("pw"),
            F.count("*").alias("plen"),
        )
        .select(
            "doc_id",
            "island",
            F.expr("transform(pw, x -> x.w)").alias("members"),
            F.expr("array_join(transform(pw, x -> x.w), ' ')").alias("phrase"),
            "plen",
        )
        .transform(materialize)  # read by wstat, pscore, and pocc
    )
    wstat = (
        phrases.select(F.explode("members").alias("w"), "plen")
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
    )
    dphrase = phrases.select("phrase", "members", "plen").dropDuplicates(
        ["phrase"]
    )
    pscore = (
        dphrase.select("phrase", "plen", F.explode("members").alias("w"))
        # wstat is vocab-grain (Heaps-growing): pin merge, never
        # estimator-broadcast (round-13 audit, chi2 class)
        .join(wstat.hint("merge"), "w")
        .groupBy("phrase", "plen")
        .agg(F.expr("sum((1000 * degree) div freq)").alias("score_milli"))
    )
    pocc = phrases.groupBy("phrase").agg(F.count("*").alias("n_occurrences"))
    return (
        pscore.join(pocc, "phrase")
        .select(
            "phrase",
            F.col("plen").cast("long").alias("n_words"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("score_milli").cast("long").alias("score_milli"),
        )
        .orderBy(F.desc("score_milli"), "phrase")
        .limit(RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# Near-duplicate leakage across the train/valid/test boundary — the
# eval-contamination audit a split pipeline runs before training:
# a test document that is a NEAR-copy of a training document inflates
# eval scores even though exact-hash dedup sees nothing. Near is the
# MinHash band relation (pipeline.queries._bands — the same family all
# dedup operators use, so "near" means the same thing everywhere).
#
# Shape: splits are a map-side hash of doc_id (split_assign's rule);
# per band bucket a bit_or of the splits present (one keyed agg); per
# document a bit_or of its buckets' masks minus its own split — i.e.
# WHICH other splits this document leaks into. No self-join: a
# mega-family bucket costs two aggregation rows, not O(k²) pairs
# (the round-7 "existence beats enumeration" rule).
# ---------------------------------------------------------------------------
def _split_leak_sql() -> str:
    from eventsourcing_spark.pipeline.queries import _BANDS_SQL

    return _BANDS_SQL + f"""
    , s AS (
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{TEST_HEX}' THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{VALID_HEX}' THEN 'valid'
                    ELSE 'train' END AS split,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{TEST_HEX}' THEN 4
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{VALID_HEX}' THEN 2
                    ELSE 1 END AS m
        FROM documents
    ),
    sb AS (
        SELECT b.doc_id, b.band_id, b.band_key, s.split, s.m
        FROM bands b JOIN s ON s.doc_id = b.doc_id
    ),
    bm AS (
        SELECT band_id, band_key, bit_or(m) AS bmask
        FROM sb GROUP BY band_id, band_key
    ),
    dl AS (
        SELECT sb.doc_id, any_value(sb.split) AS split,
               bit_or(bm.bmask) & ~any_value(sb.m) AS leaks_into
        FROM sb JOIN bm ON bm.band_id = sb.band_id
             AND bm.band_key = sb.band_key
        GROUP BY sb.doc_id
    )
    SELECT split, CAST(leaks_into AS BIGINT) AS leaks_into_mask,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM dl GROUP BY split, leaks_into
    ORDER BY split, leaks_into_mask
    """


@query("split_neardup_leakage", _split_leak_sql())
def split_neardup_leakage(spark, sf_dir):
    """Per (split, leaked-into mask) document counts: mask bits
    train=1, valid=2, test=4; leaks_into_mask = the OTHER splits this
    document shares a MinHash band with (0 = clean). The audit a
    training pipeline gates on: any test-row with train bit set is
    eval contamination exact dedup cannot see."""
    from eventsourcing_spark.io import ensure_parallelism
    from eventsourcing_spark.pipeline.queries import _bands

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    prefix = F.substring(_doc_hash(F.col("doc_id")), 1, 2)
    s = docs.select(
        "doc_id",
        F.when(prefix < TEST_HEX, F.lit("test"))
        .when(prefix < VALID_HEX, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
        F.when(prefix < TEST_HEX, F.lit(4))
        .when(prefix < VALID_HEX, F.lit(2))
        .otherwise(F.lit(1))
        .alias("m"),
    )
    # Round 12: bm and the leak rollup both read the banded+split frame
    # — materialize it once (doc x band grain, the LSH index state)
    # instead of re-running the minhash banding per branch.
    sb = _bands(docs).join(s, "doc_id").transform(materialize)
    bm = sb.groupBy("band_id", "band_key").agg(
        F.expr("bit_or(m)").alias("bmask")
    )
    dl = (
        sb.join(bm, ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.any_value("split").alias("split"),
            F.expr("bit_or(bmask) & ~any_value(m)").alias("leaks_into"),
        )
    )
    return (
        dl.groupBy("split", F.col("leaks_into").cast("long").alias(
            "leaks_into_mask"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("split", "leaks_into_mask")
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit between the document corpus and its
# embedding table — the "does every doc have a vector, and whose
# vectors are orphans" check a feature-store sync runs after every
# backfill. Per source: docs with/without a vector (LEFT SEMI/ANTI
# against vec_id — existence probes, no row multiplication even if the
# embedding table carried duplicate ids); one extra ALL-row carries the
# reverse direction (vectors with no document), which has no per-source
# attribution. Shape: two broadcast-or-shuffle semi-joins on the id key
# and one keyed aggregation.
# ---------------------------------------------------------------------------
@query(
    "doc_embedding_coverage",
    """
    WITH cov AS (
        SELECT d.source,
               CASE WHEN EXISTS (SELECT 1 FROM embeddings e
                                 WHERE e.vec_id = d.doc_id)
                    THEN 1 ELSE 0 END AS has_vec
        FROM documents d
    ),
    per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(has_vec) AS BIGINT) AS n_with_vec,
               CAST(count(*) - sum(has_vec) AS BIGINT) AS n_without_vec
        FROM cov GROUP BY source
    ),
    orphans AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM embeddings e
        WHERE NOT EXISTS (SELECT 1 FROM documents d
                          WHERE d.doc_id = e.vec_id)
    )
    SELECT source, n_docs, n_with_vec, n_without_vec FROM per
    UNION ALL
    SELECT '__orphan_vectors__', o.n, CAST(0 AS BIGINT), o.n FROM orphans o
    ORDER BY source
    """,
)
def doc_embedding_coverage(spark, sf_dir):
    # Round 12 (scan-collapse): the semi-join, the per-source base and
    # the anti-join scanned documents 3x and embeddings 2x. ONE full
    # outer join of documents against the (vec_id, count) rollup of
    # embeddings carries every fact both directions need: a doc row's
    # vector-existence flag, and orphan embedding ROWS (cnt preserves
    # duplicate ids, which the anti-join counted individually) grouped
    # under the synthetic source. A zero literal row keeps the orphan
    # group present when every vector has a document (the old
    # aggregate emitted n=0 unconditionally).
    spark_ = spark
    docs = load_table(spark, sf_dir, "documents")
    embc = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("vec_id")
        .agg(F.count("*").alias("cnt"))
    )
    j = docs.select("doc_id", "source").join(
        embc, docs.doc_id == embc.vec_id, "full"
    )
    rows = j.select(
        F.coalesce(F.col("source"), F.lit("__orphan_vectors__")).alias(
            "source"
        ),
        F.col("doc_id").isNotNull().alias("has_doc"),
        F.col("vec_id").isNotNull().alias("has_vec"),
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
    )
    zero = spark_.createDataFrame(
        [("__orphan_vectors__", 0, 0, 0)],
        "source string, n_docs long, n_with_vec long, n_without_vec long",
    )
    per = rows.groupBy("source").agg(
        (
            F.sum(F.when(F.col("has_doc"), 1).otherwise(0))
            + F.sum(F.when(~F.col("has_doc"), F.col("cnt")).otherwise(0))
        )
        .cast("long")
        .alias("n_docs"),
        F.sum(F.when(F.col("has_doc") & F.col("has_vec"), 1).otherwise(0))
        .cast("long")
        .alias("n_with_vec"),
        (
            F.sum(
                F.when(F.col("has_doc") & ~F.col("has_vec"), 1).otherwise(0)
            )
            + F.sum(F.when(~F.col("has_doc"), F.col("cnt")).otherwise(0))
        )
        .cast("long")
        .alias("n_without_vec"),
    )
    return (
        per.unionByName(zero)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_with_vec").cast("long").alias("n_with_vec"),
            F.sum("n_without_vec").cast("long").alias("n_without_vec"),
        )
        .orderBy("source")
    )
