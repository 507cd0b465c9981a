"""Second-order text-quality operators: n-gram repetition, linear quality
scoring, Zipf profiling, per-stratum sampling.

Complements curation.py's Gopher rule battery (token-level flags) with
the *structural* signals a 100 TB curation run adds next:

* ``doc_bigram_repetition`` — Gopher's "fraction of characters in
  duplicated n-grams" analog at bigram level. Token-uniqueness (already
  in ``gopher_quality_flags``) misses looping *phrases*; bigram
  duplication catches them. Shape: map-side bigram explode → one count
  keyed by ``(doc_id, bigram)`` → per-doc rollup. Both aggregations
  hash on ``doc_id`` (the second is a prefix of the first's key), so
  AQE plans one real exchange; linear in emitted bigrams, which is the
  floor for any n-gram statistic.
* ``quality_linear_score`` — a fasttext-style *linear* quality
  classifier with fixed integer weights over per-doc features. The
  features are the same single-pass HOF metrics as the Gopher battery,
  so the whole model evaluates map-only inside the scan stage; scores
  are integer dot products (no float threshold can flip between
  engines). At scale this is the cheap scoring pass that gates the
  expensive model-based scorer.
* ``zipf_rank_freq`` — corpus rank-frequency profile: top-30 tokens
  with their Zipf constant ``rank·freq``. Map-side explode +
  partial-agg combine, then a 30-row TakeOrdered — no global sort. The
  deviation of ``rank·freq`` across ranks is the standard corpus-health
  check (natural text ≈ constant; synthetic/boilerplate corpora skew).
* ``per_group_bottomk_sample`` — deterministic uniform k-per-stratum
  sample: bottom-k by ``md5(doc_id)`` within each language. The hash
  *is* the random order, so the sample is reproducible at any
  parallelism and any history of the table (same property as
  mixing.py's rate-based sampler, but with an exact per-stratum count
  guarantee). Per-group window top-k, one exchange on ``lang``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import (
    materialize,
    TEXT_KERNEL_BYTES,
    TEXT_KERNEL_BYTES_MID,
    ensure_parallelism,
    load_table,
)
from eventsourcing_spark.queries import query

# ---------------------------------------------------------------------------
# Bigram repetition: phrase-level duplication per document.
# ---------------------------------------------------------------------------


@query(
    "doc_bigram_repetition",
    """
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    b AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM t
    ),
    c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY doc_id, bg)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(max(cnt) AS BIGINT) AS top_bigram_n,
           CAST((sum(cnt) - count(*)) * 1000000 // sum(cnt) AS BIGINT)
               AS dup_bigram_ppm
    FROM c GROUP BY doc_id
    """,
)
def doc_bigram_repetition(spark, sf_dir):
    """Per-doc bigram duplication: total/distinct bigram counts, the
    top bigram's multiplicity, and the duplicated-bigram fraction in
    ppm (integer floor-div, exact in both engines). The explode is
    map-side; the two aggregations share the ``doc_id`` hash so the
    plan carries one keyed exchange — linear in bigrams at any scale."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    b = docs.select("doc_id", F.explode(bigrams).alias("bg"))
    c = b.groupBy("doc_id", "bg").agg(F.count("*").alias("cnt"))
    return c.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_distinct_bigrams"),
        F.max("cnt").cast("long").alias("top_bigram_n"),
        F.expr("CAST((sum(cnt) - count(*)) * 1000000 div sum(cnt) AS BIGINT)").alias(
            "dup_bigram_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Linear quality classifier with fixed integer weights.
# ---------------------------------------------------------------------------
STOPWORDS = ["the", "a", "of", "to", "and"]
# weights on (n_tok, mean-word-len(×10), stopword-rate(‰), uniq-rate(‰))
W_TOK, W_MWL, W_STOP, W_UNIQ = 2, -3, 5, 1
SCORE_HI, SCORE_LO = 1000, 700


@query(
    "quality_linear_score",
    f"""
    WITH m AS (
        SELECT doc_id, source,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
               list_aggregate(list_transform(string_split(lower(text), ' '),
                                             x -> len(x)), 'sum') AS sum_len,
               len(list_filter(string_split(lower(text), ' '),
                               x -> list_contains({STOPWORDS!r}, x))) AS n_stop
        FROM documents
    ),
    s AS (
        SELECT doc_id, source,
               {W_TOK} * n_tok
                 + {W_MWL} * (sum_len * 10 // n_tok)
                 + {W_STOP} * (n_stop * 1000 // n_tok)
                 + {W_UNIQ} * (n_uniq * 1000 // n_tok) AS score
        FROM m
    )
    SELECT doc_id, source, CAST(score AS BIGINT) AS score,
           CASE WHEN score >= {SCORE_HI} THEN 'high'
                WHEN score >= {SCORE_LO} THEN 'mid'
                ELSE 'low' END AS quality_class
    FROM s
    """,
)
def quality_linear_score(spark, sf_dir):
    """Integer linear quality model: score = w·(n_tok, mean-word-len,
    stopword-rate, uniq-rate), all rates pre-scaled to integers with
    floor division so the dot product is exact. Map-only — the model
    evaluates inside the scan stage with zero exchanges; at 100 TB
    this is the cheap gate before any model-based scorer."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    m = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_lit, x))).alias(
            "n_stop"
        ),
    )
    score = (
        F.lit(W_TOK) * F.col("n_tok")
        + F.lit(W_MWL) * F.expr("sum_len * 10 div n_tok")
        + F.lit(W_STOP) * F.expr("n_stop * 1000 div n_tok")
        + F.lit(W_UNIQ) * F.expr("n_uniq * 1000 div n_tok")
    )
    s = m.select("doc_id", "source", score.alias("score"))
    return s.select(
        "doc_id",
        "source",
        F.col("score").cast("long").alias("score"),
        F.when(F.col("score") >= SCORE_HI, "high")
        .when(F.col("score") >= SCORE_LO, "mid")
        .otherwise("low")
        .alias("quality_class"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency profile of the corpus vocabulary.
# ---------------------------------------------------------------------------
ZIPF_TOPK = 30


@query(
    "zipf_rank_freq",
    f"""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
    ranked AS (
        SELECT token, freq,
               row_number() OVER (ORDER BY freq DESC, token) AS rank
        FROM freq
    )
    SELECT CAST(rank AS BIGINT) AS rank, token, CAST(freq AS BIGINT) AS freq,
           CAST(rank * freq AS BIGINT) AS zipf_c
    FROM ranked WHERE rank <= {ZIPF_TOPK}
    """,
)
def zipf_rank_freq(spark, sf_dir):
    """Corpus Zipf profile: top-30 tokens with rank·freq. Explode +
    map-side partial counts, then a 30-row TakeOrdered; the rank
    window runs over 30 rows on one task. Natural corpora hold
    rank·freq ≈ constant — drift flags boilerplate or synthetic text."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    freq = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(ZIPF_TOPK)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return freq.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        F.col("freq").cast("long").alias("freq"),
    ).select(
        "rank", "token", "freq", (F.col("rank") * F.col("freq")).alias("zipf_c")
    )


# ---------------------------------------------------------------------------
# Deterministic k-per-stratum sample (exact count per language).
# ---------------------------------------------------------------------------
SAMPLE_K = 20


@query(
    "per_group_bottomk_sample",
    f"""
    WITH h AS (
        SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hkey
        FROM documents
    ),
    r AS (
        SELECT doc_id, lang, hkey,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY hkey, doc_id) AS rk
        FROM h
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
    FROM r WHERE rk <= {SAMPLE_K}
    """,
)
def per_group_bottomk_sample(spark, sf_dir):
    """Exactly-k uniform sample per language: bottom-k of md5(doc_id)
    within each stratum. The hash is the shuffle-independent random
    order, so the sample is reproducible on any cluster layout and
    stable under appends that don't displace the k smallest hashes.
    One exchange on ``lang``; the per-group window truncates to k rows
    early (rank predicate pushes into the window's sort as top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("hkey")
    )
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("sample_rank"))
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity-bucket partitioning (Wenzek et al. 2020): split
# each language's corpus into LM-score quantiles (CCNet: head/middle/
# tail thirds by wikipedia-LM perplexity; here 5 ntile buckets by the
# integer bigram-familiarity proxy — low familiarity ≈ high perplexity,
# so bucket 1 is the "tail"). Downstream pipelines sample by bucket
# (keep head, subsample tail) — this query emits the partition manifest.
#
# Scale shape: the familiarity score is the bigram_lm_score plan (one
# keyed exchange on doc_id + a broadcast corpus-frequency join); the
# ntile is per-language (|langs| independent sorts, never global) and
# the result is a |langs|×5 manifest. Deterministic total order
# (familiarity, doc_id) makes ntile reproducible at any parallelism.
# ---------------------------------------------------------------------------

PPL_BUCKETS = 5


@query(
    "perplexity_bucket_partition",
    f"""
    WITH words AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t
        FROM documents WHERE length(text) > 0
    ),
    pairs AS (
        SELECT doc_id, t[i] || '_' || t[i + 1] AS bg
        FROM words, unnest(generate_series(1, len(t) - 1)) u(i)
        WHERE len(t) >= 2
    ),
    corpus AS (SELECT bg, count(*) AS c FROM pairs GROUP BY bg),
    scored AS (
        SELECT p.doc_id, count(*) AS n_pairs, sum(c.c) AS fam
        FROM pairs p JOIN corpus c ON p.bg = c.bg
        GROUP BY p.doc_id
    ),
    fam AS (
        SELECT s.doc_id, d.lang,
               (1000000 * s.fam) // s.n_pairs AS lm_familiarity
        FROM scored s JOIN documents d USING (doc_id)
    ),
    b AS (
        SELECT lang, lm_familiarity,
               ntile({PPL_BUCKETS}) OVER (PARTITION BY lang
                    ORDER BY lm_familiarity, doc_id) AS bucket
        FROM fam
    )
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(lm_familiarity) AS BIGINT) AS min_fam,
           CAST(max(lm_familiarity) AS BIGINT) AS max_fam
    FROM b GROUP BY lang, bucket
    """,
)
def perplexity_bucket_partition(spark, sf_dir):
    from pyspark.sql import Window

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    words = docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    pairs = words.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], '_', t[i + 1]))"
            )
        ).alias("bg"),
    )
    corpus = pairs.groupBy("bg").agg(F.count("*").alias("c"))
    fam = (
        pairs.join(F.broadcast(corpus), "bg")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_pairs"), F.sum("c").alias("fam"))
        .select(
            "doc_id",
            "lang",
            F.expr("(1000000 * fam) div n_pairs").alias("lm_familiarity"),
        )
    )
    w = Window.partitionBy("lang").orderBy("lm_familiarity", "doc_id")
    b = fam.withColumn("bucket", F.ntile(PPL_BUCKETS).over(w))
    return b.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("lm_familiarity").cast("long").alias("min_fam"),
        F.max("lm_familiarity").cast("long").alias("max_fam"),
    ).select("lang", F.col("bucket").cast("long").alias("bucket"),
             "n_docs", "min_fam", "max_fam")


# ---------------------------------------------------------------------------
# Skyline (Pareto front) over (n_chars, quality) — multi-objective
# curation: the documents not dominated on BOTH length and quality
# (dominated = another doc >= on both axes, > on at least one). The
# distributed formulation is the classic two-phase skyline: each
# partition computes its LOCAL front in one Arrow batch (numpy
# dominance scan over the partition's rows), then the union of local
# fronts — provably a superset of the global front, and tiny — is
# resolved in a single final batch. No O(n²) step ever sees the full
# corpus. Oracle: the NOT EXISTS dominance definition, verbatim.
# ---------------------------------------------------------------------------


def _quality_cols():
    """Integer quality score shared with quality_linear_score: favor
    mid-length docs with many distinct tokens."""
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    return (F.size(F.array_distinct(toks)) * 1000).alias("q_distinct")


_SKY_Q_SQL = "len(list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> ''))) * 1000"


@query(
    "skyline_quality_length",
    f"""
    WITH d AS (
        SELECT doc_id, n_chars, {_SKY_Q_SQL} AS q FROM documents
    )
    SELECT a.doc_id, CAST(a.n_chars AS BIGINT) AS n_chars,
           CAST(a.q AS BIGINT) AS q
    FROM d a
    WHERE NOT EXISTS (
        SELECT 1 FROM d b
        WHERE b.n_chars >= a.n_chars AND b.q >= a.q
          AND (b.n_chars > a.n_chars OR b.q > a.q)
    )
    """,
)
def skyline_quality_length(spark, sf_dir):
    import numpy as np
    import pandas as pd

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    d = docs.select("doc_id", "n_chars", _quality_cols().alias("q"))

    def front(pdf):
        x = pdf["n_chars"].to_numpy(dtype=np.int64)
        y = pdf["q"].to_numpy(dtype=np.int64)
        dominated = np.zeros(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            if dom.any():
                dominated[i] = True
        return pdf[~dominated]

    def local_front(batches):
        # dropping locally-dominated points is safe: dominance within a
        # partition implies dominance globally
        for pdf in batches:
            if len(pdf):
                yield front(pdf)

    def global_front(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        yield front(pdf) if len(pdf) else pdf

    schema = "doc_id long, n_chars long, q long"
    local = d.mapInPandas(local_front, schema)
    # Cardinality bound for the SinglePartition stage (census class
    # python_fed): its input is the UNION OF LOCAL PARETO FRONTS, not
    # the corpus — each partition forwards only its non-dominated
    # points, so the final batch holds ≤ P·|front| rows (two-phase
    # distributed skyline; dominance is transitive, local pruning is
    # lossless). The corpus itself never passes through one task.
    return local.repartition(1).mapInPandas(global_front, schema)


# ---------------------------------------------------------------------------
# Quality × duplication deciles — the cross-signal audit curation teams
# run before setting filter thresholds: per quality decile (ntile 10 on
# the distinct-token score), what fraction of documents are exact
# duplicates? A strong correlation (template spam is both low-quality
# and duplicated) justifies aggressive joint filtering; a flat curve
# says the two filters prune different mass.
#
# Scale shape: a literal `ntile(10) OVER (ORDER BY q, doc_id)` would
# funnel EVERY document through one task (Exchange SinglePartition +
# global sort — the class plans.unpartitioned_windows flags). Instead
# the global rank is decomposed exactly:
#   rank(q, doc_id) = [# rows with smaller q]  +  [rank of doc_id within q]
# The first term is a cumulative sum over the distinct-q histogram
# (|distinct q| ≤ max tokens/doc — a bounded aggregate-fed frame), the
# second a row_number PARTITIONED by q; ntile's closed-form group-size
# formula then maps rank → decile. Same answer as the oracle's ntile,
# zero corpus-sized single-partition stages.
# ---------------------------------------------------------------------------
@query(
    "quality_vs_dup_deciles",
    f"""
    WITH q AS (
        SELECT doc_id, md5(text) AS h, {_SKY_Q_SQL} AS q FROM documents
    ),
    fam AS (SELECT h, count(*) AS fam_n FROM q GROUP BY h),
    dec AS (
        SELECT q.doc_id, q.q, fam.fam_n,
               ntile(10) OVER (ORDER BY q.q, q.doc_id) AS decile
        FROM q JOIN fam USING (h)
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(q) AS BIGINT) AS min_quality,
           CAST(count(*) FILTER (WHERE fam_n > 1) AS BIGINT) AS n_duplicated,
           CAST((count(*) FILTER (WHERE fam_n > 1) * 1000000) // count(*)
                AS BIGINT) AS dup_ppm
    FROM dec GROUP BY decile
    """,
)
def quality_vs_dup_deciles(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # Round 12: fam, the histogram, the totals row and the rank join
    # all read q — materialize the narrow doc-grain frame once instead
    # of re-running the quality HOF + md5 over the corpus four times.
    q = docs.select(
        "doc_id", F.md5("text").alias("h"), _quality_cols().alias("q")
    ).transform(materialize)
    fam = q.groupBy("h").agg(F.count("*").alias("fam_n"))

    # distinct-q histogram: counts + exclusive running total. The window
    # here is single-partition BY DESIGN over |distinct q| rows — an
    # aggregate-reduced frame the plan audit whitelists.
    hist = q.groupBy("q").agg(F.count("*").alias("q_cnt"))
    hist = hist.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("q_cnt").over(
                Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    totals = q.agg(F.count("*").alias("n_total"))

    ranked = (
        q.join(fam, "h")
        .join(F.broadcast(hist.select("q", "cum_before")), "q")
        .withColumn(
            "rk",
            F.col("cum_before")
            + F.row_number().over(Window.partitionBy("q").orderBy("doc_id")),
        )
        .crossJoin(F.broadcast(totals))
    )
    # ntile(10) closed form: first (n % 10) groups get (n div 10 + 1)
    # rows, the rest (n div 10); rank -> group id by size boundary.
    # Integer `div` throughout — float division would round at 2^53.
    dec = ranked.withColumn(
        "decile",
        F.expr(
            "1 + CASE WHEN rk <= (n_total % 10) * (n_total div 10 + 1)"
            " THEN (rk - 1) div (n_total div 10 + 1)"
            " ELSE (n_total % 10)"
            "  + (rk - (n_total % 10) * (n_total div 10 + 1) - 1)"
            "    div greatest(n_total div 10, 1) END"
        ).cast("int"),
    )
    return dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("q").cast("long").alias("min_quality"),
        F.count(F.when(F.col("fam_n") > 1, 1)).cast("long").alias("n_duplicated"),
        F.expr(
            "cast((count(case when fam_n > 1 then 1 end) * 1000000)"
            " div count(*) as bigint)"
        ).alias("dup_ppm"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage thresholds — the inverse of chunking.py's
# vocab_coverage_curve (which sums coverage at FIXED vocab sizes): how
# many of the most frequent tokens cover 50% / 90% / 99% of all token
# occurrences? (Heaps/Zipf: a tiny head covers
# half the corpus; the long tail decides the OOV rate.) Distributed
# shape: the token-frequency table shuffles once; the cumulative
# occurrence share uses the distributed prefix sum
# (operators/ranking.global_rank_cumsum — range partition + local
# cumsum + broadcast partition offsets), NOT a single-partition window,
# because |vocab| at 100 TB is itself in the 10⁸ range. Threshold probes
# arrive as a broadcast 3-row frame.
# ---------------------------------------------------------------------------
COVERAGE_THRESHOLDS = (50, 90, 99)


@query(
    "vocab_coverage_thresholds",
    f"""
    WITH f AS (
        SELECT t AS token, count(*) AS c
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS t
              FROM documents)
        GROUP BY t
    ),
    r AS (
        SELECT token, c,
               row_number() OVER (ORDER BY c DESC, token) AS rk,
               sum(c) OVER (ORDER BY c DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM f
    ),
    n AS (SELECT sum(c) AS total, count(*) AS vocab FROM f),
    thr AS (SELECT * FROM (VALUES {", ".join(f"({t})" for t in COVERAGE_THRESHOLDS)}) t(pct))
    SELECT thr.pct,
           CAST(min(r.rk) AS BIGINT) AS tokens_needed,
           CAST((min(r.rk) * 1000000) // (SELECT vocab FROM n) AS BIGINT)
             AS vocab_frac_ppm,
           (SELECT CAST(vocab AS BIGINT) FROM n) AS vocab_size,
           (SELECT CAST(total AS BIGINT) FROM n) AS total_occurrences
    FROM thr, r, n
    WHERE r.cum * 100 >= thr.pct * n.total
    GROUP BY thr.pct
    """,
)
def vocab_coverage_thresholds(spark, sf_dir):
    from eventsourcing_spark.operators.ranking import global_rank_cumsum

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("token")
    )
    f = toks.groupBy("token").agg(F.count("*").alias("c"))
    r = global_rank_cumsum(f, "c", F.desc("c"), F.asc("token"))
    n = f.agg(
        F.sum("c").alias("total"), F.count("*").alias("vocab")
    )
    thr = spark.createDataFrame(
        [(t,) for t in COVERAGE_THRESHOLDS], "pct int"
    )
    return (
        r.crossJoin(F.broadcast(thr.crossJoin(n)))
        .filter(F.col("cum") * 100 >= F.col("pct") * F.col("total"))
        .groupBy("pct")
        .agg(
            F.min("rk").cast("long").alias("tokens_needed"),
            F.expr(
                "cast((min(rk) * 1000000) div any_value(vocab) as bigint)"
            ).alias("vocab_frac_ppm"),
            F.any_value("vocab").cast("long").alias("vocab_size"),
            F.any_value("total").cast("long").alias("total_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# Type-token ratio (lexical diversity) — the oldest quality signal in
# corpus linguistics and still a standard column in pretraining-data
# audit sheets (Gopher's "repetition" family measures its inverse):
# distinct tokens / total tokens per document, in truncating ppm so
# both engines agree bit-exactly, rolled up per source. A source whose
# average TTR sags is serving templated or looping text even when no
# exact duplicate exists. Map-only per-doc arithmetic (array HOFs, no
# explode) followed by one |sources|-row aggregate — zero data-sized
# shuffles at any scale.
# ---------------------------------------------------------------------------
@query(
    "ttr_lexical_diversity",
    """
    WITH t AS (
        SELECT doc_id, source,
               CAST((1000000 * len(list_distinct(
                        list_filter(string_split(lower(text), ' '),
                                    x -> x <> ''))))
                    // len(list_filter(string_split(lower(text), ' '),
                                       x -> x <> '')) AS BIGINT) AS ttr_ppm
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ttr_ppm) // count(*) AS BIGINT) AS avg_ttr_ppm,
           CAST(min(ttr_ppm) AS BIGINT) AS min_ttr_ppm,
           CAST(max(ttr_ppm) AS BIGINT) AS max_ttr_ppm
    FROM t GROUP BY source
    """,
)
def ttr_lexical_diversity(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ttr = docs.select(
        "source",
        F.expr(
            "(1000000 * size(array_distinct(filter(split(lower(text), ' '),"
            " x -> x != '')))) div"
            " size(filter(split(lower(text), ' '), x -> x != ''))"
        ).alias("ttr_ppm"),
    )
    return ttr.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(ttr_ppm) div count(*)").alias("avg_ttr_ppm"),
        F.min("ttr_ppm").cast("long").alias("min_ttr_ppm"),
        F.max("ttr_ppm").cast("long").alias("max_ttr_ppm"),
    )


from eventsourcing_spark.pipeline.queries import (  # noqa: E402
    MAX_BUCKET as _Q_MAX_BUCKET,
    _BANDS_SQL as _Q_BANDS_SQL,
    _qscore_sql,
)


# ---------------------------------------------------------------------------
# Exact ROC AUC of the quality score as a duplicate detector — the
# Mann-Whitney rank-sum identity makes AUC computable without
# thresholds, floats, or sampling: AUC = P(score_pos > score_neg) +
# ½·P(equal), and over the DISTINCT-SCORE histogram that is
# U×2 = Σ_s n_pos(s)·(2·cum_neg(<s) + n_neg(s)) — one integer per
# score value, one running window over the bounded score domain (the
# same distinct-value-histogram trick as the percentile family; the
# corpus never sorts globally). Label: NEAR-duplicate membership (the
# doc appears in a capped MinHash-band candidate pair — this corpus
# has no byte-exact copies, so md5 families would be all-negative).
# AUC far from 0.5 in either direction
# means the cheap score carries dedup signal; ≈0.5 means it does not —
# the go/no-go number before wiring a score into a kill rule.
# DECIMAL(38,0) carries U×2 (P·N overflows int64 at 100 TB corpus
# sizes); one floor()ed ppm division at the end.
# ---------------------------------------------------------------------------
@query(
    "dup_quality_auc",
    _Q_BANDS_SQL
    + ", "
    + _qscore_sql()
    + f""",
    sized AS (
        SELECT doc_id, band_id, band_key,
               count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
        FROM bands
    ),
    dupdocs AS (
        SELECT DISTINCT a.doc_id
        FROM sized a
        JOIN sized b ON a.band_key = b.band_key AND a.band_id = b.band_id
                    AND a.doc_id <> b.doc_id
        WHERE a.bucket_n <= {_Q_MAX_BUCKET}
    ),
    lab AS (
        SELECT d.doc_id,
               CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        FROM documents d LEFT JOIN dupdocs dd ON dd.doc_id = d.doc_id
    ),
    hist AS (
        SELECT qs.score,
               CAST(sum(l.is_dup) AS DECIMAL(38,0)) AS n_pos,
               CAST(sum(1 - l.is_dup) AS DECIMAL(38,0)) AS n_neg
        FROM qs JOIN lab l USING (doc_id)
        GROUP BY qs.score
    ),
    run AS (
        SELECT score, n_pos, n_neg,
               coalesce(sum(n_neg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_neg
        FROM hist
    )
    SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
           CAST(sum(n_neg) AS BIGINT) AS n_neg,
           CAST(floor(sum(n_pos * (2 * cum_neg + n_neg)) * 1000000
                      / (2 * sum(n_pos) * sum(n_neg))) AS BIGINT) AS auc_ppm
    FROM run
    """,
)
def dup_quality_auc(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_lit, x))).alias(
            "n_stop"
        ),
    )
    score = (
        F.lit(W_TOK) * F.col("n_tok")
        + F.lit(W_MWL) * F.expr("sum_len * 10 div n_tok")
        + F.lit(W_STOP) * F.expr("n_stop * 1000 div n_tok")
        + F.lit(W_UNIQ) * F.expr("n_uniq * 1000 div n_tok")
    )
    from eventsourcing_spark.pipeline.queries import _bands

    sized = _bands(docs).withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band_id", "band_key")),
    )
    # Round 12 (join-elimination): the band self-join only ever asked
    # "does ANOTHER doc share this bucket" — _bands emits one row per
    # (doc, band), so bucket_n counts distinct docs and the exists-test
    # is simply 2 <= bucket_n (<= cap, the a-side filter). The
    # corpus-vs-corpus shuffle-merge join (and its round-12 merge-hint
    # pin) disappears; dupdocs is a filter over the window the plan
    # already paid for. 3 document scans -> 2, minhash chain 2x -> 1x.
    dupdocs = (
        sized.filter(
            (F.col("bucket_n") >= 2) & (F.col("bucket_n") <= _Q_MAX_BUCKET)
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    # dupdocs is Generate-fed (band explode) with a corpus-sized
    # doc_id grain — pin shuffle-merge so the estimator never
    # broadcasts it on the explode's inherited size estimate.
    lab = (
        m.select("doc_id", score.alias("score"))
        .join(dupdocs.hint("merge"), "doc_id", "left")
        .select("doc_id", "score", F.coalesce("is_dup", F.lit(0)).alias("is_dup"))
    )
    hist = lab.groupBy("score").agg(
        F.sum("is_dup").cast("decimal(38,0)").alias("n_pos"),
        F.sum(1 - F.col("is_dup")).cast("decimal(38,0)").alias("n_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    run = hist.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("cum_neg"),
    )
    return run.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.floor(
            F.sum(F.col("n_pos") * (2 * F.col("cum_neg") + F.col("n_neg")))
            * 1000000
            / (2 * F.sum("n_pos") * F.sum("n_neg"))
        )
        .cast("long")
        .alias("auc_ppm"),
    )

from eventsourcing_spark.pipeline.queries import (  # noqa: E402
    _LANG_MARKERS as _LM,
)


# ---------------------------------------------------------------------------
# Expected calibration error (ECE; Naeini et al. 2015, Guo et al. 2017)
# of the lang-ID heuristic — the standard "can you trust the
# confidence?" audit run before using a classifier's score to route or
# filter data. Confidence = winning-marker share of all marker hits in
# milli (1000·s_max // total, 0 when no marker fires); predictions and
# truth reuse lang_id_heuristic's argmax with its exact tie-break
# order. Deciles of confidence → per-bucket accuracy vs mean
# confidence in ppm (truncating); ECE = Σ n_b·|acc − conf| / n with
# the division LAST. Every number is an integer; the per-bucket table
# is the output (the reliability diagram, in rows) with the scalar ECE
# repeated per row via a window sum over the ≤11-row bucket frame.
# Plan: one map-only scan → bucket aggregate → tiny window. Nothing
# corpus-global.
# ---------------------------------------------------------------------------
@query(
    "langid_calibration_ece",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LM["en"]!r}, t))) AS s_en,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LM["es"]!r}, t))) AS s_es,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LM["de"]!r}, t))) AS s_de,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LM["fr"]!r}, t))) AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang_pred,
               (1000 * greatest(s_en, s_es, s_de, s_fr))
                 // greatest(s_en + s_es + s_de + s_fr, 1) AS conf_milli
        FROM scored
    ),
    buckets AS (
        SELECT conf_milli // 100 AS bucket,
               count(*) AS n,
               sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS n_correct,
               sum(conf_milli) AS sum_conf
        FROM pred GROUP BY 1
    ),
    rows_out AS (
        SELECT bucket, n,
               (1000000 * n_correct) // n AS acc_ppm,
               (1000 * sum_conf) // n AS conf_ppm
        FROM buckets
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n_docs,
           CAST(acc_ppm AS BIGINT) AS acc_ppm,
           CAST(conf_ppm AS BIGINT) AS conf_ppm,
           CAST(sum(n * abs(acc_ppm - conf_ppm)) OVER ()
                // sum(n) OVER () AS BIGINT) AS ece_ppm
    FROM rows_out
    ORDER BY bucket
    """,
)
def langid_calibration_ece(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")

    def hits(markers):
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    s = {k: hits(v) for k, v in _LM.items()}
    pred = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    total = (s["en"] + s["es"] + s["de"] + s["fr"]).cast("long")
    p = docs.select(
        "lang",
        pred.alias("lang_pred"),
        (F.lit(1000) * F.greatest(s["en"], s["es"], s["de"], s["fr"]))
        .cast("long")
        .alias("_num"),
        F.greatest(total, F.lit(1).cast("long")).alias("_den"),
    ).select("lang", "lang_pred", F.expr("_num div _den").alias("conf_milli"))
    buckets = p.groupBy(F.expr("conf_milli div 100").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
        ).alias("n_correct"),
        F.sum("conf_milli").alias("sum_conf"),
    )
    rows_out = buckets.select(
        "bucket",
        "n",
        F.expr("(1000000 * n_correct) div n").alias("acc_ppm"),
        F.expr("(1000 * sum_conf) div n").alias("conf_ppm"),
    )
    return rows_out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n_docs"),
        F.col("acc_ppm").cast("long").alias("acc_ppm"),
        F.col("conf_ppm").cast("long").alias("conf_ppm"),
        F.expr(
            "sum(n * abs(acc_ppm - conf_ppm)) OVER () div sum(n) OVER ()"
        )
        .cast("long")
        .alias("ece_ppm"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift audit: each source's quality-score
# distribution against the rest of the corpus — the distribution-shift
# check a curation pipeline runs per ingest source (a crawler gone bad
# shifts the whole CDF even when the mean barely moves).
#
# Integer-exact KS: with cumulative counts cS(v) (source) and cR(v)
# (rest) at every pooled score v, the statistic is
#     D = max_v |cS(v)·nR − cR(v)·nS| / (nS·nR)
# computed as the integer numerator max (no per-point division — the
# single division happens once at the end, so both engines truncate
# identically). Magnitudes: c·n ≤ n² ≤ 1e12 per term at 1M docs.
#
# Shape: one doc-grain score projection (map-only), a (source, score)
# aggregate, a score-grain pooled aggregate, and per-source windows over
# the SCORE GRID — grid rows = distinct score values, a bounded value
# domain (the score is a bounded integer combination), never doc grain.
# ---------------------------------------------------------------------------

_KS_SCORE_DUCK = f"""
    m AS (
        SELECT doc_id, source,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
               list_aggregate(list_transform(string_split(lower(text), ' '),
                                             x -> len(x)), 'sum') AS sum_len,
               len(list_filter(string_split(lower(text), ' '),
                               x -> list_contains({STOPWORDS!r}, x)))
                 AS n_stop
        FROM documents
    ),
    sc AS (
        SELECT source,
               {W_TOK} * n_tok
                 + {W_MWL} * (sum_len * 10 // n_tok)
                 + {W_STOP} * (n_stop * 1000 // n_tok)
                 + {W_UNIQ} * (n_uniq * 1000 // n_tok) AS score
        FROM m
    )
"""


@query(
    "ks_quality_by_source",
    f"""
    WITH {_KS_SCORE_DUCK},
    bysrc AS (
        SELECT source, score, CAST(count(*) AS BIGINT) AS c
        FROM sc GROUP BY source, score
    ),
    pts AS (SELECT DISTINCT score FROM sc),
    srcn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM sc
             GROUP BY source),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM sc),
    grid AS (
        SELECT g.source, g.score, coalesce(b.c, 0) AS c
        FROM (SELECT s.source, p.score FROM srcn s CROSS JOIN pts p) g
        LEFT JOIN bysrc b ON b.source = g.source AND b.score = g.score
    ),
    cums AS (
        SELECT source, score,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY score)
                    AS BIGINT) AS cum_s
        FROM grid
    ),
    cumall AS (
        SELECT score,
               CAST(sum(c) OVER (ORDER BY score) AS BIGINT) AS cum_all
        FROM (SELECT score, CAST(count(*) AS BIGINT) AS c FROM sc
              GROUP BY score)
    ),
    d AS (
        SELECT g.source, g.score, s.n_s, t.n_tot,
               abs(g.cum_s * (t.n_tot - s.n_s)
                   - (a.cum_all - g.cum_s) * s.n_s) AS dnum
        FROM cums g
        JOIN cumall a ON a.score = g.score
        JOIN srcn s ON s.source = g.source
        CROSS JOIN tot t
    ),
    mx AS (
        SELECT source, max(dnum) AS maxd FROM d GROUP BY source
    )
    SELECT d.source,
           CAST(any_value(d.n_s) AS BIGINT) AS n_docs,
           CAST(any_value(m.maxd) AS BIGINT) AS ks_num,
           CAST(1000000 * any_value(m.maxd)
                // (any_value(d.n_s)
                    * (any_value(d.n_tot) - any_value(d.n_s)))
                AS BIGINT) AS ks_ppm,
           CAST(min(d.score) AS BIGINT) AS ks_at_score
    FROM d JOIN mx m ON m.source = d.source AND d.dnum = m.maxd
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def ks_quality_by_source(spark, sf_dir):
    """Per-source two-sample KS statistic (source vs rest) over the
    integer quality score, division-last (one truncating division per
    output row). ks_at_score = the smallest score achieving the max."""
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        per_partition_bytes=TEXT_KERNEL_BYTES_MID,
    )
    ws = "split(lower(text), ' ')"
    score = F.expr(
        f"{W_TOK} * size({ws})"
        f" + {W_MWL} * (aggregate(transform({ws},"
        f" x -> CAST(length(x) AS BIGINT)), CAST(0 AS BIGINT),"
        f" (a, x) -> a + x) * 10 div size({ws}))"
        f" + {W_STOP} * (size(filter({ws},"
        f" x -> array_contains(array("
        + ", ".join(f"'{w}'" for w in STOPWORDS)
        + f"), x))) * 1000 div size({ws}))"
        f" + {W_UNIQ} * (size(array_distinct({ws})) * 1000 div size({ws}))"
    )
    sc = docs.select("source", score.alias("score"))
    # Round 12: every downstream frame (score grid, per-source counts,
    # total, pooled cdf) is a rollup of the ONE (source, score)
    # aggregation — previously each re-derived it, re-running the
    # 4-lambda score expression over the corpus five times (10 parquet
    # scans in the plan). Aggregate once at distinct-value grain
    # (bounded by |sources| x |score domain|, never corpus-sized),
    # materialize, and roll everything up from it.
    bysrc = (
        sc.groupBy("source", "score")
        .agg(F.count("*").cast("long").alias("c"))
        .transform(materialize)
    )
    pts = bysrc.select("score").distinct()
    srcn = bysrc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_s")
    )
    tot = bysrc.agg(F.sum("c").cast("long").alias("n_tot"))
    grid = (
        srcn.crossJoin(pts)
        .join(bysrc, ["source", "score"], "left")
        .select(
            "source", "score", "n_s",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    wsrc = Window.partitionBy("source").orderBy("score")
    cums = grid.withColumn(
        "cum_s", F.sum("c").over(wsrc).cast("long")
    )
    pooled = bysrc.groupBy("score").agg(F.sum("c").cast("long").alias("c"))
    wall = Window.orderBy("score")
    cumall = pooled.withColumn(
        "cum_all", F.sum("c").over(wall).cast("long")
    ).select("score", "cum_all")
    d = (
        cums.join(cumall, "score")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "score", "n_s", "n_tot",
            F.abs(
                F.col("cum_s") * (F.col("n_tot") - F.col("n_s"))
                - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
            ).alias("dnum"),
        )
    )
    mx = d.groupBy("source").agg(F.max("dnum").alias("maxd"))
    return (
        d.join(mx, "source")
        .filter(F.col("dnum") == F.col("maxd"))
        .groupBy("source")
        .agg(
            F.any_value("n_s").cast("long").alias("n_docs"),
            F.any_value("maxd").cast("long").alias("ks_num"),
            F.expr(
                "CAST(1000000 * any_value(maxd) div (any_value(n_s)"
                " * (any_value(n_tot) - any_value(n_s))) AS BIGINT)"
            ).alias("ks_ppm"),
            F.min("score").cast("long").alias("ks_at_score"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact Zipf slope — fit log(freq) ≈ a + s·log(rank) over the token
# frequency table by ORDINARY LEAST SQUARES computed exactly: both logs
# are the 20-fraction-bit integer ilog2 kernel (pipeline/ilog2 — bit-
# identical across engines by construction), the OLS slope is the
# rational (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over those integers, and
# the fixed-point emission reuses the ridge trunc-toward-zero two-stage
# long division. A healthy natural-language corpus fits s ≈ −1 (Zipf's
# law); a corpus whose slope drifts is the canonical symptom of
# boilerplate floods or aggressive dedup. slope_mfx is in units of
# 2^-20 per log2 — i.e. ≈ −(1<<20) for ideal Zipf.
#
# Shape: one token-grain aggregation (map-side combine on the Zipf head
# is exactly the langid/NB scoring discipline), one distributed global
# rank over the vocabulary, map-side ilog2 arithmetic, one 1-row sum.
# ---------------------------------------------------------------------------


from eventsourcing_spark.pipeline.ilog2 import (
    ilog2_duck as _ilog2_duck,
)


def _slope_div(num: str, den: str, div: str) -> str:
    """trunc-toward-zero ((num << 20) / den) via two 10-bit stages —
    the ridge long-division discipline (remainders stay < den)."""
    q = f"(({num}) {div} ({den}))"
    r1 = f"(({num}) - {q} * ({den}))"
    h1 = f"(({r1} * 1024) {div} ({den}))"
    r2 = f"(({r1} * 1024) - {h1} * ({den}))"
    h2 = f"(({r2} * 1024) {div} ({den}))"
    return f"({q} * 1048576 + {h1} * 1024 + {h2})"


@query(
    "zipf_slope_tokens",
    f"""
    WITH tf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS token
            FROM documents
        ) GROUP BY token
    ),
    rk AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, token) AS i
        FROM tf
    ),
    xy AS (
        SELECT {{ix}} AS x, {{iy}} AS y FROM rk
    ),
    s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x::HUGEINT * y::HUGEINT) AS HUGEINT) AS sxy,
               CAST(sum(x::HUGEINT * x::HUGEINT) AS HUGEINT) AS sxx
        FROM xy
    )
    SELECT CAST(n AS BIGINT) AS vocab_n,
           CAST(sx AS BIGINT) AS sum_logx_fx,
           CAST(sy AS BIGINT) AS sum_logy_fx,
           CAST({_slope_div("(n * sxy - sx * sy)",
                            "(n * sxx - sx * sx)", "//")}
                AS BIGINT) AS slope_mfx
    FROM s
    """.replace("{ix}", _ilog2_duck("i")).replace(
        "{iy}", _ilog2_duck("freq")),
)
def zipf_slope_tokens(spark, sf_dir):
    from eventsourcing_spark.operators.ranking import global_rank

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    rk = global_rank(tf, F.desc("freq"), "token", rank_col="i")
    from eventsourcing_spark.pipeline.ilog2 import ilog2_spark

    xy = rk.select(
        F.expr(ilog2_spark("i")).alias("x"),
        F.expr(ilog2_spark("freq")).alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
        ).alias("sxx"),
    )
    return s.select(
        F.col("n").cast("long").alias("vocab_n"),
        F.col("sx").cast("long").alias("sum_logx_fx"),
        F.col("sy").cast("long").alias("sum_logy_fx"),
        F.expr(
            "CAST("
            + _slope_div("(n * sxy - sx * sy)", "(n * sxx - sx * sx)", "div")
            + " AS BIGINT)"
        ).alias("slope_mfx"),
    )
