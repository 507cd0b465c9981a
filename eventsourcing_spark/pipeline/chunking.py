"""Document chunking + subword-merge statistics (training-data prep).

Two map-only operators a RAG / pretraining pipeline needs in front of
tokenization:

* ``chunk_documents`` — split each document into fixed-size overlapping
  character windows (size 120, stride 90).  Pure higher-order functions
  (``sequence`` → ``posexplode`` → ``substring``): zero shuffles, so at
  100 TB it is embarrassingly parallel and the output is written straight
  from the scan stage.  Chunk identity is carried as ``md5`` of the chunk
  text so downstream chunk-level dedup can reuse the ``dedup_exact``
  machinery without re-reading full text.

* ``bpe_merge_pairs`` — the counting step of one BPE merge round:
  frequency of adjacent character pairs inside whitespace tokens
  (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  Subword Units").  Explode is map-side; the pair count benefits from
  partial aggregation (the pair alphabet is tiny, so the shuffle carries
  ~|alphabet|² rows per task, not the corpus); final top-k is a
  TakeOrderedAndProject, never a global sort.

The reference has no text surface; these extend the engine per the task
brief (token counting / fingerprinting family, COVERAGE.md "Beyond-
reference").
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

CHUNK_SIZE = 120
CHUNK_STRIDE = 90
TOP_PAIRS = 40


@query(
    "chunk_documents",
    f"""
    SELECT doc_id,
           i AS chunk_idx,
           i * {CHUNK_STRIDE} AS chunk_start,
           len(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_len,
           md5(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})) AS chunk_hash
    FROM documents,
         unnest(range(0, ((len(text) - 1) // {CHUNK_STRIDE}) + 1)) AS t(i)
    """,
)
def chunk_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = (F.floor((F.length("text") - 1) / CHUNK_STRIDE) + 1).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    chunk = F.expr(f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})")
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_STRIDE).alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_hash"),
        )
    )


@query(
    "bpe_merge_pairs",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(tok)),
                                     i -> substr(tok, i, 2))) AS pair
        FROM toks WHERE len(tok) >= 2
    )
    SELECT pair, count(*) AS n_pair
    FROM pairs
    GROUP BY pair
    ORDER BY n_pair DESC, pair
    LIMIT {TOP_PAIRS}
    """,
)
def bpe_merge_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_pair"))
        .orderBy(F.desc("n_pair"), "pair")
        .limit(TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# LM training pairs — (context, next token) supervision extracted from
# each document: position i yields (tokens[0..i) joined, tokens[i]).
# Bounded to the first 6 positions per doc (the training-objective prep
# demo, not a corpus explosion). Pure explode over an index sequence —
# map-side, zero shuffles before the (tiny) output.
# ---------------------------------------------------------------------------

PAIR_POSITIONS = 6


@query(
    "lm_next_token_pairs",
    f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    )
    SELECT doc_id, i AS pos,
           array_to_string(t[1:i], ' ') AS context,
           t[i + 1] AS target
    FROM words, unnest(generate_series(1, least(len(t) - 1, {PAIR_POSITIONS}))) u(i)
    WHERE len(t) >= 2
    """,
)
def lm_next_token_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    # Spark arrays are 0-based; DuckDB 1-based — the oracle's t[1:i]
    # (first i tokens) is slice(t, 1, i) here, and t[i+1] is t[i] (0-based)
    return words.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.size("t") - 1, F.lit(PAIR_POSITIONS)),
            )
        ).alias("pos"),
        "t",
    ).select(
        "doc_id",
        "pos",
        F.array_join(F.slice("t", 1, F.col("pos")), " ").alias("context"),
        F.element_at("t", F.col("pos") + 1).alias("target"),
    )


# ---------------------------------------------------------------------------
# Deterministic word-dropout augmentation — the reproducibility-critical
# form of text augmentation: token at position p of doc d drops iff
# md5(d:p) lands in the dropout band (10%). Same hash → same augmented
# corpus on every run, any cluster size, either engine; emitted as the
# augmented text plus kept/dropped accounting so the gate hashes the
# actual output strings.
# ---------------------------------------------------------------------------
@query(
    "word_dropout_augment",
    """
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    toks AS (
        SELECT doc_id, i, t[i] AS w,
               substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                          CAST(i AS VARCHAR)), 1, 1) AS h
        FROM words, unnest(generate_series(1, len(t))) u(i)
    )
    SELECT doc_id,
           string_agg(CASE WHEN h != '0' THEN w END, ' ' ORDER BY i)
             AS augmented,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN h = '0' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM toks GROUP BY doc_id
    """,
)
def word_dropout_augment(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select("doc_id", F.split("text", " ").alias("t"))
    toks = words.select(
        "doc_id",
        F.posexplode("t").alias("i0", "w"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),  # 1-based to match the oracle
        "w",
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"),
                    (F.col("i0") + 1).cast("string"),
                )
            ),
            1,
            1,
        ).alias("h"),
    )
    return toks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("h") != "0", F.struct("i", "w"))
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("augmented"),
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("h") == "0", 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Span corruption (T5-style) — masked-LM data prep: length-2 spans
# start wherever md5(doc:pos) lands in the start band (1/8); a position
# is masked iff a span starts at it or at its predecessor. Every flag
# is CLOSED-FORM per position (two hash lookups) — no sequential scan,
# so the whole corruption is a map-side expression. The input drops the
# span for a sentinel at its first masked position; the target collects
# the masked-out tokens. Same hash → same corruption everywhere.
# ---------------------------------------------------------------------------


def _span_start_sql(p: str) -> str:
    return (
        f"substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST({p} AS VARCHAR)),"
        f" 1, 1) IN ('0', '1')"
    )


@query(
    "span_corruption_mask",
    f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    toks AS (
        SELECT doc_id, i, t[i] AS w,
               {_span_start_sql("i")} AS s_here,
               CASE WHEN i > 1 THEN {_span_start_sql("i - 1")}
                    ELSE FALSE END AS s_prev
        FROM words, unnest(generate_series(1, len(t))) u(i)
    ),
    flagged AS (
        SELECT doc_id, i, w,
               (s_here OR s_prev) AS masked,
               (s_here AND NOT s_prev) AS span_head
        FROM toks
    )
    SELECT doc_id,
           string_agg(CASE WHEN NOT masked THEN w
                           WHEN span_head THEN '<X>' END, ' ' ORDER BY i)
             AS corrupted,
           coalesce(string_agg(CASE WHEN masked THEN w END, ' ' ORDER BY i),
                    '') AS target,
           CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_masked,
           count(*) AS n_tokens
    FROM flagged GROUP BY doc_id
    """,
)
def span_corruption_mask(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select("doc_id", F.split("text", " ").alias("t"))

    def start_at(pos_col):
        return F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    pos_col.cast("string"),
                )
            ),
            1,
            1,
        ).isin("0", "1")

    toks = words.select("doc_id", F.posexplode("t").alias("i0", "w")).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "w",
        start_at(F.col("i0") + 1).alias("s_here"),
        F.when(F.col("i0") + 1 > 1, start_at(F.col("i0")))
        .otherwise(F.lit(False))
        .alias("s_prev"),
    )
    flagged = toks.select(
        "doc_id",
        "i",
        "w",
        (F.col("s_here") | F.col("s_prev")).alias("masked"),
        (F.col("s_here") & ~F.col("s_prev")).alias("span_head"),
    )

    def ordered_join(cond_value):
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(cond_value)),
                lambda s: s["w"],
            ),
            " ",
        )

    corrupted_tok = F.when(
        ~F.col("masked"), F.struct("i", "w")
    ).when(F.col("span_head"), F.struct("i", F.lit("<X>").alias("w")))
    target_tok = F.when(F.col("masked"), F.struct("i", "w"))
    return flagged.groupBy("doc_id").agg(
        ordered_join(corrupted_tok).alias("corrupted"),
        ordered_join(target_tok).alias("target"),
        F.sum(F.when(F.col("masked"), 1).otherwise(0))
        .cast("long")
        .alias("n_masked"),
        F.count("*").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Contrastive pairs — embedding-model training data: anchor = first half
# of a document, positive = its second half (same-source continuity),
# negative = the second half of the NEXT document in a deterministic
# md5 shuffle order (lead window — an unbiased random partner that is
# reproducible at any parallelism; at corpus scale you'd take k
# negatives from the +1..+k successors the same way). Emitted as md5 of
# each text part so the gate hashes the pairing itself, not megabytes
# of text.
# ---------------------------------------------------------------------------
@query(
    "contrastive_pairs",
    """
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE length(text) > 0
    ),
    halves AS (
        SELECT doc_id,
               md5(array_to_string(t[1:len(t) // 2], ' ')) AS anchor_md5,
               md5(array_to_string(t[len(t) // 2 + 1:len(t)], ' '))
                 AS positive_md5
        FROM words WHERE len(t) >= 4
    ),
    shuffled AS (
        SELECT doc_id, anchor_md5, positive_md5,
               lead(positive_md5) OVER (
                   PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS negative_md5
        FROM halves
    )
    SELECT doc_id, anchor_md5, positive_md5, negative_md5
    FROM shuffled WHERE negative_md5 IS NOT NULL
    """,
)
def contrastive_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 4
    )
    half = F.expr("size(t) div 2")
    halves = words.select(
        "doc_id",
        F.md5(F.array_join(F.slice("t", 1, half), " ")).alias("anchor_md5"),
        F.md5(
            F.array_join(
                F.expr("slice(t, size(t) div 2 + 1, size(t) - size(t) div 2)"),
                " ",
            )
        ).alias("positive_md5"),
    )
    # partitioned by hash prefix: the shuffle order is still uniform-random
    # but the window never goes global (16 independent partitions; the last
    # row of each loses its negative — 16 rows at any corpus size)
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy(F.substring(h, 1, 1)).orderBy(h, "doc_id")
    shuffled = halves.withColumn(
        "negative_md5", F.lead("positive_md5").over(w)
    )
    return shuffled.filter(F.col("negative_md5").isNotNull())


# ---------------------------------------------------------------------------
# BPE merge application — the *encode* step that pairs with
# ``bpe_merge_pairs`` (the count step). Each word is exploded to a
# space-separated char sequence (regexp boundary insertion), then a fixed
# ordered merge list is applied as left-to-right non-overlapping string
# replaces — byte-identical semantics in Spark and DuckDB (verified).
# Map-only: tokenization compresses inside the scan stage; per-doc subword
# counts before/after measure the merge table's compression.
# ---------------------------------------------------------------------------
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"),
]


def _apply_merges_sql(expr: str) -> str:
    out = f"trim(regexp_replace({expr}, '(.)', '\\1 ', 'g'))"
    for a, b in BPE_MERGES:
        out = f"replace({out}, '{a} {b}', '{a}{b}')"
    return out


@query(
    "bpe_apply_merges",
    f"""
    WITH t AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    ),
    m AS (
        SELECT doc_id, word,
               len(word) AS n_chars,
               len(string_split({_apply_merges_sql('word')}, ' '))
                   AS n_subwords
        FROM t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
           CAST((sum(n_chars) - sum(n_subwords)) * 1000000
                // sum(n_chars) AS BIGINT) AS compression_ppm
    FROM m GROUP BY doc_id
    """,
)
def bpe_apply_merges(spark, sf_dir):
    """Apply a fixed 8-entry BPE merge table per word and account the
    subword compression per document. The merge chain is plain string
    replaces over an exploded char sequence — all inside the scan
    stage; one keyed agg back to doc granularity. At 100 TB this is
    the shape of tokenizer application: embarrassingly parallel text
    transform + one rollup."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    seq = "trim(regexp_replace(word, '(.)', '$1 '))"
    for a, b in BPE_MERGES:
        seq = f"replace({seq}, '{a} {b}', '{a}{b}')"
    m = t.select(
        "doc_id",
        F.length("word").alias("n_chars"),
        F.size(F.split(F.expr(seq), " ")).alias("n_subwords"),
    )
    return m.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        F.expr(
            "CAST((sum(n_chars) - sum(n_subwords)) * 1000000"
            " div sum(n_chars) AS BIGINT)"
        ).alias("compression_ppm"),
    )


# ---------------------------------------------------------------------------
# OOV rate against a top-K corpus vocabulary: the vocabulary-coverage
# audit run before fixing a tokenizer/vocab. Vocab = top-100 tokens by
# global frequency (deterministic tie order); per-doc fraction of tokens
# outside it. Two aggregations + one broadcast join of the 100-row vocab.
# ---------------------------------------------------------------------------
VOCAB_K = 100


@query(
    "oov_rate_topk_vocab",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, count(*) AS freq,
                   row_number() OVER (ORDER BY count(*) DESC, token) AS rk
            FROM tok GROUP BY token
        ) WHERE rk <= {VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(count(*) FILTER (v.token IS NULL) AS BIGINT) AS n_oov,
           CAST(count(*) FILTER (v.token IS NULL) * 1000000
                // count(*) AS BIGINT) AS oov_ppm
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
    """,
)
def oov_rate_topk_vocab(spark, sf_dir):
    """Per-doc out-of-vocabulary rate vs the corpus top-100 vocab.
    The vocab is a 100-row TakeOrdered — broadcast to the token
    explode, so the expensive side never shuffles for the membership
    test; one rollup keyed by doc_id."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "token", "left")
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.sum(F.col("in_vocab").isNull().cast("long")).cast("long").alias("n_oov"),
        F.expr(
            "CAST(sum(CAST(in_vocab IS NULL AS BIGINT)) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("oov_ppm"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: corpus-token coverage at several vocab sizes.
# Four top-K sums over the (small) frequency table unioned — no global
# window over the vocabulary (which at web scale is 10⁸ terms); each branch
# is a TakeOrdered of K rows + a scalar agg, and the total is one scalar.
# ---------------------------------------------------------------------------
COVERAGE_KS = [10, 50, 100, 500]


def _coverage_oracle() -> str:
    branches = "\n    UNION ALL\n".join(
        f"""    SELECT {k} AS vocab_k,
           (SELECT sum(freq) FROM
             (SELECT freq FROM f ORDER BY freq DESC, token LIMIT {k}))
               AS covered"""
        for k in COVERAGE_KS
    )
    return f"""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    f AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
    t AS (SELECT sum(freq) AS total_tokens FROM f),
    ks AS (
{branches}
    )
    SELECT CAST(vocab_k AS BIGINT) AS vocab_k,
           CAST(covered AS BIGINT) AS covered,
           CAST(t.total_tokens AS BIGINT) AS total_tokens,
           CAST(covered * 1000000 // t.total_tokens AS BIGINT)
               AS coverage_ppm
    FROM ks CROSS JOIN t
    """


@query("vocab_coverage_curve", _coverage_oracle())
def vocab_coverage_curve(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # Round 12 (scan-collapse): the token frequency table — vocab
    # grain — feeds the total and all four top-K branches; each branch
    # replayed the tokenize-explode corpus pass (5 document scans per
    # plan). One pass, materialized.
    f = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .transform(materialize)
    )
    total = f.agg(F.sum("freq").alias("total_tokens"))
    branches = None
    for k in COVERAGE_KS:
        topk = (
            f.orderBy(F.desc("freq"), F.asc("token"))
            .limit(k)
            .agg(F.sum("freq").alias("covered"))
            .select(F.lit(k).cast("long").alias("vocab_k"), "covered")
        )
        branches = topk if branches is None else branches.unionAll(topk)
    return branches.crossJoin(F.broadcast(total)).select(
        "vocab_k",
        F.col("covered").cast("long").alias("covered"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.expr("CAST(covered * 1000000 div total_tokens AS BIGINT)").alias(
            "coverage_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Content-defined chunk boundaries — the rolling-hash cut rule behind
# dedup storage systems (LBFS/restic/borg): a boundary falls wherever
# the hash of the local 8-char window ≡ 0 (mod 64), so chunk edges are
# content-anchored and survive insertions (fixed-size chunking's
# weakness). Per doc: boundary count, chunk count, expected chunk
# length ×100. The window hashes are md5 (the cross-engine hash
# contract); Spark side computes them in an Arrow batch (one hashlib
# pass per window — md5 bytes are identical to the SQL md5).
# ---------------------------------------------------------------------------
CDC_W = 8
CDC_MOD = 64


@query(
    "cdc_chunk_boundaries",
    f"""
    WITH t AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents WHERE length(text) >= {CDC_W}
    ),
    b AS (
        SELECT doc_id, n,
               len(list_filter(
                   list_transform(range(1, n - {CDC_W} + 2),
                       i -> CAST('0x' || substr(md5(substr(text,
                                CAST(i AS INTEGER), {CDC_W})), 1, 8) AS BIGINT)
                            % {CDC_MOD}),
                   h -> h = 0)) AS n_boundaries
        FROM t
    )
    SELECT doc_id,
           CAST(n_boundaries AS BIGINT) AS n_boundaries,
           CAST(n_boundaries + 1 AS BIGINT) AS n_chunks,
           CAST((n * 100) // (n_boundaries + 1) AS BIGINT) AS avg_chunk_len_x100
    FROM b
    """,
)
def cdc_chunk_boundaries(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def bounds(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = str(text or "")
                n = len(s)
                if n < CDC_W:
                    continue
                nb = 0
                for i in range(n - CDC_W + 1):
                    h = int(hashlib.md5(s[i : i + CDC_W].encode()).hexdigest()[:8], 16)
                    if h % CDC_MOD == 0:
                        nb += 1
                out.append((int(doc_id), n, nb))
            yield pd.DataFrame(out, columns=["doc_id", "n", "n_boundaries"])

    b = docs.select("doc_id", "text").mapInPandas(
        bounds, "doc_id long, n long, n_boundaries long"
    )
    return b.select(
        "doc_id",
        F.col("n_boundaries").cast("long").alias("n_boundaries"),
        (F.col("n_boundaries") + 1).cast("long").alias("n_chunks"),
        F.expr("(n * 100) div (n_boundaries + 1)")
        .cast("long")
        .alias("avg_chunk_len_x100"),
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup — the storage-system trick (restic/borg/LBFS)
# applied to corpora: cut every document at the content-defined
# boundaries above, hash each chunk, and measure per-source how much
# text is DUPLICATE CHUNKS — the partial-overlap duplication that
# whole-document dedup (exact or near-dup) cannot see (e.g. a boiler-
# plate header pasted into thousands of otherwise-unique pages).
# chars_dedupable is exactly the bytes a chunk-store would not store
# twice. One chunk-emitting pass (map-side), one keyed aggregate on
# (source, chunk hash), one source rollup.
# ---------------------------------------------------------------------------


@query(
    "cdc_chunk_dedup",
    f"""
    WITH t AS (
        SELECT doc_id, source, text, length(text) AS n
        FROM documents WHERE length(text) >= {CDC_W}
    ),
    cutp AS (
        SELECT doc_id, source, text, n,
               [0] || list_transform(
                   list_filter(range(1, n - {CDC_W} + 2),
                       i -> CAST('0x' || substr(md5(substr(text,
                                CAST(i AS INTEGER), {CDC_W})), 1, 8) AS BIGINT)
                            % {CDC_MOD} = 0),
                   i -> i + {CDC_W} - 1) || [n] AS pos
        FROM t
    ),
    chunks AS (
        SELECT source,
               md5(substr(text, CAST(pos[j] + 1 AS INTEGER),
                          CAST(pos[j + 1] - pos[j] AS INTEGER))) AS ch,
               pos[j + 1] - pos[j] AS clen
        FROM cutp, unnest(range(1, len(pos))) u(j)
        WHERE pos[j + 1] > pos[j]
    ),
    per_hash AS (
        SELECT source, ch, count(*) AS cnt, any_value(clen) AS clen
        FROM chunks GROUP BY source, ch
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(cnt * clen) AS BIGINT) AS chars_total,
           CAST(sum(cnt * clen) - sum(clen) AS BIGINT) AS chars_dedupable,
           CAST((1000000 * (sum(cnt * clen) - sum(clen)))
                // sum(cnt * clen) AS BIGINT) AS dedup_ppm
    FROM per_hash GROUP BY source
    """,
)
def cdc_chunk_dedup(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def chunks(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                s = str(text or "")
                n = len(s)
                if n < CDC_W:
                    continue
                cuts = [0]
                for i in range(n - CDC_W + 1):
                    h = int(
                        hashlib.md5(s[i : i + CDC_W].encode()).hexdigest()[:8],
                        16,
                    )
                    if h % CDC_MOD == 0:
                        cuts.append(i + CDC_W)
                cuts.append(n)
                for a, b in zip(cuts, cuts[1:]):
                    if b > a:
                        out.append(
                            (source,
                             hashlib.md5(s[a:b].encode()).hexdigest(),
                             b - a)
                        )
            yield pd.DataFrame(out, columns=["source", "ch", "clen"])

    ck = docs.select("doc_id", "source", "text").mapInPandas(
        chunks, "source string, ch string, clen long"
    )
    per_hash = ck.groupBy("source", "ch").agg(
        F.count("*").alias("cnt"), F.any_value("clen").alias("clen")
    )
    return per_hash.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).cast("long").alias("chars_total"),
        (F.sum(F.col("cnt") * F.col("clen")) - F.sum("clen"))
        .cast("long")
        .alias("chars_dedupable"),
        F.expr(
            "cast((1000000 * (sum(cnt * clen) - sum(clen)))"
            " div sum(cnt * clen) as bigint)"
        ).alias("dedup_ppm"),
    )


# ---------------------------------------------------------------------------
# Sequence packing audit — concat-and-chunk, the packing rule real
# pretraining loaders use (concatenate documents in a fixed order,
# slice into fixed token-budget sequences, documents split across
# boundaries). A token at global position p (0-based, order = doc_id)
# belongs to sequence p div B, so a document occupying positions
# [cum − tok, cum) spans sequences (cum−tok) div B .. (cum−1) div B
# and its overlap with each is pure interval arithmetic.
#
# Shape: the only corpus-wide operation is ONE distributed prefix sum
# (operators/ranking.global_rank_cumsum — range exchange + broadcast
# partition offsets, no single-partition window); the span explode is
# map-side (a document touches ≤ tok div B + 2 sequences) and the
# audit is one keyed aggregation at sequence grain.
# ---------------------------------------------------------------------------
PACK_BUDGET = 1024  # tokens per packed training sequence


@query(
    "sequence_packing_audit",
    f"""
    WITH d AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok
        FROM documents
        WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
    ),
    c AS (
        SELECT doc_id, tok,
               CAST(sum(tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        FROM d
    ),
    g AS (
        SELECT unnest(generate_series(0, (
            SELECT coalesce(max(cum), 0) FROM c) // {PACK_BUDGET})) AS s
    ),
    spans AS (
        SELECT c.doc_id, c.tok, c.cum,
               g.s AS seq_id,
               least((g.s + 1) * {PACK_BUDGET}, c.cum)
                 - greatest(g.s * {PACK_BUDGET}, c.cum - c.tok) AS n_tok,
               CASE WHEN (c.cum - c.tok) // {PACK_BUDGET} = g.s
                    THEN 1 ELSE 0 END AS started
        FROM c, g
        WHERE g.s BETWEEN (c.cum - c.tok) // {PACK_BUDGET}
                      AND (c.cum - 1) // {PACK_BUDGET}
    )
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(started) AS BIGINT) AS n_docs_started,
           CAST(count(*) - sum(started) AS BIGINT) AS n_carryover_docs
    FROM spans GROUP BY seq_id
    """,
)
def sequence_packing_audit(spark, sf_dir):
    """Per packed-sequence statistics of concat-and-chunk packing:
    token fill (PACK_BUDGET except the final partial sequence), how
    many documents each sequence touches, and how many were carried
    over a boundary from the previous sequence (attention-masking
    overhead a loader wants to know)."""
    from eventsourcing_spark.operators.ranking import global_rank_cumsum

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        F.expr(
            "size(filter(split(text, ' '), x -> x != ''))"
        ).cast("long").alias("tok"),
    ).filter(F.col("tok") > 0)
    c = global_rank_cumsum(d, "tok", "doc_id", cum_col="cum")
    B = PACK_BUDGET
    spans = c.select(
        "doc_id",
        "tok",
        "cum",
        F.explode(
            F.expr(f"sequence((cum - tok) div {B}, (cum - 1) div {B})")
        ).alias("seq_id"),
    ).select(
        "seq_id",
        (
            F.least(
                (F.col("seq_id") + 1) * B, F.col("cum")
            )
            - F.greatest(F.col("seq_id") * B, F.col("cum") - F.col("tok"))
        ).alias("n_tok"),
        (
            ((F.col("cum") - F.col("tok")) / B).cast("long")
            == F.col("seq_id")
        ).cast("int").alias("started"),
    )
    return spans.groupBy(F.col("seq_id").cast("long").alias("seq_id")).agg(
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum("started").cast("long").alias("n_docs_started"),
        (F.count("*") - F.sum("started")).cast("long").alias(
            "n_carryover_docs"
        ),
    )
