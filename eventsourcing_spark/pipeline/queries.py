"""Training-data pipeline operators over documents/embeddings.

First-class components beyond the reference (task brief): exact and
near dedup, similarity search, text analysis. Every operator is
expressed so the distributed shape is right at 100 TB:

* exact dedup — hash-groupBy, one shuffle on the content hash;
* MinHash/LSH near-dup — shingle → per-seed min-hash → band key →
  bucket join; all-pairs comparison happens only within LSH buckets,
  never globally;
* n-gram Jaccard — verification step on LSH candidate pairs only;
* KNN — brute-force top-k via quantized-integer dot products (exact in
  both engines, so the oracle compare is bit-stable); the scale path
  (LSH bucketing) reuses the same banding machinery;
* text analysis — tokenization/stopword/quality entirely with
  higher-order functions (no Python UDFs).

MinHash here uses md5-based hash families (md5(token || seed)) because
both Spark and DuckDB implement md5 identically — a deliberate
choice so the correctness oracle can replay the exact computation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import (
    materialize,
    TEXT_KERNEL_BYTES,
    TEXT_KERNEL_BYTES_WIDE,
    TEXT_KERNEL_BYTES_MID,
    ensure_parallelism,
    load_table,
)
from eventsourcing_spark.queries import DEC, query

STOPWORDS = ["the", "a", "of", "to", "and"]
N_MINHASH = 4  # seeds 0..3 → 2 bands of 2 hashes


def _tokens(col):
    return F.split(F.lower(col), " ")


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on content. One shuffle on md5(text).
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash signatures: per doc, per seed j, min over tokens of md5(token||j).
# ---------------------------------------------------------------------------
def _minhash_expr(j: int):
    return F.array_min(
        F.transform(_tokens(F.col("text")), lambda t: F.md5(F.concat(t, F.lit(str(j)))))
    ).alias(f"mh{j}")


def _minhash_oracle(j: int) -> str:
    return (
        "list_aggregate(list_transform(string_split(lower(text), ' '), "
        f"t -> md5(t || '{j}')), 'min') AS mh{j}"
    )


@query(
    "dedup_minhash_signatures",
    f"""
    SELECT doc_id, {", ".join(_minhash_oracle(j) for j in range(N_MINHASH))}
    FROM documents
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES)
    return docs.select("doc_id", *[_minhash_expr(j) for j in range(N_MINHASH)])


# ---------------------------------------------------------------------------
# LSH near-dup candidate pairs: docs sharing a band (band = concat of 2
# minhashes). Join happens on the band key — the 100 TB shape: shuffle by
# band, compare only within buckets.
# ---------------------------------------------------------------------------
# Candidate pairs are only generated inside buckets of ≤ MAX_BUCKET docs: a
# band shared by thousands of documents is a duplicate mega-family, and
# emitting its O(k²) pairs is both useless (no discriminative signal) and the
# thing that kills LSH jobs at scale. Mega-buckets are handled linearly by
# dedup_lsh_clusters below.
#
# Corpus-size sizing note (why minhash banding does NOT need the dynamic
# band-bits rule that pipeline.similarity/graph wire for hyperplane LSH):
# a hyperplane band has a FIXED key space (2^bits values), so bucket
# occupancy grows linearly with the corpus and a static width saturates
# — the failure the sizing rule fixes. A minhash band key is the concat
# of r full md5 min-values: its key space is content-hash-sized (~2^64r),
# so occupancy is driven by actual content collisions (true near-dups at
# Jaccard ≈ threshold), not corpus growth. The knob here is r (rows per
# band) and band count, which set the Jaccard THRESHOLD s* ≈ (1/b)^(1/r)
# — a semantic parameter, deliberately not derived from n. Growth only
# enlarges genuine duplicate families, which MAX_BUCKET caps and the
# keeper-star/components path absorbs linearly.
MAX_BUCKET = 64


def _explode_band_keys(sig):
    """(doc_id, bk0, bk1) → (doc_id, band_id, band_key): THE band
    layout, defined once (pinned by _BANDS_SQL). Split from _bands in
    round 12 so a caller holding a materialized per-doc signature frame
    (dedup_incremental_batch) emits band rows without re-running the
    min-hash chain."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band_id"),
                    F.col("bk0").alias("band_key"),
                ),
                F.struct(
                    F.lit(1).alias("band_id"),
                    F.col("bk1").alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")


def _bands(docs):
    """MinHash signature computed ONCE per row; both bands emitted via
    explode (the union-of-selects form evaluates the md5 min-hash chain
    once per band per join side — 4× the work)."""
    sig = docs.select(
        "doc_id", *[_minhash_expr(j) for j in range(N_MINHASH)]
    ).select(
        "doc_id",
        F.concat("mh0", "mh1").alias("bk0"),
        F.concat("mh2", "mh3").alias("bk1"),
    )
    return _explode_band_keys(sig)


_BANDS_SQL = f"""
    WITH sig AS (
        SELECT doc_id, {", ".join(_minhash_oracle(j) for j in range(N_MINHASH))}
        FROM documents
    ),
    bands AS (
        SELECT doc_id, 0 AS band_id, mh0 || mh1 AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_id, mh2 || mh3 AS band_key FROM sig
    )
"""


@query(
    "dedup_lsh_pairs",
    _BANDS_SQL
    + f"""
    , sized AS (
        SELECT doc_id, band_id, band_key,
               count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
        FROM bands
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sized a
    JOIN sized b ON a.band_key = b.band_key AND a.band_id = b.band_id
                AND a.doc_id < b.doc_id
    WHERE a.bucket_n <= {MAX_BUCKET}
    """,
)
def dedup_lsh_pairs(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # one shuffle on the band key; pairs generated by exploding the sorted
    # member list within each small bucket — no self-join, and the md5
    # signature chain is evaluated exactly once per document
    buckets = (
        _bands(docs)
        .groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
    return (
        buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias("doc_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# LSH dedup clusters: each doc pairs with its bucket's keeper (min doc_id) —
# linear in corpus size even for duplicate mega-families, which is the only
# shape that survives 100 TB (the all-pairs form above is O(k²) per family).
# Iterating keeper-of-keeper to a fixpoint yields connected components; one
# pass already assigns every duplicate a canonical representative per band.
# ---------------------------------------------------------------------------
def _keeper_edges(docs):
    """(member, keeper) star edges: every doc → its bucket's min doc_id."""
    w = Window.partitionBy("band_id", "band_key")
    return (
        _bands(docs)
        .withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") > F.col("keeper"))
        .select(F.col("doc_id").alias("member"), "keeper")
        .distinct()
    )


@query(
    "dedup_lsh_clusters",
    _BANDS_SQL
    + """
    SELECT DISTINCT b.doc_id AS member, k.keeper
    FROM bands b
    JOIN (
      SELECT band_id, band_key, min(doc_id) AS keeper
      FROM bands GROUP BY band_id, band_key
    ) k ON b.band_id = k.band_id AND b.band_key = k.band_key
    WHERE b.doc_id > k.keeper
    """,
)
def dedup_lsh_clusters(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return _keeper_edges(docs)


# ---------------------------------------------------------------------------
# Duplicate connected components: min-label propagation over the keeper
# edges to a fixpoint — two docs share a component iff they are joined by
# any chain of shared LSH buckets. The Spark side is the standard
# driver-orchestrated iterative loop (localCheckpoint per round to cut
# lineage, monotone label sum as the convergence test — labels only ever
# decrease, so the sum is strictly decreasing until the fixpoint); the
# oracle replays the same fixpoint as a DuckDB recursive CTE, so even this
# iterative algorithm gets an exact value-hash check. At 100 TB each round
# is 3 shuffles keyed by node id; rounds scale with the bucket-graph
# diameter (small: buckets are stars), not corpus size.
# ---------------------------------------------------------------------------
@query(
    "dedup_components",
    _BANDS_SQL.replace("WITH sig", "WITH RECURSIVE sig", 1)
    + """
    , keepers AS (
        SELECT band_id, band_key, min(doc_id) AS keeper
        FROM bands GROUP BY band_id, band_key
    ),
    edges AS (
        SELECT DISTINCT b.doc_id AS member, k.keeper
        FROM bands b
        JOIN keepers k ON b.band_id = k.band_id AND b.band_key = k.band_key
        WHERE b.doc_id > k.keeper
    ),
    und AS (
        SELECT member AS src, keeper AS dst FROM edges
        UNION
        SELECT keeper AS src, member AS dst FROM edges
    ),
    walk(node, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.node, u.dst FROM walk w JOIN und u ON u.src = w.lab
    )
    SELECT node AS doc_id, min(lab) AS component
    FROM walk GROUP BY node
    """,
)
def dedup_components(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    edges = _keeper_edges(docs)
    und = edges.select(
        F.col("member").alias("src"), F.col("keeper").alias("dst")
    ).union(edges.select(F.col("keeper").alias("src"), F.col("member").alias("dst")))
    und = und.transform(materialize)
    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("component")
    ).transform(materialize)
    prev_sum = labels.agg(F.sum("component")).first()[0]
    # Fixpoint, no round cap (mirrors dbscan_embeddings): labels only
    # decrease, so the sum stalls exactly at convergence; a cap would
    # diverge from the exact recursive-CTE oracle on any component
    # whose diameter exceeds it.
    while True:
        nbr_min = (
            und.join(labels, und.dst == labels.node)
            .groupBy(F.col("src").alias("nbr_node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.nbr_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
            .transform(materialize)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias("doc_id"), "component")


# ---------------------------------------------------------------------------
# Incremental batch dedup — the continual-ingestion shape (round 5): a
# NEW batch arrives and must be classified against the EXISTING corpus
# index, not self-joined. Every self-dedup query above answers "what
# duplicates exist in this corpus"; a 100 TB pipeline ingesting daily
# asks the cheaper question "which of these N new docs are already
# indexed" — exact (content hash in the index) vs near-dup (shares a
# MinHash band with any indexed doc) vs novel. Both probes are SEMI
# joins: existence only, so a duplicate mega-family in the index costs
# one bucket hit, never O(k²) pairs — no MAX_BUCKET cap needed. At real
# scale the incoming batch is tiny relative to the index and broadcasts;
# the index's band table is exactly the artifact an incremental pipeline
# keeps materialized between runs. Gate split: doc_id % 10 = 0 plays the
# incoming batch, the rest the index.
# ---------------------------------------------------------------------------
def classify_against_index(
    incoming, hash_index, band_index,
    incoming_hashes=None, incoming_bands=None,
):
    """(doc_id, status): exact_dup / near_dup / novel against an index —
    THE shared classification rule. ``dedup_incremental_batch`` (the
    oracle-gated batch backfill) and the streaming ingest twin
    (pipeline.streaming_incremental) both call this one function, so
    the two paths cannot drift (the C2 dual-rule pattern applied to
    curation). hash_index: DF[text_hash]; band_index: DF[band_id,
    band_key]. SEMI joins only — a duplicate mega-family costs one
    existence probe, never O(k²).

    Round 12: ``incoming_hashes`` (DF[doc_id, text_hash]) and
    ``incoming_bands`` (DF[doc_id, band_id, band_key]) let a caller
    that already materialized the per-doc signatures (the batch query's
    one-pass frame) skip re-deriving them from text; the probe/join
    logic — the rule itself — is unchanged either way."""
    if incoming_hashes is None:
        incoming_hashes = incoming.select(
            "doc_id", F.md5("text").alias("text_hash")
        )
    if incoming_bands is None:
        incoming_bands = _bands(incoming)
    exact_hit = (
        incoming_hashes
        .join(hash_index, "text_hash", "left_semi")
        .select("doc_id")
        .withColumn("is_exact", F.lit(1))
    )
    near_hit = (
        incoming_bands
        .join(band_index, ["band_id", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    # the hit frames are batch-sized but DOC-grain (they scale with the
    # incoming batch) and near_hit is explode-fed, so estimator
    # broadcast is the round-11 OOM class for a large backfill batch —
    # pin the doc_id-co-partitioned merge join, correct at every batch
    # size (round-12 Generate-fed broadcast audit)
    return (
        incoming.select("doc_id")
        .join(exact_hit.hint("merge"), "doc_id", "left")
        .join(near_hit.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, "exact_dup")
            .when(F.col("is_near") == 1, "near_dup")
            .otherwise("novel")
            .alias("status"),
        )
    )


@query(
    "dedup_incremental_batch",
    _BANDS_SQL
    + """
    , inc AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0
    ),
    idx_h AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
    ),
    near AS (
        SELECT DISTINCT a.doc_id
        FROM bands a JOIN bands b
          ON b.band_id = a.band_id AND b.band_key = a.band_key
         AND b.doc_id % 10 <> 0
        WHERE a.doc_id % 10 = 0
    )
    SELECT i.doc_id,
           CASE WHEN i.h IN (SELECT h FROM idx_h) THEN 'exact_dup'
                WHEN i.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
                ELSE 'novel' END AS status
    FROM inc i
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    # Round 12 (scan-collapse): the md5 and min-hash chains previously
    # ran once per side per probe — 5 document scans in one plan. One
    # pass computes the narrow per-doc signature frame (hash + two band
    # keys, no text), materialized once; both index sides and both
    # probe sides derive from it. The classification rule itself stays
    # in classify_against_index, shared with the streaming twin.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sig = (
        docs.select(
            "doc_id",
            F.md5("text").alias("text_hash"),
            *[_minhash_expr(j) for j in range(N_MINHASH)],
        )
        .select(
            "doc_id",
            "text_hash",
            F.concat("mh0", "mh1").alias("bk0"),
            F.concat("mh2", "mh3").alias("bk1"),
        )
        .transform(materialize)
    )
    incoming = sig.filter(F.col("doc_id") % 10 == 0)
    indexed = sig.filter(F.col("doc_id") % 10 != 0)
    return classify_against_index(
        incoming,
        indexed.select("text_hash").distinct(),
        _explode_band_keys(indexed).select("band_id", "band_key").distinct(),
        incoming_hashes=incoming.select("doc_id", "text_hash"),
        incoming_bands=_explode_band_keys(incoming),
    )


# ---------------------------------------------------------------------------
# Token-set Jaccard verification on candidate pairs (n-gram Jaccard with
# n=1; the LSH pairs bound the comparison set).
# ---------------------------------------------------------------------------
@query(
    "dedup_jaccard_verify",
    """
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.ts, b.ts)) AS n_common,
               len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS n_union
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id AND a.doc_id < 20
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / n_union AS jaccard
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / n_union > 0.5
    """,
)
def dedup_jaccard_verify(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("ts")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    common = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - common
    jac = common.cast("double") / union
    return (
        # the probe slice is bounded by construction (20 docs): declare
        # the broadcast — the 100x stress showed Generate-fed size
        # estimates can hand the build side to the corpus (curation.py
        # contamination note)
        F.broadcast(a.filter(F.col("doc_id") < 20))
        .join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") > 0.5)
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: content hash prefix + bucket (rolling-hash stand-in
# that both engines compute identically).
# ---------------------------------------------------------------------------
@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           substr(md5(text), 1, 16) AS fingerprint,
           substr(md5(text), 1, 2) AS bucket
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fingerprint"),
        F.substring(F.md5("text"), 1, 2).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
# algorithm): hash every character k-gram, slide a window of w consecutive
# k-gram hashes, keep each window's minimum, dedupe. Guarantees any match
# of length ≥ w+k-1 shares a fingerprint, with density 2/(w+1). Entirely
# higher-order functions over one projection — no shuffle until the final
# explode, and at 100 TB it stays embarrassingly parallel per document.
# k=8/w=4; hashes compared as md5 hex strings (identical in both engines).
# ---------------------------------------------------------------------------
WINNOW_K = 8
WINNOW_W = 4


@query(
    "text_winnow_fingerprints",
    f"""
    WITH g AS (
        SELECT doc_id, lower(text) AS t,
               greatest(len(lower(text)) - {WINNOW_K} + 1, 0) AS n
        FROM documents
    ),
    h AS (
        SELECT doc_id, n,
               list_transform(range(1, n + 1),
                              i -> md5(substr(t, CAST(i AS INTEGER), {WINNOW_K})))
                 AS hs
        FROM g
    ),
    w AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(range(1, n - {WINNOW_W} + 2),
                                j -> list_aggregate(
                                       list_slice(hs, CAST(j AS INTEGER),
                                                  CAST(j + {WINNOW_W} - 1 AS INTEGER)),
                                       'min'))
               ) AS fps
        FROM h
        WHERE n >= {WINNOW_W}
    )
    SELECT doc_id, unnest(fps) AS fingerprint
    FROM w
    """,
)
def text_winnow_fingerprints(spark, sf_dir):
    # CPU-bound per byte (~n_chars md5 calls per doc): byte-based
    # partition sizing undershoots, so ask for real core spread
    docs = load_table(spark, sf_dir, "documents")
    docs = ensure_parallelism(
        docs, min_partitions=docs.sparkSession.sparkContext.defaultParallelism // 2
    )
    t = F.lower(F.col("text"))
    n = F.greatest(F.length(t) - F.lit(WINNOW_K - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.md5(F.substring(t, i, WINNOW_K))
    )
    h = docs.select(
        "doc_id", n.alias("n"), F.when(n >= 1, grams).otherwise(F.array()).alias("hs")
    ).filter(F.col("n") >= WINNOW_W)
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - F.lit(WINNOW_W - 1)),
            lambda j: F.array_min(F.slice("hs", j, WINNOW_W)),
        )
    )
    return h.select("doc_id", F.explode(fps).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Text stats / quality scoring: tokenization + stopword ratio, pure
# higher-order functions — zero Python in the hot path.
# ---------------------------------------------------------------------------
@query(
    "text_stats",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(lower(text), ' '),
                           t -> list_contains({STOPWORDS!r}, t))) AS n_stopwords,
           CAST(len(list_filter(string_split(lower(text), ' '),
                                t -> list_contains({STOPWORDS!r}, t))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stops = F.size(
        F.filter(
            _tokens(F.col("text")),
            lambda t: t.isin(STOPWORDS),
        )
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        stops.alias("n_stopwords"),
        (stops.cast("double") / F.size(toks)).alias("stopword_ratio"),
        F.length("text").alias("n_chars_actual"),
    )


# ---------------------------------------------------------------------------
# Language × quality rollup (quality score: length buckets).
# ---------------------------------------------------------------------------
@query(
    "text_quality_by_lang",
    """
    SELECT lang,
           CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 350 THEN 'medium'
                ELSE 'long' END AS len_bucket,
           count(*) AS n_docs,
           CAST(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS DOUBLE)
             AS avg_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def text_quality_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 350, "medium")
        .otherwise("long")
    )
    n_toks = F.size(F.split(F.col("text"), " "))
    return (
        docs.withColumn("len_bucket", bucket)
        .groupBy("lang", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(n_toks).cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Token counting per source (corpus accounting).
# ---------------------------------------------------------------------------
@query(
    "token_count_by_source",
    """
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
)
def token_count_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Global vocabulary top-k — the word-count shape at corpus scale: explode →
# partial count per partition (map-side combine) → one shuffle on token →
# TakeOrderedAndProject. Deterministic tiebreak on the token itself.
# ---------------------------------------------------------------------------
@query(
    "vocab_topk",
    """
    SELECT token, count(*) AS freq
    FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 100
    """,
)
def vocab_topk(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# BPE-ish subword accounting: a GPT-style pre-tokenizer approximation
# (letter runs / digit runs / punctuation runs) counted next to whitespace
# tokens. The character classes are chosen so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte.
# ---------------------------------------------------------------------------
_SUBWORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]+"


@query(
    "subword_token_stats",
    f"""
    SELECT source,
           CAST(sum(len(regexp_extract_all(lower(text), '{_SUBWORD_RE}'))) AS BIGINT)
             AS n_subwords,
           CAST(sum(len(list_filter(string_split(lower(text), ' '), t -> t <> '')))
                AS BIGINT) AS n_ws_tokens,
           CAST(CAST(sum(len(regexp_extract_all(lower(text), '{_SUBWORD_RE}'))) AS DOUBLE)
                / sum(len(list_filter(string_split(lower(text), ' '), t -> t <> '')))
                AS DOUBLE) AS subwords_per_token
    FROM documents
    GROUP BY source
    """,
)
def subword_token_stats(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    low = F.lower(F.col("text"))
    n_sub = F.size(F.regexp_extract_all(low, F.lit(_SUBWORD_RE), F.lit(0)))
    n_ws = F.size(F.filter(F.split(low, " "), lambda t: t != ""))
    return docs.groupBy("source").agg(
        F.sum(n_sub).cast("long").alias("n_subwords"),
        F.sum(n_ws).cast("long").alias("n_ws_tokens"),
        (F.sum(n_sub).cast("double") / F.sum(n_ws))
        .cast("double")
        .alias("subwords_per_token"),
    )


# ---------------------------------------------------------------------------
# Language ID heuristic: stopword-profile vote, engine-replayable exactly.
# ---------------------------------------------------------------------------
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "la", "et"],
}


@query(
    "lang_id_heuristic",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["en"]!r}, t))) AS s_en,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["es"]!r}, t))) AS s_es,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["de"]!r}, t))) AS s_de,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["fr"]!r}, t))) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
)
def lang_id_heuristic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def score(markers):
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    s = {k: score(v) for k, v in _LANG_MARKERS.items()}
    pred = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )
    return docs.select("doc_id", "lang", pred.alias("lang_pred"))


# ---------------------------------------------------------------------------
# KNN similarity search: brute-force top-k per query vector. Dot products on
# quantized ints (round(x*1000)) — exact integer arithmetic in both engines,
# so ranking is fully deterministic. Scale path: broadcast the query set
# (tiny) against the full embedding table — no shuffle of the big side.
# ---------------------------------------------------------------------------
@query(
    "knn_topk_dot",
    """
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               CAST(list_dot_product(
                    qv,
                    list_transform(e.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               ) AS BIGINT) AS dot
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, dot,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id)
                AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 10
    """,
)
def knn_topk_dot(spark, sf_dir):
    """Brute-force KNN, the vectorized way: the tiny query set is collected
    (it is a query *parameter*, not data), quantized JVM-side so the
    integers match the oracle bit-for-bit, and the scan side computes all
    query dots per row in one numpy int64 matmul inside an Arrow-batched
    pandas UDF — the per-element higher-order-function form runs
    interpreted per array slot and is ~10× slower."""
    import numpy as np
    import pandas as pd

    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    quant = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < 5).select("vec_id", quant.alias("qv")).collect(),
        key=lambda r: r.vec_id,
    )
    qmat = np.array([r.qv for r in qrows], dtype=np.int64)
    qids = F.array(*[F.lit(int(r.vec_id)).cast("long") for r in qrows])

    def _all_dots(ev: pd.Series) -> pd.Series:
        m = np.stack(ev.to_numpy()).astype(np.int64)
        return pd.Series(list(m @ qmat.T))

    _all_dots.__annotations__ = {"ev": pd.Series, "return": pd.Series}
    all_dots = F.pandas_udf(_all_dots, "array<long>")

    e = emb.select(F.col("vec_id").alias("neighbor_id"), quant.alias("ev"))
    pairs = (
        e.select("neighbor_id", F.posexplode(all_dots(F.col("ev"))).alias("qi", "dot"))
        .select(
            F.element_at(qids, F.col("qi") + 1).alias("query_id"),
            "neighbor_id",
            "dot",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Embedding norms / label centroids — the aggregation side of similarity.
# ---------------------------------------------------------------------------
@query(
    "embedding_label_stats",
    """
    SELECT label,
           count(*) AS n_vectors,
           CAST(sum(CAST(list_dot_product(
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           ) AS BIGINT)) AS BIGINT) AS sum_sq_norm_q
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_label_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    quant = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    sq = F.aggregate(
        F.zip_with(quant, quant, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        emb.select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("sq").cast("long").alias("sum_sq_norm_q"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus profiling — the QA pass a training-data pipeline runs before and
# after every transform: per-source null/empty rates, exact distinct
# counts, char-length spread, language mix. All counts are exact
# integers; one full scan, one shuffle on the grouping key. At 100 TB
# this runs as a partial-aggregated rollup (map-side combine), and the
# distinct counts would switch to the HLL sketches pinned in
# tests/test_approx.py — kept exact here so the oracle can hash-match.
# ---------------------------------------------------------------------------
@query(
    "profile_documents",
    """
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_empty,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           count(DISTINCT doc_id) AS n_distinct_ids
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def profile_documents(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    empty = F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(empty).alias("n_empty"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
            F.countDistinct("doc_id").alias("n_distinct_ids"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Distinctive terms per language — TF-IDF's ranking intent with exact
# integer ordering: a term is distinctive for a language when it is
# frequent there (high tf) and rare elsewhere (low document frequency).
# Ordering by (tf DESC, df ASC, term) is a float-free proxy for
# tf·idf — monotone in tf and anti-monotone in df — so Spark and DuckDB
# rank identically with no log() in sight. Two shuffles: token rollup,
# then per-language top-k via ranking window.
# ---------------------------------------------------------------------------
@query(
    "text_distinctive_terms",
    """
    WITH toks AS (
      SELECT lang, doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT lang, term, count(*) AS tf
      FROM toks WHERE term <> '' GROUP BY lang, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM toks WHERE term <> '' GROUP BY term
    )
    SELECT lang, term, tf, df,
           CAST(row_number() OVER (PARTITION BY lang
                ORDER BY tf DESC, df ASC, term) AS BIGINT) AS rnk
    FROM tf JOIN df USING (term)
    QUALIFY rnk <= 10
    ORDER BY lang, rnk
    """,
)
def text_distinctive_terms(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("lang").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        # vocab-grain df (Heaps-growing): pin merge, never broadcast
        tf.join(df.hint("merge"), "term")
        .select(
            "lang",
            "term",
            "tf",
            "df",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram detection: word n-grams repeated across ≥2 distinct
# documents, ranked by corpus frequency — the standard pass for finding
# navigation chrome / license headers / template text before removal.
# Map-side explode of per-doc n-grams (pure HOFs, no Python), one keyed
# exchange with partial aggs, TakeOrderedAndProject for the top-k. At
# 100 TB the explode is embarrassingly parallel per document and the
# groupBy benefits from map-side combine because boilerplate is by
# definition heavy-hitter-skewed.
# ---------------------------------------------------------------------------
BOILERPLATE_N = 3


@query(
    "boilerplate_ngrams",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(toks) - {BOILERPLATE_N} + 2),
               i -> array_to_string(
                      list_slice(toks, CAST(i AS INTEGER),
                                 CAST(i + {BOILERPLATE_N} - 1 AS INTEGER)),
                      ' '))) AS ngram
      FROM t
      WHERE len(toks) >= {BOILERPLATE_N}
    )
    SELECT ngram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g
    GROUP BY ngram
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_occurrences DESC, ngram ASC
    LIMIT 100
    """,
)
def boilerplate_ngrams(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES_MID)
    n = BOILERPLATE_N

    # N-gram generation stays map-only (the right 100 TB shape — no
    # shuffle before the ngram rollup); emitted from an Arrow batch
    # instead of the transform(sequence, slice, array_join) expression,
    # whose interpreted per-index lambdas dominated the query. Byte
    # semantics identical: ' '.join over the same split tokens.
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            grams: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in str(text or "").lower().split(" ") if t]
                for i in range(len(toks) - n + 1):
                    ids.append(doc_id)
                    grams.append(" ".join(toks[i : i + n]))
            yield pd.DataFrame({"doc_id": ids, "ngram": grams})

    return (
        docs.select("doc_id", "text")
        .mapInPandas(gen, "doc_id long, ngram string")
        .groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Unigram-LM quality proxy (model-free perplexity stand-in): score every
# document by the corpus-level frequency of its own tokens. Low mean
# frequency / high rare-token ratio ≈ high unigram surprisal — the
# cheap first-pass quality filter pipelines run before any learned LM.
# Exact-integer aggregates (token frequencies are counts) so the oracle
# hash-matches; only the final ratios divide, identically in both
# engines. Two keyed exchanges at scale: token (frequency table +
# join-back) and doc_id (rollup) — the frequency side is Zipf-skewed,
# which is fine: partial aggs absorb the head tokens map-side.
# ---------------------------------------------------------------------------
RARE_FREQ_THR = 5


@query(
    "rare_token_score",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) AS token
        FROM documents
    ),
    freq AS (
        SELECT token, count(*) AS f FROM toks GROUP BY token
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(f.f) AS BIGINT) AS sum_freq,
           CAST(count(*) FILTER (WHERE f.f <= {RARE_FREQ_THR}) AS BIGINT)
             AS n_rare,
           CAST(CAST(sum(f.f) AS DOUBLE) / count(*) AS DOUBLE) AS mean_freq,
           CAST(CAST(count(*) FILTER (WHERE f.f <= {RARE_FREQ_THR}) AS DOUBLE)
                / count(*) AS DOUBLE) AS rare_ratio
    FROM toks t JOIN freq f USING (token)
    GROUP BY t.doc_id
    """,
)
def rare_token_score(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    freq = toks.groupBy("token").agg(F.count("*").alias("f"))
    # vocab-grain frame (Heaps-growing): never estimator-broadcast —
    # pin the token-keyed merge join (round-13 audit, chi2 class)
    j = toks.join(freq.hint("merge"), "token")
    n = F.count("*")
    rare = F.count(F.when(F.col("f") <= RARE_FREQ_THR, 1))
    return j.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.sum("f").cast("long").alias("sum_freq"),
        rare.cast("long").alias("n_rare"),
        (F.sum("f").cast("double") / n).alias("mean_freq"),
        (rare.cast("double") / n).alias("rare_ratio"),
    )


# ---------------------------------------------------------------------------
# Word co-occurrence / PMI — which words travel together across
# documents (collocation mining; the scaled-integer PMI score makes the
# ranking hash-exact). score = 10^6 · n_ab · N / (n_a · n_b), i.e. PMI
# without the log — monotone in PMI, so the top-k is identical. Pair
# generation is a within-document self-join on the (distinct) word
# sets; the explode is map-side, the pair count is one keyed shuffle.
# At 100 TB you'd pre-filter to a vocabulary (df bounds) first — here
# the corpus vocabulary is already small.
# ---------------------------------------------------------------------------
@query(
    "cooccur_pmi_topk",
    """
    WITH dw AS (
        SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents WHERE length(text) > 0
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS nd FROM dw),
    wc AS (SELECT w, count(*) AS n_w FROM dw GROUP BY w),
    pairs AS (
        SELECT a.w AS w_a, b.w AS w_b, count(*) AS n_ab
        FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY a.w, b.w
    )
    SELECT w_a, w_b, n_ab,
           (1000000 * p.n_ab * nd.nd) // (ca.n_w * cb.n_w) AS pmi_scaled
    FROM pairs p
    JOIN wc ca ON ca.w = p.w_a
    JOIN wc cb ON cb.w = p.w_b
    CROSS JOIN n_docs nd
    ORDER BY pmi_scaled DESC, w_a, w_b
    LIMIT 50
    """,
)
def cooccur_pmi_topk(spark, sf_dir):
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    # Round 12: dw feeds the doc count, the word counts, and BOTH sides
    # of the within-doc self-join — materialize the distinct (doc, word)
    # frame once (linear state) instead of four explode+distinct passes.
    dw = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("w")
    ).distinct().transform(materialize)
    n_docs = dw.select("doc_id").distinct().count()  # scalar: tiny, plan-time
    wc = dw.groupBy("w").agg(F.count("*").alias("n_w"))
    # corpus-scale within-doc self-join: pin merge — the (doc_id, w)
    # frame is explode-fed, so the estimator can broadcast a corpus-
    # sized build at scale (round-12 Generate-fed broadcast audit)
    pairs = (
        dw.alias("a")
        .join(dw.hint("merge").alias("b"), "doc_id")
        .filter(F.col("a.w") < F.col("b.w"))
        .groupBy(F.col("a.w").alias("w_a"), F.col("b.w").alias("w_b"))
        .agg(F.count("*").alias("n_ab"))
    )
    scored = (
        pairs.join(F.broadcast(wc.withColumnRenamed("w", "w_a")
                   .withColumnRenamed("n_w", "n_a")), "w_a")
        .join(F.broadcast(wc.withColumnRenamed("w", "w_b")
              .withColumnRenamed("n_w", "n_b")), "w_b")
        .select(
            "w_a",
            "w_b",
            "n_ab",
            F.expr(f"(1000000 * n_ab * {n_docs}) div (n_a * n_b)").alias(
                "pmi_scaled"
            ),
        )
    )
    return scored.orderBy(
        F.desc("pmi_scaled"), "w_a", "w_b"
    ).limit(50)


# ---------------------------------------------------------------------------
# Bigram LM familiarity — the word-ORDER quality signal that unigram
# rarity (rare_token_score) can't see: score each document by the mean
# corpus frequency of its adjacent word pairs, integer-scaled. A doc of
# common words in an unusual order scores low — the model-free stand-in
# for LM perplexity filtering (CCNet-style), with the corpus itself as
# the LM. Plan: bigram explode map-side, corpus pair-count aggregate
# (bounded by vocab², tiny here) broadcast back onto the doc pairs, one
# partial-agg groupBy per doc.
# ---------------------------------------------------------------------------
@query(
    "bigram_lm_score",
    """
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
    )
    SELECT doc_id, n_pairs,
           CAST((1000000 * fam) // n_pairs AS BIGINT) AS lm_familiarity
    FROM scored
    """,
)
def bigram_lm_score(spark, sf_dir):
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    words = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    pairs = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], '_', t[i + 1]))"
            )
        ).alias("bg"),
    )
    corpus = pairs.groupBy("bg").agg(F.count("*").alias("c"))
    scored = (
        pairs.join(F.broadcast(corpus), "bg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_pairs"), F.sum("c").alias("fam"))
    )
    return scored.select(
        "doc_id",
        "n_pairs",
        F.expr("(1000000 * fam) div n_pairs").alias("lm_familiarity"),
    )


# ---------------------------------------------------------------------------
# Near-dup rate per source: the exact-dedup sweep rolled up to the source
# dimension — the per-provider quality scorecard a curation run reports.
# Reuses the dedup_exact shape (one shuffle on the content hash) and joins
# the keeper verdict back to source granularity.
# ---------------------------------------------------------------------------
@query(
    "dup_rate_by_source",
    """
    WITH h AS (
        SELECT doc_id, source, md5(text) AS text_hash FROM documents
    ),
    g AS (
        SELECT text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM h GROUP BY text_hash
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (h.doc_id <> g.keeper_id) AS BIGINT)
               AS n_dropped,
           CAST(count(*) FILTER (g.n_copies > 1) AS BIGINT)
               AS n_in_dup_families,
           CAST(count(*) FILTER (h.doc_id <> g.keeper_id) * 1000000
                // count(*) AS BIGINT) AS drop_ppm
    FROM h JOIN g USING (text_hash)
    GROUP BY h.source
    """,
)
def dup_rate_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5("text").alias("text_hash"))
    g = h.groupBy("text_hash").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    )
    j = h.join(g, "text_hash")
    dropped = (F.col("doc_id") != F.col("keeper_id")).cast("long")
    in_fam = (F.col("n_copies") > 1).cast("long")
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(dropped).cast("long").alias("n_dropped"),
        F.sum(in_fam).cast("long").alias("n_in_dup_families"),
        F.expr(
            "CAST(sum(CAST(doc_id <> keeper_id AS BIGINT)) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("drop_ppm"),
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster representative selection — the step AFTER dedup
# clustering that every curation pipeline runs: of each near-dup
# family, keep the best document by an explicit quality model, not an
# arbitrary min-id. Cluster label = one min-label step over the
# keeper-star edges (each doc's smallest keeper; dedup_components is
# the fixpoint variant); representative = argmax integer quality score
# (quality_linear_score weights), ties to the lowest doc_id.
# Singleton clusters are dropped — the output is the keep-list for
# duplicate families only. One window per cluster over ≤family-size
# rows; everything upstream is the linear keeper-edge plan.
# ---------------------------------------------------------------------------


def _qscore_sql() -> str:
    from eventsourcing_spark.pipeline.quality import (
        STOPWORDS,
        W_MWL,
        W_STOP,
        W_TOK,
        W_UNIQ,
    )

    return f"""
    qm AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tok,
               len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
               list_aggregate(list_transform(string_split(lower(text), ' '),
                                             x -> len(x)), 'sum') AS sum_len,
               len(list_filter(string_split(lower(text), ' '),
                               x -> list_contains({STOPWORDS!r}, x))) AS n_stop
        FROM documents
    ),
    qs AS (
        SELECT doc_id,
               {W_TOK} * n_tok
                 + {W_MWL} * (sum_len * 10 // n_tok)
                 + {W_STOP} * (n_stop * 1000 // n_tok)
                 + {W_UNIQ} * (n_uniq * 1000 // n_tok) AS score
        FROM qm
    )"""


@query(
    "cluster_rep_selection",
    _BANDS_SQL
    + """,
    k AS (
        SELECT band_id, band_key, min(doc_id) AS keeper
        FROM bands GROUP BY band_id, band_key
    ),
    e AS (
        SELECT DISTINCT b.doc_id AS member, k.keeper
        FROM bands b
        JOIN k ON b.band_id = k.band_id AND b.band_key = k.band_key
        WHERE b.doc_id > k.keeper
    ),
    lab AS (
        SELECT d.doc_id, coalesce(min(e.keeper), d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN e ON e.member = d.doc_id
        GROUP BY d.doc_id
    ),
"""
    + _qscore_sql()
    + """,
    j AS (
        SELECT lab.cluster_id, lab.doc_id, qs.score,
               count(*) OVER (PARTITION BY lab.cluster_id) AS n_members,
               row_number() OVER (PARTITION BY lab.cluster_id
                    ORDER BY qs.score DESC, lab.doc_id) AS rn
        FROM lab JOIN qs ON qs.doc_id = lab.doc_id
    )
    SELECT cluster_id, doc_id AS rep_doc_id,
           CAST(score AS BIGINT) AS rep_score,
           CAST(n_members AS BIGINT) AS n_members
    FROM j WHERE rn = 1 AND n_members >= 2
    """,
)
def cluster_rep_selection(spark, sf_dir):
    from eventsourcing_spark.pipeline.quality import (
        STOPWORDS,
        W_MWL,
        W_STOP,
        W_TOK,
        W_UNIQ,
    )

    # Round 12 (scan-collapse): the lab base (docs.select(doc_id)) and
    # the qs join were separate consumers — 3 document scans. The
    # quality columns ride the SAME rows the label join uses (score is
    # functionally determined by doc_id), so qs IS the join base and
    # the lab⋈qs equi-join disappears: 2 scans (keeper edges + quality
    # pass), one doc-keyed shuffle fewer.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    edges = _keeper_edges(docs)
    toks = F.split(F.lower("text"), " ")
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    qm = docs.select(
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
    qs = qm.select(
        "doc_id",
        (
            F.lit(W_TOK) * F.col("n_tok")
            + F.lit(W_MWL) * F.expr("sum_len * 10 div n_tok")
            + F.lit(W_STOP) * F.expr("n_stop * 1000 div n_tok")
            + F.lit(W_UNIQ) * F.expr("n_uniq * 1000 div n_tok")
        ).alias("score"),
    )
    j = (
        qs.join(edges, qs["doc_id"] == edges["member"], "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.min("keeper"), F.first("doc_id")).alias(
                "cluster_id"
            ),
            F.first("score").alias("score"),
        )
    )
    wc = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        j.withColumn("n_members", F.count("*").over(wc))
        .withColumn("rn", F.row_number().over(wr))
        .filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("score").cast("long").alias("rep_score"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash accuracy audit — the estimator-vs-truth sweep for the dedup
# family, mirroring what the sketch queries do for counts: on every LSH
# candidate pair, the K=16-permutation MinHash Jaccard estimate
# (matching-minima fraction, Broder 1997) next to the true token-set
# Jaccard, both ppm-scaled integers. This is the number you tune band/
# row parameters against before a 100 TB dedup run. The 16-hash
# signature is computed once per doc map-side; candidates come from the
# same capped LSH buckets as dedup_lsh_pairs; true Jaccard touches only
# candidate pairs, never the corpus cross-product.
# ---------------------------------------------------------------------------

MH_EST_K = 16


@query(
    "minhash_jaccard_estimate",
    _BANDS_SQL
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
        WHERE a.bucket_n <= {MAX_BUCKET}
    ),
    sig16 AS (
        SELECT doc_id,
               {", ".join(_minhash_oracle(j).replace(f"AS mh{j}", f"AS m{j}")
                          for j in range(MH_EST_K))}
        FROM documents
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS t
        FROM documents
    )
    SELECT c.doc_a, c.doc_b,
           CAST({" + ".join(f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END"
                            for j in range(MH_EST_K))} AS BIGINT) AS n_match,
           CAST(({" + ".join(f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END"
                             for j in range(MH_EST_K))})
                * 1000000 // {MH_EST_K} AS BIGINT) AS est_ppm,
           CAST(len(list_intersect(ta.t, tb.t)) * 1000000
                // (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)))
                AS BIGINT) AS true_ppm
    FROM cand c
    JOIN sig16 sa ON sa.doc_id = c.doc_a
    JOIN sig16 sb ON sb.doc_id = c.doc_b
    JOIN toks ta ON ta.doc_id = c.doc_a
    JOIN toks tb ON tb.doc_id = c.doc_b
    """,
)
def minhash_jaccard_estimate(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    buckets = (
        _bands(docs)
        .groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
    cand = (
        buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias(
                "doc_b"
            ),
        )
        .distinct()
    )
    def _mh(j: int):
        # factory, not a default-arg lambda: transform() interprets a
        # two-parameter lambda as (element, index) and would shadow j
        return F.array_min(
            F.transform(
                _tokens(F.col("text")),
                lambda t: F.md5(F.concat(t, F.lit(str(j)))),
            )
        )

    sig16 = docs.select(
        "doc_id",
        F.array(*[_mh(j) for j in range(MH_EST_K)]).alias("sig"),
        F.array_distinct(_tokens(F.col("text"))).alias("t"),
    )
    # Round 12 (scan-collapse): sa and sb were two consumers of sig16,
    # re-running the 16-hash minhash chain over the corpus per join
    # side (3 document scans). Each candidate pair instead explodes
    # into its two member rows, joins sig16 ONCE on doc_id, and the
    # pair re-assembles in a groupBy keyed on (doc_a, doc_b) — first()
    # with a side guard is deterministic (exactly one non-null per
    # side per pair). One minhash pass, one join. The pair-member side
    # is Generate-fed (candidate explode grows with the corpus), so the
    # join is pinned to shuffle-merge — the estimator would otherwise
    # broadcast the exploded side on its parent's size estimate.
    sides = cand.select(
        "doc_a",
        "doc_b",
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id"),
    )
    paired = (
        sides.hint("merge").join(sig16, "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.first(
                F.when(F.col("doc_id") == F.col("doc_a"), F.col("sig")),
                ignorenulls=True,
            ).alias("sig_a"),
            F.first(
                F.when(F.col("doc_id") == F.col("doc_b"), F.col("sig")),
                ignorenulls=True,
            ).alias("sig_b"),
            F.first(
                F.when(F.col("doc_id") == F.col("doc_a"), F.col("t")),
                ignorenulls=True,
            ).alias("t_a"),
            F.first(
                F.when(F.col("doc_id") == F.col("doc_b"), F.col("t")),
                ignorenulls=True,
            ).alias("t_b"),
        )
    )
    n_match = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda a, b: F.when(a == b, 1).otherwise(0)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inter = F.size(F.array_intersect("t_a", "t_b")).cast("long")
    union = F.size("t_a").cast("long") + F.size("t_b").cast("long") - inter
    return (
        paired
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_match"),
            (inter * 1000000).alias("__num"),
            union.alias("__den"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            F.expr(f"n_match * 1000000 div {MH_EST_K}").alias("est_ppm"),
            F.expr("__num div __den").alias("true_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# LSH parameter sweep — the banding trade-off (b bands × r rows) made
# measurable: with the same 4 minhashes arranged as 4×1, 2×2, and 1×4,
# candidate-pair counts, precision, and recall against the brute-force
# Jaccard-≥½ truth set. More bands → higher recall, worse precision
# (collision prob 1−(1−s^r)^b); this query emits the actual curve for
# the corpus so the 100 TB run picks its operating point from data, not
# folklore. The brute-force truth is the audit-only part (all-pairs
# token intersection — fine at gate scale, never run on the corpus);
# candidate generation per config is the same capped-bucket plan as
# dedup_lsh_pairs. All ratios ppm-scaled integers.
# ---------------------------------------------------------------------------

LSH_CONFIGS = {
    "b4r1": [["mh0"], ["mh1"], ["mh2"], ["mh3"]],
    "b2r2": [["mh0", "mh1"], ["mh2", "mh3"]],
    "b1r4": [["mh0", "mh1", "mh2", "mh3"]],
}


def _sweep_cand_sql(name: str, bands: list[list[str]]) -> str:
    arms = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, {' || '.join(cols)} AS band_key"
        " FROM sig"
        for bi, cols in enumerate(bands)
    )
    return f"""
    bands_{name} AS ({arms}),
    sized_{name} AS (
        SELECT doc_id, band_id, band_key,
               count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
        FROM bands_{name}
    ),
    cand_{name} AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sized_{name} a
        JOIN sized_{name} b ON a.band_key = b.band_key
                           AND a.band_id = b.band_id
                           AND a.doc_id < b.doc_id
        WHERE a.bucket_n <= {MAX_BUCKET}
    ),
    m_{name} AS (
        SELECT '{name}' AS config,
               (SELECT count(*) FROM cand_{name}) AS n_candidates,
               (SELECT count(*) FROM truth) AS n_true,
               (SELECT count(*) FROM cand_{name} c
                JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
                 AS n_hit
    )"""


@query(
    "lsh_parameter_sweep",
    f"""
    WITH sig AS (
        SELECT doc_id, {", ".join(_minhash_oracle(j) for j in range(N_MINHASH))}
        FROM documents
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.t, b.t))
              >= len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))
          AND len(list_intersect(a.t, b.t)) > 0
    ),
    {", ".join(_sweep_cand_sql(n, b).lstrip() for n, b in LSH_CONFIGS.items())}
    SELECT config,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(CASE WHEN n_true = 0 THEN 0
                     ELSE n_hit * 1000000 // n_true END AS BIGINT)
             AS recall_ppm,
           CAST(CASE WHEN n_candidates = 0 THEN 0
                     ELSE n_hit * 1000000 // n_candidates END AS BIGINT)
             AS precision_ppm
    FROM ({" UNION ALL ".join(f"SELECT * FROM m_{n}" for n in LSH_CONFIGS)})
    """,
)
def lsh_parameter_sweep(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sig = docs.select(
        "doc_id", *[_minhash_expr(j) for j in range(N_MINHASH)]
    ).transform(materialize)
    toks = docs.select(
        "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("t")
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("t_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("t_b"))
    inter = F.size(F.array_intersect("t_a", "t_b"))
    union = F.size("t_a") + F.size("t_b") - inter
    truth = (
        ta.join(tb, F.col("doc_a") < F.col("doc_b"))
        .filter((2 * inter >= union) & (inter > 0))
        .select("doc_a", "doc_b")
        .transform(materialize)
    )
    n_true = truth.count()
    out_rows = []
    for name, bands in LSH_CONFIGS.items():
        b = None
        for bi, cols in enumerate(bands):
            arm = sig.select(
                "doc_id",
                F.lit(bi).alias("band_id"),
                F.concat(*cols).alias("band_key"),
            )
            b = arm if b is None else b.unionByName(arm)
        buckets = (
            b.groupBy("band_id", "band_key")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
        )
        cand = (
            buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
            .select(
                "doc_a",
                F.explode(
                    F.slice("ids", F.col("i") + 2, F.size("ids"))
                ).alias("doc_b"),
            )
            .distinct()
        )
        n_cand = cand.count()
        n_hit = cand.join(truth, ["doc_a", "doc_b"]).count()
        out_rows.append(
            (
                name,
                n_cand,
                n_true,
                n_hit,
                n_hit * 1000000 // n_true if n_true else 0,
                n_hit * 1000000 // n_cand if n_cand else 0,
            )
        )
    return spark.createDataFrame(
        out_rows,
        "config string, n_candidates long, n_true long, n_hit long,"
        " recall_ppm long, precision_ppm long",
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation — confusion matrix of the stopword-vote
# classifier against the ground-truth lang column, with per-true-lang
# share so precision/recall per class read straight off the rows. The
# closing of the classifier loop: every model-ish operator in this
# engine ships with its evaluation query (sketches → exact columns,
# minhash → jaccard audit, LSH → parameter sweep, lang-id → this).
# ---------------------------------------------------------------------------


@query(
    "langid_confusion_matrix",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["en"]!r}, t))) AS s_en,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["es"]!r}, t))) AS s_es,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["de"]!r}, t))) AS s_de,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["fr"]!r}, t))) AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    )
    SELECT lang, lang_pred,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) * 1000000
                // sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
             AS share_of_true_ppm
    FROM pred GROUP BY lang, lang_pred
    """,
)
def langid_confusion_matrix(spark, sf_dir):
    pred = lang_id_heuristic(spark, sf_dir).select("lang", "lang_pred")
    cm = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    return cm.select(
        "lang",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000000").cast("long").alias("__num"),
        F.sum("n").over(w).alias("__den"),
    ).select(
        "lang",
        "lang_pred",
        "n",
        F.expr("__num div __den").cast("long").alias("share_of_true_ppm"),
    )


# ---------------------------------------------------------------------------
# Dedup savings projection — the capacity-planning readout of the dedup
# family: per source, bytes today vs bytes after exact dedup (keep one
# copy per content hash, global — a duplicate is kept ONCE even when it
# spans sources; the keeper's source gets the byte). The ppm saving is
# the number that justifies running the 100 TB dedup job at all. One
# hash-groupBy (the dedup_exact plan) + per-source byte rollups.
# ---------------------------------------------------------------------------


@query(
    "dedup_savings_by_source",
    """
    WITH k AS (
        SELECT min(doc_id) AS keeper_id FROM documents GROUP BY md5(text)
    ),
    kept AS (
        SELECT d.source, strlen(d.text) AS b
        FROM documents d JOIN k ON k.keeper_id = d.doc_id
    ),
    total AS (
        SELECT source, count(*) AS n_docs,
               sum(strlen(text)) AS bytes_total
        FROM documents GROUP BY source
    ),
    dedup AS (
        SELECT source, count(*) AS n_kept, sum(b) AS bytes_kept
        FROM kept GROUP BY source
    )
    SELECT t.source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(t.bytes_total AS BIGINT) AS bytes_total,
           CAST(coalesce(d.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(d.bytes_kept, 0) AS BIGINT) AS bytes_kept,
           CAST((t.bytes_total - coalesce(d.bytes_kept, 0)) * 1000000
                // t.bytes_total AS BIGINT) AS savings_ppm
    FROM total t LEFT JOIN dedup d ON d.source = t.source
    """,
)
def dedup_savings_by_source(spark, sf_dir):
    # Round 12 (scan-collapse): the keeper aggregate, the keeper join
    # side and the per-source totals each scanned documents (3 scans,
    # md5 twice, plus a doc-keyed join). "Doc is the keeper" is simply
    # doc_id == min(doc_id) over (partition by md5(text)) — one window
    # on the same hash-keyed shuffle the old groupBy paid, then ONE
    # per-source rollup with conditional sums. 1 scan, md5 once, no
    # join.
    docs = load_table(spark, sf_dir, "documents")
    keep = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.md5("text"))
    )
    b = F.octet_length("text")
    return (
        docs.select("source", b.alias("b"), keep.alias("is_keeper"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("b").alias("bytes_total"),
            F.sum(F.when(F.col("is_keeper"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("is_keeper"), F.col("b"))).alias("bytes_kept"),
        )
        .select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("bytes_total").cast("long").alias("bytes_total"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("bytes_kept", F.lit(0)).cast("long").alias("bytes_kept"),
        F.expr(
            "(bytes_total - coalesce(bytes_kept, 0)) * 1000000"
            " div bytes_total"
        )
        .cast("long")
        .alias("savings_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Payload-size budget audit — the reference caps event bodies at 60,000
# bytes (MySQL VARBINARY, store/mysql/store.go:678); this is that cap
# as a standing data-quality query over the corpus: per source, byte
# totals, the largest payload, and how many documents would violate a
# configurable budget. Pure map-side byte math + one rollup.
# ---------------------------------------------------------------------------

BODY_BYTE_CAP = 60000


@query(
    "payload_size_budget",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(strlen(text)) AS BIGINT) AS bytes_total,
           CAST(max(strlen(text)) AS BIGINT) AS max_bytes,
           CAST(sum(CASE WHEN strlen(text) > {BODY_BYTE_CAP}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over_cap,
           CAST(sum(strlen(text)) // count(*) AS BIGINT)
             AS mean_bytes
    FROM documents GROUP BY source
    """,
)
def payload_size_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    b = F.octet_length("text")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(b).cast("long").alias("bytes_total"),
        F.max(b).cast("long").alias("max_bytes"),
        F.sum(F.when(b > BODY_BYTE_CAP, 1).otherwise(0))
        .cast("long")
        .alias("n_over_cap"),
        F.expr("sum(octet_length(text)) div count(*)")
        .cast("long")
        .alias("mean_bytes"),
    )


# ---------------------------------------------------------------------------
# Containment verification — the asymmetric cousin of Jaccard: C(A,B) =
# |A∩B| / min(|A|,|B|). Near-dup families produced by quotation or
# partial copies (a short doc wholly inside a long one) score low on
# Jaccard but ~1.0 on containment; dedup pipelines (e.g. news/CC)
# gate on both. Same probe-set shape as dedup_jaccard_verify: at scale
# the pair source is the LSH candidate stream, never a cross join —
# the per-pair verify math is what this query pins.
# ---------------------------------------------------------------------------
@query(
    "dedup_containment_verify",
    """
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.ts, b.ts)) AS n_common,
               least(len(a.ts), len(b.ts)) AS n_min
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id AND a.doc_id < 20
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / n_min AS containment
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / n_min > 0.8
    """,
)
def dedup_containment_verify(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("ts")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    common = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    nmin = F.least(F.size(F.col("a.ts")), F.size(F.col("b.ts")))
    cont = common.cast("double") / nmin
    return (
        # bounded probe slice: same explicit-broadcast rule as above
        F.broadcast(a.filter(F.col("doc_id") < 20))
        .join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") > 0.8)
    )


# ---------------------------------------------------------------------------
# Exact-substring duplicate detection — the ExactSubstr method used for
# GPT-3/The-Pile style corpora (Lee et al. 2022, "Deduplicating
# training data makes language models better"): any 50-char window
# shared verbatim between two documents marks a duplicated span. The
# suffix-array formulation is sequential; this distributed form is
# TWO-STAGE and EXACT at the paper's 50-char threshold (round 7 closed
# the 65→50 gap the single-scale winnowed form carried):
#
#   Stage 1 (candidate docs, sampled): hash every SUBSTR_CAND=35-char
#   window and select anchors by WINNOWING (Schleimer, Wilkerson,
#   Aiken — SIGMOD 2003): in each run of SUBSTR_SEL=16 consecutive
#   window hashes keep only the minimum. The classic guarantee: any
#   span shared verbatim across documents of length
#   >= SUBSTR_CAND + SUBSTR_SEL - 1 = 50 chars shares at least one
#   anchor — so the candidate-doc set provably contains EVERY document
#   participating in a >=50-char duplication. Anchor density
#   ~2/(SEL+1) ≈ 12%.
#
#   Stage 2 (exact verify, full windows, candidates only): explode ALL
#   SUBSTR_W=50-char window hashes of the candidate docs and keep the
#   hashes seen in >1 doc. Because any two docs sharing a 50-char
#   window are both stage-1 candidates, the result is exactly the set
#   of cross-document duplicated 50-char windows of the WHOLE corpus —
#   zero false negatives at >=50 (the paper's bar) and zero false
#   positives (every reported family is a verbatim 50-char match).
#
# Why content-defined selection and not a position stride in stage 1: a
# stride-s sampler on BOTH sides only matches spans whose cross-document
# alignment offsets agree mod s — a duplicated span landing at offset 3
# in one doc and 7 in the other is missed at ANY length. Winnowing
# selects by window CONTENTS, so both copies select the same anchors
# regardless of position. tests/test_exact_substring.py plants 50-char
# duplicates at every offset residue and proves each is caught.
#
# Anchors are selected by hash VALUE only (not position), so md5 ties
# inside a selection window emit the identical anchor either way and
# the two engines can never diverge on a tie rule.
#
# TEXT-GRAIN FOLD (round 8, VERDICT r7 #5): both stages run over
# DISTINCT texts, not documents. Byte-identical documents share every
# window, so the corpus is first grouped by md5(text) into
# (representative text, multiplicity, min doc_id); a window's document
# count is then the SUM of multiplicities of the distinct texts
# containing it and its first_doc the min of their min_docs — the
# output is provably unchanged, but the adversarial worst case (a
# ~95%-replicated corpus, where every doc is a candidate) collapses to
# the distinct-text count before any window is hashed. This is the
# "dedup to existence grain before the explode" discipline: exact
# duplication is resolved at text grain for the price of one
# text-keyed aggregation, and the expensive window work only ever sees
# unique byte content.
#
# Scale shape: stage 1's O(L·SEL) min-scan runs inside the map stage
# over distinct texts; ~12% anchors shuffle keyed by hash. Stage 2's
# full-window explode is restricted to candidate texts — a set sized
# by the corpus's actual near-duplication (plus 35-49-char
# near-threshold matches), NOT by corpus size. The candidate semi-join
# broadcasts when small and shuffles when not — AQE's call, no collect
# anywhere.
# ---------------------------------------------------------------------------
SUBSTR_W = 50  # the ExactSubstr match length (Lee et al. 2022)
SUBSTR_CAND = 35  # stage-1 window; guarantee = CAND + SEL - 1 = 50
SUBSTR_SEL = 16  # winnowing selection window


def _let(var: str, value: str, body: str) -> str:
    """SQL let-binding: evaluate ``value`` ONCE and bind it as lambda
    variable ``var`` inside ``body``. Catalyst's CollapseProject would
    otherwise inline a chained withColumn expression into every use
    site — for the doubling min chain below that is exponential
    re-evaluation of the window-hash transform. Lambda variables are
    opaque to the optimizer, so the single-element transform is a
    genuine let."""
    return f"element_at(transform(array({value}), {var} -> {body}), 1)"


def _winnow_expr() -> str:
    """Winnowed anchor array for one text, O(L·log SEL) (round 9).

    The window hashes are 60-bit longs (md5 prefix via conv — identical
    rule in the oracle). The SEL=16 sliding min is computed by the
    sparse-table doubling decomposition instead of per-position
    slice+array_min: m2[k]=min(h[k],h[k+1]), m4[k]=min(m2[k],m2[k+2]),
    m8[k]=min(m4[k],m4[k+4]), m16[k]=min(m8[k],m8[k+8]) — four ``least``
    ops per position instead of a 16-element slice allocation + scan,
    value-identical because min is associative and idempotent
    (overlapping halves are harmless). Texts shorter than
    CAND+SEL-1 = 50 chars have < 16 windows and emit the single
    whole-array min, exactly as the slice form's greatest(·,0) clamp
    did."""
    hs = (
        f"transform(sequence(0, length(text) - {SUBSTR_CAND}),"
        f" i -> cast(conv(substring(md5(substring(text,"
        f" cast(i + 1 as int), {SUBSTR_CAND})), 1, 15), 16, 10)"
        f" as bigint))"
    )
    lvl = (
        "transform(sequence(1, size({src}) - {off}),"
        " k -> least(element_at({src}, k), element_at({src}, k + {off})))"
    )
    chain = _let(
        "m2", lvl.format(src="h0", off=1),
        _let(
            "m4", lvl.format(src="m2", off=2),
            _let(
                "m8", lvl.format(src="m4", off=4),
                "array_distinct("
                + lvl.format(src="m8", off=8)
                + ")",
            ),
        ),
    )
    return _let(
        "h0",
        hs,
        f"CASE WHEN size(h0) >= {SUBSTR_SEL} THEN {chain}"
        f" ELSE array(array_min(h0)) END",
    )


@query(
    "exact_substring_dedup",
    f"""
    -- window-function winnowing (min over a 16-row moving frame is the
    -- O(n) monotonic-deque path; the list_slice form measured 2.5x the
    -- whole gate query). Fixed position series + correlated WHERE
    -- (generate_series takes no lateral args); the position domain is
    -- derived from the corpus's longest document (NOT a fixed literal:
    -- a fixed cap silently truncates any doc beyond it and diverges
    -- from the uncapped Spark side — same rule as c4's line bound).
    WITH pos AS (
        SELECT unnest(generate_series(0, (
            SELECT coalesce(max(length(text)), 1) FROM documents) - 1)) AS i
    ),
    texts AS MATERIALIZED (
        SELECT md5(text) AS tkey,
               arg_min(text, doc_id) AS text,
               CAST(count(*) AS BIGINT) AS mult,
               min(doc_id) AS min_doc
        FROM documents
        WHERE length(text) >= {SUBSTR_CAND}
        GROUP BY md5(text)
    ),
    wins AS (
        -- 60-bit md5-prefix hashes (round 9): anchor SELECTION only
        -- needs a content-determined total order, and comparing longs
        -- in the sliding min beats comparing 32-char hash strings;
        -- the truncation is applied identically in the Spark plan
        -- (conv(substring(md5,1,15),16,10)) so selection can never
        -- diverge, and a 60-bit collision costs at most one spurious
        -- candidate text — stage 2 verifies raw window content, so
        -- the OUTPUT is exact regardless
        SELECT tkey, i,
               length(text) - {SUBSTR_CAND} + 1 AS nwin,
               CAST(('0x' || substr(md5(substr(text, CAST(i + 1 AS INTEGER),
                                              {SUBSTR_CAND})), 1, 15))
                    AS BIGINT) AS h
        FROM texts, pos
        WHERE i < length(text) - {SUBSTR_CAND} + 1
    ),
    sel AS (
        SELECT tkey, i, nwin,
               min(h) OVER (PARTITION BY tkey ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {SUBSTR_SEL - 1} FOLLOWING) AS wh
        FROM wins
    ),
    anch AS MATERIALIZED (
        SELECT DISTINCT tkey, wh
        FROM sel
        WHERE i <= greatest(nwin - {SUBSTR_SEL}, 0)
    ),
    fam AS (
        SELECT wh FROM anch a JOIN texts t ON t.tkey = a.tkey
        GROUP BY wh HAVING sum(t.mult) > 1
    ),
    cand AS (
        SELECT DISTINCT a.tkey FROM anch a JOIN fam f ON a.wh = f.wh
    ),
    fullw AS (
        -- raw window content, NOT md5(window): grouping needs only
        -- EQUALITY (byte-identical in both engines); the hash is
        -- computed once per surviving family below instead of once per
        -- window — at a 95%-duplicated corpus that is ~20x fewer md5s
        SELECT t.tkey,
               substr(t.text, CAST(i + 1 AS INTEGER), {SUBSTR_W}) AS win
        FROM texts t JOIN cand c ON c.tkey = t.tkey, pos
        WHERE length(t.text) >= {SUBSTR_W}
          AND i < length(t.text) - {SUBSTR_W} + 1
    ),
    fdist AS (SELECT DISTINCT tkey, win FROM fullw)
    SELECT md5(f.win) AS window_hash,
           CAST(sum(t.mult) AS BIGINT) AS n_docs,
           CAST(min(t.min_doc) AS BIGINT) AS first_doc
    FROM fdist f JOIN texts t ON t.tkey = f.tkey
    GROUP BY f.win
    HAVING sum(t.mult) > 1
    """,
)
def exact_substring_dedup(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES_WIDE)
    # Text-grain fold: one aggregation to (distinct text, multiplicity,
    # min doc) — every downstream window is hashed once per unique byte
    # content, never once per document copy.
    texts = (
        docs.filter(F.length("text") >= SUBSTR_CAND)
        .groupBy(F.md5("text").alias("tkey"))
        .agg(
            F.min_by("text", "doc_id").alias("text"),
            F.count("*").cast("long").alias("mult"),
            F.min("doc_id").alias("min_doc"),
        )
    )
    # Four consumers (anchors, fam, stage-2 explode, final rollup):
    # materialize the distinct-text fold once instead of re-running the
    # corpus aggregation per consumer. ensure_parallelism first — AQE
    # coalesces the small distinct-text shuffle to one partition, which
    # would serialize the CPU-heavy winnow scan downstream.
    texts = ensure_parallelism(texts).transform(materialize)
    # Stage 1: winnowed anchors → candidate text set (doubling min
    # chain over 60-bit long hashes — see _winnow_expr).
    anchors = (
        texts.select(
            "tkey",
            "mult",
            F.explode(F.expr(_winnow_expr())).alias("wh"),
        )
        # consumed three times (family counts, candidate semi-join,
        # stage-2 co-location key): the winnow scan is the most
        # expensive map stage in the query — materialize it once
        .transform(materialize)
    )
    fam = (
        anchors.groupBy("wh")
        .agg(F.sum("mult").alias("n"))
        .filter(F.col("n") > 1)
    )
    cand = (
        anchors.join(fam, "wh", "left_semi").select("tkey").distinct()
    )
    # Stage-2 co-location (round 9): partition candidate texts by their
    # minimum anchor, so a near-duplicate family's texts land in one
    # partition and the partial aggregation collapses their ~identical
    # window sets BEFORE the shuffle — on the 20× adversarial corpus
    # (every doc 19 near-copies) this shrinks the stage-2 exchange by
    # ~the family size. Physical-plan-only: the groupBy result is
    # partitioning-independent (tools/determinism_check.py gates this).
    rep = anchors.groupBy("tkey").agg(F.min("wh").alias("rep"))
    par = spark.sparkContext.defaultParallelism
    # Stage 2: full 50-char windows over candidate texts only — exact.
    # Raw window content, not md5(window): grouping needs only EQUALITY
    # (byte-identical both engines); md5 is computed once per surviving
    # family, ~20x fewer hashes on a heavily-duplicated corpus.
    fullw = (
        texts.join(cand, "tkey", "left_semi")
        .join(rep, "tkey")
        .repartition(par, "rep")
        .filter(F.length("text") >= SUBSTR_W)
        .select(
            "tkey",
            "mult",
            "min_doc",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f" sequence(0, length(text) - {SUBSTR_W}),"
                    f" i -> substring(text, cast(i + 1 as int),"
                    f" {SUBSTR_W})))"
                )
            ).alias("win"),
        )
    )
    return (
        fullw.groupBy("win")
        .agg(
            F.sum("mult").cast("long").alias("n_docs"),
            F.min("min_doc").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.md5("win").alias("window_hash"),
            "n_docs",
            "first_doc",
        )
    )


# ---------------------------------------------------------------------------
# Interpolated trigram LM familiarity — the Jelinek-Mercer smoothed
# n-gram score (λ₃P₃+λ₂P₂+λ₁P₁ with λ = 0.6/0.3/0.1) that corpus
# quality filters run before a learned LM exists; bigram_lm_score is
# the 2-gram special case. Every probability is a corpus count ratio,
# so the per-position score is three integer divisions
#   (6e6·c₁₂₃)//(10·c₁₂) + (3e6·c₂₃)//(10·c₂) + (1e6·c₃)//(10·N)
# summed per document. Plan shape: position rows explode map-side; the
# three count tables are grouped aggregates joined back (broadcast at
# gate scale; at 100 TB the trigram join shuffles on the ngram key and
# Zipf head mass combines map-side, same as the bigram scorer).
# ---------------------------------------------------------------------------


@query(
    "trigram_lm_interpolated",
    """
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        FROM documents
    ),
    pos3 AS (
        SELECT doc_id, toks, unnest(generate_series(3, len(toks))) AS i
        FROM t WHERE len(toks) >= 3
    ),
    tr AS (
        SELECT doc_id,
               toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i] AS tg,
               toks[i-2] || ' ' || toks[i-1] AS b12,
               toks[i-1] || ' ' || toks[i] AS b23,
               toks[i-1] AS w2, toks[i] AS w3
        FROM pos3
    ),
    pos2 AS (
        SELECT doc_id, toks, unnest(generate_series(2, len(toks))) AS i
        FROM t WHERE len(toks) >= 2
    ),
    bg AS (
        SELECT toks[i-1] || ' ' || toks[i] AS b, count(*) AS c
        FROM pos2 GROUP BY 1
    ),
    tg_c AS (SELECT tg, count(*) AS c FROM tr GROUP BY tg),
    un AS (
        SELECT u.w, count(*) AS c FROM (
            SELECT unnest(toks) AS w FROM t
        ) u GROUP BY u.w
    ),
    nn AS (SELECT sum(c) AS n FROM un)
    SELECT tr.doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(
               (6000000 * tc.c) // (10 * b1.c)
             + (3000000 * b2.c) // (10 * u2.c)
             + (1000000 * u3.c) // (10 * nn.n)
           ) AS BIGINT) AS lm_score
    FROM tr
    JOIN tg_c tc ON tc.tg = tr.tg
    JOIN bg b1 ON b1.b = tr.b12
    JOIN bg b2 ON b2.b = tr.b23
    JOIN un u2 ON u2.w = tr.w2
    JOIN un u3 ON u3.w = tr.w3
    CROSS JOIN nn
    GROUP BY tr.doc_id
    """,
)
def trigram_lm_interpolated(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.filter(_tokens(F.col("text")), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks"))

    def gram(i_from: int, build):
        return F.explode(
            F.transform(
                F.sequence(F.lit(i_from), F.size("toks")),
                build,
            )
        )

    el = lambda i, off: F.element_at(F.col("toks"), (i - off).cast("int"))  # noqa: E731
    tr = base.filter(F.size("toks") >= 3).select(
        "doc_id",
        gram(
            3,
            lambda i: F.struct(
                F.concat_ws(" ", el(i, 2), el(i, 1), el(i, 0)).alias("tg"),
                F.concat_ws(" ", el(i, 2), el(i, 1)).alias("b12"),
                F.concat_ws(" ", el(i, 1), el(i, 0)).alias("b23"),
                el(i, 1).alias("w2"),
                el(i, 0).alias("w3"),
            ),
        ).alias("g"),
    ).select("doc_id", "g.tg", "g.b12", "g.b23", "g.w2", "g.w3")
    # Round 12 negative result (scan-collapse sweep): checkpointing the
    # three gram count tables (bg / tg_c / un — each consumed 2-3x, so
    # the lazy plan re-tokenizes documents 7-8x) measured SLOWER at
    # sf0.1 (3.13 -> 3.69 s same-conditions A/B): the three eager
    # materializations serialize what the lazy plan runs as overlapped
    # stages of one job, and at bench scale the re-tokenize is cheaper
    # than the lost overlap. Left lazy; at true scale the 7-8 corpus
    # passes dominate and the checkpoint form should win — revisit with
    # a stress-ratio measurement before flipping (do NOT re-try blind).
    bg = (
        base.filter(F.size("toks") >= 2)
        .select(gram(2, lambda i: F.concat_ws(" ", el(i, 1), el(i, 0))).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )
    tg_c = tr.groupBy("tg").agg(F.count("*").alias("c"))
    un = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_total = un.agg(F.sum("c").alias("n"))
    scored = (
        tr.join(tg_c.withColumnRenamed("c", "c123"), "tg")
        .join(bg.withColumnRenamed("b", "b12").withColumnRenamed("c", "c12"), "b12")
        .join(bg.withColumnRenamed("b", "b23").withColumnRenamed("c", "c23"), "b23")
        # unigram tables are vocab-grain (Heaps-growing): pin merge —
        # the estimator was broadcasting both at bench scale (round-13
        # audit, chi2 class)
        .join(un.hint("merge").withColumnRenamed("w", "w2")
              .withColumnRenamed("c", "c2"), "w2")
        .join(un.hint("merge").withColumnRenamed("w", "w3")
              .withColumnRenamed("c", "c3"), "w3")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "sc",
            F.expr(
                "(6000000 * c123) div (10 * c12)"
                " + (3000000 * c23) div (10 * c2)"
                " + (1000000 * c3) div (10 * n)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum("sc").cast("long").alias("lm_score"),
    )


# ---------------------------------------------------------------------------
# χ² keyword extraction — the feature-selection statistic (Manning &
# Schütze §5.3.3) ranking each language's most over-represented tokens
# from the 2×2 contingency (a,b,c,d): χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)).
# (ad−bc)² reaches ~10²¹ at gate scale, so the ratio rides DECIMAL(38)
# in Spark / HUGEINT in DuckDB (the same int128 discipline as
# hourly_type_correlation — and the same DuckDB caveat: // on DECIMAL
# rounds, HUGEINT divides exactly). Plan: one (lang, token) count, two
# tiny marginals broadcast back, per-lang top-5 window.
# ---------------------------------------------------------------------------
CHI2_MIN_A = 5
CHI2_TOPK = 5


@query(
    "chi2_lang_terms",
    f"""
    WITH toks AS (
        SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
        FROM documents
    ),
    wl AS (SELECT lang, w, count(*) AS a FROM toks GROUP BY lang, w),
    wt AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
    lt AS (SELECT lang, count(*) AS cl FROM toks GROUP BY lang),
    nn AS (SELECT count(*) AS n FROM toks),
    cells AS (
        SELECT wl.lang, wl.w, wl.a,
               wt.cw - wl.a AS b,
               lt.cl - wl.a AS c,
               nn.n - wt.cw - lt.cl + wl.a AS d,
               nn.n AS n
        FROM wl JOIN wt USING (w) JOIN lt USING (lang) CROSS JOIN nn
    ),
    scored AS (
        SELECT lang, w, a,
               CAST((CAST(n AS HUGEINT)
                     * CAST(a*d - b*c AS HUGEINT) * CAST(a*d - b*c AS HUGEINT)
                     * 1000)
                    // (CAST(a+b AS HUGEINT) * CAST(c+d AS HUGEINT)
                        * CAST(a+c AS HUGEINT) * CAST(b+d AS HUGEINT))
                 AS BIGINT) AS chi2_milli
        FROM cells
        WHERE a >= {CHI2_MIN_A} AND a*d > b*c
    )
    SELECT lang, w AS term, CAST(a AS BIGINT) AS a, chi2_milli,
           CAST(row_number() OVER (PARTITION BY lang
                ORDER BY chi2_milli DESC, w) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= {CHI2_TOPK}
    """,
)
def chi2_lang_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(_tokens(F.col("text")), lambda x: x != "")
        ).alias("w"),
    )
    # Round 13 (ADVICE r12, high): the round-12 form computed cl and n as
    # window sums over Window.partitionBy('lang') / partitionBy() on the
    # (lang, w) count matrix — but vocabulary grows with the corpus
    # (Heaps' law), so the empty-partition window funneled an UNBOUNDED
    # vocab-grain frame through one task at scale. cl and n are
    # per-token-count marginals that never need the vocabulary at all:
    # one extra NARROW pass over documents (size(filter(split)) sums, no
    # explode — the dsir_importance_resample pattern) yields the
    # lang-grain cl frame, and n is its total (window over the
    # lang-bounded frame). cw stays a w-keyed window — same key grain as
    # the wl aggregate itself, so it rides the existing exchange. Net:
    # 2 scans (1 explode + 1 narrow), 0 corpus-grain single-task stages.
    wl = toks.groupBy("lang", "w").agg(F.count("*").alias("a"))
    lt = (
        docs.groupBy("lang")
        .agg(
            F.sum(
                F.size(F.filter(_tokens(F.col("text")), lambda x: x != ""))
            ).alias("cl")
        )
        # lang-grain frame: bounded by the language domain, so the
        # empty-partition total window moves |langs| rows, never vocab
        .withColumn("n", F.sum("cl").over(Window.partitionBy()))
    )
    cells = (
        wl.withColumn("cw", F.sum("a").over(Window.partitionBy("w")))
        .join(F.broadcast(lt), "lang")
    ).select(
        "lang",
        "w",
        "a",
        (F.col("cw") - F.col("a")).alias("b"),
        (F.col("cl") - F.col("a")).alias("c"),
        (F.col("n") - F.col("cw") - F.col("cl") + F.col("a")).alias("d"),
        "n",
    )
    scored = cells.filter(
        (F.col("a") >= CHI2_MIN_A) & (F.col("a") * F.col("d") > F.col("b") * F.col("c"))
    ).withColumn(
        "chi2_milli",
        F.expr(
            "cast((cast(n as decimal(38,0))"
            " * cast(a*d - b*c as decimal(38,0))"
            " * cast(a*d - b*c as decimal(38,0)) * 1000)"
            " div (cast(a+b as decimal(38,0)) * cast(c+d as decimal(38,0))"
            "      * cast(a+c as decimal(38,0)) * cast(b+d as decimal(38,0)))"
            " as bigint)"
        ),
    )
    wlang = Window.partitionBy("lang").orderBy(F.desc("chi2_milli"), "w")
    return (
        scored.withColumn("rank", F.row_number().over(wlang).cast("long"))
        .filter(F.col("rank") <= CHI2_TOPK)
        .select("lang", F.col("w").alias("term"), F.col("a").cast("long").alias("a"),
                "chi2_milli", "rank")
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking — the entity-resolution strategy that
# predates LSH (Hernández & Stolfo, SIGMOD'95): sort the corpus by a
# blocking key (here the first 24 chars of normalized text) and compare
# only records within a sliding window of the sort order. Complements
# the LSH candidate generator: SNM catches prefix-anchored near-dups
# LSH's bag-of-tokens bands can miss. Candidate volume = (w−1)·n, never n².
#
# Scale shape: the sort-order position is a DISTRIBUTED zip-with-index,
# not a global row_number (which would funnel the corpus through one
# task — the plans.unpartitioned_windows class): range-partition by the
# blocking key, stamp partition ids, row_number WITHIN each partition,
# then add the exclusive cumulative partition counts (a P-row aggregate
# frame, broadcast back). Range partitioning guarantees every key in
# partition p sorts before partition p+1, so offset + local rank IS the
# global position; Spark's exchange reuse materializes the range shuffle
# once for both consumers. Neighbor pairs across partition boundaries
# need no special casing — the position self-join is key-hashed on pos.
# ---------------------------------------------------------------------------
SNM_WINDOW = 3  # compare each doc to the 2 previous docs in sort order


@query(
    "sorted_neighborhood_pairs",
    f"""
    WITH keyed AS (
        SELECT doc_id,
               substr(lower(text), 1, 24) AS bkey,
               list_distinct(list_filter(string_split(lower(text), ' '),
                                         t -> t <> '')) AS ts
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, bkey, ts,
               row_number() OVER (ORDER BY bkey, doc_id) AS pos
        FROM keyed
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.ts, b.ts)) AS n_common,
               len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS n_union
        FROM ordered a JOIN ordered b
          ON b.pos BETWEEN a.pos + 1 AND a.pos + {SNM_WINDOW - 1}
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST((n_common * 1000000) // n_union AS BIGINT) AS jaccard_ppm
    FROM cand
    WHERE n_common * 2 > n_union
    """,
)
def sorted_neighborhood_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    )
    keyed = docs.select(
        "doc_id",
        F.substring(F.lower("text"), 1, 24).alias("bkey"),
        toks.alias("ts"),
    )
    from eventsourcing_spark.operators.ranking import global_rank

    # pos stays LONG end-to-end: the distributed rank exists precisely to
    # survive >2^31-row corpora, so the shifted join keys below must use
    # long arithmetic (an int cast here would silently wrap the pairing)
    ordered = global_rank(keyed, "bkey", "doc_id", rank_col="pos")
    pairs = None
    for off in range(1, SNM_WINDOW):
        nxt = ordered.select(
            (F.col("pos") - off).alias("pos"),
            F.col("doc_id").alias("doc_b"),
            F.col("ts").alias("ts_b"),
        )
        p = ordered.join(nxt, "pos").select(
            F.col("doc_id").alias("doc_a"), "doc_b", "ts", "ts_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    common = F.size(F.array_intersect("ts", "ts_b"))
    union = F.size("ts") + F.size("ts_b") - common
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            common.cast("long").alias("n_common"),
            union.alias("__union"),
        )
        .filter(F.col("n_common") * 2 > F.col("__union"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.expr("(n_common * 1000000) div __union")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Simpson diversity — corpus composition QA: per source, the
# probability two random tokens^W documents share a language,
# D = Σ n_i(n_i−1) / (N(N−1)), emitted as concentration ppm (higher =
# more monolingual) plus the language count. Pure integer
# cross-multiplication; one tiny two-level aggregate.
# ---------------------------------------------------------------------------
@query(
    "lang_diversity_simpson",
    """
    WITH c AS (
        SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    s AS (
        SELECT source, sum(n) AS total, sum(n * (n - 1)) AS same_pairs,
               count(*) AS n_langs
        FROM c GROUP BY source
    )
    SELECT source,
           CAST(total AS BIGINT) AS n_docs,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(CASE WHEN total > 1
                THEN (same_pairs * 1000000) // (total * (total - 1))
                ELSE 1000000 END AS BIGINT) AS concentration_ppm
    FROM s
    """,
)
def lang_diversity_simpson(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("same_pairs"),
        F.count("*").alias("n_langs"),
    )
    return s.select(
        "source",
        F.col("total").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.when(
            F.col("total") > 1,
            F.expr("(same_pairs * 1000000) div (total * (total - 1))"),
        )
        .otherwise(F.lit(1000000))
        .cast("long")
        .alias("concentration_ppm"),
    )


# ---------------------------------------------------------------------------
# Cohen's κ for the language-ID heuristic — the chance-corrected scalar
# summary of langid_confusion_matrix: κ = (p_o − p_e)/(1 − p_e) with
# p_o = diagonal agreement and p_e = Σ_c row_c·col_c / N², computed in
# cross-multiplied integers: κ_ppm = (agree·N − Σ row·col)·1e6 //
# (N² − Σ row·col), clamped at 0 (a below-chance classifier reads 0 —
# avoids the negative-floor-division asymmetry between engines). The
# marginal tables are tiny grouped aggregates of the prediction pass.
# ---------------------------------------------------------------------------
@query(
    "langid_cohens_kappa",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["en"]!r}, t))) AS s_en,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["es"]!r}, t))) AS s_es,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["de"]!r}, t))) AS s_de,
               len(list_filter(string_split(lower(text), ' '),
                               t -> list_contains({_LANG_MARKERS["fr"]!r}, t))) AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    ),
    cm AS (SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2),
    marg AS (
        SELECT coalesce(r.lang, c.lang_pred) AS cat,
               coalesce(r.rn, 0) AS rn, coalesce(c.cn, 0) AS cn
        FROM (SELECT lang, sum(n) AS rn FROM cm GROUP BY lang) r
        FULL OUTER JOIN (SELECT lang_pred, sum(n) AS cn FROM cm
                         GROUP BY lang_pred) c
          ON r.lang = c.lang_pred
    ),
    s AS (
        SELECT (SELECT sum(n) FROM cm) AS total,
               (SELECT coalesce(sum(n), 0) FROM cm WHERE lang = lang_pred)
                 AS agree,
               (SELECT sum(rn * cn) FROM marg) AS pe_num
    )
    SELECT CAST(total AS BIGINT) AS n_docs,
           CAST(agree AS BIGINT) AS n_agree,
           CAST(pe_num AS BIGINT) AS pe_num,
           -- NULLIF: total²=pe_num when every doc lands in one class
           -- (chance agreement saturates); Spark div gives NULL there,
           -- DuckDB // would raise — align the degenerate case on NULL.
           CAST((greatest(agree * total - pe_num, 0) * 1000000)
                // NULLIF(total * total - pe_num, 0) AS BIGINT) AS kappa_ppm
    FROM s
    """,
)
def langid_cohens_kappa(spark, sf_dir):
    # Round 12 (scan-collapse): r, c and totals were three consumers of
    # cm, each replanning the 4-marker tokenize over the corpus (3
    # scans) plus a full-outer marginal join. Each cm cell instead
    # contributes its count to its row-category and its col-category
    # via a 2-element explode; one groupBy(cat) yields (rn, cn) per
    # category — exactly the full-outer join's rows with 0 for missing
    # sides — and the final aggregate folds total (= sum rn), agree
    # (carried on the row-side struct) and pe_num in one pass.
    pred = lang_id_heuristic(spark, sf_dir).select("lang", "lang_pred")
    cm = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    per_cat = (
        cm.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("lang").alias("cat"),
                        F.col("n").alias("rn_p"),
                        F.lit(0).cast("long").alias("cn_p"),
                        F.when(
                            F.col("lang") == F.col("lang_pred"), F.col("n")
                        )
                        .otherwise(0)
                        .alias("agree_p"),
                    ),
                    F.struct(
                        F.col("lang_pred").alias("cat"),
                        F.lit(0).cast("long").alias("rn_p"),
                        F.col("n").alias("cn_p"),
                        F.lit(0).cast("long").alias("agree_p"),
                    ),
                )
            ).alias("m")
        )
        .groupBy("m.cat")
        .agg(
            F.sum("m.rn_p").alias("rn"),
            F.sum("m.cn_p").alias("cn"),
            F.sum("m.agree_p").alias("agree_p"),
        )
    )
    return per_cat.agg(
        F.sum("rn").alias("total"),
        F.coalesce(F.sum("agree_p"), F.lit(0)).alias("agree"),
        F.sum(F.col("rn") * F.col("cn")).alias("pe_num"),
    ).select(
        F.col("total").cast("long").alias("n_docs"),
        F.col("agree").cast("long").alias("n_agree"),
        F.col("pe_num").cast("long").alias("pe_num"),
        F.expr(
            "cast((greatest(agree * total - pe_num, 0) * 1000000)"
            " div (total * total - pe_num) as bigint)"
        ).alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# Corpus fingerprint — the integrity check a 100 TB pipeline runs after
# every copy/transfer/rewrite: an order-independent content signature
# per source shard. Each doc contributes a 40-bit md5 slice of
# (doc_id ':' text); the per-source (count, sum, min, max) tuple detects
# any dropped, duplicated, truncated, or bit-flipped document without
# requiring a global sort (sum/min/max are commutative — they merge
# map-side and across shards, so the fingerprint of a union is the
# merge of fingerprints). 40-bit slices keep the sum < 2^63 for up to
# ~8M docs per source; at larger shard sizes fingerprint hierarchically.
# ---------------------------------------------------------------------------
@query(
    "corpus_fingerprint",
    """
    WITH h AS (
        SELECT source,
               CAST('0x' || substr(
                   md5(CAST(doc_id AS VARCHAR) || ':' || coalesce(text, '')),
                   1, 10) AS BIGINT) AS fp
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fp) AS BIGINT) AS fp_sum,
           CAST(min(fp) AS BIGINT) AS fp_min,
           CAST(max(fp) AS BIGINT) AS fp_max
    FROM h GROUP BY source
    """,
)
def corpus_fingerprint(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.coalesce(F.col("text"), F.lit("")),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return docs.select("source", fp.alias("fp")).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("fp").cast("long").alias("fp_sum"),
        F.min("fp").cast("long").alias("fp_min"),
        F.max("fp").cast("long").alias("fp_max"),
    )


# ---------------------------------------------------------------------------
# Span-level dedup REWRITE — the write side of exact_substring_dedup
# (Lee et al. 2022 "Deduplicating training data makes language models
# better" §3: ExactSubstr *removes* the duplicated spans rather than
# dropping whole documents; C4 does the same at line grain). Detection
# grain here is deliberately STRIDED (not the winnowed anchors the
# detector upgraded to): the rewriter needs contiguous char RANGES to
# cut, and a fixed stride gives every marked window a known extent for
# the island merge; the alignment caveat of a two-sided stride applies
# and is accepted for the rewrite audit (the winnowed detector is the
# recall surface). A 50-char
# window (stride 10) duplicated verbatim across >1 document marks its
# char range for removal; overlapping/adjacent ranges merge into
# islands (classic gaps-and-islands: a window opens a new island when
# its start exceeds the previous start + W) and the per-source audit
# pins bytes before/after plus span counts, so a rewriter that cuts
# the wrong ranges, double-counts overlaps, or misses adjacent merges
# fails the gate. Plan shape: windows explode map-side; ONE shuffle
# keyed by window hash builds the cross-doc duplicate set (per-key
# work = duplication degree); the semi-join back is the same keyed
# exchange; island numbering is a doc_id-partitioned window (per-doc
# frame ≤ len/stride rows — bounded, never corpus-sized). At 100 TB
# the output transform would rewrite text with the same island list;
# the audit aggregates to |sources| rows.
# ---------------------------------------------------------------------------
SPAN_W = 50
SPAN_STRIDE = 10


@query(
    "dedup_span_rewrite",
    f"""
    WITH wins AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   range(0, (length(text) - {SPAN_W}) // {SPAN_STRIDE} + 1),
                   i -> struct_pack(
                       start := CAST(i * {SPAN_STRIDE} AS BIGINT),
                       wh := md5(substr(text,
                                        CAST(i * {SPAN_STRIDE} + 1 AS INTEGER),
                                        {SPAN_W}))))) AS w
        FROM documents WHERE length(text) >= {SPAN_W}
    ),
    flat AS (SELECT doc_id, source, w.start AS start, w.wh AS wh FROM wins),
    dup AS (SELECT wh FROM flat GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
    dwins AS (SELECT f.* FROM flat f WHERE f.wh IN (SELECT wh FROM dup)),
    isl AS (
        SELECT doc_id, source, start,
               CASE WHEN lag(start) OVER w IS NULL
                      OR start > lag(start) OVER w + {SPAN_W} THEN 1 ELSE 0
               END AS ni
        FROM dwins
        WINDOW w AS (PARTITION BY doc_id ORDER BY start)
    ),
    isl2 AS (
        SELECT doc_id, source, start,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS island
        FROM isl
    ),
    spans AS (
        SELECT doc_id, source, island,
               max(start) + {SPAN_W} - min(start) AS span_len
        FROM isl2 GROUP BY doc_id, source, island
    ),
    per_doc AS (
        SELECT doc_id, sum(span_len) AS removed, count(*) AS n_spans
        FROM spans GROUP BY doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p.removed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_affected,
           CAST(sum(length(d.text)) AS BIGINT) AS chars_before,
           CAST(coalesce(sum(p.removed), 0) AS BIGINT) AS chars_removed,
           CAST(sum(length(d.text)) - coalesce(sum(p.removed), 0) AS BIGINT)
             AS chars_after,
           CAST(coalesce(sum(p.n_spans), 0) AS BIGINT) AS n_spans
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    GROUP BY d.source
    """,
)
def dedup_span_rewrite(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES_WIDE)
    wins = docs.filter(F.length("text") >= SPAN_W).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    ((F.length("text") - SPAN_W) / F.lit(SPAN_STRIDE)).cast("long"),
                ),
                lambda i: F.struct(
                    (i * SPAN_STRIDE).cast("long").alias("start"),
                    F.md5(
                        F.substring(
                            F.col("text"),
                            (i * SPAN_STRIDE + 1).cast("int"),
                            SPAN_W,
                        )
                    ).alias("wh"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "source", "w.start", "w.wh")
    # Round 12 (scan-collapse): the HAVING-count-distinct + semi-join
    # replanned the window explode for both sides (2 of the 3 document
    # scans). "Some OTHER doc shares this window hash" is simply
    # min(doc_id) != max(doc_id) over (partition by wh) — two window
    # aggregates on one hash-keyed shuffle, no join, 1 explode.
    wd = Window.partitionBy("wh")
    dwins = wins.withColumn(
        "is_dup",
        F.min("doc_id").over(wd) != F.max("doc_id").over(wd),
    ).filter(F.col("is_dup"))
    ww = Window.partitionBy("doc_id").orderBy("start")
    prev_start = F.lag("start").over(ww)
    new_isl = F.when(
        prev_start.isNull() | (F.col("start") > prev_start + SPAN_W), 1
    ).otherwise(0)
    isl = dwins.withColumn("ni", new_isl).withColumn(
        "island", F.sum("ni").over(ww.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "source", "island").agg(
        (F.max("start") + SPAN_W - F.min("start")).alias("span_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("removed"), F.count("*").alias("n_spans")
    )
    return (
        docs.select("doc_id", "source", F.length("text").alias("len"))
        # per_doc is DOC-grain (corpus-growing) and descends from an
        # explode whose size estimate hides the fan-out — pin the
        # co-partitioned merge join instead of estimator broadcast
        # (round-12 Generate-fed broadcast audit)
        .join(per_doc.hint("merge"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("removed").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("docs_affected"),
            F.sum("len").cast("long").alias("chars_before"),
            F.coalesce(F.sum("removed"), F.lit(0)).cast("long").alias("chars_removed"),
            (F.sum("len") - F.coalesce(F.sum("removed"), F.lit(0)))
            .cast("long")
            .alias("chars_after"),
            F.coalesce(F.sum("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram novelty — the tail-side complement of boilerplate_ngrams:
# instead of ranking the most-repeated n-grams (heavy hitters), measure
# per source what fraction of its 5-gram instances are corpus-UNIQUE.
# Low novelty = a crawl that re-serves templated text (memorization
# risk concentrates there, Carlini et al. 2021/2023 quantify the
# duplication→extraction link); high novelty = fresh text worth its
# tokens. One gram-keyed shuffle (Zipf head combines map-side) and a
# join back on the same key; the per-source rollup is |sources| rows.
# The <5-token guard matters in Spark: sequence(1, 0) is DESCENDING
# ([1,0]), so short docs must yield an empty gram array explicitly.
# ---------------------------------------------------------------------------
NOVELTY_N = 5


@query(
    "ngram_novelty_by_source",
    f"""
    WITH t AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   range(1, greatest(len(toks) - {NOVELTY_N - 1}, 0) + 1),
                   i -> array_to_string(toks[i:i+{NOVELTY_N - 1}], ' '))) AS g
        FROM t
    ),
    gc AS (SELECT g, count(*) AS c FROM grams GROUP BY g)
    SELECT source,
           CAST(count(*) AS BIGINT) AS total_grams,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unique_grams,
           CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS novelty_ppm
    FROM grams JOIN gc USING (g)
    GROUP BY source
    """,
)
def ngram_novelty_by_source(spark, sf_dir):
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES)
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"""CASE WHEN size(split(lower(text), ' ')) >= {NOVELTY_N}
                    THEN transform(
                        sequence(1, size(split(lower(text), ' ')) - {NOVELTY_N - 1}),
                        i -> array_join(
                            slice(split(lower(text), ' '), i, {NOVELTY_N}), ' '))
                    ELSE array() END"""
            )
        ).alias("g"),
    )
    # Round 13: the gram-count join replanned the corpus explode (2
    # scans + 2 explodes) and shuffled the full INSTANCE grain a second
    # time with no map-side combine. The rollup only needs per-(gram,
    # source) instance counts and each gram's global count: one explode
    # feeds groupBy(g, source) (partial aggregation collapses the Zipf
    # head before the exchange, guide §2.3), the global count is a
    # g-keyed window over that already-combined grain, and a gram with
    # c = 1 has exactly one instance (cnt = 1), so the per-source
    # uniques read off the same rows. 1 scan, no instance-grain join.
    from pyspark.sql import Window

    gs = grams.groupBy("g", "source").agg(F.count("*").alias("cnt"))
    withc = gs.withColumn("c", F.sum("cnt").over(Window.partitionBy("g")))
    return withc.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("total_grams"),
        F.sum(F.when(F.col("c") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("unique_grams"),
        F.expr(
            "(1000000 * sum(CASE WHEN c = 1 THEN cnt ELSE 0 END))"
            " div sum(cnt)"
        ).alias("novelty_ppm"),
    )
