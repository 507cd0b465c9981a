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

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
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
