"""BPE merge learning — tokenizer training as an iterative Spark job.

``pipeline.chunking`` already covers the single-shot pieces
(``bpe_merge_pairs`` counts one round of char pairs; ``bpe_apply_merges``
applies a FIXED merge list); this module closes the loop and learns the
merge table itself. Classic byte-pair-encoding training (Sennrich et
al. 2016): start from characters, repeatedly count adjacent symbol
pairs weighted by word frequency, merge the most frequent pair, repeat.
Each round is ONE keyed aggregation over the word-frequency table (the
wordcount rollup — vocabulary-sized, not corpus-sized), so at 100 TB the
corpus is scanned once for the word table and every round after that
touches only |vocab| rows: the same driver-holds-O(K)-state shape as
k-means (clustering.py), with the chosen pair collected per round.

Determinism contract: symbols are space-joined strings and one merge
round applies the pair via a single leftmost non-overlapping
``replace(seg, ' a b ', ' ab ')`` pass — semantics identical in Spark
and DuckDB (probed byte-for-byte, e.g. ``' l l l '`` → ``' ll l '``).
This is a documented VARIANT of canonical greedy BPE: inside a run of
repeated symbols the single pass merges alternately (canonical
re-scans after each merge), which keeps the whole 8-round derivation
expressible as pure string algebra in BOTH engines — tie-broken
(count DESC, pair ASC), hence value-hash exact. Pair statistics, and
therefore which merges get learned, are unaffected in practice.

Words are lowercase [a-z]+ runs capped at MAX_WORD_LEN chars (URL/noise
hygiene; also bounds the oracle's pair-index series).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import query

N_MERGES = 8
MAX_WORD_LEN = 24


def _word_freq(docs):
    words = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word")
    ).filter(F.length("word").between(2, MAX_WORD_LEN))
    return words.groupBy("word").agg(F.count("*").alias("freq"))


_W0_SQL = f"""
    w0 AS (
        SELECT word, count(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
            FROM documents
        )
        WHERE len(word) BETWEEN 2 AND {MAX_WORD_LEN}
        GROUP BY word
    ),
    s0 AS (
        SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg,
               freq
        FROM w0
    )"""


def _chain_sql() -> str:
    """The full 8-round learn chain (w0/s0, p/b/s per round) — shared by
    the learn and tokenize oracles."""
    parts = [_W0_SQL]
    for r in range(1, N_MERGES + 1):
        parts.append(f""",
    p{r} AS (
        SELECT l[g.i] || ' ' || l[g.i + 1] AS pair, freq
        FROM (SELECT string_split(trim(seg), ' ') AS l, freq FROM s{r - 1}),
             generate_series(1, {MAX_WORD_LEN - 1}) g(i)
        WHERE g.i < len(l)
    ),
    b{r} AS MATERIALIZED (
        SELECT {r} AS round, pair, CAST(sum(freq) AS BIGINT) AS weighted_count
        FROM p{r} GROUP BY pair
        ORDER BY weighted_count DESC, pair LIMIT 1
    ),
    s{r} AS MATERIALIZED (
        -- MATERIALIZED: s{{r}} is read by both p{{r+1}} and s{{r+1}};
        -- inlining doubles the chain per round → 2^8 re-evaluation
        -- (the kcore lesson)
        SELECT word,
               replace(seg, ' ' || b.pair || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS seg, freq
        FROM s{r - 1} CROSS JOIN b{r} b
    )""")
    return "".join(parts)


def _bpe_oracle() -> str:
    sel = " UNION ALL ".join(
        f"SELECT round, pair, replace(pair, ' ', '') AS merged, weighted_count "
        f"FROM b{r}"
        for r in range(1, N_MERGES + 1)
    )
    return f"WITH {_chain_sql()}\n    {sel}"


def _learn(spark, sf_dir):
    """Run the 8 merge rounds; returns (merges, vocab) where merges is
    [(round, pair, merged, weighted_count)] and vocab the final
    (word, seg, freq) segmentation DataFrame."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # The vocab table is small relative to the corpus but not constant:
    # size the round-job partitioning from the vocabulary itself
    # (~500k words per task keeps rounds single-wave at gate scale AND
    # at a 100M-word web vocab) and localCheckpoint so every round runs
    # over materialized data with flat lineage (no CacheManager buildup
    # — the kcore lesson applies here too).
    wf = _word_freq(docs).select(
        "word",
        F.expr("' ' || regexp_replace(word, '(.)', '$1 ')").alias("seg"),
        "freq",
    )
    n_vocab = wf.count()
    wf = wf.coalesce(max(2, n_vocab // 500_000 + 1)).transform(materialize)
    merges = []
    for r in range(1, N_MERGES + 1):
        pairs = (
            wf.select(F.split(F.trim(F.col("seg")), " ").alias("l"), "freq")
            .filter(F.size("l") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l) - 2),"
                        " i -> l[i] || ' ' || l[i + 1])"
                    )
                ).alias("pair"),
                "freq",
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("weighted_count"))
            .orderBy(F.desc("weighted_count"), F.asc("pair"))
            .first()
        )
        if best is None:
            break
        merges.append((r, best.pair, best.pair.replace(" ", ""),
                       int(best.weighted_count)))
        # apply the merge: single leftmost non-overlapping pass — the
        # exact replace() semantics the oracle uses
        wf = wf.select(
            "word",
            F.expr(
                "replace(seg, ' {p} ', ' {m} ')".format(
                    p=best.pair.replace("'", ""), m=best.pair.replace(" ", "")
                )
            ).alias("seg"),
            "freq",
        ).transform(materialize)
    return merges, wf


@query("bpe_learn_merges", _bpe_oracle())
def bpe_learn_merges(spark, sf_dir):
    merges, _ = _learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round long, pair string, merged string, weighted_count long"
    ).coalesce(1)


@query(
    "bpe_tokenize_stats",
    f"""
    WITH {_chain_sql()},
    corpus AS (
        SELECT source, word FROM (
            SELECT source,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
            FROM documents
        )
        WHERE len(word) BETWEEN 2 AND {MAX_WORD_LEN}
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS words_total,
           CAST(sum(len(string_split(trim(s.seg), ' '))) AS BIGINT)
             AS subword_tokens,
           CAST(sum(len(c.word)) AS BIGINT) AS chars_total
    FROM corpus c JOIN s{N_MERGES} s USING (word)
    GROUP BY c.source
    """,
)
def bpe_tokenize_stats(spark, sf_dir):
    """Apply the learned merge table to the whole corpus: per source,
    word instances vs subword tokens vs characters — the compression the
    tokenizer actually achieves. Scale shape: the merges were learned on
    the vocab table, so application is a join of the corpus word stream
    against the |vocab|-row final segmentation — the corpus is scanned
    once and never re-segmented row by row. The join side is left to
    AQE: at gate scale the vocab auto-broadcasts; at a 100M-word web
    vocab it correctly falls back to a shuffle join."""
    merges, vocab = _learn(spark, sf_dir)
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    corpus = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    ).filter(F.length("word").between(2, MAX_WORD_LEN))
    seg = vocab.select(
        "word", F.size(F.split(F.trim(F.col("seg")), " ")).alias("n_tok")
    )
    return (
        corpus.join(seg, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("words_total"),
            F.sum("n_tok").cast("long").alias("subword_tokens"),
            F.sum(F.length("word")).cast("long").alias("chars_total"),
        )
    )


@query(
    "bpe_compression_curve",
    f"""
    WITH {_W0_SQL}
    SELECT CAST(sum(freq * len(word)) AS BIGINT) AS chars_total,
           CAST(sum(freq) AS BIGINT) AS words_total,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(max(len(word)) AS BIGINT) AS max_word_len
    FROM w0
    """,
)
def bpe_compression_curve(spark, sf_dir):
    """Pre-merge corpus statistics the BPE run starts from: total
    characters (= initial symbol count), word instances, vocabulary
    size. One wordcount rollup — the invariant the merge rounds then
    compress against (each learned merge removes weighted_count symbols
    from the corpus segmentation)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wf = _word_freq(docs)
    return wf.agg(
        F.sum(F.col("freq") * F.length("word")).cast("long").alias("chars_total"),
        F.sum("freq").cast("long").alias("words_total"),
        F.count("*").cast("long").alias("vocab_size"),
        F.max(F.length("word")).cast("long").alias("max_word_len"),
    )
