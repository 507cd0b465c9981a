"""Exact set-similarity join via prefix filtering (PPJoin-family).

LSH (pipeline.similarity) answers near-dup *probabilistically*; data
cleaning sometimes needs the EXACT answer: all document pairs with
token-set Jaccard ≥ t, no false negatives. The naive join is O(n²);
prefix filtering (Chaudhuri et al. 2006; Xiao et al., PPJoin, WWW'08)
makes it tractable and stays exact:

* order every document's tokens by ascending global frequency (rarest
  first — ties broken by token text so the order is total and
  deterministic);
* a pair with Jaccard ≥ t MUST share a token within each side's first
  ``|d| − ⌈t·|d|⌉ + 1`` tokens (the prefix) — pigeonhole: two sets that
  miss each other's prefixes cannot overlap enough;
* so candidates = pairs sharing ≥1 *prefix* token (equi-join on token,
  rare tokens ⇒ tiny buckets), then exact verification by counting the
  real intersection.

Scale shape: candidate generation is one equi-join keyed on prefix
tokens; because prefixes hold each document's RAREST tokens, bucket
sizes are the df of rare tokens — the frequent-token quadratic blowup
is filtered out by construction (the same reason the prefix is taken
from the ascending-df order and not the raw text order). Verification
shuffles only candidate pairs. The threshold comparison is integer
cross-multiplied (1000·∩ ≥ T·∪), so the DuckDB oracle — which verifies
against the BRUTE-FORCE all-pairs join — hash-matches exactly; the
gate thereby proves the prefix filter loses nothing.

Sets are word-BIGRAM shingles, deduplicated per document (set
semantics, as in the paper). Unigrams over the synthetic corpus's tiny
vocabulary would make nearly every pair similar (measured: 71 k pairs
at t = 0.6) — shingling is what the dedup literature actually joins on,
and it keeps prefix tokens rare, which is the whole filter.

Regime note (the honest scale boundary): prefix filtering's win is
proportional to how rare the rarest tokens are. On natural-language
corpora shingle dfs are zipfian and prefixes prune candidates by orders
of magnitude; on this synthetic corpus the bigram vocabulary is only
~900, so at sf0.1 (50 k docs) even the rarest shingles have df in the
thousands and candidate generation degrades toward quadratic (measured
~30 s vs 1-2 s for the LSH dedup family). When token frequencies are
dense, LSH (dedup_lsh_*) is the right tool and this operator is the
exact-verification complement for the shortlist — which is precisely
how the two are paired in production dedup stacks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import (
    materialize,
    TEXT_KERNEL_BYTES,
    ensure_parallelism,
    load_table,
)
from eventsourcing_spark.queries import query

JACCARD_PERMILLE = 800  # t = 0.8


@query(
    "setjoin_prefix_jaccard",
    f"""
    WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE length(text) > 0
    ),
    toks AS (
        SELECT DISTINCT doc_id, t[i] || '_' || t[i + 1] AS tok
        FROM words, unnest(generate_series(1, len(t) - 1)) u(i)
        WHERE len(t) >= 2
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.doc_a, s.doc_b, s.inter,
           sa.sz + sb.sz - s.inter AS un,
           (1000 * s.inter) // (sa.sz + sb.sz - s.inter) AS jaccard_permille
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.doc_a
    JOIN sizes sb ON sb.doc_id = s.doc_b
    WHERE 1000 * s.inter >= {JACCARD_PERMILLE} * (sa.sz + sb.sz - s.inter)
    """,
)
def setjoin_prefix_jaccard(spark, sf_dir):
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    words = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    # word bigram shingles; Spark [] array access is 0-based
    toks = (
        words.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], '_', t[i + 1]))"
                )
            ).alias("tok"),
        )
        .distinct()
        # read 4× downstream (df ranking, prefix, both verification sides):
        # materialize the token table once instead of re-exploding the
        # corpus per consumer — at scale this is a persisted/bucketed
        # intermediate table, the standard PPJoin preprocessing step
        .transform(materialize)
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))

    # global document frequency → deterministic total token order
    df_tok = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = toks.join(df_tok, "tok").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "tok")
        ),
    )
    with_sz = ranked.join(sizes, "doc_id")
    # prefix length |d| - ceil(t*|d|) + 1, integer ceil = (a+b-1) div b
    prefix_len = (
        F.col("sz")
        - F.expr(f"({JACCARD_PERMILLE} * sz + 999) div 1000")
        + 1
    )
    prefix = with_sz.filter(F.col("pos") <= prefix_len).select("doc_id", "tok")

    # candidates: pairs sharing a PREFIX token (rare tokens → small buckets)
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # exact verification: real intersection over ALL tokens of both docs
    inter = (
        cands.join(toks.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            toks.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
    )
    un = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return out.filter(F.lit(1000) * F.col("inter") >= JACCARD_PERMILLE * un).select(
        "doc_a",
        "doc_b",
        "inter",
        un.alias("un"),
        F.expr(f"(1000 * inter) div (sz_a + sz_b - inter)").alias(
            "jaccard_permille"
        ),
    )


# ---------------------------------------------------------------------------
# Exact edit-distance-1 similarity join via deletion-neighborhood
# blocking (FastSS — Bocek et al. 2007): two strings are within
# Levenshtein distance 1 iff their deletion neighborhoods (the string
# itself plus every single-character deletion) intersect. Generating
# the |s|+1 keys per string turns the fuzzy join into an EQUI-join —
# candidates are pairs sharing a key, verified by one levenshtein()
# call — with zero false negatives, the exact-match complement to
# fuzzy_match_topk's scored shortlist.
#
# The driving use case is dirty-key entity resolution: customer names
# differing by a single typo'd character. Scale shape: the key table is
# (L+1)·n rows (linear, map-only generation via posexplode); the
# self-join is keyed (never all-pairs) with block sizes bounded by
# alphabet×length, not corpus size; verification is a map filter on
# candidate pairs; output is TakeOrdered-bounded. The same construction
# extends to distance k by deleting k characters (keys ~ L^k — the
# documented reason production FastSS stops at k ≤ 2).
#
# The DuckDB twin generates the identical key set (fixed series +
# correlated WHERE — DuckDB's generate_series takes no lateral column
# args) and both engines run their native levenshtein(), so the gate
# also proves the two DP implementations agree on this corpus.
#
# Both engines share two structural rules so the key sets and pair
# grains can never desynchronize on a different name domain:
# (1) deletion positions are capped at FASTSS_MAX_LEN on BOTH sides
#     (least(len+1, 64) / WHERE i <= least(len+1, 64)) — for keys
#     longer than the cap, edits past position 64 are missed by both
#     engines identically (the documented production bound on key
#     count; this corpus's names are 18 chars);
# (2) candidate/pair dedup is keyed on the CUSTKEY pair on both sides
#     — duplicate name strings produce one verified pair per id pair
#     in both engines (dedup by name would collapse them in one engine
#     only).
# ---------------------------------------------------------------------------
FASTSS_MAX_LEN = 64  # deletion-position cap, mirrored on BOTH engines
FASTSS_TOP = 100


@query(
    "fastss_editdist1_pairs",
    f"""
    WITH pos AS (SELECT unnest(generate_series(1, {FASTSS_MAX_LEN})) AS i),
    keys AS (
        SELECT c_custkey, c_name,
               substr(c_name, 1, i-1) || substr(c_name, i+1) AS k
        FROM customer, pos WHERE i <= least(len(c_name) + 1, {FASTSS_MAX_LEN})
    ),
    cand AS (
        SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.c_custkey < b.c_custkey
    ),
    pairs AS MATERIALIZED (
        SELECT na.c_name AS name_a, nb.c_name AS name_b
        FROM cand
        JOIN customer na ON na.c_custkey = cand.id_a
        JOIN customer nb ON nb.c_custkey = cand.id_b
        WHERE levenshtein(na.c_name, nb.c_name) <= 1
    ),
    tot AS (SELECT count(*) AS n_pairs_total FROM pairs)
    SELECT name_a, name_b, CAST(n_pairs_total AS BIGINT) AS n_pairs_total
    FROM pairs, tot
    ORDER BY name_a, name_b LIMIT {FASTSS_TOP}
    """,
)
def fastss_editdist1_pairs(spark, sf_dir):
    cust = ensure_parallelism(load_table(spark, sf_dir, "customer"), per_partition_bytes=TEXT_KERNEL_BYTES)
    # |s|+1 deletion keys per name: position i in 1..len+1, key = name
    # with char i removed (i = len+1 keeps the original string, which
    # catches the pure-insert/delete case between different lengths).
    # The key table carries ONLY (id, key) — the candidate join and the
    # pair dedup shuffle int pairs, not 2×18-char strings (dropping the
    # names from the hot shuffles measured 6.4 s → ~3 s at sf0.1);
    # names re-attach by two keyed joins on the deduped pair set.
    keys = cust.select(
        "c_custkey",
        F.explode(
            F.expr(f"sequence(1, least(length(c_name) + 1, {FASTSS_MAX_LEN}))")
        ).alias("i"),
        "c_name",
    ).select(
        "c_custkey",
        F.expr(
            "concat(substring(c_name, 1, i-1), substring(c_name, i+1))"
        ).alias("k"),
    )
    cand = (
        keys.alias("a")
        .join(keys.alias("b"), "k")
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
        )
        .distinct()
    )
    names = cust.select("c_custkey", "c_name")
    # localCheckpoint: the verified pair set feeds BOTH the total-count
    # aggregate and the ordered output — without it the whole key-join
    # pipeline runs twice. The set is output-sized, safe to materialize.
    pairs = (
        cand.join(
            names.select(
                F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a")
            ),
            "id_a",
        )
        .join(
            names.select(
                F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b")
            ),
            "id_b",
        )
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("name_a", "name_b")
        .transform(materialize)
    )
    tot = pairs.agg(F.count("*").cast("long").alias("n_pairs_total"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .orderBy("name_a", "name_b")
        .limit(FASTSS_TOP)
    )


# ---------------------------------------------------------------------------
# Pairwise source-vocabulary Jaccard — "how much do two ingest sources
# share a vocabulary" for all source pairs at once, WITHOUT any
# token-level pairwise join: each token aggregates to one BITMASK of
# the sources containing it (bit_or of 1<<source_index, ≤ 64 sources
# per mask word), the token table rolls up to MASK grain (a few
# thousand rows at most — 2^|sources| is the ceiling, the distinct
# patterns that occur is the reality), and every pair's intersection/
# union is a conditional sum over that tiny frame. The usual all-pairs
# token join is O(vocab · pairs); this is one token aggregation +
# mask-grain arithmetic — the bitmap-index trick applied to set
# similarity.
# ---------------------------------------------------------------------------
@query(
    "source_vocab_jaccard",
    """
    WITH srcs AS (
        SELECT source,
               row_number() OVER (ORDER BY source) - 1 AS sid
        FROM (SELECT DISTINCT source FROM documents)
    ),
    tok AS (
        SELECT d.source,
               unnest(list_distinct(list_filter(
                   string_split(lower(d.text), ' '), x -> x <> ''))) AS token
        FROM documents d
    ),
    masks AS (
        SELECT t.token, bit_or(1::BIGINT << s.sid) AS m
        FROM (SELECT DISTINCT source, token FROM tok) t
        JOIN srcs s ON s.source = t.source
        GROUP BY t.token
    ),
    mg AS (SELECT m, CAST(count(*) AS BIGINT) AS cnt FROM masks GROUP BY m),
    pairs AS (
        SELECT a.source AS source_a, a.sid AS ai,
               b.source AS source_b, b.sid AS bi
        FROM srcs a JOIN srcs b ON a.sid < b.sid
    )
    SELECT p.source_a, p.source_b,
           CAST(sum(CASE WHEN (mg.m >> p.ai) % 2 = 1
                          AND (mg.m >> p.bi) % 2 = 1
                         THEN mg.cnt ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(sum(CASE WHEN (mg.m >> p.ai) % 2 = 1
                           OR (mg.m >> p.bi) % 2 = 1
                         THEN mg.cnt ELSE 0 END) AS BIGINT) AS n_union,
           CAST(1000000 * sum(CASE WHEN (mg.m >> p.ai) % 2 = 1
                                    AND (mg.m >> p.bi) % 2 = 1
                                   THEN mg.cnt ELSE 0 END)
                // sum(CASE WHEN (mg.m >> p.ai) % 2 = 1
                             OR (mg.m >> p.bi) % 2 = 1
                            THEN mg.cnt ELSE 0 END) AS BIGINT)
             AS jaccard_ppm
    FROM pairs p CROSS JOIN mg
    GROUP BY p.source_a, p.source_b
    ORDER BY source_a, source_b
    """,
)
def source_vocab_jaccard(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # Round 12 (scan-collapse): srcs fed the mask join and BOTH pair
    # sides — 3 replans of the distinct + row_number over the corpus
    # (4 document scans in the plan). The |sources|-row frame is
    # materialized once; every consumer reads the checkpoint.
    srcs = (
        docs.select("source")
        .distinct()
        .withColumn(
            "sid",
            (F.row_number().over(Window.orderBy("source")) - 1).cast("long"),
        )
        # Hard bound (VERDICT r12 #5): shiftleft(1L, sid) silently WRAPS
        # for a 65th source — fail loudly at materialization time
        # instead of returning wrong vocabulary-overlap counts.
        .withColumn(
            "sid",
            F.expr(
                "CASE WHEN sid < 64 THEN sid ELSE raise_error("
                "'source_vocab_jaccard: more than 64 distinct sources"
                " — the 64-bit source bitmask would overflow') END"
            ),
        )
        .transform(materialize)
    )
    tok = docs.select(
        "source",
        F.explode(
            F.expr(
                "array_distinct(filter(split(lower(text), ' '),"
                " x -> x != ''))"
            )
        ).alias("token"),
    ).distinct()
    masks = (
        tok.join(F.broadcast(srcs), "source")
        .groupBy("token")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), sid))").alias("m"))
    )
    mg = masks.groupBy("m").agg(F.count("*").cast("long").alias("cnt"))
    # srcs and pairs are strictly bounded (<= 64 and <= 64*63/2 rows
    # at any corpus size — the 64-bit mask caps |sources|), so the
    # pair build and the pair-x-mask product broadcast the bounded
    # side: BroadcastNestedLoopJoin instead of a single-partition
    # CartesianProduct.
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
    both = (
        (F.expr("(m >> ai) % 2") == 1) & (F.expr("(m >> bi) % 2") == 1)
    ).cast("long") * F.col("cnt")
    either = (
        (F.expr("(m >> ai) % 2") == 1) | (F.expr("(m >> bi) % 2") == 1)
    ).cast("long") * F.col("cnt")
    return (
        mg.crossJoin(F.broadcast(pairs))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(both).cast("long").alias("n_shared"),
            F.sum(either).cast("long").alias("n_union"),
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_union",
            F.expr("CAST(1000000 * n_shared div n_union AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy("source_a", "source_b")
    )
