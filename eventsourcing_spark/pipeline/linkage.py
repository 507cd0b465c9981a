"""Probabilistic record linkage (Fellegi–Sunter) and boundary-overlap
dedup — the entity-resolution face of the dedup family.

The dedup operators in pipeline/queries.py answer "are these two TEXTS
the same content?"; record linkage answers "are these two ROWS the same
entity?" across fields that individually disagree. The canonical model
is Fellegi & Sunter (JASA 1969): each candidate pair gets an agreement
vector over compared fields, and each field contributes a log-odds
weight — log2(m/u) on agreement, log2((1−m)/(1−u)) on disagreement,
where m = P(agree | match) and u = P(agree | non-match). The pair's
total weight ranks it match / possible / non-match. This is the same
machinery production MDM / customer-dedup stacks run (Splink, dedupe.io)
— here with FIXED published m/u priors so the whole computation is
integer-exact and oracle-replayable (the EM step that fits m/u from
data is a training concern, out of scope the same way nb_classifier
fixes its priors at train time).

Scale shape (the part that matters at 100 TB):

* candidate generation is sorted-neighborhood blocking — row_number
  within the blocking key, each row paired with its next W neighbors
  via an exploded-offset EQUI-join (k = 1..W), so pairs are LINEAR in
  rows (W·n), never quadratic-in-block; the same discipline as
  sorted_neighborhood_pairs. A skewed blocking key cannot blow up a
  bucket because the join key is (block, position), not (block).
* agreement scoring is a map-side expression over candidate pairs —
  integer micro-log-odds constants, one levenshtein() per pair (both
  engines run their native DP; fastss_editdist1_pairs already gates
  that they agree).
* the output is PATTERN grain — at most 2^|fields| rows — so the
  result never grows with the corpus.

``stitch_truncation_pairs`` covers the two boundary-overlap dup
modalities crawl pipelines hit that n-gram/LSH dedup under-weights:
*stitching* (page A's tail is page B's head — split articles,
pagination seams) and *truncation* (B is A plus more text — partial
fetches, expanded rewrites). Both reduce to an equi-join on a K-char
boundary key (tail-K = head-K / head-K = head-K) plus an exact verify,
so candidates are keyed buckets, never all-pairs — the containment
family's discipline applied at document boundaries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table, materialize
from eventsourcing_spark.queries import DEC, query

# Sorted-neighborhood window: each row compared with its next W
# neighbors in (block, acctbal-cents, custkey) order.
SN_WINDOW = 8
# Balance agreement tolerance, in cents.
BAL_TOL_CENTS = 5000

# Fixed m/u priors → integer micro-log-odds (round(1e6·log2(·))).
#   segment:  m=0.90 u=0.20  → agree log2(4.5),  disagree log2(0.1/0.8)
#   balance:  m=0.80 u=0.05  → agree log2(16),   disagree log2(0.2/0.95)
#   name≤1:   m=0.95 u=0.001 → agree log2(950),  disagree log2(0.05/0.999)
W_SEG_A, W_SEG_D = 2_169_925, -3_000_000
W_BAL_A, W_BAL_D = 4_000_000, -2_247_928
W_NAME_A, W_NAME_D = 9_891_784, -4_320_485
# Decision thresholds on the summed micro-weight: a match needs the
# name evidence (no combination without the name bit reaches 6e6).
MATCH_MIN = 6_000_000
POSSIBLE_MIN = 0

_FS_SQL = f"""
WITH base AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           CAST(CAST(c_acctbal AS {DEC}) * 100 AS BIGINT) AS bal_c,
           row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(CAST(c_acctbal AS {DEC}) * 100 AS BIGINT),
                        c_custkey
           ) AS rn
    FROM customer
),
pairs AS (
    SELECT a.c_mktsegment = b.c_mktsegment AS agr_seg,
           abs(a.bal_c - b.bal_c) <= {BAL_TOL_CENTS} AS agr_bal,
           levenshtein(a.c_name, b.c_name) <= 1 AS agr_name
    FROM base a JOIN base b
      ON a.c_nationkey = b.c_nationkey
     AND b.rn BETWEEN a.rn + 1 AND a.rn + {SN_WINDOW}
),
scored AS (
    SELECT concat(CASE WHEN agr_seg THEN '1' ELSE '0' END,
                  CASE WHEN agr_bal THEN '1' ELSE '0' END,
                  CASE WHEN agr_name THEN '1' ELSE '0' END) AS pattern,
           (CASE WHEN agr_seg THEN {W_SEG_A} ELSE {W_SEG_D} END
            + CASE WHEN agr_bal THEN {W_BAL_A} ELSE {W_BAL_D} END
            + CASE WHEN agr_name THEN {W_NAME_A} ELSE {W_NAME_D} END)
               AS weight_micro
    FROM pairs
)
SELECT pattern,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(weight_micro AS BIGINT) AS weight_micro,
       CASE WHEN weight_micro >= {MATCH_MIN} THEN 'match'
            WHEN weight_micro >= {POSSIBLE_MIN} THEN 'possible'
            ELSE 'non_match' END AS decision
FROM scored
GROUP BY pattern, weight_micro
ORDER BY pattern
"""


@query("fs_linkage_weights", _FS_SQL)
def fs_linkage_weights(spark, sf_dir):
    cust = ensure_parallelism(load_table(spark, sf_dir, "customer"))
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        (F.col("c_acctbal").cast(DEC) * 100).cast("long").alias("bal_c"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy("bal_c", "c_custkey")
        ),
    )
    # linear candidate pairs: each row meets its next W neighbors via an
    # exploded-offset EQUI-join on (nation, position) — W·n rows total,
    # no quadratic block anywhere
    left = base.withColumn(
        "k", F.explode(F.expr(f"sequence(1, {SN_WINDOW})"))
    ).withColumn("rn_b", F.col("rn") + F.col("k"))
    # pin shuffle-merge: the exploded-offset side's size estimate does
    # not grow with the window fan-out, so the estimator can broadcast
    # a corpus-sized neighbor frame at scale (round-12 audit); SMJ
    # co-partitions both sides on the nation key instead
    pairs = left.alias("a").join(
        base.hint("merge").alias("b"),
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.rn_b") == F.col("b.rn")),
    )
    agr_seg = F.col("a.c_mktsegment") == F.col("b.c_mktsegment")
    agr_bal = (
        F.abs(F.col("a.bal_c") - F.col("b.bal_c")) <= BAL_TOL_CENTS
    )
    agr_name = F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1
    bit = lambda c: F.when(c, F.lit("1")).otherwise(F.lit("0"))  # noqa: E731
    weight = (
        F.when(agr_seg, F.lit(W_SEG_A)).otherwise(F.lit(W_SEG_D))
        + F.when(agr_bal, F.lit(W_BAL_A)).otherwise(F.lit(W_BAL_D))
        + F.when(agr_name, F.lit(W_NAME_A)).otherwise(F.lit(W_NAME_D))
    ).cast("long")
    scored = pairs.select(
        F.concat(bit(agr_seg), bit(agr_bal), bit(agr_name)).alias("pattern"),
        weight.alias("weight_micro"),
    )
    return (
        scored.groupBy("pattern", "weight_micro")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select(
            "pattern",
            "n_pairs",
            "weight_micro",
            F.when(F.col("weight_micro") >= MATCH_MIN, F.lit("match"))
            .when(F.col("weight_micro") >= POSSIBLE_MIN, F.lit("possible"))
            .otherwise(F.lit("non_match"))
            .alias("decision"),
        )
        .orderBy("pattern")
    )


# boundary key length; stitch additionally requires L >= 2K so a
# document's head and tail keys cannot overlap inside the text
STITCH_K = 16

_STITCH_SQL = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS L
    FROM documents WHERE length(text) >= {STITCH_K}
),
stitch AS (
    SELECT 'stitch' AS kind, a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({STITCH_K} AS BIGINT) AS overlap_chars,
           CAST(a.L + b.L - {STITCH_K} AS BIGINT) AS combined_chars
    FROM d a JOIN d b
      ON substr(a.text, a.L - {STITCH_K} + 1, {STITCH_K})
         = substr(b.text, 1, {STITCH_K})
     AND a.doc_id <> b.doc_id
    WHERE a.L >= {2 * STITCH_K} AND b.L >= {2 * STITCH_K}
),
trunc AS (
    SELECT 'truncation' AS kind, a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(a.L AS BIGINT) AS overlap_chars,
           CAST(b.L AS BIGINT) AS combined_chars
    FROM d a JOIN d b
      ON substr(a.text, 1, {STITCH_K}) = substr(b.text, 1, {STITCH_K})
     AND b.L > a.L AND substr(b.text, 1, a.L) = a.text
)
SELECT * FROM stitch UNION ALL SELECT * FROM trunc
"""


@query("stitch_truncation_pairs", _STITCH_SQL)
def stitch_truncation_pairs(spark, sf_dir):
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= STITCH_K
        )
    ).select("doc_id", "text", F.length("text").alias("L"))
    head = F.expr(f"substring(text, 1, {STITCH_K})")
    tail = F.expr(f"substring(text, L - {STITCH_K} + 1, {STITCH_K})")
    # Round 12: four join branches (both stitch sides, both truncation
    # sides) re-scanned and re-keyed the corpus — materialize the keyed
    # frame once (doc grain; the same linear-state trade as the
    # exact-substring texts fold).
    keyed = docs.select(
        "doc_id", "text", "L", head.alias("head_k"), tail.alias("tail_k")
    ).transform(materialize)
    long_enough = keyed.filter(F.col("L") >= 2 * STITCH_K)
    # stitch: A's tail-K equals B's head-K — keyed equi-join, buckets are
    # per-16-char-boundary collision sets, never all-pairs
    stitch = (
        long_enough.alias("a")
        .join(
            long_enough.alias("b"),
            (F.col("a.tail_k") == F.col("b.head_k"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.lit("stitch").alias("kind"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.lit(STITCH_K).cast("long").alias("overlap_chars"),
            (F.col("a.L") + F.col("b.L") - STITCH_K)
            .cast("long")
            .alias("combined_chars"),
        )
    )
    # truncation: same head-K key, then the exact strict-prefix verify
    # runs only inside key buckets (JVM substring equality, map-side)
    trunc = (
        keyed.alias("a")
        .join(keyed.alias("b"), F.col("a.head_k") == F.col("b.head_k"))
        .filter(
            (F.col("b.L") > F.col("a.L"))
            & (
                F.expr("substring(b.text, 1, a.L)") == F.col("a.text")
            )
        )
        .select(
            F.lit("truncation").alias("kind"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.L").cast("long").alias("overlap_chars"),
            F.col("b.L").cast("long").alias("combined_chars"),
        )
    )
    return stitch.unionByName(trunc)
