"""C4-style line-grain cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2) — the rule set that built C4 out of
Common Crawl and that every web-scale corpus re-implements:

* keep only lines ending in a terminal punctuation mark ('.', '!',
  '?', '"');
* drop lines with fewer than 5 words;
* drop lines containing the word "javascript";
* drop pages left with fewer than 3 surviving lines;
* deduplicate surviving lines corpus-wide, keeping the FIRST
  occurrence (min (doc_id, line_idx)).

The synthetic corpus has no newlines or punctuation, so the gate
synthesizes the line structure deterministically from (doc_id, word
stream) — the pii/html injection pattern: every run of 6 words is a
line (the trailing remainder is the natural short line), lines with
(doc_id + idx) % 5 == 0 gain a trailing " javascript" token, and lines
with (doc_id + idx) % 7 == 3 get no terminal period. The RULES are
evaluated generically against the line string (right(line, 1), word
count of the split, substring containment) — they are the real C4
predicates, not the injection conditions, so a rule that drifts from
the construction fails the gate. Cross-document line duplicates occur
naturally (the corpus vocabulary is small), giving the dedup stage
real work.

Scale shape: lines explode map-side; the page rule is a window keyed
by doc_id; line dedup is a window keyed by the line string (per-key
population = duplication degree); the funnel aggregates to |sources|
rows. No corpus-global stage, no Python rows.

Reference parity: none — training-pipeline surface (task brief), same
family as pipeline/quality.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import ensure_parallelism, load_table
from eventsourcing_spark.queries import query

LINE_WORDS = 6        # synthesized line width (words)
MIN_LINE_WORDS = 5    # C4: drop lines under 5 words
MIN_PAGE_LINES = 3    # C4: drop pages under 3 surviving lines

# Sortable first-occurrence key: zero-padded doc_id then line_idx.
_OCC_KEY_SPARK = (
    "concat(lpad(cast(doc_id as string), 12, '0'), ':',"
    " lpad(cast(line_idx as string), 8, '0'))"
)
_OCC_KEY_SQL = (
    "lpad(CAST(doc_id AS VARCHAR), 12, '0') || ':' ||"
    " lpad(CAST(line_idx AS VARCHAR), 8, '0')"
)


def synthesize_lines(docs):
    """documents → (doc_id, source, line_idx, line): the deterministic
    line structure. Map-side explode, JVM expressions only."""
    ws = "filter(split(text, ' '), x -> x != '')"
    lines = (
        f"transform(sequence(0, (size({ws}) + {LINE_WORDS} - 1)"
        f" div {LINE_WORDS} - 1), i -> named_struct("
        f"'idx', i, 'line',"
        f" concat(array_join(slice({ws}, i * {LINE_WORDS} + 1,"
        f" {LINE_WORDS}), ' '),"
        " CASE WHEN (doc_id + i) % 5 = 0 THEN ' javascript' ELSE '' END,"
        " CASE WHEN (doc_id + i) % 7 <> 3 THEN '.' ELSE '' END)))"
    )
    return (
        docs.filter(F.expr(f"size({ws}) > 0"))
        .select("doc_id", "source", F.explode(F.expr(lines)).alias("l"))
        .select(
            "doc_id",
            "source",
            F.col("l.idx").alias("line_idx"),
            F.col("l.line").alias("line"),
        )
    )


_LINES_SQL = f"""
    w AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    pos AS (SELECT unnest(generate_series(0, 511)) AS i),
    ln AS (
        SELECT doc_id, source, i AS line_idx,
               array_to_string(list_slice(ws, i * {LINE_WORDS} + 1,
                                          i * {LINE_WORDS} + {LINE_WORDS}),
                               ' ')
               || CASE WHEN (doc_id + i) % 5 = 0 THEN ' javascript'
                       ELSE '' END
               || CASE WHEN (doc_id + i) % 7 <> 3 THEN '.' ELSE '' END
                 AS line
        FROM w, pos
        WHERE len(ws) > 0
          AND i <= (len(ws) + {LINE_WORDS} - 1) // {LINE_WORDS} - 1
    )
"""

# Generic C4 predicates, evaluated on the line STRING (shared shape;
# each engine's dialect below).
_STATUS_SQL = f"""
        CASE WHEN right(line, 1) NOT IN ('.', '!', '?', '"') THEN 'punct'
             WHEN len(string_split(line, ' ')) < {MIN_LINE_WORDS}
                  THEN 'short'
             WHEN line LIKE '%javascript%' THEN 'badword'
             ELSE 'keep' END
"""
_STATUS_SPARK = f"""
        CASE WHEN right(line, 1) NOT IN ('.', '!', '?', '\\"') THEN 'punct'
             WHEN size(split(line, ' ')) < {MIN_LINE_WORDS} THEN 'short'
             WHEN line LIKE '%javascript%' THEN 'badword'
             ELSE 'keep' END
"""


@query(
    "c4_line_filters",
    f"""
    WITH {_LINES_SQL},
    fl AS (
        SELECT *, {_STATUS_SQL} AS status FROM ln
    ),
    pg AS (
        SELECT *,
               sum(CASE WHEN status = 'keep' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id) >= {MIN_PAGE_LINES} AS page_kept
        FROM fl
    ),
    dd AS (
        SELECT *,
               CASE WHEN status = 'keep' AND page_kept THEN
                   {_OCC_KEY_SQL} = min(CASE WHEN status = 'keep'
                                             AND page_kept
                                        THEN {_OCC_KEY_SQL} END)
                       OVER (PARTITION BY line)
               ELSE FALSE END AS is_keeper
        FROM pg
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN status = 'punct' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_drop_punct,
           CAST(sum(CASE WHEN status = 'short' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_drop_short,
           CAST(sum(CASE WHEN status = 'badword' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_drop_badword,
           CAST(sum(CASE WHEN status = 'keep' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept_lines,
           CAST(count(DISTINCT CASE WHEN page_kept THEN doc_id END)
                AS BIGINT) AS n_pages_kept,
           CAST(sum(CASE WHEN status = 'keep' AND page_kept
                         AND NOT is_keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_removed,
           CAST(sum(CASE WHEN is_keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_final_lines
    FROM dd
    GROUP BY source
    """,
)
def c4_line_filters(spark, sf_dir):
    """The C4 cleaning funnel per source: line drops by first failing
    rule, the page rule, and corpus-wide first-occurrence line dedup."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    fl = synthesize_lines(docs).withColumn("status", F.expr(_STATUS_SPARK))
    pg = fl.withColumn(
        "page_kept",
        F.expr(
            "sum(CASE WHEN status = 'keep' THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY doc_id)"
        )
        >= MIN_PAGE_LINES,
    )
    dd = pg.withColumn(
        "is_keeper",
        F.expr(
            f"CASE WHEN status = 'keep' AND page_kept THEN"
            f" {_OCC_KEY_SPARK} = min(CASE WHEN status = 'keep'"
            f" AND page_kept THEN {_OCC_KEY_SPARK} END)"
            f" OVER (PARTITION BY line)"
            f" ELSE FALSE END"
        ),
    )
    keep = F.expr("CASE WHEN status = 'keep' THEN 1 ELSE 0 END")
    return dd.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.expr("CASE WHEN status = 'punct' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_drop_punct"),
        F.sum(F.expr("CASE WHEN status = 'short' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_drop_short"),
        F.sum(F.expr("CASE WHEN status = 'badword' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_drop_badword"),
        F.sum(keep).cast("long").alias("n_kept_lines"),
        F.countDistinct(
            F.expr("CASE WHEN page_kept THEN doc_id END")
        )
        .cast("long")
        .alias("n_pages_kept"),
        F.sum(
            F.expr(
                "CASE WHEN status = 'keep' AND page_kept AND NOT is_keeper"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_dup_removed"),
        F.sum(F.expr("CASE WHEN is_keeper THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_final_lines"),
    )
