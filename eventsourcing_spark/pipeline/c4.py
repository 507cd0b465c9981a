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

from eventsourcing_spark.io import (
    TEXT_KERNEL_BYTES,
    TEXT_KERNEL_BYTES_MID,
    ensure_parallelism,
    load_table,
)
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
    pos AS (
        -- line-index domain derived from the corpus's longest document
        -- (NOT a fixed literal: a fixed cap silently truncates any doc
        -- beyond it and diverges from the uncapped Spark side — the
        -- same loud-not-silent rule as exact_substring's bound)
        SELECT unnest(generate_series(0, (
            SELECT coalesce(max((len(list_filter(string_split(text, ' '),
                                                 x -> x <> ''))
                                 + {LINE_WORDS} - 1) // {LINE_WORDS}), 1)
            FROM documents) - 1)) AS i
    ),
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
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES_MID)
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


# ---------------------------------------------------------------------------
# Gopher repetition flags (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1): the
# within-document repetition filters — duplicate-line fraction and
# duplicate-line CHARACTER fraction — that catch template spam and
# scraper loops which whole-document dedup never sees (the document is
# globally unique; its insides repeat). Gopher drops documents whose
# duplicate-line fraction exceeds 0.30 or whose duplicate-line char
# fraction exceeds 0.20; both thresholds here in exact ppm.
#
# A line is a DUPLICATE if the same line string appeared at a smaller
# line_idx in the SAME document (first occurrence stays clean — the
# Gopher counting rule). Lines are the same synthesized structure the
# C4 pass uses, so the two filters read one grain.
#
# Scale shape: map-side explode, one window keyed by (doc_id, line) for
# the first-occurrence test, one doc-grain aggregate. Nothing global.
# ---------------------------------------------------------------------------
DUP_LINE_PPM = 300_000   # Gopher: duplicate line fraction > 0.30
DUP_CHAR_PPM = 200_000   # Gopher: duplicate line char fraction > 0.20


@query(
    "gopher_repetition_flags",
    f"""
    WITH {_LINES_SQL},
    fo AS (
        SELECT doc_id, source, line_idx, line,
               line_idx > min(line_idx)
                   OVER (PARTITION BY doc_id, line) AS is_dup
        FROM ln
    ),
    d AS (
        SELECT doc_id,
               count(*) AS n_lines,
               sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup,
               sum(length(line)) AS n_chars,
               sum(CASE WHEN is_dup THEN length(line) ELSE 0 END)
                 AS n_dup_chars
        FROM fo GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_dup AS BIGINT) AS n_dup_lines,
           CAST(1000000 * n_dup // n_lines AS BIGINT) AS dup_line_ppm,
           CAST(1000000 * n_dup_chars // n_chars AS BIGINT)
             AS dup_char_ppm,
           1000000 * n_dup // n_lines > {DUP_LINE_PPM}
               OR 1000000 * n_dup_chars // n_chars > {DUP_CHAR_PPM}
             AS flagged
    FROM d
    """,
)
def gopher_repetition_flags(spark, sf_dir):
    """Within-document repetition audit at the shared line grain:
    duplicate-line and duplicate-char fractions in ppm plus the Gopher
    drop flag."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    fo = synthesize_lines(docs).withColumn(
        "is_dup",
        F.expr(
            "line_idx > min(line_idx) OVER (PARTITION BY doc_id, line)"
        ),
    )
    d = fo.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.expr("CASE WHEN is_dup THEN 1 ELSE 0 END")).alias("n_dup"),
        F.sum(F.length("line")).alias("n_chars"),
        F.sum(
            F.expr("CASE WHEN is_dup THEN length(line) ELSE 0 END")
        ).alias("n_dup_chars"),
    )
    return d.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_dup").cast("long").alias("n_dup_lines"),
        F.expr("(1000000 * n_dup) div n_lines")
        .cast("long")
        .alias("dup_line_ppm"),
        F.expr("(1000000 * n_dup_chars) div n_chars")
        .cast("long")
        .alias("dup_char_ppm"),
        (
            (F.expr("(1000000 * n_dup) div n_lines") > DUP_LINE_PPM)
            | (F.expr("(1000000 * n_dup_chars) div n_chars") > DUP_CHAR_PPM)
        ).alias("flagged"),
    )
