"""Text normalization — the canonicalization pass every pipeline runs
between extraction and tokenization: strip control characters,
normalize line endings, fold tab/space runs, trim. Done wrong it
silently changes token counts and dedup hashes downstream; this module
pins the END STATE byte-for-byte.

Normalization rule chain (applied in this order, all JVM
regexp_replace — map-only, no shuffle):

1. remove control characters except TAB/CR/LF
   (``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]``);
2. CRLF and lone CR → LF;
3. TAB → space;
4. collapse space runs to one space;
5. trim leading/trailing whitespace.

Gate design (pii/html injection pattern): the corpus has no control
characters, so the gate augments each document deterministically from
doc_id — BEL+BS control bytes on d%3=0, a trailing CRLF on d%4=1,
three leading spaces on d%5=2, a trailing TAB+'x' on d%7=3 — all built
with chr() so no string-escape dialect is involved. Both engines then
run the SAME rule chain (Java regex / RE2 agree on these ASCII
classes) and the gate hashes per-doc byte lengths at every stage
boundary, so an over-eager class (eating '\\n') or a missed fold shows
as a stage-length mismatch, not a cancelled total.

Reference parity: none — training-pipeline surface, the text analog of
store/codec.py's byte-exact body canonicalization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import query

_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"


def augment_with_mess(docs):
    """documents → (doc_id, source, raw): deterministic whitespace/
    control-char injection, chr()-built (no escape dialects)."""
    raw = (
        "concat("
        " CASE WHEN doc_id % 5 = 2 THEN '   ' ELSE '' END,"
        " text,"
        " CASE WHEN doc_id % 3 = 0 THEN concat(chr(7), chr(8)) ELSE '' END,"
        " CASE WHEN doc_id % 7 = 3 THEN concat(chr(9), 'x') ELSE '' END,"
        " CASE WHEN doc_id % 4 = 1 THEN concat(chr(13), chr(10))"
        " ELSE '' END)"
    )
    return docs.select("doc_id", "source", F.expr(raw).alias("raw"))


def normalize(col):
    """The rule chain on a Spark column. Patterns pass as Column
    literals (never through expr — backslash escapes)."""
    c = F.regexp_replace(col, F.lit(_CTRL_CLASS), F.lit(""))
    c = F.regexp_replace(c, F.lit("\r\n|\r"), F.lit("\n"))
    c = F.regexp_replace(c, F.lit("\t"), F.lit(" "))
    c = F.regexp_replace(c, F.lit(" +"), F.lit(" "))
    return F.trim(c)


@query(
    "text_normalize_endstate",
    f"""
    WITH a AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 2 THEN '   ' ELSE '' END
               || text
               || CASE WHEN doc_id % 3 = 0 THEN chr(7) || chr(8)
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 3 THEN chr(9) || 'x' ELSE '' END
               || CASE WHEN doc_id % 4 = 1 THEN chr(13) || chr(10)
                       ELSE '' END AS raw
        FROM documents
    ),
    s AS (
        SELECT doc_id, raw,
               regexp_replace(raw, '{_CTRL_CLASS}', '', 'g') AS s1
        FROM a
    ),
    t AS (
        SELECT doc_id, raw, s1,
               -- replacement strings are chr()-built: DuckDB's RE2
               -- replacement does NOT interpret '\\n' (inserts empty)
               trim(regexp_replace(regexp_replace(
                   regexp_replace(s1, '\\r\\n|\\r', chr(10), 'g'),
                   '\\t', ' ', 'g'), ' +', ' ', 'g')) AS clean
        FROM s
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(raw) - length(s1) AS BIGINT) AS n_control_removed,
           CAST(length(s1) - length(clean) AS BIGINT) AS n_ws_removed,
           CAST(length(clean) AS BIGINT) AS len_clean
    FROM t
    """,
)
def text_normalize_endstate(spark, sf_dir):
    """Per-doc byte accounting of the normalization chain over the
    deterministically messed-up corpus: raw length, control bytes
    removed, whitespace folded/trimmed, final length."""
    docs = load_table(spark, sf_dir, "documents")
    a = augment_with_mess(docs)
    s1 = F.regexp_replace(F.col("raw"), F.lit(_CTRL_CLASS), F.lit(""))
    staged = a.select("doc_id", "raw", s1.alias("s1")).select(
        "doc_id", "raw", "s1", normalize(F.col("raw")).alias("clean")
    )
    return staged.select(
        "doc_id",
        F.length("raw").cast("long").alias("len_raw"),
        (F.length("raw") - F.length("s1"))
        .cast("long")
        .alias("n_control_removed"),
        (F.length("s1") - F.length("clean"))
        .cast("long")
        .alias("n_ws_removed"),
        F.length("clean").cast("long").alias("len_clean"),
    )
