"""PII detection and redaction — the privacy stage of a curation pipeline.

Every production-scale training-data pipeline runs a PII pass before
release: find emails / phone numbers / IP addresses / card- and SSN-like
tokens, measure their density per source, and rewrite the text with
typed placeholders. The reference's privacy surface is the event-store
"forget" (maintenance/forget.py, M1 — delete/blank by stream); this
module is the corpus-side complement for free text.

**Detection is REAL regex work on the JVM fast path** (`regexp_count` /
`regexp_replace` — whole-stage-codegen string kernels, no Python in the
loop). The synthetic corpus contains no PII, so the gate derives an
augmented corpus deterministically from ``doc_id`` (the media-family
pattern: multimodal.py injects pixels, this injects spans) — each doc
gains 0-5 typed spans via pure `concat` arithmetic. The DuckDB twin
never runs a regex: it recomputes expected counts, match lengths, and
post-redaction byte lengths arithmetically from the same doc_id rules,
so a regex that under- or over-matches (or a redaction that eats
neighboring text) cannot cancel out.

Scale shape: both queries are map-only over documents plus one keyed
aggregate (per source / per doc) — no joins, no windows; the scan reads
only (doc_id, text, source).

Span injection rules (all arithmetic on ``d = doc_id``):

========  ==============  ==========================================
type      condition       injected text (appended in this order)
========  ==============  ==========================================
email     d % 3 == 0      `` contact user{d}@ex{d%7}.com``
phone     d % 4 == 1      `` call +1-555-{1000+d%9000}``
ipv4      d % 5 == 2      `` host 10.{d%256}.{(d//7)%256}.{d%250}``
card      d % 7 == 3      `` cc 4{d%10**15 left-padded to 15}``
ssn       d % 11 == 4     `` ssn {100+d%900}-{10+d%90}-{1000+d%9000}``
========  ==============  ==========================================
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import query

# Java-regex patterns (Spark side). Kept deliberately standard — these
# are the shapes a real PII pass uses, not patterns tuned to the
# injection (the arithmetic oracle is what keeps them honest).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+1-555-\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card": r"\b\d{16}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
PII_MARKERS = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
    "card": "<CARD>",
    "ssn": "<SSN>",
}

# SQL-side presence conditions (shared by both engines' derivations)
_COND = {
    "email": "doc_id % 3 = 0",
    "phone": "doc_id % 4 = 1",
    "ipv4": "doc_id % 5 = 2",
    "card": "doc_id % 7 = 3",
    "ssn": "doc_id % 11 = 4",
}


def augment_with_pii(docs):
    """documents → (doc_id, source, text2): deterministic span injection,
    pure JVM concat (no UDF)."""
    email = F.expr(
        "CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id,"
        " '@ex', doc_id % 7, '.com') ELSE '' END"
    )
    phone = F.expr(
        "CASE WHEN doc_id % 4 = 1 THEN concat(' call +1-555-',"
        " 1000 + doc_id % 9000) ELSE '' END"
    )
    ipv4 = F.expr(
        "CASE WHEN doc_id % 5 = 2 THEN concat(' host 10.', doc_id % 256,"
        " '.', (doc_id div 7) % 256, '.', doc_id % 250) ELSE '' END"
    )
    card = F.expr(
        "CASE WHEN doc_id % 7 = 3 THEN concat(' cc 4',"
        " lpad(cast(doc_id % 1000000000000000 as string), 15, '0'))"
        " ELSE '' END"
    )
    ssn = F.expr(
        "CASE WHEN doc_id % 11 = 4 THEN concat(' ssn ', 100 + doc_id % 900,"
        " '-', 10 + doc_id % 90, '-', 1000 + doc_id % 9000) ELSE '' END"
    )
    return docs.select(
        "doc_id",
        "source",
        F.concat("text", email, phone, ipv4, card, ssn).alias("text2"),
    )


@query(
    "pii_detection_stats",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN {_COND['email']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_email,
           CAST(sum(CASE WHEN {_COND['phone']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phone,
           CAST(sum(CASE WHEN {_COND['ipv4']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ipv4,
           CAST(sum(CASE WHEN {_COND['card']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_card,
           CAST(sum(CASE WHEN {_COND['ssn']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ssn,
           CAST(sum(CASE WHEN {_COND['email']} OR {_COND['phone']}
                      OR {_COND['ipv4']} OR {_COND['card']}
                      OR {_COND['ssn']} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_with_pii,
           CAST(sum((CASE WHEN {_COND['email']} THEN 1 ELSE 0 END)
                  + (CASE WHEN {_COND['phone']} THEN 1 ELSE 0 END)
                  + (CASE WHEN {_COND['ipv4']} THEN 1 ELSE 0 END)
                  + (CASE WHEN {_COND['card']} THEN 1 ELSE 0 END)
                  + (CASE WHEN {_COND['ssn']} THEN 1 ELSE 0 END)) AS BIGINT)
             AS pii_hits
    FROM documents
    GROUP BY source
    """,
)
def pii_detection_stats(spark, sf_dir):
    """Per-source PII density over the augmented corpus, detected by the
    REAL regexes (regexp_count on the JVM). The oracle knows how many
    spans were injected; the regexes must find exactly those — an
    over-matching pattern (e.g. ipv4 matching the card digits) or an
    under-matching one fails the gate."""
    docs = load_table(spark, sf_dir, "documents")
    aug = augment_with_pii(docs)
    # DataFrame-API regexp_count: patterns pass through verbatim (a SQL
    # string literal would eat the \b/\d escapes)
    cnt = {
        k: F.regexp_count(F.col("text2"), F.lit(p))
        for k, p in PII_PATTERNS.items()
    }
    return aug.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(cnt["email"]).cast("long").alias("n_email"),
        F.sum(cnt["phone"]).cast("long").alias("n_phone"),
        F.sum(cnt["ipv4"]).cast("long").alias("n_ipv4"),
        F.sum(cnt["card"]).cast("long").alias("n_card"),
        F.sum(cnt["ssn"]).cast("long").alias("n_ssn"),
        F.sum(
            F.when(
                (cnt["email"] + cnt["phone"] + cnt["ipv4"]
                 + cnt["card"] + cnt["ssn"]) > 0, 1
            ).otherwise(0)
        ).cast("long").alias("n_docs_with_pii"),
        F.sum(
            cnt["email"] + cnt["phone"] + cnt["ipv4"]
            + cnt["card"] + cnt["ssn"]
        ).cast("long").alias("pii_hits"),
    )


# per-type matched-span lengths, arithmetically (digits(n) = length of
# the decimal rendering); the redaction replaces the span with a marker
_DIGITS = "length(CAST({n} AS VARCHAR))"


@query(
    "pii_redaction_endstate",
    f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS len0,
               CASE WHEN {_COND['email']} THEN 1 ELSE 0 END AS he,
               CASE WHEN {_COND['phone']} THEN 1 ELSE 0 END AS hp,
               CASE WHEN {_COND['ipv4']} THEN 1 ELSE 0 END AS hi,
               CASE WHEN {_COND['card']} THEN 1 ELSE 0 END AS hc,
               CASE WHEN {_COND['ssn']} THEN 1 ELSE 0 END AS hs,
               -- matched-span lengths: email 'user{{d}}@ex{{m}}.com',
               -- phone '+1-555-DDDD', ip '10.a.b.c', card 16, ssn 11
               12 + {_DIGITS.format(n='doc_id')} AS le,
               11 AS lp,
               5 + {_DIGITS.format(n='doc_id % 256')}
                 + {_DIGITS.format(n='(doc_id // 7) % 256')}
                 + {_DIGITS.format(n='doc_id % 250')} AS li,
               16 AS lc,
               11 AS ls
        FROM documents
    )
    SELECT doc_id,
           CAST(he + hp + hi + hc + hs AS BIGINT) AS n_redactions,
           -- augmented length = text + injected segments (prefixes incl.)
           CAST(len0 + he * (9 + le) + hp * (6 + lp) + hi * (6 + li)
                + hc * (4 + lc) + hs * (5 + ls) AS BIGINT) AS len_before,
           -- redaction swaps each span for its marker: <EMAIL>=7,
           -- <PHONE>=7, <IP>=4, <CARD>=6, <SSN>=5
           CAST(len0 + he * (9 + 7) + hp * (6 + 7) + hi * (6 + 4)
                + hc * (4 + 6) + hs * (5 + 5) AS BIGINT) AS len_after
    FROM m
    """,
)
def pii_redaction_endstate(spark, sf_dir):
    """Redact the augmented corpus with the real regexes and pin the END
    STATE: per-doc redaction count and exact byte lengths before/after.
    The oracle computes both lengths arithmetically, so a redaction that
    leaves a span behind, eats neighboring text, or double-replaces
    shifts len_after and fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    aug = augment_with_pii(docs)
    red = F.col("text2")
    total = F.lit(0)
    for k in ("email", "phone", "ipv4", "card", "ssn"):
        total = total + F.regexp_count(
            F.col("text2"), F.lit(PII_PATTERNS[k])
        )
        red = F.regexp_replace(red, PII_PATTERNS[k], PII_MARKERS[k])
    return aug.select(
        "doc_id",
        total.cast("long").alias("n_redactions"),
        F.octet_length("text2").cast("long").alias("len_before"),
        F.octet_length(red).cast("long").alias("len_after"),
    )
