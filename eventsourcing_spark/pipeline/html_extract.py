"""HTML boilerplate extraction — the first stage of every web-crawl
curation pipeline.

Before dedup, quality scoring, or PII scrubbing, a crawled page must be
reduced to its main content: strip <script>/<style>/<head>, segment the
markup into blocks, and keep the blocks a reader came for while
dropping navigation, ads, and footers. The extractor here implements
the published text-density/link-density family of rules (jusText —
Pomikálek 2011; trafilatura's link-density gate; Boilerpipe —
Kohlschütter et al., WSDM 2010) in a deterministic integer form:

  a block is CONTENT iff  len(text) >= {MIN_CONTENT_CHARS}
                     and  2 * link_chars < len(text)   (< 500 permille)

Everything runs as JVM expressions (regexp_replace / split /
higher-order array functions) in ONE projection — map-only, no
shuffle, no Python. That is the shape that matters at 100 TB: the
extraction pass is embarrassingly parallel and rides executor count.

**Gate design (the pii.py pattern — pii.py module docstring):** the
synthetic corpus is plain text, so the gate WRAPS each document into a
deterministic HTML page derived from (doc_id, text): head with
title/style/script, a nav div of doc_id%4+1 links, the document text
as a <p>, an all-link ad div on doc_id%3=0, a second content
paragraph on doc_id%5=0, and a link-heavy footer. The DuckDB twin
NEVER parses HTML — it recomputes the expected extracted text, block
counts, and boilerplate ppm arithmetically from the same doc_id rules,
so an extractor that leaks a nav link, eats a content character, or
miscounts a block cannot cancel out.

The wrap replaces any '<'/'>' already in the text with a space
(length-preserving canonicalization, applied identically in the
oracle's arithmetic) so document content can never inject markup into
the synthesized page.

Block inventory per page (d = doc_id, L = length of canonicalized
text):

=========  ==============  ===========  ==========  =================
block      condition       text chars   link chars  verdict
=========  ==============  ===========  ==========  =================
nav        always          6n-1 (n=d%4+1)  5n       boiler (short+densе→ short rule)
content    always          L            0           content iff L>=30
ad         d % 3 == 0      36           36          boiler (density)
appendix   d % 5 == 0      47+digits(d) 0           content
footer     always          58           35          boiler (density)
=========  ==============  ===========  ==========  =================

Reference parity: none — the reference has no text-extraction surface;
this is training-pipeline surface alongside pipeline/quality.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.queries import query

MIN_CONTENT_CHARS = 30  # jusText-style short-block floor
# density rule is the integer form 2*link < len  (i.e. < 500 permille)

# Shared literal fragments (single source for wrap + oracle arithmetic).
_AD_TXT = "limited offer buy now and save today"
_APP_PRE = "appendix note "
_APP_SUF = " for long-form readers everywhere"
_FOOT_LINK_A = "terms of service"
_FOOT_LINK_B = "privacy and cookies"
_FOOT_TAIL = " (c) 2024 example corp"
_FOOT_TXT_LEN = len(_FOOT_LINK_A) + 1 + len(_FOOT_LINK_B) + len(_FOOT_TAIL)
_FOOT_LINK_LEN = len(_FOOT_LINK_A) + len(_FOOT_LINK_B)
_AD_LEN = len(_AD_TXT)


def wrap_as_html(docs):
    """documents → (doc_id, source, html): the deterministic page. Pure
    JVM concat / higher-order functions — no UDF, no shuffle."""
    canon = "replace(replace(text, '<', ' '), '>', ' ')"
    nav = (
        "array_join(transform(sequence(1, int(doc_id % 4) + 1),"
        " j -> concat('<a href=\"/s', j, '\">sec ', j, '</a>')), ' ')"
    )
    ad = (
        f"CASE WHEN doc_id % 3 = 0 THEN concat('<div><a href=\"/buy\">',"
        f" '{_AD_TXT}', '</a></div>') ELSE '' END"
    )
    app = (
        f"CASE WHEN doc_id % 5 = 0 THEN concat('<p>', '{_APP_PRE}',"
        f" doc_id, '{_APP_SUF}', '</p>') ELSE '' END"
    )
    footer = (
        f"concat('<div><a href=\"/tos\">{_FOOT_LINK_A}</a> ',"
        f" '<a href=\"/p\">{_FOOT_LINK_B}</a>{_FOOT_TAIL}</div>')"
    )
    html = (
        "concat('<html><head><title>Doc ', doc_id,"
        " '</title><style>p{margin:0}</style><script>var i=', doc_id,"
        f" ';</script></head><body>', '<div>', {nav}, '</div>',"
        f" '<p>', {canon}, '</p>', {ad}, {app}, {footer},"
        " '</body></html>')"
    )
    return docs.select("doc_id", "source", F.expr(html).alias("html"))


# -- the extractor proper (works on ANY html column, not just the wrap) --
# None of these patterns contain a backslash, so they are safe inside
# expr() string literals (round-5 lesson: expr eats backslash escapes).
_STRIPPED = (
    "regexp_replace(regexp_replace(regexp_replace(html,"
    " '(?s)<script[^>]*>.*?</script>', ''),"
    " '(?s)<style[^>]*>.*?</style>', ''),"
    " '(?s)<head[^>]*>.*?</head>', '')"
)
# Segment on block-level tags (lookahead keeps <param>-style names from
# matching the p alternative); drop the empty inter-tag fragments.
_BLOCKS = (
    f"filter(split({_STRIPPED}, '</?(?:div|p|html|body)(?=[ >])[^>]*>'),"
    " x -> length(x) > 0)"
)
# Per block: visible text and the chars contributed by <a> spans.
_BS = (
    f"transform({_BLOCKS}, b -> named_struct("
    "'txt', regexp_replace(b, '<[^>]*>', ''), "
    "'link', length(regexp_replace(b, '<[^>]*>', ''))"
    " - length(regexp_replace(regexp_replace(b,"
    " '(?s)<a[^>]*>.*?</a>', ''), '<[^>]*>', ''))))"
)
_IS_CONTENT = (
    f"length(x.txt) >= {MIN_CONTENT_CHARS} and 2 * x.link < length(x.txt)"
)


def extract_blocks(df):
    """(... html) → (..., bs: array<struct<txt,link>>): the segmented
    block table. Exposed for the audit query and for reuse on real
    crawled HTML."""
    return df.withColumn("bs", F.expr(_BS))


# Oracle-side arithmetic fragments (DuckDB; derives expectations from
# the injection rules — never parses HTML).
_O_CANON = "replace(replace(text, '<', ' '), '>', ' ')"
_O_APP = f"'{_APP_PRE}' || doc_id || '{_APP_SUF}'"


def extraction_stats(pages):
    """(doc_id, html, ...) → (doc_id, extracted_text, n_blocks,
    n_content_blocks, boilerplate_ppm): THE extraction rule, shared by
    the oracle-gated batch query and the streaming ingest twin
    (pipeline.streaming_extract) so the two paths cannot drift."""
    bs = extract_blocks(pages)
    return bs.select(
        "doc_id",
        F.expr(
            f"array_join(transform(filter(bs, x -> {_IS_CONTENT}),"
            " x -> x.txt), chr(10))"
        ).alias("extracted_text"),
        F.expr("size(bs)").cast("long").alias("n_blocks"),
        F.expr(f"size(filter(bs, x -> {_IS_CONTENT}))")
        .cast("long")
        .alias("n_content_blocks"),
        F.expr(
            f"(1000000 * aggregate(filter(bs, x -> not ({_IS_CONTENT})),"
            " 0L, (a, x) -> a + length(x.txt)))"
            " div aggregate(bs, 0L, (a, x) -> a + length(x.txt))"
        )
        .cast("long")
        .alias("boilerplate_ppm"),
    )


@query(
    "html_extract_stats",
    f"""
    WITH t AS (
        SELECT doc_id, {_O_CANON} AS t2,
               length({_O_CANON}) AS L,
               doc_id % 4 + 1 AS n_nav,
               CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS has_ad,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS has_app,
               {_O_APP} AS app_txt
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN L >= {MIN_CONTENT_CHARS} AND has_app = 1
                     THEN t2 || chr(10) || app_txt
                WHEN L >= {MIN_CONTENT_CHARS} THEN t2
                WHEN has_app = 1 THEN app_txt
                ELSE '' END AS extracted_text,
           -- nav + content-p + footer, but the extractor drops empty
           -- inter-tag fragments, so an empty-text doc contributes no
           -- content block (L = 0 → 2 fixed blocks, not 3)
           CAST(CASE WHEN L > 0 THEN 3 ELSE 2 END + has_ad + has_app
                AS BIGINT) AS n_blocks,
           CAST(CASE WHEN L >= {MIN_CONTENT_CHARS} THEN 1 ELSE 0 END
                + has_app AS BIGINT) AS n_content_blocks,
           CAST(1000000 * (6 * n_nav - 1
                           + CASE WHEN L < {MIN_CONTENT_CHARS} THEN L
                                  ELSE 0 END
                           + has_ad * {_AD_LEN} + {_FOOT_TXT_LEN})
                // (6 * n_nav - 1 + L + has_ad * {_AD_LEN}
                    + has_app * length(app_txt) + {_FOOT_TXT_LEN})
                AS BIGINT) AS boilerplate_ppm
    FROM t
    """,
)
def html_extract_stats(spark, sf_dir):
    """Main-content extraction over the HTML-wrapped corpus: per doc,
    the recovered text, block census, and boilerplate fraction. The
    oracle's expected extracted_text is the original document text
    (plus the injected appendix paragraph) — one leaked nav character
    or one eaten content character fails the value hash."""
    docs = load_table(spark, sf_dir, "documents")
    return extraction_stats(wrap_as_html(docs))


@query(
    "html_link_graph",
    """
    WITH t AS (SELECT doc_id FROM documents),
    l AS (
        SELECT doc_id, '/s' || j AS href
        FROM t, (SELECT unnest(generate_series(1, 4)) AS j) s
        WHERE j <= doc_id % 4 + 1
        UNION ALL SELECT doc_id, '/buy' FROM t WHERE doc_id % 3 = 0
        UNION ALL SELECT doc_id, '/tos' FROM t
        UNION ALL SELECT doc_id, '/p' FROM t
    )
    SELECT href,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM l
    GROUP BY href
    """,
)
def html_link_graph(spark, sf_dir):
    """Outlink graph from the markup — the crawl-frontier/PageRank
    input a web pipeline derives right after extraction. Real regex
    work on the JVM (regexp_extract_all over the page); the oracle
    recomputes the link inventory arithmetically from the injection
    rules, so an href pattern that over- or under-captures fails."""
    docs = load_table(spark, sf_dir, "documents")
    pages = wrap_as_html(docs)
    links = pages.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("html", F.lit('<a href="([^"]*)"'), 1)
        ).alias("href"),
    )
    return links.groupBy("href").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


@query(
    "html_density_rule_audit",
    f"""
    WITH t AS (
        SELECT doc_id, length({_O_CANON}) AS L, doc_id % 4 + 1 AS n_nav,
               {_O_APP} AS app_txt
        FROM documents
    ),
    blk AS (
        SELECT 6 * n_nav - 1 AS len, 5 * n_nav AS link FROM t
        UNION ALL SELECT L, 0 FROM t
        UNION ALL SELECT {_AD_LEN}, {_AD_LEN} FROM t WHERE doc_id % 3 = 0
        UNION ALL SELECT length(app_txt), 0 FROM t WHERE doc_id % 5 = 0
        UNION ALL SELECT {_FOOT_TXT_LEN}, {_FOOT_LINK_LEN} FROM t
    )
    SELECT CAST((1000 * link // len) // 100 AS BIGINT) AS ld_decile,
           len >= {MIN_CONTENT_CHARS} AND 2 * link < len AS is_content,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(len) AS BIGINT) AS sum_chars,
           CAST(sum(link) AS BIGINT) AS sum_link_chars
    FROM blk
    GROUP BY 1, 2
    ORDER BY ld_decile, is_content
    """,
)
def html_density_rule_audit(spark, sf_dir):
    """Block-level audit of the density rule: how many blocks land in
    each link-density decile and which side of the content gate they
    fall on. This is the tuning view a curation team reads before
    moving the thresholds; the oracle derives the same census from the
    injection arithmetic, so segmentation drift (a split block, a
    swallowed tag) shows up as a shifted decile count."""
    docs = load_table(spark, sf_dir, "documents")
    bs = extract_blocks(wrap_as_html(docs))
    blocks = bs.select(F.explode("bs").alias("x")).select(
        F.expr("(1000 * x.link) div length(x.txt)").alias("ld"),
        F.expr(f"{_IS_CONTENT}").alias("is_content"),
        F.expr("length(x.txt)").alias("len"),
        F.col("x.link").alias("link"),
    )
    return (
        blocks.groupBy(
            F.expr("ld div 100").cast("long").alias("ld_decile"),
            "is_content",
        )
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum("len").cast("long").alias("sum_chars"),
            F.sum("link").cast("long").alias("sum_link_chars"),
        )
        .orderBy("ld_decile", "is_content")
    )


# ---------------------------------------------------------------------------
# URL parsing / host-level census — the domain view a crawl pipeline
# derives right after extraction (host-level caps, per-domain quality
# priors, tracking-parameter hygiene all key off it). The Spark side
# exercises the REAL JVM url parser (parse_url HOST/PATH/QUERY); the
# corpus has no URL column, so the gate synthesizes one per document
# from (source, doc_id) — injection pattern — and the oracle recomputes
# host/path/query facts arithmetically from the same rules, so a parser
# invocation that grabs the wrong component fails the hash.
# Map-only + one |hosts|-row aggregate.
# ---------------------------------------------------------------------------
@query(
    "url_host_stats",
    """
    WITH u AS (
        SELECT doc_id, source,
               source || '-' || (doc_id % 7) || '.example.com' AS host,
               length('/p/' || doc_id) AS path_len,
               CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS has_query
        FROM documents
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(has_query) AS BIGINT) AS n_with_query,
           CAST(max(path_len) AS BIGINT) AS max_path_len,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM u
    GROUP BY host
    """,
)
def url_host_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    url = F.expr(
        "concat('https://', source, '-', doc_id % 7, '.example.com/p/',"
        " doc_id,"
        " CASE WHEN doc_id % 3 = 0 THEN concat('?utm=1&ref=', doc_id % 5)"
        " ELSE '' END)"
    )
    parsed = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.length(F.parse_url(url, F.lit("PATH"))).alias("path_len"),
        F.when(F.parse_url(url, F.lit("QUERY")).isNotNull(), 1)
        .otherwise(0)
        .alias("has_query"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("has_query").cast("long").alias("n_with_query"),
        F.max("path_len").cast("long").alias("max_path_len"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL first-occurrence dedup — the
# cheapest dedup stage a CommonCrawl-style corpus runs before any
# content hashing (RFC 3986 §6 normalization subset: lowercase scheme
# and host, strip the scheme's default port (keep non-default ports),
# drop the fragment, sort query parameters; path and parameter
# names/values untouched). Spark runs the REAL kernels (parse_url
# PROTOCOL/AUTHORITY/PATH/QUERY + regex + array_sort); the corpus has
# no URL column, so the gate injects 8 deterministic messy variants
# per document (uppercase host, uppercase scheme + :443, :8080 +
# fragment, unsorted query, sorted query, http + :80, clean, query +
# fragment) and the oracle recomputes the canonical form ARITHMETICALLY
# from the injection rules — a canonicalizer that eats a port it
# should keep, keeps one it should strip, or mis-sorts a query fails
# the value hash. Map-only + one canonical-grain aggregate.
# ---------------------------------------------------------------------------
_RAW_URL_SPARK = """
    CASE doc_id % 8
      WHEN 0 THEN concat('https://H', doc_id % 4, '.EXAMPLE.COM/a/',
                         doc_id % 7)
      WHEN 1 THEN concat('HTTPS://h', doc_id % 4, '.example.com:443/a/',
                         doc_id % 7)
      WHEN 2 THEN concat('https://h', doc_id % 4, '.example.com:8080/a/',
                         doc_id % 7, '#frag')
      WHEN 3 THEN concat('https://h', doc_id % 4, '.example.com/a/',
                         doc_id % 7, '?b=2&a=', doc_id % 7 % 3)
      WHEN 4 THEN concat('https://h', doc_id % 4, '.example.com/a/',
                         doc_id % 7, '?a=', doc_id % 7 % 3, '&b=2')
      WHEN 5 THEN concat('http://h', doc_id % 4, '.example.com:80/a/',
                         doc_id % 7)
      WHEN 6 THEN concat('https://h', doc_id % 4, '.example.com/a/',
                         doc_id % 7)
      ELSE concat('https://h', doc_id % 4, '.example.com/a/',
                  doc_id % 7, '?a=', doc_id % 7 % 3, '&b=2#x')
    END
"""

# The raw-URL synthesis uses only concat/CASE/% — a dialect subset the
# two engines share verbatim.
_RAW_URL_DUCK = _RAW_URL_SPARK

# Oracle-side canonical form, derived arithmetically from the injection
# rules (shared by url_canonical_dedup and the composed curation gate).
CANON_URL_DUCK = """
    CASE WHEN doc_id % 8 = 5
         THEN 'http://h' || (doc_id % 4) || '.example.com/a/'
              || (doc_id % 7)
         WHEN doc_id % 8 = 2
         THEN 'https://h' || (doc_id % 4)
              || '.example.com:8080/a/' || (doc_id % 7)
         WHEN doc_id % 8 IN (3, 4, 7)
         THEN 'https://h' || (doc_id % 4) || '.example.com/a/'
              || (doc_id % 7) || '?a=' || (doc_id % 7 % 3)
              || '&b=2'
         ELSE 'https://h' || (doc_id % 4) || '.example.com/a/'
              || (doc_id % 7)
    END
"""


def canonical_url_col():
    """The REAL canonicalizer as a Column over the injected raw URL —
    exposed for composition (classifier-gated curation)."""
    scheme = F.lower(F.parse_url(F.expr(_RAW_URL_SPARK), F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(F.expr(_RAW_URL_SPARK), F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    host = F.regexp_replace(auth, ":[0-9]+$", "")
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80"))
    )
    path = F.parse_url(F.expr(_RAW_URL_SPARK), F.lit("PATH"))
    q = F.parse_url(F.expr(_RAW_URL_SPARK), F.lit("QUERY"))
    qsorted = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(q.isNotNull() & (q != ""), F.concat(F.lit("?"), qsorted))
        .otherwise(""),
    )


@query(
    "url_canonical_dedup",
    f"""
    WITH u AS (
        SELECT doc_id,
               {_RAW_URL_DUCK} AS raw_url,
               {CANON_URL_DUCK} AS canonical_url
        FROM documents
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_forms,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM u
    GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup census: per canonical URL, how many docs
    collapse onto it, how many distinct raw spellings they arrived
    with, and the kept first occurrence. The canonicalizer is pure JVM
    (parse_url + regex + array_sort inside the scan stage); the only
    exchange is the canonical-grain aggregate — at 100 TB this is the
    same shape as exact-hash dedup with a far cheaper key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(_RAW_URL_SPARK).alias("raw_url"),
            canonical_url_col().alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("raw_url").cast("long").alias("n_raw_forms"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )
