"""HTML extraction: the generic extractor on raw handwritten pages
(the oracle gate covers the synthesized wrap; these pin behavior the
wrap never produces — body scripts, nested inline tags, all-link
blocks, short fragments, markup already in document text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.html_extract import (
    MIN_CONTENT_CHARS,
    extract_blocks,
    wrap_as_html,
)


def _blocks(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    rows = extract_blocks(df).select(F.explode("bs").alias("x")).collect()
    return [(r.x.txt, r.x.link) for r in rows]


def test_strips_head_script_style_everywhere(spark):
    html = (
        "<html><head><title>T</title><style>a{color:red}</style></head>"
        "<body><p>real content paragraph long enough to keep around</p>"
        "<script>var x = 'in body';</script>"
        "<div>second real block with plenty of visible prose text</div>"
        "</body></html>"
    )
    got = _blocks(spark, html)
    txts = [t for t, _ in got]
    assert "real content paragraph long enough to keep around" in txts
    assert "second real block with plenty of visible prose text" in txts
    assert not any("var x" in t or "color:red" in t or t == "T" for t in txts)


def test_nested_inline_tags_count_link_chars_only(spark):
    html = (
        "<body><p>read <b>the</b> docs at <a href='/d'>docs page</a> now"
        "</p></body>"
    )
    got = _blocks(spark, html)
    assert len(got) == 1
    txt, link = got[0]
    assert txt == "read the docs at docs page now"
    assert link == len("docs page")


def test_all_link_and_short_blocks_are_boilerplate(spark):
    html = (
        "<body>"
        "<div><a href='/x'>an all link navigation block here longer</a></div>"
        "<p>tiny</p>"
        "<p>a genuine paragraph of content comfortably past the floor</p>"
        "</body>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    out = extract_blocks(df).select(
        F.expr(
            "array_join(transform(filter(bs, x -> length(x.txt) >= "
            f"{MIN_CONTENT_CHARS} and 2 * x.link < length(x.txt)),"
            " x -> x.txt), chr(10))"
        ).alias("kept")
    ).collect()[0]
    assert out.kept == (
        "a genuine paragraph of content comfortably past the floor"
    )


def test_wrap_canonicalizes_markup_in_text(spark):
    docs = spark.createDataFrame(
        [(7, "src0", "beware <div> injection </p> attempts in documents")],
        "doc_id long, source string, text string",
    )
    rows = extract_blocks(wrap_as_html(docs)).select(
        F.explode("bs").alias("x")
    ).collect()
    txts = [r.x.txt for r in rows]
    # The injected markup arrives as spaces — same length, no new block.
    assert "beware  div  injection  /p  attempts in documents" in txts


def test_wrap_block_census_matches_module_table(spark):
    # doc_id 0: nav(n=1), content, ad (0%3), appendix (0%5), footer.
    docs = spark.createDataFrame(
        [(0, "src0", "x" * 40)], "doc_id long, source string, text string"
    )
    got = _blocks(
        spark, wrap_as_html(docs).collect()[0].html
    )
    assert [(len(t), l) for t, l in got] == [
        (5, 5),        # nav: "sec 1"
        (40, 0),       # content
        (36, 36),      # ad
        (47 + 1, 0),   # appendix, digits(0) = 1
        (58, 35),      # footer
    ]


def test_empty_text_doc_engine_parity(spark, tmp_path):
    """An empty-text document drops its empty content fragment on the
    Spark side; the oracle's block census must agree (ADVICE r6: the
    old oracle hard-coded 3 fixed blocks and diverged at L = 0)."""
    import duckdb
    import pandas as pd

    import eventsourcing_spark.registry as reg

    d = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [0, 1, 3],
            "text": ["", "plenty of honest content " * 4, "x"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 104, 1],
        }
    ).to_parquet(f"{d}/documents.parquet")
    sdf = (
        reg.SPARK_QUERIES["html_extract_stats"](spark, d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = (
        con.sql(reg.ORACLE_SQL["html_extract_stats"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("n_blocks", "n_content_blocks", "boilerplate_ppm"):
        assert list(sdf[c].astype(int)) == list(odf[c].astype(int)), c
    assert list(sdf["extracted_text"]) == list(odf["extracted_text"])
