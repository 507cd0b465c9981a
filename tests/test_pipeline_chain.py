"""The composed curation chain, end to end: HTML pages → main-content
extraction → normalization → incremental dedup classification. Each
stage is oracle- or parity-gated on its own; this pins that they WIRE
— schemas line up, the extracted text round-trips the normalizer, and
the classifier sees clean content (a near-dup planted as two different
page wrappings of the same text is caught AFTER extraction even though
the raw pages differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.html_extract import (
    extraction_stats,
    wrap_as_html,
)
from eventsourcing_spark.pipeline.normalize import normalize
from eventsourcing_spark.pipeline.streaming_incremental import classify_batch

DOCS = "doc_id long, source string, text string"


def test_extract_normalize_classify_chain(spark, tmp_path):
    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # 1 and 31 carry the SAME content under DIFFERENT page wrap
        # (doc_id drives nav width / ad / appendix), so the raw pages
        # differ but extraction + near-dup must still pair them.
        (1, "s0", text_a),
        (31, "s1", "delta gamma beta alpha " + " ".join(
            text_a.split()[4:]
        )),  # token multiset equal -> same MinHash signature
        (7, "s0", "totally different content about ships and harbors ok"),
    ]
    docs = spark.createDataFrame(rows, DOCS)
    pages = wrap_as_html(docs)
    # Stage 1: extraction recovers the content (appendix may ride along
    # for doc_id % 5 == 0 — none here).
    extracted = extraction_stats(pages)
    got = {r.doc_id: r.extracted_text for r in extracted.collect()}
    assert got[1] == text_a
    assert "ships and harbors" in got[7]
    # Stage 2: normalization is a no-op on already-clean extracted text.
    norm = extracted.select(
        "doc_id", normalize(F.col("extracted_text")).alias("text")
    )
    clean = {r.doc_id: r.text for r in norm.collect()}
    assert clean[1] == text_a
    # Stage 3: incremental classification over the cleaned content.
    # Empty registries: within-batch near keeper-star must pair 1 and 31
    # (same token multiset -> same bands) despite different raw pages.
    batch = norm.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id", "text", "source"
    )
    statuses, admitted = classify_batch(
        batch, str(tmp_path / "h"), str(tmp_path / "b")
    )
    st = {r.doc_id: r.status for r in statuses.collect()}
    assert st == {1: "novel", 31: "near_dup", 7: "novel"}
    assert sorted(r.doc_id for r in admitted.collect()) == [1, 7]
