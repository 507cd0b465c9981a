"""Streaming PII redaction: scrub-at-ingest e2e over a file stream."""

from __future__ import annotations

import re

import pytest

from eventsourcing_spark.pipeline.pii import PII_PATTERNS
from eventsourcing_spark.pipeline.streaming_pii import (
    redact_at_ingest,
    redact_batch,
)

DOCS_SCHEMA = "doc_id long, text string"


def _write_batch(spark, src_dir, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "audit": str(tmp_path / "audit"),
        "cp": str(tmp_path / "cp"),
    }


def _drain(spark, d):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(d["src"])
    q = redact_at_ingest(stream, d["out"], d["audit"], d["cp"])
    q.awaitTermination(120)


ROWS = [
    (1, "plain text no pii at all"),
    (2, "reach me at alice.smith@corp.example.com thanks"),
    (3, "call +1-555-0134 or visit 10.1.2.3 today"),
    (4, "card 4111111111111111 ssn 123-45-6789"),
]


def test_scrub_and_audit_end_to_end(spark, dirs):
    _write_batch(spark, dirs["src"], ROWS)
    _drain(spark, dirs)

    out = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert out[1].text == ROWS[0][1] and out[1].n_redactions == 0
    assert out[2].text == "reach me at <EMAIL> thanks"
    assert out[2].n_redactions == 1
    assert out[3].text == "call <PHONE> or visit <IP> today"
    assert out[3].n_redactions == 2
    assert out[4].text == "card <CARD> ssn <SSN>"
    assert out[4].n_redactions == 2

    # the scrubbed corpus is pattern-free — the property the control exists for
    for r in out.values():
        for kind, pat in PII_PATTERNS.items():
            assert not re.search(pat, r.text), (r.doc_id, kind)

    audit = spark.read.parquet(dirs["audit"]).collect()
    assert len(audit) == 1
    a = audit[0]
    assert (a.n_docs, a.n_docs_with_pii, a.n_spans) == (4, 3, 5)

    # second batch drains incrementally from the checkpoint: only the new
    # docs are scrubbed and a second audit row appears
    _write_batch(spark, dirs["src"], [(5, "ping bob@b.example.org now")])
    _drain(spark, dirs)
    out2 = {r.doc_id: r.text for r in spark.read.parquet(dirs["out"]).collect()}
    assert out2[5] == "ping <EMAIL> now"
    assert len(out2) == 5
    audit2 = spark.read.parquet(dirs["audit"]).collect()
    assert len(audit2) == 2
    assert {(a.n_docs, a.n_spans) for a in audit2} == {(4, 5), (1, 1)}


def test_redact_batch_static_frame(spark):
    df = spark.createDataFrame(ROWS, DOCS_SCHEMA)
    got = {r.doc_id: r for r in redact_batch(df).collect()}
    assert got[4].text == "card <CARD> ssn <SSN>"
    assert sum(r.n_redactions for r in got.values()) == 5
