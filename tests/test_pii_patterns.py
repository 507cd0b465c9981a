"""PII pattern safety — pure-regex unit tests (no SparkSession).

The gate (pii_detection_stats / pii_redaction_endstate) pins counts and
byte lengths against an arithmetic oracle; these tests pin the pattern
PROPERTIES the oracle math assumes: each injected span type matches its
own pattern exactly once, no pattern cross-matches another type's span,
and redaction markers are inert (no pattern matches a marker, so chained
replacement order cannot matter). Python `re` and Java regex agree on
this dialect subset (character classes, \\b, \\d, bounded quantifiers).
"""

from __future__ import annotations

import re

from eventsourcing_spark.pipeline.pii import PII_MARKERS, PII_PATTERNS

# one injected span of each type, for a representative doc_id family
SPANS = {
    "email": ["user0@ex0.com", "user123456@ex3.com"],
    "phone": ["+1-555-1000", "+1-555-9999"],
    "ipv4": ["10.0.0.0", "10.255.17.249"],
    "card": ["4000000000000003", "4999999999999999"],
    "ssn": ["100-10-1000", "999-99-9999"],
}


def test_each_pattern_matches_own_span_exactly_once():
    for kind, spans in SPANS.items():
        pat = re.compile(PII_PATTERNS[kind])
        for span in spans:
            hits = pat.findall(f"word {span} word")
            assert len(hits) == 1, (kind, span, hits)
            assert hits[0] == span, (kind, span, hits)


def test_no_cross_type_matches():
    """A pattern must not fire on another type's span — the arithmetic
    oracle counts each injection exactly once per type."""
    for kind, pat_s in PII_PATTERNS.items():
        pat = re.compile(pat_s)
        for other, spans in SPANS.items():
            if other == kind:
                continue
            for span in spans:
                assert not pat.search(f"word {span} word"), (
                    f"{kind} pattern cross-matched {other} span {span!r}"
                )


def test_markers_are_inert():
    """After redaction the text contains markers; no pattern may match a
    marker (or replacement order would change the end state)."""
    soup = " ".join(PII_MARKERS.values())
    for kind, pat_s in PII_PATTERNS.items():
        assert not re.search(pat_s, soup), kind


def test_corpus_tokens_never_match():
    """The synthetic corpus vocabulary (lowercase words, no digits or
    @) must be invisible to every pattern — zero false positives on the
    un-augmented text."""
    corpus = "key agg row scan slow fast table value part hash the a"
    for kind, pat_s in PII_PATTERNS.items():
        assert not re.search(pat_s, corpus), kind
