"""Online PII redaction at ingest: the streaming face of the PII pass.

The batch operators (pipeline.pii) detect and redact over a corpus at
rest; a production ingest must ALSO scrub documents before they are
ever admitted — PII that touches the output corpus, even transiently,
is a retention liability (the same reasoning as the reference's GDPR
"forget" surface, maintenance/forget.py / README.md "GDPR": deletion
after the fact is the remedy, prevention at ingest is the control).
Mechanics per micro-batch (foreachBatch, same machinery as the
projection live phase):

1. run the chained ``regexp_replace`` scrub (pipeline.pii patterns +
   typed markers — JVM string kernels, no Python in the loop);
2. stamp each doc with ``n_redactions`` (regexp_count before scrub);
3. append the scrubbed docs to the output corpus;
4. append one per-batch audit row (batch id, docs, docs touched, spans
   removed) to a side table — the evidence trail a privacy review asks
   for.

Write order is docs-first: a crash between the writes re-emits the
batch on retry (at-least-once on the corpus side) and the audit row is
re-appended with the same batch id — audit consumers aggregate by max
per batch id, the same idempotence discipline as the projection's dual
checkpoint (projection/checkpoints.py C2).

Scale shape: stateless map-only per batch — no shuffle, no state store;
throughput is the regex kernels' scan rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.pii import PII_MARKERS, PII_PATTERNS

AUDIT_SCHEMA = "batch_id long, n_docs long, n_docs_with_pii long, n_spans long"


def redact_batch(batch_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Steps 1-2 on one micro-batch (also usable on a static frame):
    returns the frame with ``text_col`` scrubbed and ``n_redactions``
    appended."""
    red = F.col(text_col)
    total = F.lit(0)
    for kind in ("email", "phone", "ipv4", "card", "ssn"):
        total = total + F.regexp_count(
            F.col(text_col), F.lit(PII_PATTERNS[kind])
        )
        red = F.regexp_replace(red, PII_PATTERNS[kind], PII_MARKERS[kind])
    return batch_df.withColumn("n_redactions", total.cast("long")).withColumn(
        text_col, red
    )


def redact_at_ingest(
    stream_docs: DataFrame,
    out_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Start the scrub stream; returns the StreamingQuery (trigger
    availableNow: drain what exists, then stop — tests and backfills
    share the path with continuous ingest)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        scrubbed = redact_batch(batch_df, text_col)
        # docs first (at-least-once), then the audit row — see module doc
        scrubbed.write.mode("append").parquet(out_dir)
        stats = scrubbed.agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("n_redactions") > 0, 1)).alias(
                "n_docs_with_pii"
            ),
            F.coalesce(F.sum("n_redactions"), F.lit(0)).alias("n_spans"),
        ).first()
        batch_df.sparkSession.createDataFrame(
            [(batch_id, stats.n_docs, stats.n_docs_with_pii, int(stats.n_spans))],
            AUDIT_SCHEMA,
        ).write.mode("append").parquet(audit_dir)

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
