"""Apply the trained NB quality gate AT INGEST — the streaming apply
face that closes the loop with streaming_nb's train face.

A curation front door scores every arriving document against the
current model and routes it: gate-passers continue into the corpus,
rejects land in a quarantine directory (kept, not dropped — rejects
are re-scorable when the model improves, and reject-rate telemetry is
the canary for upstream drift). Scoring reuses
``nb_classifier.score_docs`` — the SAME function the batch gate query
runs — so a document gets the identical verdict on either path
(shared-classifier discipline, like streaming_incremental and
streaming_nb).

Model source: any (token, llr_fx) frame — the batch trainer's output
or ``streaming_nb.nb_model_from_registry`` (the continuously-updated
counts registry). The model is read ONCE at wiring time and broadcast
per batch; swap-on-retrain = stop the query, rewire, restart (the
standard Structured Streaming model-refresh seam).

Per micro-batch the scored frame is eagerly localCheckpointed BEFORE
the two sink writes — the round-6 lesson: lazy re-evaluation between
two actions can recompute against changed state; one materialization
feeds both routes, so kept ∪ rejected is exactly the batch with no
overlap. Write order kept-first (at-least-once: a crash between the
writes re-emits the batch; the downstream batch dedup sweep removes
the replayed kept rows, and quarantine rows are advisory).

Reference parity: none — training-pipeline surface on the projection
live phase's foreachBatch machinery (projection/projector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.nb_classifier import score_docs
from eventsourcing_spark.io import materialize


def gate_batch(
    batch_df: DataFrame, model: DataFrame, prior: DataFrame
) -> DataFrame:
    """One micro-batch scored: original columns + score_fx + kept."""
    scored = score_docs(batch_df, model, prior)
    return scored.select(
        *batch_df.columns,
        (F.coalesce(F.col("tok_sum"), F.lit(0)) + F.col("prior_fx"))
        .cast("long")
        .alias("score_fx"),
    ).withColumn("kept", (F.col("score_fx") >= 0).cast("int"))


def quality_gate_at_ingest(
    stream_docs: DataFrame,
    model: DataFrame,
    prior: DataFrame,
    kept_dir: str,
    rejected_dir: str,
    checkpoint_dir: str,
):
    """Wire a document stream through the quality gate. Returns the
    started query (availableNow trigger — drain then stop; swap the
    trigger for continuous ingest)."""

    def process(batch_df: DataFrame, _epoch_id: int) -> None:
        scored = gate_batch(batch_df, model, prior).transform(materialize)
        try:
            kept = scored.filter("kept = 1").drop("kept")
            rej = scored.filter("kept = 0").drop("kept")
            if not kept.isEmpty():
                kept.write.mode("append").parquet(kept_dir)
            if not rej.isEmpty():
                rej.write.mode("append").parquet(rejected_dir)
        finally:
            scored.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
