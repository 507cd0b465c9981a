"""Privacy + cross-modal dedup tour. Run: python examples/curation_privacy_tour.py

The round-5 curation stages end-to-end on real data:

  1. pii        — inject deterministic PII spans, detect them with the
                  real JVM regexes, redact with typed markers, and show
                  the before/after densities per source
  2. near-dup   — modality-complete near-duplicate detection: image
                  dHash (real PNG path), audio fingerprint (real WAV
                  path), video frame-hash (real AVI demux)
  3. components — cross-modal duplicate families over the union of
                  text-LSH and image-phash edges
  4. incremental— classify a "new batch" against the corpus index
                  (exact / near-dup / novel) with semi-join probes

Every number printed here is also pinned bit-exact by the oracle gate
(pii_detection_stats, pii_redaction_endstate, media_*_neardup,
multimodal_dedup_components, dedup_incremental_batch).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curation-privacy-tour")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. PII detection (per source) ==")
    SPARK_QUERIES["pii_detection_stats"](spark, SF).orderBy("source").show(5)

    print("== 1b. PII redaction end-state (sample) ==")
    red = SPARK_QUERIES["pii_redaction_endstate"](spark, SF)
    red.filter(F.col("n_redactions") > 0).orderBy("doc_id").show(5)
    tot = red.agg(
        F.sum("n_redactions").alias("spans_redacted"),
        F.sum(F.col("len_before") - F.col("len_after")).alias("bytes_removed"),
    ).first()
    print(f"   redacted {tot.spans_redacted} spans, removed {tot.bytes_removed} bytes\n")

    print("== 2. Near-dup pairs per modality ==")
    for q in (
        "media_phash_neardup_pairs",
        "media_audio_fingerprint_neardup",
        "media_video_framehash_neardup",
    ):
        n = SPARK_QUERIES[q](spark, SF).count()
        print(f"   {q:36s} {n} pairs")

    print("\n== 3. Cross-modal duplicate families ==")
    comp = SPARK_QUERIES["multimodal_dedup_components"](spark, SF)
    fams = (
        comp.groupBy("component")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    stats = fams.agg(
        F.count("*").alias("families"), F.max("n").alias("largest")
    ).first()
    print(f"   {stats.families} multi-doc families, largest has {stats.largest} docs")

    print("\n== 4. Incremental batch vs index ==")
    SPARK_QUERIES["dedup_incremental_batch"](spark, SF).groupBy("status").agg(
        F.count("*").alias("n")
    ).orderBy("status").show()

    spark.stop()


if __name__ == "__main__":
    main()
