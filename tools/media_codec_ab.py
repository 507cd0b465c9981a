"""Same-session codec A/B over the 20x media stress rows.

The round-10 verdict's open perf directive: the batch-stacked codec
must deliver >=3x on the 20x media stress rows that single-image numpy
provably cannot reach at thumbnail scale. Absolute 20x numbers drift
+/-40% with host heat across days (SCALE.md round-10 note), so the
ONLY valid evidence is a same-session A/B: build the stress corpus
once, then time each media query under the stdlib reference codec and
under the batch codec in the same JVM, interleaved.

Usage: python tools/media_codec_ab.py [replicas] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventsourcing_spark.pipeline.media_codecs import (
    STDLIB_CODEC,
    set_media_codec,
)
from eventsourcing_spark.pipeline.media_codecs_batch import BATCH_CODEC
from eventsourcing_spark.registry import SPARK_QUERIES
from eventsourcing_spark.session import get_spark
from tools.stress_pipeline import build_stress_dir

MEDIA_QUERIES = (
    "media_resize_pixels",
    "media_phash_neardup_pairs",
    "media_video_framehash_neardup",
    "media_audio_downsample",
    "media_audio_fingerprint_neardup",
    "media_png_decode_stats",
)


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    queries = tuple(sys.argv[3:]) or MEDIA_QUERIES
    spark = get_spark("media-codec-ab")
    spark.sparkContext.setLogLevel("ERROR")
    stress_dir = build_stress_dir(spark, sf_dir, replicas)
    try:
        print(f"{'query':34s} {'stdlib(s)':>10s} {'batch(s)':>10s} {'x':>6s}")
        for name in queries:
            best = {}
            for codec in (STDLIB_CODEC, BATCH_CODEC):
                set_media_codec(codec)
                try:
                    times = []
                    for _ in range(2):
                        t0 = time.time()
                        SPARK_QUERIES[name](spark, stress_dir).write.format(
                            "noop"
                        ).mode("overwrite").save()
                        times.append(time.time() - t0)
                    best[codec.name] = min(times)
                finally:
                    set_media_codec(None)
            ratio = best["stdlib"] / best["batch"]
            print(
                f"{name:34s} {best['stdlib']:10.2f} {best['batch']:10.2f} "
                f"{ratio:6.2f}"
            )
    finally:
        shutil.rmtree(stress_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
