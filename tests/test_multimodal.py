"""Multimodal plumbing tests: schema, batch shape, decode/featurize/
frame-sample/resize over mapInPandas; binary column pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventsourcing_spark.pipeline.multimodal import (
    decode_and_featurize,
    media_stats,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30, partitions=4).cache()


def test_synth_media_schema_and_determinism(spark, media):
    rows = {r.media_id: r for r in media.collect()}
    assert len(rows) == 30
    assert {r.kind for r in rows.values()} == {"image", "audio", "video"}
    again = {r.media_id: r for r in synth_media(spark, n=30, partitions=2).collect()}
    assert bytes(rows[7].content) == bytes(again[7].content)  # deterministic
    assert rows[3].metadata.width == 19


def test_decode_and_featurize(media):
    feats = decode_and_featurize(media, allow_fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-5  # histogram normalized
        assert r.n_payload_bytes > 0


def test_decode_raises_on_unknown_format(spark):
    # JPEG magic: no real decoder wired for it → must raise, not fake
    df = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff\xe00123456789abcdef", None)],
        synth_media(spark, 1).schema,
    )
    with pytest.raises(Exception) as exc_info:
        decode_and_featurize(df, allow_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_real_png_through_pipeline(spark):
    # a genuinely-encoded PNG decodes for real — no allow_fake
    from eventsourcing_spark.pipeline.media_codecs import encode_png

    px = bytes(range(64))
    df = spark.createDataFrame(
        [(1, "image", encode_png(px, 8, 8, 1), None)],
        synth_media(spark, 1).schema,
    )
    row = decode_and_featurize(df, allow_fake=False).collect()[0]
    assert (row.width, row.height, row.n_payload_bytes) == (8, 8, 64)


def test_decode_real_wav_through_pipeline(spark):
    from eventsourcing_spark.pipeline.media_codecs import encode_wav

    df = spark.createDataFrame(
        [(2, "audio", encode_wav([0, 100, -100, 32767] * 25, 8000), None)],
        synth_media(spark, 1).schema,
    )
    row = decode_and_featurize(df, allow_fake=False).collect()[0]
    assert row.n_payload_bytes == 200  # 100 samples × 2 bytes


def test_sample_frames_udtf_shape(media):
    frames = sample_frames(media, every_ms=1000, allow_fake=True)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "ts_ms", "frame"}
    # only video rows expand; frame count = duration//1000 per video
    vids = {r.media_id: r for r in media.filter(F.col("kind") == "video").collect()}
    assert set(pdf.media_id) == set(vids)
    for mid, grp in pdf.groupby("media_id"):
        expect = max(vids[mid].metadata.duration_ms // 1000, 1)
        assert len(grp) == expect
        assert list(grp.frame_idx) == list(range(expect))


def test_resize_images_only_touches_images(media):
    out = {r.media_id: r for r in resize_images(media, 8, 8, allow_fake=True).collect()}
    before = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        if r.kind == "image":
            assert (r.metadata.width, r.metadata.height) == (8, 8)
        else:
            assert bytes(r.content) == bytes(before[mid].content)


def test_media_stats(media):
    rows = {r.kind: r for r in media_stats(media).collect()}
    assert rows["video"].avg_duration_ms > 0
    assert rows["image"].total_bytes > 0


def test_sample_frames_real_avi(spark):
    """Frame sampling over a REAL AVI: the emitted frames are the
    container's actual demuxed payloads at the sampled timestamps."""
    from eventsourcing_spark.pipeline.media_codecs import encode_avi

    w, h, fps = 4, 3, 2  # 2 fps → one frame every 500ms
    frames = [bytes([k] * (w * h * 3)) for k in range(6)]  # 3 s of video
    df = spark.createDataFrame(
        [(9, "video", encode_avi(frames, w, h, fps), None)],
        synth_media(spark, 1).schema,
    )
    out = sample_frames(df, every_ms=1000).orderBy("frame_idx").collect()
    assert [r.ts_ms for r in out] == [0, 1000, 2000]
    # ts 0 → frame 0, ts 1000 → frame 2, ts 2000 → frame 4
    assert [bytes(r.frame)[0] for r in out] == [0, 2, 4]
