"""Pure-stdlib PNG/WAV codec tests: exact roundtrips over every filter
path and color type, corruption rejection, and property-style fuzz
roundtrips (hypothesis)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eventsourcing_spark.pipeline.media_codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@pytest.mark.parametrize(
    "w,h,ch", [(1, 1, 1), (8, 8, 1), (16, 14, 3), (5, 7, 3), (16, 5, 1), (2, 9, 3)]
)
def test_png_roundtrip(w, h, ch):
    px = bytes((31 * i + 7) % 256 for i in range(w * h * ch))
    dec = decode_png(encode_png(px, w, h, ch))
    assert dec["pixels"] == px
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)


def test_png_every_filter_path_exercised():
    # encoder cycles y % 5 — a 6-row image hits all five filters
    px = bytes((i * 13) % 256 for i in range(6 * 4 * 3))
    enc = encode_png(px, 4, 6, 3)
    # magic(8) + IHDR chunk(25) + IDAT len/tag(8) … body … IDAT crc(4) + IEND(12)
    raw = zlib.decompress(enc[8 + 25 + 8 : -16])
    stride = 4 * 3
    filters = [raw[y * (stride + 1)] for y in range(6)]
    assert filters == [0, 1, 2, 3, 4, 0]
    assert decode_png(enc)["pixels"] == px


def test_png_rejects_corruption_and_non_png():
    enc = encode_png(bytes(range(64)), 8, 8, 1)
    bad = bytearray(enc)
    bad[20] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + enc)


def test_png_rejects_unsupported_variant():
    # hand-build a 16-bit-depth IHDR: must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(PNG_MAGIC + chunk)


@pytest.mark.parametrize("sr,ch,n", [(8000, 1, 64), (16000, 2, 100), (44100, 1, 1)])
def test_wav_roundtrip(sr, ch, n):
    s = [((13 * i * 11) % 65536) - 32768 for i in range(n * ch)]
    dec = decode_wav(encode_wav(s, sr, ch))
    assert dec["samples"] == s
    assert (dec["sample_rate"], dec["channels"], dec["n_samples"]) == (sr, ch, n)
    assert dec["duration_ms"] == n * 1000 // sr


def test_wav_rejects_non_pcm16():
    enc = bytearray(encode_wav([0, 1, 2], 8000))
    # flip bits-per-sample to 8 inside the fmt chunk
    fmt_at = enc.index(b"fmt ") + 8
    enc[fmt_at + 14 : fmt_at + 16] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(enc))
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"OggS" + bytes(enc))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_fuzz(w, h, ch, seed):
    px = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(w * h * ch))
    assert decode_png(encode_png(px, w, h, ch))["pixels"] == px


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 200),
    sr=st.sampled_from([8000, 22050, 48000]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_fuzz(n, sr, seed):
    s = [((seed + 97 * i) % 65536) - 32768 for i in range(n)]
    assert decode_wav(encode_wav(s, sr))["samples"] == s


@pytest.mark.parametrize("w,h,n,fps", [(4, 3, 5, 10), (8, 8, 1, 25), (2, 2, 12, 5)])
def test_avi_roundtrip(w, h, n, fps):
    from eventsourcing_spark.pipeline.media_codecs import decode_avi, encode_avi

    frames = [
        bytes(((k * 31 + i * 7) % 256) for i in range(w * h * 3)) for k in range(n)
    ]
    d = decode_avi(encode_avi(frames, w, h, fps))
    assert d["frames"] == frames
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) == (w, h, n, fps)


def test_avi_rejects_compressed_and_non_avi():
    import struct as _struct

    from eventsourcing_spark.pipeline.media_codecs import decode_avi, encode_avi

    enc = bytearray(encode_avi([bytes(12)], 2, 2, 10))
    strf_at = enc.index(b"strf") + 8
    # biCompression lives 16 bytes into BITMAPINFOHEADER
    enc[strf_at + 16 : strf_at + 20] = _struct.pack("<I", 0x44495658)  # 'XVID'
    with pytest.raises(ValueError, match="unsupported AVI compression"):
        decode_avi(bytes(enc))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_resample_nearest_identity_and_mapping():
    from eventsourcing_spark.pipeline.media_codecs import resample_nearest

    # identity: same dims returns the same bytes
    px = bytes(range(4 * 3))
    assert resample_nearest(px, 4, 3, 4, 3) == px
    # 2x2 -> 4x4 upscale: each source pixel becomes a 2x2 block
    src = bytes([10, 20, 30, 40])
    up = resample_nearest(src, 2, 2, 4, 4)
    assert up == bytes(
        [10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40]
    )
    # 4x4 -> 2x2 downscale: floor mapping picks rows/cols 0 and 2
    src = bytes(range(16))
    down = resample_nearest(src, 4, 4, 2, 2)
    assert down == bytes([0, 2, 8, 10])
    # multi-channel keeps channels together
    rgb = bytes([1, 2, 3, 4, 5, 6])  # 2x1 rgb
    out = resample_nearest(rgb, 2, 1, 4, 1, channels=3)
    assert out == bytes([1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6])


def test_resample_through_png_round_trip():
    from eventsourcing_spark.pipeline.media_codecs import (
        decode_png,
        encode_png,
        resample_nearest,
    )

    w, h, ch = 9, 7, 3
    px = bytes((31 * 5 + 7 * i) % 256 for i in range(w * h * ch))
    img = decode_png(encode_png(px, w, h, ch))
    rp = resample_nearest(img["pixels"], w, h, 5, 4, ch)
    out = decode_png(encode_png(rp, 5, 4, ch))
    # every output byte equals the formula pixel at its source index
    j = 0
    for y in range(4):
        sy = (y * h) // 4
        for x in range(5):
            sx = (x * w) // 5
            for c in range(ch):
                src = (sy * w + sx) * ch + c
                assert out["pixels"][j] == (31 * 5 + 7 * src) % 256
                j += 1
