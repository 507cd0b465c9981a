"""numpy-vectorized MediaCodec (VERDICT r9 #4).

The pure-stdlib codecs in :mod:`media_codecs` are correct but carry a
per-byte Python-loop constant — the media family was the battery's
densest cost block (phash 3.6 s + video 3.6 s + resize 2.0 s + audio
1.5 s; media_resize 9.7× at the 20× stress). This module is the first
real user of the round-9 codec seam: the same seven kernels, BYTE-FOR-
BYTE identical outputs (same filter-type cycling, same zlib level,
same exceptions on unsupported input), with the hot loops moved into
numpy array ops:

* **PNG encode** — all five scanline filters are pure functions of the
  source line and the prior source line (no output recurrence on the
  encode side), so Sub/Up/Average/Paeth each vectorize over the whole
  row; Paeth is the textbook predictor as ``np.where`` over the three
  absolute differences.
* **PNG decode** — filters None/Up are whole-row vector ops and Sub is
  a per-lane cumulative sum mod 256; Average and Paeth carry a true
  output recurrence (out[x] depends on out[x−c]) and keep the scalar
  loop — with the encoder's y % 5 filter cycling exactly 2 of 5 rows
  stay scalar, bounding decode speedup at ~2.5× while keeping every
  byte identical.
* **resample_nearest** — the floor source-index mapping as one fancy-
  indexing gather (this was media_resize's entire inner loop; 36× at
  256×256, and it wins even at thumbnail size).
* **WAV decode** — ``np.frombuffer`` replaces per-sample struct
  unpacking; the samples list contract (callers slice, index and sum
  it) is preserved via ``tolist()``. WAV ENCODE stays stdlib — see the
  note at its definition.
* **AVI** — container demux is header parsing + frame slicing (no
  per-byte loop); the stdlib functions are reused as-is.

**Size-adaptive routing (measured, round 10):** numpy's fixed per-call
cost loses to the stdlib byte loops below ~1-2k pixels — and the gate's
fixtures are 16-22 px thumbnails (encode 119 µs stdlib vs 206 µs pure-
numpy at 18×19, flipping to 3.2 ms vs 14.9 ms at 256×256). The PNG
kernels therefore delegate to the stdlib reference below a measured
pixel threshold, making the numpy codec ≥ stdlib at every size while
the big-image wins (4.7× encode, 36× resample, 1.4× decode) remain.
The consequence stated honestly: at the GATE's thumbnail scale the
per-image codec constant is not numpy-beatable one image at a time —
the ≥3× path there is batch-stacked vectorization (pad the Arrow
batch's images to common dims and run each filter row across all
images at once; the y % 5 filter schedule is shared by construction),
which changes the seam to an optional batch kernel and is specced for
the next round.

Selected automatically by :func:`media_codecs.get_media_codec` when
numpy imports cleanly (it is a baked dependency of this engine's Arrow
paths); the stdlib codec remains the dependency-free fallback and the
behavioral reference — the seam tests run both and compare bytes.
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np

from eventsourcing_spark.pipeline.media_codecs import (
    AVI_MAGIC,  # noqa: F401 — re-exported for symmetry
    PNG_MAGIC,
    WAV_MAGIC,
    MediaCodec,
    _chunk,
    decode_avi,
    encode_avi,
    encode_wav,
)
from eventsourcing_spark.pipeline.media_codecs import (
    decode_png as _decode_png_scalar,
)
from eventsourcing_spark.pipeline.media_codecs import (
    encode_png as _encode_png_scalar,
)

# Size-adaptive routing (micro-benchmarked on this container, round 10):
# numpy's per-call overhead beats the loop savings below these pixel
# counts (the gate's fixtures are 16-22 px thumbnails where stdlib wins
# 119 vs 206 us on encode), while at 256x256 numpy wins 4.7x on encode
# and 1.4x on decode (decode is bounded by the 2-of-5 scalar-recurrence
# filter rows). Below the threshold the numpy kernels DELEGATE to the
# stdlib reference — identical bytes by construction either way.
PNG_ENCODE_NP_MIN_PIXELS = 2048   # ~45x45 grey; numpy wins above
PNG_DECODE_NP_MIN_PIXELS = 1024   # ~32x32 grey

# Worker-closure rule (see media_codecs): executors under a pristine
# session cannot import this package, so the kernel functions ship by
# value inside the Arrow-batch closures; numpy itself is importable on
# every executor (a baked dependency of the Arrow/pandas-UDF paths).
try:  # pragma: no cover — absent only outside a pyspark environment
    from pyspark.cloudpickle import register_pickle_by_value

    register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 — plain-python use of the codecs is fine
    pass


def _paeth_vec(a, b, c):
    """Vector Paeth predictor over int16 arrays (values fit 0..255)."""
    p = a.astype(np.int16) + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png_np(
    pixels: bytes, width: int, height: int, channels: int = 1
) -> bytes:
    """Byte-identical twin of ``media_codecs.encode_png`` (same y % 5
    filter cycling, same zlib defaults) with every filter vectorized —
    on the encode side each filter reads only SOURCE bytes, so there is
    no recurrence to serialize."""
    if channels not in (1, 3):
        raise ValueError(
            f"channels must be 1 (grey) or 3 (rgb), got {channels}"
        )
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if width * height * channels < PNG_ENCODE_NP_MIN_PIXELS:
        return _encode_png_scalar(pixels, width, height, channels)
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    z = np.zeros(channels, dtype=np.uint8)
    raw = bytearray()
    for y in range(height):
        line = img[y]
        prior = img[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        f = y % 5
        raw.append(f)
        if f == 0:
            raw += line.tobytes()
            continue
        a = np.concatenate([z, line[:-channels]])  # left neighbor
        if f == 1:
            pred = a
        elif f == 2:
            pred = prior
        elif f == 3:
            pred = (
                (a.astype(np.int16) + prior) // 2
            ).astype(np.uint8)
        else:
            c = np.concatenate([z, prior[:-channels]])
            pred = _paeth_vec(a, prior, c)
        raw += (line - pred).tobytes()  # uint8 wraps = & 0xFF
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png_np(data: bytes) -> dict:
    """Byte-identical twin of ``media_codecs.decode_png``: chunk walk,
    CRC check, inflate, unfilter. Filters 0/2 are whole-row vector ops,
    filter 1 a per-lane cumulative sum mod 256; filters 3/4 carry an
    output recurrence and keep the scalar loop."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    if len(data) >= 26 and data[12:16] == b"IHDR":
        w0, h0 = struct.unpack(">II", data[16:24])
        ch0 = 3 if data[25] == 2 else 1
        if w0 * h0 * ch0 < PNG_DECODE_NP_MIN_PIXELS:
            return _decode_png_scalar(data)
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} color={color_type} "
            f"interlace={interlace}"
        )
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(rows[y, 0])
        line = rows[y, 1:]
        if f == 0:
            cur = line.copy()
        elif f == 1:
            # out[x] = line[x] + out[x-c]: per-lane prefix sum mod 256
            cur = (
                line.reshape(-1, channels)
                .astype(np.int64)
                .cumsum(axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif f == 2:
            cur = line + prior  # uint8 wraps
        elif f in (3, 4):
            # true output recurrence (out[x-c] feeds the predictor) —
            # scalar loop, same as the stdlib reference
            cur_l = bytearray(line.tobytes())
            pri = prior.tolist()
            for x in range(stride):
                a = cur_l[x - channels] if x >= channels else 0
                b = pri[x]
                if f == 3:
                    pred = (a + b) // 2
                else:
                    c = pri[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                cur_l[x] = (cur_l[x] + pred) & 0xFF
            cur = np.frombuffer(bytes(cur_l), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prior = out[y]
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": out.tobytes(),
    }


def resample_nearest_np(
    pixels: bytes,
    width: int,
    height: int,
    new_width: int,
    new_height: int,
    channels: int = 1,
) -> bytes:
    """Byte-identical twin of ``media_codecs.resample_nearest``: the
    floor source-index map as one fancy-indexing gather."""
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if new_width < 1 or new_height < 1:
        raise ValueError("target dimensions must be >= 1")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    sy = (np.arange(new_height, dtype=np.int64) * height) // new_height
    sx = (np.arange(new_width, dtype=np.int64) * width) // new_width
    return img[sy[:, None], sx[None, :], :].tobytes()


# WAV ENCODE stays the stdlib struct.pack: the input contract is a
# plain Python list, and np.asarray(list) pays a per-element C-API
# conversion that measures SLOWER than struct.pack at every size tried
# (4.5 vs 15.2 us at 256 samples, 70 vs 138 us at 4096). An ndarray-
# input variant would win, but no pipeline call site holds one.
encode_wav_np = encode_wav


def decode_wav_np(data: bytes) -> dict:
    """Byte-identical twin of ``media_codecs.decode_wav``; the sample
    unpacking is ``np.frombuffer`` (+ ``tolist()`` to keep the list
    contract callers slice and sum)."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sample_rate = channels = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} bits={bits}"
                )
        elif tag == b"data":
            body = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = len(body) // 2
    raw = body[: n * 2]
    samples = np.frombuffer(raw, dtype="<i2").tolist()
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": n // channels,
        "duration_ms": (n // channels) * 1000 // sample_rate,
        "samples": samples,
        "raw": raw,
    }


NUMPY_CODEC = MediaCodec(
    name="numpy",
    decode_png=decode_png_np,
    encode_png=encode_png_np,
    resample_nearest=resample_nearest_np,
    decode_wav=decode_wav_np,
    encode_wav=encode_wav_np,
    decode_avi=decode_avi,  # container demux has no per-byte loop
    encode_avi=encode_avi,
)
