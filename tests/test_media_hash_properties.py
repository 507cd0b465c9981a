"""Property-based tests for the media hash kernels (no SparkSession).

The near-dup gate queries pin exact values against arithmetic oracles;
these hypothesis tests pin the SEMANTIC properties that make the hashes
perceptual — the reason to use comparison hashes instead of byte hashes:

* brightness/gain-shift invariance: adding a constant to every pixel /
  sample (within headroom, no wrap or clip) cannot change any
  comparison, so the hash is identical;
* locality: flipping a single pixel changes a bounded number of bits
  (a pixel touches one 2×2 block = one cell = at most its two adjacent
  comparisons per direction);
* range/determinism: hashes stay inside their declared bit-widths.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from eventsourcing_spark.pipeline.multimodal import (
    audio_fingerprint_128,
    dhash_16x16_gray,
    frame_hash_8x8_bgr,
)


def _bgr(gray: list[int]) -> bytes:
    return bytes(b for v in gray for b in (v, v, v))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 127), min_size=256, max_size=256),
    st.integers(0, 128),
)
def test_dhash_brightness_shift_invariant(px, k):
    """Pixels in [0,127] shifted by k ≤ 128 stay in byte range: every
    2×2 block mean shifts by exactly k, comparisons are unchanged."""
    a = dhash_16x16_gray(bytes(px))
    b = dhash_16x16_gray(bytes(v + k for v in px))
    assert a == b
    assert 0 <= a < (1 << 56)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-16384, 16383), min_size=128, max_size=128),
    st.integers(-8192, 8192),
)
def test_audio_fingerprint_offset_invariant(sm, k):
    """A DC offset within int16 headroom shifts every frame mean by the
    same amount (frames are sums of 2 samples div 2 — the parity error
    of the div cancels because both frames shift identically when k is
    applied to both samples)."""
    a = audio_fingerprint_128(sm)
    b = audio_fingerprint_128([s + k for s in sm])
    assert a == b
    assert 0 <= a < (1 << 63)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 191), min_size=64, max_size=64),
    st.integers(0, 64),
)
def test_frame_hash_brightness_shift_invariant(gray, k):
    a = frame_hash_8x8_bgr(_bgr(gray))
    b = frame_hash_8x8_bgr(_bgr([v + k for v in gray]))
    assert a == b
    assert 0 <= a < (1 << 24)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 255), min_size=256, max_size=256),
    st.integers(0, 255),
    st.integers(0, 255),
)
def test_dhash_single_pixel_locality(px, pos, newval):
    """One pixel lives in exactly one 2×2 block → one 8×8 cell → at most
    2 horizontal comparisons involve it: Hamming distance ≤ 2."""
    a = dhash_16x16_gray(bytes(px))
    mutated = list(px)
    mutated[pos] = newval
    b = dhash_16x16_gray(bytes(mutated))
    assert bin(a ^ b).count("1") <= 2


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=128, max_size=128))
def test_audio_fingerprint_deterministic(sm):
    assert audio_fingerprint_128(sm) == audio_fingerprint_128(list(sm))
