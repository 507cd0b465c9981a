"""ULID event-ID functions — pure column expressions + a write-path generator.

The reference's event IDs are 26-char Crockford-base32 ULIDs
(eventid/eventid.go:14-25): 48-bit millisecond timestamp + 80-bit
entropy; lexicographic order == time order. The engine needs three
things (SURVEY.md §2.8 X1-X3):

* ``ulid_millis`` / ``ulid_timestamp`` — extract the embedded time from
  an ID column. Implemented JVM-side with ``translate`` (Crockford →
  standard base-32 digits) + ``conv`` — no Python UDF.
* ``ulid_time_only`` — the zero-entropy boundary ULID for a timestamp
  (eventid/eventid.go:51-55), used to build ``(after, until]`` range
  bounds from wall-clock times (X3).
* ``ulid_random`` — bulk ID generation for distributed appends: embedded
  time from a timestamp column + 80 random bits.
* ``UlidGenerator`` — driver-side monotonic generator mirroring
  eventid/eventid.go:153-201: IDs are ≥ (base time + 1 ms) and strictly
  increasing within the generator even inside one millisecond.
"""

from __future__ import annotations

import secrets
from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
# letters for digit values 10..31 in each alphabet (digits 0-9 map to themselves)
_CROCKFORD_TAIL = "ABCDEFGHJKMNPQRSTVWXYZ"
_STD_TAIL = "ABCDEFGHIJKLMNOPQRSTUV"  # spark `conv` digit alphabet, upper-cased

ENCODED_SIZE = 26
_TIME_CHARS = 10


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ulid_millis(col: Column | str) -> Column:
    """Unix milliseconds embedded in a ULID string column (X2)."""
    time_part = F.substring(_as_col(col), 1, _TIME_CHARS)
    std = F.translate(time_part, _CROCKFORD_TAIL, _STD_TAIL)
    return F.conv(std, 32, 10).cast("long")


def ulid_timestamp(col: Column | str) -> Column:
    """Embedded time of a ULID as a TimestampType column (X2)."""
    return F.timestamp_millis(ulid_millis(col))


def _encode_time(ms: Column) -> Column:
    std = F.conv(ms.cast("string"), 10, 32)  # uppercase 0-9A-V
    return F.lpad(F.translate(std, _STD_TAIL, _CROCKFORD_TAIL), _TIME_CHARS, "0")


def ulid_offset(col: Column | str, offset_ms: Column | int) -> Column:
    """X2 ``OffsetTime``: shift the ULID's embedded timestamp by
    ``offset_ms`` while preserving its 80-bit entropy suffix
    (eventid/eventid.go:69-103) — used to widen `(after, until]` bounds
    without disturbing identity ordering within a millisecond."""
    c = _as_col(col)
    off = F.lit(offset_ms) if isinstance(offset_ms, int) else offset_ms
    return F.concat(
        _encode_time(ulid_millis(c) + off),
        F.substring(c, _TIME_CHARS + 1, ENCODED_SIZE - _TIME_CHARS),
    )


def ulid_time_only(ts: Column | str) -> Column:
    """Zero-entropy boundary ULID for a timestamp column (X3;
    eventid/eventid.go:51-55). ``ulid_time_only(t)`` sorts before every
    real ULID of the same millisecond, so ``id > ulid_time_only(after)
    AND id <= ulid_time_only(until)`` reproduces the reference's
    time-range scans exactly.
    """
    c = _as_col(ts)
    ms = F.unix_millis(c) if not isinstance(ts, str) else F.unix_millis(F.col(ts))
    return F.concat(_encode_time(ms), F.lit("0" * (ENCODED_SIZE - _TIME_CHARS)))


def ulid_random(ts: Column | str) -> Column:
    """Bulk ULID generation: embedded time from ``ts`` + 80 random bits.

    For distributed appends where per-generator monotonicity is not
    required — uniqueness comes from entropy (collision odds 2^-80 per
    millisecond pair). Stays JVM-side (rand + conv + translate).
    """
    ms = F.unix_millis(_as_col(ts))
    # 80 bits = two 40-bit halves, 8 base32 chars each
    half = F.lit(float(1 << 40))
    ent = [
        F.lpad(
            F.translate(
                F.conv(F.floor(F.rand() * half).cast("string"), 10, 32),
                _STD_TAIL,
                _CROCKFORD_TAIL,
            ),
            8,
            "0",
        )
        for _ in range(2)
    ]
    return F.concat(_encode_time(ms), *ent)


# --------------------------------------------------------------------------
# Driver-side twins (write path, range-bound construction, tests)
# --------------------------------------------------------------------------


def _encode_py(value: int, length: int) -> str:
    out = []
    for _ in range(length):
        out.append(CROCKFORD[value & 31])
        value >>= 5
    return "".join(reversed(out))


def _decode_py(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 5) | CROCKFORD.index(ch)
    return v


def ulid_py(ms: int, entropy: int) -> str:
    return _encode_py(ms, _TIME_CHARS) + _encode_py(entropy, 16)


def ulid_time_only_py(t: datetime) -> str:
    """Python twin of :func:`ulid_time_only` (eventid/eventid.go:51-55)."""
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return ulid_py(int(t.timestamp() * 1000), 0)


def ulid_millis_py(s: str) -> int:
    return _decode_py(s[:_TIME_CHARS])


class UlidGenerator:
    """Monotonic ULID generator (parity: eventid/eventid.go:153-201).

    ``NewGenerator(t)``: IDs use max(now, t+1ms); within a single
    millisecond the 80-bit entropy increments, so IDs are strictly
    increasing per generator — the property the event store relies on
    for per-aggregate ID monotonicity (README.md:389-399).
    """

    def __init__(self, after: datetime | None = None, now_fn=None):
        self._now_fn = now_fn or (lambda: datetime.now(timezone.utc))
        base = after if after is not None else self._now_fn()
        if base.tzinfo is None:
            base = base.replace(tzinfo=timezone.utc)
        self._after_ms = int(base.timestamp() * 1000) + 1
        self._last_ms = -1
        self._entropy = 0

    def new_id(self) -> str:
        now_ms = int(self._now_fn().timestamp() * 1000)
        ms = max(now_ms, self._after_ms)
        if ms == self._last_ms:
            self._entropy += 1  # monotonic within the millisecond
            if self._entropy >= 1 << 80:
                ms += 1
                self._entropy = secrets.randbits(80) >> 1
        else:
            self._entropy = secrets.randbits(80) >> 1  # headroom to increment
        self._last_ms = ms
        return ulid_py(ms, self._entropy)
