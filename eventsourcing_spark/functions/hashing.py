"""FNV-1a 32-bit hashing and partition math — pure column expressions.

The reference partitions streams by ``FNV-1a(aggregate_id) & 0x7fffffff``
(util/common.go:40-56) and routes to bus partitions with
``hash % n + 1`` (util/common.go:13-18). Spark's built-in ``hash()`` is
Murmur3, so parity requires reimplementing FNV-1a — but NOT as a Python
UDF: the whole hash is expressible with ``aggregate`` over the char
array, which stays JVM-side inside whole-stage codegen and therefore
costs nothing extra at 100 TB scale.

The fold is BYTE-level over the UTF-8 encoding (hex-pair expansion of
``encode(col, 'UTF-8')``), exactly matching the reference's raw-byte
hash (util/common.go:44) for any input — ASCII or not — so there is no
ASCII-only caveat and no divergence from the Python twin. Verified by a
hypothesis property test over arbitrary unicode ids.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

FNV_OFFSET_BASIS = 2166136261
FNV_PRIME = 16777619
_MOD32 = 4294967296  # 2^32
_SIGN_MASK = 2147483647  # 0x7fffffff


def fnv1a_32(col: Column | str) -> Column:
    """FNV-1a 32-bit of a string column's UTF-8 BYTES, sign bit cleared.

    Parity target: util/common.go:40-56 (HashToInt → Int32ring) — the
    reference hashes raw bytes, so the fold runs over the UTF-8 byte
    sequence (hex-pair expansion), not codepoints: identical to
    :func:`fnv1a_32_py` on every input, ASCII or not. JVM-side
    throughout: encode → hex → regexp_extract_all → aggregate
    (xor/multiply/pmod) — no Python UDF in the 100 TB hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    byte_hex = F.regexp_extract_all(
        F.hex(F.encode(c, "UTF-8")), F.lit("(..)"), 1
    )
    h = F.aggregate(
        byte_hex,
        F.lit(FNV_OFFSET_BASIS).cast("long"),
        lambda acc, b: F.pmod(
            acc.bitwiseXOR(F.conv(b, 16, 10).cast("long")) * F.lit(FNV_PRIME),
            F.lit(_MOD32),
        ),
    )
    return h.bitwiseAND(F.lit(_SIGN_MASK)).cast("int")


def fnv1a_32_py(s: str) -> int:
    """Driver-side twin of :func:`fnv1a_32` (write path, tests)."""
    h = FNV_OFFSET_BASIS
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) % _MOD32
    return h & _SIGN_MASK


def calc_partition(hash_col: Column | str, partitions: int) -> Column:
    """``hash % partitions + 1`` — bus partition routing (util/common.go:13-18)."""
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    if partitions <= 1:
        return F.lit(1)
    return (F.pmod(c, F.lit(partitions)) + F.lit(1)).cast("int")


def split_predicate(
    hash_col: Column | str, splits: int, split_ids: Sequence[int]
) -> Column:
    """``MOD(aggregate_id_hash, splits) IN (ids)`` — F3 split filter
    (store/postgresql/store.go:536-548). Returns lit(True) when every
    split is selected, mirroring the reference's skip-when-all shortcut.
    """
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    if splits <= 1 or len(set(split_ids)) >= splits:
        return F.lit(True)
    return F.pmod(c, F.lit(splits)).isin(list(split_ids))


def _morton_terms(col_expr: str, shift: int, bits: int) -> str:
    """SQL for interleaving ``bits`` low bits of ``col_expr`` into even
    (shift=0) or odd (shift=1) positions — generated identically for
    Spark and DuckDB (both accept & | << >> on BIGINT)."""
    # every term fully parenthesized: DuckDB gives `<<` and `|` equal
    # precedence (left-assoc), so `a << 3 | b << 5` groups as
    # `((a << 3) | b) << 5` and overflows the checked shift
    terms = [
        f"(((({col_expr}) >> {i}) & 1) << {2 * i + shift})" for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def morton_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """Z-order (Morton) key: bit-interleave two dimensions so records
    close in BOTH dimensions are close in the one-dimensional sort order
    — the layout trick behind multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER, Hudi clustering): sort/partition by this key and
    min/max file stats prune range predicates on either dimension.
    Pure integer bit algebra → identical in Spark and DuckDB.
    """
    return (
        f"({_morton_terms(x_expr, 0, bits)}"
        f" | {_morton_terms(y_expr, 1, bits)})"
    )
