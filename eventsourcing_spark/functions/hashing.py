"""FNV-1a 32-bit hashing and partition math — pure column expressions.

The reference partitions streams by ``FNV-1a(aggregate_id) & 0x7fffffff``
(util/common.go:40-56) and routes to bus partitions with
``hash % n + 1`` (util/common.go:13-18). Spark's built-in ``hash()`` is
Murmur3, so parity requires reimplementing FNV-1a — but NOT as a Python
UDF: the whole hash is expressible with ``aggregate`` over the char
array, which stays JVM-side inside whole-stage codegen and therefore
costs nothing extra at 100 TB scale.

Only ASCII inputs are supported (aggregate IDs are ULIDs / ASCII
strings everywhere in the reference); for non-ASCII the byte-level FNV
would diverge from the codepoint-level fold.
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
    """FNV-1a 32-bit of an ASCII string column, sign bit cleared.

    Parity target: util/common.go:40-56 (HashToInt → Int32ring).
    JVM-side: split → aggregate(xor/multiply/pmod) — no Python UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    # split("") yields a trailing "" element (and [""] for empty input)
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    h = F.aggregate(
        chars,
        F.lit(FNV_OFFSET_BASIS).cast("long"),
        lambda acc, ch: F.pmod(
            acc.bitwiseXOR(F.ascii(ch).cast("long")) * F.lit(FNV_PRIME), F.lit(_MOD32)
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
