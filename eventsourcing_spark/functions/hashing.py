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


# ---------------------------------------------------------------------------
# Hilbert curve key — the locality-preserving upgrade to Z-order. Morton
# order has long "seam" jumps (adjacent cells up to 2^bits apart on the
# curve); the Hilbert curve visits every grid cell with CONSECUTIVE keys
# always one grid step apart, so range scans over the sort order touch
# tighter spatial neighborhoods — measurably better file-stat pruning
# for 2-D predicates (why Iceberg added hilbert clustering alongside
# zorder). The classic xy2d transform (public-domain, e.g. Wikipedia
# "Hilbert curve") is a 16-step sequential rotate-and-accumulate — not
# one closed-form expression — so both engines get a mechanically
# generated step chain from the SAME expression builder: Spark as 16
# chained projections (Catalyst keeps them separate — the CASE
# expressions are non-cheap and multiply referenced, so CollapseProject
# won't inline them exponentially), DuckDB as 16 MATERIALIZED CTE steps
# (plain CTEs inline once per reference → 4^16 expression blow-up).
#
# Bit tests use explicit floor-mod (((v % 2s) + 2s) % 2s >= s) because
# the rotation step `s-1-x` legitimately drives intermediates NEGATIVE
# and both engines' `%` truncates toward zero, which would diverge from
# the reference's two's-complement `x & s` exactly there. Parity with
# the reference transform is pinned over the full 16-bit domain corners
# and random interiors in tests/test_functions.py.
# ---------------------------------------------------------------------------


def _hilbert_step_exprs(s: int) -> tuple[str, str, str]:
    """One xy2d round at scale ``s`` over state columns cx/cy/cd:
    returns (new_cx, new_cy, new_cd) SQL expressions (engine-neutral)."""
    m = 2 * s
    rx = f"(CASE WHEN ((cx % {m}) + {m}) % {m} >= {s} THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ((cy % {m}) + {m}) % {m} >= {s} THEN 1 ELSE 0 END)"
    # (3*rx) XOR ry without an engine-specific xor: rx=0 -> ry, rx=1 -> 3-ry
    quad = f"(CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END)"
    new_d = f"cd + CAST({s * s} AS BIGINT) * {quad}"
    new_x = (
        f"CASE WHEN {ry} = 1 THEN cx"
        f" WHEN {rx} = 1 THEN {s - 1} - cy ELSE cy END"
    )
    new_y = (
        f"CASE WHEN {ry} = 1 THEN cy"
        f" WHEN {rx} = 1 THEN {s - 1} - cx ELSE cx END"
    )
    return new_x, new_y, new_d


def with_hilbert_key(
    df,
    x_expr: str,
    y_expr: str,
    out_col: str = "hkey",
    bits: int = 16,
):
    """Append the Hilbert key of (``x_expr``, ``y_expr``) — both must
    evaluate into [0, 2^bits) — as ``out_col``. 16 chained projections;
    stays entirely inside whole-stage codegen."""
    carry = [c for c in df.columns]
    stepped = df.selectExpr(
        *carry,
        f"CAST({x_expr} AS BIGINT) AS cx",
        f"CAST({y_expr} AS BIGINT) AS cy",
        "CAST(0 AS BIGINT) AS cd",
    )
    for i in range(bits):
        nx, ny, nd = _hilbert_step_exprs(1 << (bits - 1 - i))
        stepped = stepped.selectExpr(
            *carry, f"({nx}) AS cx", f"({ny}) AS cy", f"({nd}) AS cd"
        )
    return stepped.selectExpr(*carry, f"cd AS {out_col}")


def hilbert_chain_sql(
    base_select: str,
    carry_cols: list[str],
    x_col: str,
    y_col: str,
    bits: int = 16,
    prefix: str = "h",
) -> str:
    """The CTE chain of :func:`hilbert_oracle_cte` WITHOUT the final
    SELECT — for embedding inside a larger oracle (the last CTE is
    ``{prefix}{bits}`` with the key in column ``cd``). ``prefix``
    namespaces the step CTEs when a query needs the chain next to
    other CTEs."""
    carry = ", ".join(carry_cols)
    ctes = [
        f"{prefix}0 AS MATERIALIZED (SELECT {carry},"
        f" CAST({x_col} AS BIGINT) AS cx,"
        f" CAST({y_col} AS BIGINT) AS cy, CAST(0 AS BIGINT) AS cd"
        f" FROM ({base_select}))"
    ]
    for i in range(bits):
        nx, ny, nd = _hilbert_step_exprs(1 << (bits - 1 - i))
        ctes.append(
            f"{prefix}{i + 1} AS MATERIALIZED (SELECT {carry}, ({nx}) AS cx,"
            f" ({ny}) AS cy, ({nd}) AS cd FROM {prefix}{i})"
        )
    return ", ".join(ctes)


def hilbert_oracle_cte(
    base_select: str,
    carry_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "hkey",
    bits: int = 16,
) -> str:
    """The DuckDB twin of :func:`with_hilbert_key`: a WITH chain whose
    steps come from the same expression builder. ``base_select`` must
    produce ``carry_cols`` plus ``x_col``/``y_col``; MATERIALIZED per
    step (a plain CTE inlines once per reference and the multiply-
    referenced CASE expressions would blow up 4^bits)."""
    carry = ", ".join(carry_cols)
    return (
        hilbert_chain_sql(base_select, carry_cols, x_col, y_col, bits)
        + f" SELECT {carry}, cd AS {out_col} FROM h{bits}"
    )
