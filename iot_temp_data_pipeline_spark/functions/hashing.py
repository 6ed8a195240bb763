"""Portable deterministic hashing helpers.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` use different
algorithms, so sketch operators (MinHash, SimHash, LSH) built on them
could never be oracle-checked. Instead every sketch here derives its
hash from **md5**, which both engines implement identically:

  Spark:  conv(substring(md5(s), 1, 8), 16, 10) → unsigned 32-bit int
  DuckDB: CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)

32 bits is plenty for sketch hashing at any scale (collision behavior is
what matters, not key width), and it always fits a signed 64-bit long.
md5 is ~2× slower than xxhash64 but stays JVM-side inside whole-stage
codegen — still the fast path. For production (non-oracle) paths a
``use_xxhash=True`` switch selects the faster native hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column, seed: int = 0, use_xxhash: bool = False) -> Column:
    """Deterministic 32-bit hash of a string column, identical in DuckDB.

    ``seed`` folds into the input so independent hash families can be
    derived (MinHash needs k independent functions).
    """
    salted = F.concat(F.lit(f"{seed}:"), col)
    if use_xxhash:
        return F.xxhash64(salted)
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str, seed: int = 0) -> str:
    """DuckDB SQL text equivalent of :func:`portable_hash32`."""
    return f"CAST('0x' || substr(md5('{seed}:' || {expr}), 1, 8) AS BIGINT)"


def portable_hash32_family(col: Column, k: int) -> list[Column]:
    """k independent 32-bit hash lanes at ¼ the md5 cost: one md5 per
    group of 4 lanes, sliced into its four 32-bit hex words (the words of
    a single md5 are independent). Lane j = word j%4 of md5(f"{j//4}:"+s).
    MinHash's k-lane family only needs pairwise-independent-ish lanes, so
    word-slicing is standard practice."""
    lanes: list[Column] = []
    for g in range((k + 3) // 4):
        digest = F.md5(F.concat(F.lit(f"{g}:"), col))
        for w in range(4):
            if len(lanes) == k:
                break
            lanes.append(
                F.conv(F.substring(digest, 1 + 8 * w, 8), 16, 10).cast("long")
            )
    return lanes


def _affine_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the multiply-shift family, from a
    fixed-seed 64-bit LCG (Knuth MMIX constants). a is odd and < 2^30 so
    a*h + b stays well inside signed-64 for h < 2^32."""
    pairs: list[tuple[int, int]] = []
    x = 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        a = ((x >> 34) | 1) & ((1 << 30) - 1)
        b = x & 0xFFFFFFFF
        pairs.append((a, b))
    return pairs


def affine_hash32_family(col: Column, k: int) -> list[Column]:
    """k hash lanes at 1/k the md5 cost of :func:`portable_hash32_family`:
    ONE md5 → base 32-bit h, then lane_i = (a_i·h + b_i) mod 2^32 — the
    classic multiply-shift universal family MinHash implementations use.
    All-integer arithmetic, so DuckDB (`affine_hash32_family_sql`)
    reproduces every lane bit-for-bit. For k ≫ 4 this turns the dominant
    per-shingle cost from k/4 md5 digests into one digest plus k fused
    multiply-adds inside whole-stage codegen."""
    base = portable_hash32(col)
    return [
        ((F.lit(a) * base + F.lit(b)) % F.lit(1 << 32))
        for a, b in _affine_constants(k)
    ]


def affine_hash32_family_sql(expr: str, k: int) -> list[str]:
    """DuckDB SQL twins of :func:`affine_hash32_family` (same constants)."""
    h = portable_hash32_sql(expr)
    return [
        f"(({a} * {h} + {b}) % 4294967296)" for a, b in _affine_constants(k)
    ]


def portable_hash32_family_sql(expr: str, k: int) -> list[str]:
    """DuckDB SQL equivalents of :func:`portable_hash32_family`."""
    lanes: list[str] = []
    for g in range((k + 3) // 4):
        digest = f"md5('{g}:' || {expr})"
        for w in range(4):
            if len(lanes) == k:
                break
            lanes.append(f"CAST('0x' || substr({digest}, {1 + 8 * w}, 8) AS BIGINT)")
    return lanes
