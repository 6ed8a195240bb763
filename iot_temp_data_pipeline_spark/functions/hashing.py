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
