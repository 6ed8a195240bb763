"""Skew-mitigation primitives (100 TB stance, SURVEY.md §4.2).

AQE (`spark.sql.adaptive.skewJoin`, enabled by the session builder)
splits skewed partitions at runtime, which covers most cases. These
helpers are the explicit, planner-independent fallbacks for the two
situations AQE can't fix:

- ``salted_aggregate``: a high-cardinality aggregate whose *keys* are
  skewed AND whose aggregation state is large (e.g. collect-style or
  exact-distinct states that map-side combine can't shrink). Two-phase:
  group on (key, salt) first — the hot key's rows spread over
  ``n_salts`` reducers — then re-aggregate per key. For algebraic
  aggregates (sum/count/min/max) the two-phase rewrite is exact.
- ``salted_broadcast_left_join``: a large×small equi-join where ONE hot
  key dominates and the small side must not be broadcast whole (or the
  join is forced shuffle). The small side is replicated ``n_salts``
  times, the big side gets a uniform random salt — every reducer sees
  1/n of the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, seed: int = 7) -> DataFrame:
    """Uniform integer salt in [0, n_salts)."""
    return df.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key: str,
    n_salts: int,
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    seed: int = 7,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregates within (key, salt); ``final_aggs``
    re-combines the ≤ n_salts partials per key (its Columns reference the
    partial alias names)."""
    partial = (
        with_salt(df, n_salts, seed)
        .groupBy(key, SALT_COL)
        .agg(*[c.alias(name) for name, c in partial_aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def salted_broadcast_left_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int,
    seed: int = 7,
) -> DataFrame:
    """Skew-safe left equi-join: replicate the small side across salts,
    salt the big side, join on (key, salt). Result ≡ ``big.join(small,
    key, "left")`` for unique-keyed ``small``."""
    salted_big = with_salt(big, n_salts, seed)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, [key, SALT_COL], "left").drop(SALT_COL)
