"""Entity resolution / record linkage (beyond-reference surface): the
blocked fuzzy-match primitive every customer-data or crawl-metadata
pipeline needs — find records that refer to the same real-world entity
without comparing all pairs.

Design (Fellegi–Sunter-era blocking, public technique): a cheap
BLOCKING KEY partitions records so the quadratic comparison runs only
inside blocks; the match score is integer Levenshtein distance (both
engines implement the same classic DP, so distances — and therefore
verdicts — are bit-identical cross-engine, no float similarity needed).

Scale shape: one self-equi-join on the block key (hash shuffle both
sides on the key, never a cartesian), per-pair scoring in the join
projection, then a map-side-combined per-block report. At 100 TB the
block-size distribution is the thing to watch — cap or split hot
blocks (the same df-cap discipline as the n-gram dedup family); the
report surfaces max block size for exactly that decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MATCH_MAX_DIST = 2  # names within edit distance 2 = same-entity candidate


def linkage_blocked_matches(customer: DataFrame) -> DataFrame:
    """Near-duplicate identity detection over customer names: block by
    nation (the cheap quasi-identifier), score in-block pairs by
    Levenshtein, report per block. TPC-H names are 'Customer#NNNNNNNNN',
    so distance counts differing digit positions — synthetic but
    deterministic, and the machinery (block join + integer edit
    distance + per-block report) is the production shape.

    Output per block: customers, candidate pairs actually compared,
    matches at distance <= MATCH_MAX_DIST, and the minimum nonzero
    distance seen (how close the closest non-identical pair is)."""
    c = customer.select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("block"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .filter(F.col("a.custkey") < F.col("b.custkey"))
        .select(
            F.col("a.block").alias("block"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        )
    )
    per_block = pairs.groupBy("block").agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("dist") <= MATCH_MAX_DIST).cast("long")).alias("n_matches"),
        F.min(F.when(F.col("dist") > 0, F.col("dist"))).cast("long").alias(
            "min_nonzero_dist"
        ),
    )
    sizes = c.groupBy("block").agg(F.count("*").alias("n_customers"))
    return (
        sizes.join(per_block, "block", "left")
        .select(
            "block",
            "n_customers",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce("min_nonzero_dist", F.lit(-1)).alias("min_nonzero_dist"),
        )
        .orderBy("block")
    )


def linkage_blocked_matches_sql() -> str:
    return f"""(
    WITH lk_c AS (
        SELECT CAST(c_custkey AS BIGINT) AS custkey, c_name AS name,
            CAST(c_nationkey AS BIGINT) AS block
        FROM customer
    ),
    lk_pairs AS (
        SELECT a.block,
            levenshtein(a.name, b.name) AS dist
        FROM lk_c a JOIN lk_c b
            ON a.block = b.block AND a.custkey < b.custkey
    ),
    lk_per_block AS (
        SELECT block, COUNT(*) AS n_pairs,
            SUM(CASE WHEN dist <= {MATCH_MAX_DIST} THEN 1 ELSE 0 END)
                AS n_matches,
            CAST(MIN(CASE WHEN dist > 0 THEN dist END) AS BIGINT)
                AS min_nonzero_dist
        FROM lk_pairs GROUP BY block
    ),
    lk_sizes AS (
        SELECT block, COUNT(*) AS n_customers FROM lk_c GROUP BY block
    )
    SELECT s.block, s.n_customers,
        COALESCE(p.n_pairs, 0) AS n_pairs,
        COALESCE(p.n_matches, 0) AS n_matches,
        COALESCE(p.min_nonzero_dist, -1) AS min_nonzero_dist
    FROM lk_sizes s LEFT JOIN lk_per_block p USING (block)
    ORDER BY s.block
) lk"""
