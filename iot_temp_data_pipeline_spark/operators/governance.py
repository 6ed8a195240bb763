"""Data-governance audits (beyond-reference surface): the checks a
training-data pipeline runs before a corpus (or its metadata tables)
can be shared — complementing the PII redaction pass in
operators/text_analysis.py.

k-anonymity: a released table is k-anonymous when every combination of
quasi-identifiers (attributes that can be linked to external data)
matches at least k rows. Classes below k re-identify individuals; the
audit lists them so the release step can suppress or generalize.

Execution shape: ONE groupBy over the quasi-identifier tuple (map-side
combined), then a HAVING filter — the equivalence-class table is tiny
next to the input, so at 100 TB this is a single aggregation pass. The
acctbal band is integer floor-division (no float in the class key).

Cited parity anchor: reference has no governance surface; extends the
training-data brief (SURVEY.md §2 extension block, PII family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_ANON = 5
BAND_WIDTH = 2000  # acctbal generalization band (cents-insensitive)


def k_anonymity_audit(customer: DataFrame, k: int = K_ANON) -> DataFrame:
    """(nation, segment, acctbal band) equivalence classes with fewer
    than k members — the rows that would re-identify a customer if the
    table shipped as-is. class_size ordered ascending: worst first."""
    band = F.floor(F.col("c_acctbal").cast("double") / BAND_WIDTH).cast("long")
    return (
        customer.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            band.alias("acctbal_band"),
        )
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") < k)
        .orderBy("class_size", "nationkey", "mktsegment", "acctbal_band")
    )


def k_anonymity_audit_sql(k: int = K_ANON) -> str:
    return f"""(
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment AS mktsegment,
           CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / {BAND_WIDTH}) AS BIGINT)
               AS acctbal_band,
           COUNT(*) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < {k}
    ORDER BY class_size, nationkey, mktsegment, acctbal_band
) s"""


L_DIVERSE = 3


def l_diversity_audit(customer: DataFrame, l_min: int = L_DIVERSE) -> DataFrame:
    """l-diversity companion to :func:`k_anonymity_audit`: a class can
    be k-anonymous yet still leak if the SENSITIVE attribute is
    (near-)uniform inside it — everyone in the class shares the secret.
    Quasi-identifiers here are (nation, acctbal band); the sensitive
    attribute is the market segment. Classes whose distinct-sensitive
    count falls below l are flagged, worst first.

    Execution shape: one groupBy over (quasi + sensitive) with map-side
    combine, then a second tiny aggregate over the class table — the
    standard two-phase distinct-count, no expansion of the input."""
    band = F.floor(F.col("c_acctbal").cast("double") / BAND_WIDTH).cast("long")
    cells = (
        customer.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            band.alias("acctbal_band"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count("*").alias("c"))
    )
    return (
        cells.groupBy("nationkey", "acctbal_band")
        .agg(
            F.sum("c").alias("class_size"),
            F.count("*").alias("n_distinct_sensitive"),
        )
        .filter(F.col("n_distinct_sensitive") < l_min)
        .orderBy("n_distinct_sensitive", "nationkey", "acctbal_band")
    )


def l_diversity_audit_sql(l_min: int = L_DIVERSE) -> str:
    return f"""(
    SELECT nationkey, acctbal_band, SUM(c) AS class_size,
           COUNT(*) AS n_distinct_sensitive
    FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / {BAND_WIDTH}) AS BIGINT)
                   AS acctbal_band,
               c_mktsegment AS seg, COUNT(*) AS c
        FROM customer
        GROUP BY 1, 2, 3
    )
    GROUP BY 1, 2
    HAVING COUNT(*) < {l_min}
    ORDER BY n_distinct_sensitive, nationkey, acctbal_band
) ld"""
