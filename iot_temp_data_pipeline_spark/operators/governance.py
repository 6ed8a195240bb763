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


T_CLOSE_PPM = 300_000  # flag classes whose sensitive TVD > 0.30


def t_closeness_audit(
    customer: DataFrame, t_ppm: int = T_CLOSE_PPM
) -> DataFrame:
    """t-closeness — the third member of the release-audit trio
    (k-anonymity: classes too SMALL; l-diversity: too few DISTINCT
    sensitive values; t-closeness: sensitive DISTRIBUTION inside a
    class too far from the table-wide one — a class can pass both k and
    l yet still leak by being 90% one segment when the table is 20%).
    For the categorical sensitive attribute the standard distance is
    total variation: t = ½·Σ_seg |p_class(seg) − p_global(seg)|.

    Exact integer arithmetic end-to-end: shares are floored ppm
    integers (div), the TVD is a summed |ppm diff| halved with div —
    bit-identical cross-engine, no floats anywhere.

    Execution shape: ONE groupBy over (quasi, sensitive) — the only
    input-sized pass; class totals and the 5-row global segment
    distribution both re-aggregate FROM that cell table; the
    class × segment grid (classes × 5) comes from a broadcast of the
    global distribution, so absent segments contribute their full
    |0 − p_global| term."""
    band = F.floor(F.col("c_acctbal").cast("double") / BAND_WIDTH).cast("long")
    cells = customer.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        band.alias("acctbal_band"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").alias("c"))
    seg_tot = cells.groupBy("seg").agg(F.sum("c").alias("g"))
    grand = seg_tot.agg(F.sum("g").alias("n_total"))
    gshare = seg_tot.crossJoin(F.broadcast(grand)).select(
        "seg", F.expr("div(g * 1000000, n_total)").alias("g_ppm")
    )
    classes = cells.groupBy("nationkey", "acctbal_band").agg(
        F.sum("c").alias("class_size")
    )
    grid = classes.crossJoin(F.broadcast(gshare))
    joined = grid.join(cells, ["nationkey", "acctbal_band", "seg"], "left")
    term = F.abs(
        F.expr("div(coalesce(c, 0) * 1000000, class_size)") - F.col("g_ppm")
    )
    return (
        joined.groupBy("nationkey", "acctbal_band", "class_size")
        .agg(F.sum(term).alias("tvd2_ppm"))
        .select(
            "nationkey",
            "acctbal_band",
            "class_size",
            F.expr("div(tvd2_ppm, 2)").alias("t_ppm"),
        )
        .filter(F.col("t_ppm") > t_ppm)
    )


def t_closeness_audit_sql(t_ppm: int = T_CLOSE_PPM) -> str:
    return f"""(
    WITH tc_cells AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / {BAND_WIDTH}) AS BIGINT)
                   AS acctbal_band,
               c_mktsegment AS seg, COUNT(*) AS c
        FROM customer GROUP BY 1, 2, 3
    ),
    tc_seg AS (SELECT seg, SUM(c) AS g FROM tc_cells GROUP BY 1),
    tc_grand AS (SELECT SUM(g) AS n_total FROM tc_seg),
    tc_gshare AS (
        SELECT seg, (g * 1000000) // (SELECT n_total FROM tc_grand) AS g_ppm
        FROM tc_seg
    ),
    tc_classes AS (
        SELECT nationkey, acctbal_band, SUM(c) AS class_size
        FROM tc_cells GROUP BY 1, 2
    ),
    tc_grid AS (
        SELECT cl.nationkey, cl.acctbal_band, cl.class_size, gs.seg, gs.g_ppm
        FROM tc_classes cl CROSS JOIN tc_gshare gs
    ),
    tc_terms AS (
        SELECT g.nationkey, g.acctbal_band, g.class_size,
            ABS((COALESCE(ce.c, 0) * 1000000) // g.class_size - g.g_ppm)
                AS term
        FROM tc_grid g
        LEFT JOIN tc_cells ce
            ON g.nationkey = ce.nationkey
           AND g.acctbal_band = ce.acctbal_band
           AND g.seg = ce.seg
    )
    SELECT nationkey, acctbal_band, class_size,
        SUM(term) // 2 AS t_ppm
    FROM tc_terms
    GROUP BY 1, 2, 3
    HAVING SUM(term) // 2 > {t_ppm}
) tc"""
