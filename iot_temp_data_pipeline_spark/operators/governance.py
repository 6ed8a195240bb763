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

    Execution shape (r8, the anomaly stats-digest treatment — VERDICT
    r7 #3): ONE groupBy over (quasi, sensitive) is the only input-sized
    pass; its result is a CATEGORICALLY-bounded digest (#nations ×
    #acctbal-bands × #segments cells — a few hundred rows at ANY data
    scale, by construction of the quasi-identifier classes), so it is
    collected once and the class totals / global distribution / TVD
    grid are exact driver-side integer arithmetic over that digest —
    zero further Spark jobs where the r7 form paid ~5 exchange legs of
    fixed cost. Same bounded-collect contract as the anomaly chain's
    GROUPING SETS digest and the PQ codebooks."""
    spark = customer.sparkSession
    band = F.floor(F.col("c_acctbal").cast("double") / BAND_WIDTH).cast("long")
    cells = customer.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        band.alias("acctbal_band"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").alias("c"))
    rows = cells.collect()

    # result emits as a JVM-side literal plan (VALUES / empty range) —
    # a Python-list createDataFrame is RDD-backed (one Python-worker
    # roundtrip ≈ a whole scheduling floor, measured r8)
    def _empty() -> DataFrame:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("nationkey"),
            F.lit(0).cast("long").alias("acctbal_band"),
            F.lit(0).cast("long").alias("class_size"),
            F.lit(0).cast("long").alias("t_ppm"),
        )

    if not rows:
        return _empty()

    # exact integer arithmetic, non-negative throughout, so Python //
    # ≡ Spark div ≡ DuckDB // on every division below
    seg_tot: dict[str, int] = {}
    class_size: dict[tuple[int, int], int] = {}
    cell_c: dict[tuple[int, int, str], int] = {}
    for r in rows:
        key = (r["nationkey"], r["acctbal_band"])
        class_size[key] = class_size.get(key, 0) + r["c"]
        seg_tot[r["seg"]] = seg_tot.get(r["seg"], 0) + r["c"]
        cell_c[(r["nationkey"], r["acctbal_band"], r["seg"])] = r["c"]
    n_total = sum(seg_tot.values())
    g_ppm = {s: (g * 1_000_000) // n_total for s, g in seg_tot.items()}
    out = []
    for (nk, bd), size in class_size.items():
        tvd2 = sum(
            abs((cell_c.get((nk, bd, s), 0) * 1_000_000) // size - gp)
            for s, gp in g_ppm.items()
        )
        if tvd2 // 2 > t_ppm:
            out.append((nk, bd, size, tvd2 // 2))
    if not out:
        return _empty()
    values = ", ".join(
        f"({nk}L, {bd}L, {size}L, {t}L)" for nk, bd, size, t in out
    )
    return spark.sql(
        "SELECT * FROM VALUES "
        + values
        + " AS t(nationkey, acctbal_band, class_size, t_ppm)"
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
