"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q12/Q15/Q16/Q20/Q21),
adapted to the fixture schema. The fixtures have no `partsupp` table and
no comment/shipmode/receiptdate columns, so supply-cost / stock / mode
predicates are re-expressed over available columns (noted per query);
the PLAN SHAPES — correlated scalar MIN, two-sided nation pairing,
market-share ratio, multiway fact joins, HAVING-vs-global-scalar,
grouped-HAVING semi-join chains, double-correlated EXISTS/NOT EXISTS —
are preserved, which is what this module exists to cover.

Money math follows plans/relational.py: cents/mills integers summed as
decimal(38,0), divided back to dollars only at the end, so Spark and
the DuckDB oracle agree bit-for-bit.

Scale stance: dimension sides (part, supplier, nation, filtered
customer) are explicitly broadcast; fact-fact joins (lineitem⋈orders)
shuffle on the natural key where AQE can pick shuffle-hash and split
skew; every aggregate is partial-aggregatable (sums/counts of ints).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stats import exact_long_sum

from ..sources.catalog import load_table
from .registry import QuerySpec, shape, sql_select

_DEC = "decimal(38,0)"
_PI = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DI = "CAST(ROUND(l_discount * 1000) AS BIGINT)"
_QTY = "CAST(ROUND(l_quantity) AS BIGINT)"


def _pi() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _di() -> F.Column:
    return F.round(F.col("l_discount") * 1000).cast("long")


def _qty() -> F.Column:
    return F.round(F.col("l_quantity")).cast("long")


def _rev_e5() -> F.Column:
    # revenue in 1e-5 dollars: price-cents x (1000 - discount-mills)
    return F.col("pi") * (1000 - F.col("di"))


_REV_E5_SQL = f"{_PI} * (1000 - {_DI})"


# ------------------------------------------------------------------ TPC-H Q2

Q2_SPEC = [
    ("s_acctbal", "f2"),
    ("s_name", ""),
    ("n_name", ""),
    ("p_partkey", "long"),
    ("p_name", ""),
    ("offer_cents", "long"),
]


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery — for each part,
    the EUROPE supplier whose cheapest observed line total equals the
    per-part minimum. No partsupp table, so the "supply cost" proxy is
    MIN(line total cents) per (part, supplier) over lineitem
    (reference shape: dbt-style enrichment joins are the only joins in
    the reference, SURVEY §2.6; this extends to decorrelated scalar-min).

    Plan at scale: the EUROPE supplier set is broadcast to prune
    lineitem at the scan; per-(part,supp) and per-part MINs are two
    partial-aggregatable passes sharing the l_partkey shuffle key
    (Catalyst reuses the exchange); the final equality join keys on
    partkey. ORDER BY carries unique tiebreakers so the LIMIT is
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    pt = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    )
    eu_supp = su.join(
        F.broadcast(na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)),
        su.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    offers = (
        li.join(F.broadcast(pt.select("p_partkey", "p_name")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(_pi()).alias("offer_cents"))
    )
    per_part_min = offers.groupBy(F.col("p_partkey").alias("mp_partkey")).agg(
        F.min("offer_cents").alias("min_cents")
    )
    df = (
        offers.join(
            F.broadcast(per_part_min),
            (offers.p_partkey == F.col("mp_partkey"))
            & (offers.offer_cents == F.col("min_cents")),
        )
        .join(F.broadcast(eu_supp), offers.l_suppkey == eu_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "offer_cents")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
    return shape(df, Q2_SPEC)


Q2_SQL = sql_select(
    Q2_SPEC,
    f"""(
    WITH offers AS (
        SELECT p_partkey, p_name, l_suppkey,
               MIN({_PI}) AS offer_cents
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_type = 'STANDARD' AND p_size = 15 AND r_name = 'EUROPE'
        GROUP BY p_partkey, p_name, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, o.p_partkey, o.p_name, o.offer_cents
    FROM offers o
    JOIN supplier ON s_suppkey = o.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE o.offer_cents = (
        SELECT MIN(offer_cents) FROM offers i WHERE i.p_partkey = o.p_partkey
    )
    ORDER BY s_acctbal DESC, n_name, s_name, o.p_partkey
    LIMIT 100
) s""",
)


# ------------------------------------------------------------------ TPC-H Q7

Q7_NATIONS = ("NATION_1", "NATION_2")

Q7_SPEC = [
    ("supp_nation", ""),
    ("cust_nation", ""),
    ("l_year", "long"),
    ("revenue", "f2"),
]


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, both directions,
    by year — a 6-way join where lineitem⋈orders is fact-fact and every
    other side is a filtered dimension.

    Plan at scale: supplier and customer are pre-filtered to the two
    nations BEFORE joining (selectivity 2/25 each), then broadcast; the
    lineitem⋈orders join shuffles on orderkey; the (supp, cust) nation
    disjunction is applied as a residual on the already-joined rows.
    Grouping output is 2 pairs x 2 years."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.datetime(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.datetime(1998, 1, 1)))
    )
    od = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*Q7_NATIONS))
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cu = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    df = (
        li.withColumn("pi", _pi())
        .withColumn("di", _di())
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .filter(
            ((F.col("supp_nation") == Q7_NATIONS[0]) & (F.col("cust_nation") == Q7_NATIONS[1]))
            | ((F.col("supp_nation") == Q7_NATIONS[1]) & (F.col("cust_nation") == Q7_NATIONS[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((exact_long_sum(_rev_e5()).cast("double") / 100000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
    return shape(df, Q7_SPEC)


Q7_SQL = sql_select(
    Q7_SPEC,
    f"""(
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_E5_SQL}) AS DOUBLE) / 100000.0 AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
        OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
) s""",
)


# ------------------------------------------------------------------ TPC-H Q8

Q8_SPEC = [
    ("o_year", "long"),
    ("mkt_share", "f4"),
]


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7's share of PROMO-part revenue sold into ASIA,
    by order year — conditional-sum ratio over a 7-table join.

    Plan at scale: part (filtered to one type) and the ASIA customer set
    are broadcast; lineitem⋈orders shuffles on orderkey. The share is
    two exact-integer sums per year divided once at the end, so the
    ratio is partial-aggregatable (no double accumulation drift)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(datetime.datetime(1995, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.datetime(1997, 1, 1)))
    )
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = (
        li.withColumn("pi", _pi())
        .withColumn("di", _di())
        .join(F.broadcast(pt.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(asia_cust), od.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .withColumn("vol", _rev_e5())
    )
    df = (
        vol.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            exact_long_sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("vol")).otherwise(
                    F.lit(0)
                )
            ).alias("num"),
            exact_long_sum(F.col("vol")).alias("den"),
        )
        .select(
            "o_year",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )
    return shape(df, Q8_SPEC)


Q8_SQL = sql_select(
    Q8_SPEC,
    f"""(
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_7'
                         THEN {_REV_E5_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_REV_E5_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n2.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    ORDER BY o_year
) s""",
)


# ------------------------------------------------------------------ TPC-H Q9

Q9_SPEC = [
    ("nation", ""),
    ("o_year", "long"),
    ("sum_profit", "f2"),
]


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'red' parts by supplier nation and order
    year. No partsupp.ps_supplycost, so cost is proxied as half the
    part's retail price per unit: profit = disc. revenue − 0.5 x
    p_retailprice x qty, all in exact 1e-5-dollar integers.

    Plan at scale: the LIKE-filtered part (~13%) and supplier⋈nation
    are broadcast; lineitem⋈orders shuffles on orderkey (the only fact
    shuffle); group output is 25 nations x 7 years."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    retail_cents = F.round(F.col("p_retailprice") * 100).cast("long")
    df = (
        li.withColumn("pi", _pi())
        .withColumn("di", _di())
        .withColumn("qty", _qty())
        .join(
            F.broadcast(pt.select("p_partkey", retail_cents.alias("retail_cents"))),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .withColumn(
            "profit_e5",
            _rev_e5() - F.lit(500) * F.col("retail_cents") * F.col("qty"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            (exact_long_sum(F.col("profit_e5")).cast("double") / 100000.0).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )
    return shape(df, Q9_SPEC)


Q9_SQL = sql_select(
    Q9_SPEC,
    f"""(
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_E5_SQL}
                    - 500 * CAST(ROUND(p_retailprice * 100) AS BIGINT) * {_QTY})
                AS DOUBLE) / 100000.0 AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    ORDER BY nation, o_year DESC
) s""",
)


# ----------------------------------------------------------------- TPC-H Q11

Q11_FRACTION_DENOM = 500  # keep parts whose value > total/500

Q11_SPEC = [
    ("l_partkey", "long"),
    ("value", "f2"),
]


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part value concentration for NATION_3 suppliers —
    GROUP BY + HAVING against an uncorrelated global-scalar subquery.
    No partsupp, so "stock value" is proxied as the summed line value
    (extendedprice cents) those suppliers shipped per part.

    Plan at scale: the 4-supplier set is broadcast to prune lineitem at
    the scan; the per-part agg is one shuffle; the global total reuses
    the per-part output (tiny) and is broadcast back for the HAVING —
    exact-integer comparison value*500 > total, no float boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy("l_partkey")
        .agg(exact_long_sum(_pi()).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    df = (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * Q11_FRACTION_DENOM > F.col("total_cents")
        )
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )
    return shape(df, Q11_SPEC)


Q11_SQL = sql_select(
    Q11_SPEC,
    f"""(
    WITH per_part AS (
        SELECT l_partkey, SUM({_PI}) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value
    FROM per_part
    WHERE value_cents * {Q11_FRACTION_DENOM} >
          (SELECT SUM(value_cents) FROM per_part)
    ORDER BY value DESC, l_partkey
) s""",
)


# ----------------------------------------------------------------- TPC-H Q12

Q12_SPEC = [
    ("l_returnflag", ""),
    ("high_line_count", "long"),
    ("low_line_count", "long"),
]


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lineitem⋈orders with conditional counts of
    high/low order priority per line class. The fixtures lack
    l_shipmode/commitdate/receiptdate, so the group key is l_returnflag
    and the date filter is a one-year shipdate window.

    Plan at scale: shipdate filter pushes to the lineitem scan (one
    year ≈ 1/7 of rows); the orderkey join shuffles; the conditional
    counts are map-side partial sums into 3 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.datetime(1997, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.datetime(1998, 1, 1)))
    )
    od = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
    return shape(df, Q12_SPEC)


Q12_SQL = sql_select(
    Q12_SPEC,
    """(
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
) s""",
)


# ----------------------------------------------------------------- TPC-H Q15

Q15_SPEC = [
    ("s_suppkey", "long"),
    ("s_name", ""),
    ("total_revenue", "f2"),
]


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose quarterly revenue equals the
    maximum — an aggregate view consumed twice (once for the MAX scalar,
    once as the probe side), the classic self-referential scalar
    subquery.

    Plan at scale: the per-supplier agg is one shuffle over the
    date-pruned lineitem; the MAX is a 1-row broadcast back onto the
    agg output. Equality on exact integer 1e-5 dollars, so ties are
    engine-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.datetime(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.datetime(1996, 4, 1)))
    )
    su = load_table(spark, sf_dir, "supplier")
    rev = (
        li.withColumn("pi", _pi())
        .withColumn("di", _di())
        .groupBy("l_suppkey")
        .agg(exact_long_sum(_rev_e5()).alias("rev_e5"))
    )
    best = rev.agg(F.max("rev_e5").alias("max_e5"))
    df = (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("rev_e5") == F.col("max_e5"))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e5").cast("double") / 100000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
    return shape(df, Q15_SPEC)


Q15_SQL = sql_select(
    Q15_SPEC,
    f"""(
    WITH revenue AS (
        SELECT l_suppkey, SUM({_REV_E5_SQL}) AS rev_e5
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_e5 AS DOUBLE) / 100000.0 AS total_revenue
    FROM revenue
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_e5 = (SELECT MAX(rev_e5) FROM revenue)
    ORDER BY s_suppkey
) s""",
)


# ----------------------------------------------------------------- TPC-H Q16

Q16_SIZES = (1, 14, 23, 45)

Q16_SPEC = [
    ("p_brand", ""),
    ("p_type", ""),
    ("p_size", "long"),
    ("supplier_cnt", "long"),
]


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct suppliers able to supply each (brand, type,
    size) combo, excluding a NOT-IN supplier set. Supply evidence comes
    from lineitem (no partsupp); the excluded set — TPC-H's
    'Customer Complaints' comment match — is proxied as suppliers with
    negative account balance.

    Plan at scale: the part filter is broadcast; the exclusion set is a
    broadcast anti join BEFORE the expensive count-distinct (prune
    early); count(DISTINCT suppkey) expands to a two-phase agg keyed on
    (brand, type, size, suppkey) — both phases partial."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    df = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )
    return shape(df, Q16_SPEC)


Q16_SQL = sql_select(
    Q16_SPEC,
    f"""(
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN {Q16_SIZES}
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
) s""",
)


# ----------------------------------------------------------------- TPC-H Q20

Q20_MIN_QTY = 30

Q20_SPEC = [
    ("s_suppkey", "long"),
    ("s_name", ""),
]


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in NATION_8 who shipped more than
    Q20_MIN_QTY total units of some 'red' part during 1996 — the
    nested-IN chain (supplier IN (... partkey IN (...) HAVING sum >
    threshold)) flattened into a grouped-HAVING subquery + semi join.
    The availqty > half-of-shipped predicate becomes the qty-sum
    threshold (no partsupp).

    Plan at scale: part LIKE-filter broadcast into the date-pruned
    lineitem; the (suppkey, partkey) agg is one shuffle; the distinct
    supplier list after HAVING is tiny and drives a broadcast semi join
    against supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime.datetime(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime.datetime(1997, 1, 1)))
    )
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    su = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
    )
    qualifying = (
        li.join(F.broadcast(pt.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_qty()).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    df = (
        su.join(F.broadcast(qualifying), su.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
    return shape(df, Q20_SPEC)


Q20_SQL = sql_select(
    Q20_SPEC,
    f"""(
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_8'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM({_QTY}) > {Q20_MIN_QTY}
      )
    ORDER BY s_suppkey
) s""",
)


# ----------------------------------------------------------------- TPC-H Q21

Q21_NATION = "NATION_5"
Q21_LATE_DAYS = 30

Q21_SPEC = [
    ("s_name", ""),
    ("numwait", "long"),
]


def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers in one nation who were the SOLE late
    supplier on a finished multi-supplier order — EXISTS (another
    supplier on the order) AND NOT EXISTS (another LATE supplier on the
    order). "Late" is l_shipdate > o_orderdate + 30 days (the fixtures
    lack commit/receipt dates).

    Decorrelation: both correlated subqueries collapse into per-order
    DISTINCT-SUPPLIER counts — size(collect_set(supplier)) and
    size(collect_set(late supplier)) — computed as WINDOW functions
    over l_orderkey in the same pass as the probe rows (VERDICT r8
    #3): the outer EXISTS becomes n_supp >= 2, the NOT EXISTS becomes
    n_late_supp == 1 (the probe row itself is late, so 1 means "no
    other"). The DuckDB oracle keeps the literal EXISTS/NOT EXISTS
    form, independently checking the rewrite.

    Plan at scale: the lineitem⋈orders equi-join already hash-clusters
    on orderkey, and the window's partitionBy(l_orderkey) REUSES that
    clustering — so the whole query is the join's exchanges plus a
    4-supplier final aggregate. The earlier aggregate-and-join-back
    form evaluated the enriched join twice (no cache) and paid two
    more orderkey exchanges (16 jobs → measured ~½ the wall at
    sf0.1). Per-order window state is the distinct-supplier set —
    bounded by suppliers-per-order (7 in TPC-H), never the order's
    line count."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    enriched = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    w_ord = Window.partitionBy("l_orderkey")
    stats = enriched.select(
        "*",
        F.size(F.collect_set("l_suppkey").over(w_ord)).alias("n_supp"),
        # collect_set skips nulls, so the CASE keeps only late rows —
        # exactly countDistinct(CASE WHEN is_late THEN l_suppkey END)
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w_ord)
        ).alias("n_late_supp"),
    )
    df = (
        stats.filter(
            F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
    return shape(df, Q21_SPEC)


Q21_SQL = sql_select(
    Q21_SPEC,
    f"""(
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F' AND n_name = '{Q21_NATION}'
      AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
) s""",
)


TPCH_EXTRA: dict[str, QuerySpec] = {
    "tpch_q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL),
    "tpch_q7_volume_shipping": QuerySpec(q7_volume_shipping, Q7_SQL),
    "tpch_q8_market_share": QuerySpec(q8_market_share, Q8_SQL),
    "tpch_q9_product_type_profit": QuerySpec(q9_product_type_profit, Q9_SQL),
    "tpch_q11_important_stock": QuerySpec(q11_important_stock, Q11_SQL),
    "tpch_q12_priority_by_returnflag": QuerySpec(q12_priority_by_returnflag, Q12_SQL),
    "tpch_q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL),
    "tpch_q16_supplier_counts": QuerySpec(q16_supplier_counts, Q16_SQL),
    "tpch_q20_part_promotion": QuerySpec(q20_part_promotion, Q20_SQL),
    "tpch_q21_suppliers_who_kept_waiting": QuerySpec(
        q21_suppliers_who_kept_waiting, Q21_SQL
    ),
}
