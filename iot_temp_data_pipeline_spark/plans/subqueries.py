"""Subquery-shaped relational coverage: EXISTS / NOT EXISTS semi+anti
joins, correlated scalar subqueries, outer-join distributions,
disjunctive pushdown, and exact percentiles — the decorrelation surface
a full analytics engine must cover (TPC-H Q4/Q13/Q17/Q19/Q22 shapes,
adapted to the fixture schema's columns).

Every float-boundary comparison is rewritten to exact integers
(l_quantity is integral; money uses cents), so Spark and the DuckDB
oracle agree bit-for-bit — see plans/relational.py module docstring.

Scale notes inline per query; common stance: correlated subqueries are
decorrelated by hand into aggregate+join (what Catalyst does for simple
cases anyway, made explicit so the plan is predictable), dimension
sides are broadcast, and every semi/anti join keys on the fact table's
natural join key so AQE can pick shuffle-hash or broadcast at runtime.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stats import exact_long_sum

from ..sources.catalog import load_table
from .registry import QuerySpec, shape, sql_select

_DEC = "decimal(38,0)"
_SQL_PI = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"


# ------------------------------------------------------------------ TPC-H Q4

Q4_SPEC = [
    ("o_orderpriority", ""),
    ("order_count", "long"),
]


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join with
    a non-equi residual (late shipment: l_shipdate > o_orderdate + 60d).

    Plan at scale: date filter pushed to the orders scan; semi join
    hash-partitions both sides on orderkey (equi key) and evaluates the
    date residual inside the join — never a nested-loop. Output is 5
    groups, so the final agg is a near-free shuffle."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od_q = od.filter(
        (F.col("o_orderdate") >= F.lit(datetime.datetime(1996, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.datetime(1996, 7, 1)))
    )
    late = od_q.join(
        li,
        (od_q.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > od_q.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    df = (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )
    return shape(df, Q4_SPEC)


Q4_SQL = sql_select(
    Q4_SPEC,
    """(
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
) s""",
)


# ----------------------------------------------------------------- TPC-H Q13

Q13_SPEC = [
    ("c_count", "long"),
    ("custdist", "long"),
]


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter (kept
    orders only, but customers with zero kept orders still appear),
    then a two-level aggregation (orders-per-customer → histogram).

    Plan at scale: outer join shuffles on custkey; the first agg reuses
    that partitioning (no extra shuffle); the histogram agg shuffles a
    few hundred distinct counts. COUNT(o_orderkey) counts only matched
    rows — the outer-join NULL semantics the shape exists to pin."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    # Aggregate BEFORE the join (optimization r11, guide §2.3): the
    # old join-then-count form moved every kept order row through the
    # outer join (broadcast of the whole filtered orders table locally;
    # a full |orders| shuffle at any scale past the broadcast cap).
    # Counting per custkey first is map-side combined, so the exchange
    # carries ≤ |custkeys| pre-aggregated rows and the join side AQE
    # sees is |customers|-sized — the LEFT join + coalesce(0) preserves
    # the outer-join NULL semantics exactly (COUNT(o_orderkey) over an
    # unmatched customer = 0). count("o_orderkey"), not count(*), keeps
    # the null-key skip of the original aggregate.
    per_order_cust = od.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("n_orders")
    )
    per_cust = cu.join(
        per_order_cust, cu.c_custkey == per_order_cust.o_custkey, "left_outer"
    ).select(
        "c_custkey", F.coalesce("n_orders", F.lit(0)).alias("c_count")
    )
    df = (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
    return shape(df, Q13_SPEC)


Q13_SQL = sql_select(
    Q13_SPEC,
    """(
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) co
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
) s""",
)


# ----------------------------------------------------------------- TPC-H Q17

Q17_BRAND = "Brand#23"

Q17_SPEC = [
    ("avg_yearly", "f4"),
]


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a per-part aggregate joined back to the
    fact rows.

    The float threshold `l_quantity < 0.2 * avg(l_quantity)` is
    rewritten exact-integer: qty*5*cnt < sum  (quantities are integral)
    — no engine-dependent boundary behavior.

    Plan at scale: the brand filter cuts part to ~1/25 and is broadcast
    TWICE (once to prune lineitem, once to attach the per-part stats) —
    the per-part agg runs only over the pruned fact rows, then joins
    broadcast-side. One fact shuffle total (the agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    qty = F.round(F.col("l_quantity")).cast("long")
    li_b = li.join(
        F.broadcast(pt.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", qty.alias("qty"), F.round(F.col("l_extendedprice") * 100).cast("long").alias("pi"))
    per_part = li_b.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    df = (
        li_b.join(F.broadcast(per_part), li_b.l_partkey == F.col("agg_partkey"))
        .filter(F.col("qty") * 5 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (exact_long_sum(F.col("pi")).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )
    return shape(df, Q17_SPEC)


Q17_SQL = sql_select(
    Q17_SPEC,
    f"""(
    SELECT CAST(SUM({_SQL_PI}) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_partkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty,
               COUNT(*) AS cnt_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = '{Q17_BRAND}'
        GROUP BY l_partkey
    ) pa ON agg_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
      AND CAST(ROUND(l_quantity) AS BIGINT) * 5 * cnt_qty < sum_qty
) s""",
)


# ----------------------------------------------------------------- TPC-H Q19

Q19_SPEC = [
    ("revenue", "f2"),
]


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctive brand/size/quantity
    bands over a part⋈lineitem join.

    Plan at scale: Catalyst extracts the common `l_partkey = p_partkey`
    equi-key out of the OR (it lives in the join condition, the OR is a
    residual filter), so this stays a broadcast hash join — the shape
    exists to pin that a disjunction does NOT degrade to a
    BroadcastNestedLoop. Revenue is exact-integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    qty = F.round(F.col("l_quantity")).cast("long")
    pi = F.round(F.col("l_extendedprice") * 100).cast("long")
    di = F.round(F.col("l_discount") * 1000).cast("long")
    band1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & qty.between(1, 11)
    )
    band2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & qty.between(10, 20)
    )
    band3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & qty.between(20, 30)
    )
    df = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(band1 | band2 | band3)
        .agg(
            (
                exact_long_sum(pi * (1000 - di)).cast("double") / 100000.0
            ).alias("revenue")
        )
    )
    return shape(df, Q19_SPEC)


Q19_SQL = sql_select(
    Q19_SPEC,
    f"""(
    SELECT CAST(SUM({_SQL_PI} * (1000 - CAST(ROUND(l_discount * 1000) AS BIGINT)))
           AS DOUBLE) / 100000.0 AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
) s""",
)


# ----------------------------------------------------------------- TPC-H Q22

Q22_SPEC = [
    ("c_nationkey", "long"),
    ("numcust", "long"),
    ("totacctbal", "f2"),
]


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (positive-balance
    average) + NOT EXISTS anti-join, grouped by nation. "Lapsed" means
    no order since 2000-01-01 (every fixture customer has SOME order, so
    the original no-orders-ever predicate would be vacuous).

    The `c_acctbal > avg(...)` float boundary is exact-integer:
    bal_cents * cnt > sum_cents.

    Plan at scale: the scalar aggregate is one tiny row cross-joined
    (broadcast) onto customer; the anti join keys on custkey against
    date-pruned orders — shuffle-hash under AQE, no nested loop; final
    agg is 25 nation groups."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(datetime.datetime(2000, 1, 1))
    )
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_cents).alias("sum_cents"), F.count("*").alias("cnt")
    )
    df = (
        cu.withColumn("bal_cents", bal_cents)
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("cnt") > F.col("sum_cents"))
        .join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(F.col("bal_cents")).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
    return shape(df, Q22_SPEC)


Q22_SQL = sql_select(
    Q22_SPEC,
    """(
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS totacctbal
    FROM customer
    CROSS JOIN (
        SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_cents,
               COUNT(*) AS cnt
        FROM customer WHERE c_acctbal > 0.0
    ) pos
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * cnt > sum_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
) s""",
)


# ------------------------------------------------------- exact percentiles

PCTL_SPEC = [
    ("event_type", ""),
    ("n", "long"),
    ("p25_centi", "f4"),
    ("median_centi", "f4"),
    ("p75_centi", "f4"),
]


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (quantile_cont semantics) of event
    value per type. Values are quantized to integer centi-units FIRST,
    and only quarter quantiles are used, so the interpolation fraction
    is an exact binary number and lower+(upper−lower)·d is bit-identical
    across engines.

    Plan at scale: exact percentile requires a per-group sort — Spark's
    `percentile` aggregates within partial aggs (OpenHashMap of counts)
    rather than materializing the sorted list per row; for 100 TB the
    approx path (`percentile_approx`, t-digest, mergeable) is the
    drop-in; this query pins the exact semantics."""
    ev = load_table(spark, sf_dir, "events")
    centi = F.round(F.col("value") * 100).cast("long")
    df = (
        ev.select("event_type", centi.alias("vc"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.percentile("vc", F.lit(0.25)).alias("p25_centi"),
            F.percentile("vc", F.lit(0.5)).alias("median_centi"),
            F.percentile("vc", F.lit(0.75)).alias("p75_centi"),
        )
        .orderBy("event_type")
    )
    return shape(df, PCTL_SPEC)


PCTL_SQL = sql_select(
    PCTL_SPEC,
    """(
    SELECT event_type, COUNT(*) AS n,
        quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.25) AS p25_centi,
        quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS median_centi,
        quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.75) AS p75_centi
    FROM events
    GROUP BY event_type
    ORDER BY event_type
) s""",
)


SUBQUERIES: dict[str, QuerySpec] = {
    "tpch_q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL),
    "tpch_q13_customer_distribution": QuerySpec(
        q13_customer_distribution, Q13_SQL
    ),
    "tpch_q17_small_quantity_revenue": QuerySpec(
        q17_small_quantity_revenue, Q17_SQL
    ),
    "tpch_q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_SQL),
    "tpch_q22_global_sales_opportunity": QuerySpec(
        q22_global_sales_opportunity, Q22_SQL
    ),
    "event_value_percentiles": QuerySpec(event_value_percentiles, PCTL_SQL),
}
