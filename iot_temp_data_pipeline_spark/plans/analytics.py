"""Analytic-surface breadth: ROLLUP hierarchies, the full ranking
window-function family, INTERSECT/EXCEPT set ops, pivot (conditional
aggregation), and HyperLogLog approximate distinct — the remaining
general-purpose analytics constructs a user switching from a SQL
warehouse to this engine expects, each oracle-checked.

Scale stance: ROLLUP/pivot are single-shuffle grouped aggregations
(ROLLUP expands grouping sets in one pass, pivot is conditional
aggregation — never N separate scans); the window suite is one
hash-partition + sort per window spec; INTERSECT/EXCEPT compile to
left-semi/anti hash joins over distinct inputs; HLL is a mergeable
fixed-size sketch — the only distinct-count that works at 100 TB
without a full shuffle of the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stats import exact_long_sum

from ..sources.catalog import load_table
from .registry import QuerySpec, shape, sql_select

_DEC = "decimal(38,0)"
_SQL_PI = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"


# ------------------------------------------------------------- time ROLLUP

ROLLUP_SPEC = [
    ("order_year", "long"),
    ("order_month", "long"),
    ("grouping_level", "long"),
    ("n_orders", "long"),
    ("revenue", "f2"),
]


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year→month ROLLUP of order revenue (the hypertable-style time
    hierarchy: month rows, year subtotals, grand total — one pass).

    GROUPING_ID disambiguates NULL-as-subtotal from NULL data, exactly
    as the GROUPING() function does in ANSI SQL."""
    od = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    df = (
        od.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            cents.alias("cents"),
        )
        .rollup("order_year", "order_month")
        .agg(
            F.grouping_id().alias("grouping_level"),
            F.count("*").alias("n_orders"),
            (exact_long_sum(F.col("cents")).cast("double") / 100.0).alias(
                "revenue"
            ),
        )
    )
    return shape(df, ROLLUP_SPEC)


ROLLUP_SQL = sql_select(
    ROLLUP_SPEC,
    """(
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
        EXTRACT(MONTH FROM o_orderdate) AS order_month,
        GROUPING(order_year) * 2 + GROUPING(order_month) AS grouping_level,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
            AS revenue
    FROM orders
    GROUP BY ROLLUP (order_year, order_month)
) s""",
)


# ------------------------------------------------------ window-fn suite

WINSUITE_SPEC = [
    ("c_custkey", "long"),
    ("o_orderkey", "long"),
    ("order_seq", "long"),
    ("spend_rank", "long"),
    ("spend_dense_rank", "long"),
    ("spend_quartile", "long"),
    ("spend_pct_rank", "f4"),
    ("spend_cume_dist", "f4"),
    ("prev_price_cents", "long"),
    ("next_price_cents", "long"),
    ("first_price_cents", "long"),
    ("running_spend_cents", "long"),
]


def customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/navigation window family over each customer's
    order history in ONE window spec (one shuffle on custkey, one sort):
    row_number, rank, dense_rank, ntile, percent_rank, cume_dist,
    lag, lead, first_value, and a running sum with an explicit ROWS
    frame. Ordering keys (price desc, orderkey) are total, so every
    function is deterministic."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = od.select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        cents.alias("price_cents"),
    )
    by_spend = (
        Window.partitionBy("c_custkey")
        .orderBy(F.col("price_cents").desc(), F.col("o_orderkey"))
    )
    running = by_spend.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = base.select(
        "c_custkey",
        "o_orderkey",
        F.row_number().over(by_spend).alias("order_seq"),
        F.rank().over(by_spend).alias("spend_rank"),
        F.dense_rank().over(by_spend).alias("spend_dense_rank"),
        F.ntile(4).over(by_spend).alias("spend_quartile"),
        F.percent_rank().over(by_spend).alias("spend_pct_rank"),
        F.cume_dist().over(by_spend).alias("spend_cume_dist"),
        F.lag("price_cents").over(by_spend).alias("prev_price_cents"),
        F.lead("price_cents").over(by_spend).alias("next_price_cents"),
        F.first("price_cents").over(by_spend).alias("first_price_cents"),
        F.sum("price_cents").over(running).alias("running_spend_cents"),
    )
    return shape(df, WINSUITE_SPEC)


WINSUITE_SQL = sql_select(
    WINSUITE_SPEC,
    """(
    SELECT o_custkey AS c_custkey, o_orderkey,
        row_number() OVER w AS order_seq,
        rank() OVER w AS spend_rank,
        dense_rank() OVER w AS spend_dense_rank,
        ntile(4) OVER w AS spend_quartile,
        percent_rank() OVER w AS spend_pct_rank,
        cume_dist() OVER w AS spend_cume_dist,
        lag(price_cents) OVER w AS prev_price_cents,
        lead(price_cents) OVER w AS next_price_cents,
        first_value(price_cents) OVER w AS first_price_cents,
        sum(price_cents) OVER (PARTITION BY o_custkey
            ORDER BY price_cents DESC, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS running_spend_cents
    FROM (
        SELECT o_custkey, o_orderkey,
            CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders WHERE o_custkey % 10 = 0
    ) b
    WINDOW w AS (PARTITION BY o_custkey ORDER BY price_cents DESC, o_orderkey)
) s""",
)


# ------------------------------------------------- INTERSECT / EXCEPT

SETOPS_SPEC = [
    ("op", ""),
    ("p_partkey", "long"),
]


def part_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics) between the parts
    shipped early in the window and parts shipped late — stacked into
    one result tagged by op. Compiles to left-semi / left-anti hash
    joins over pre-distincted inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    early = li.filter(F.col("l_shipdate") < F.lit("1996-01-01")).select("l_partkey")
    late = li.filter(F.col("l_shipdate") >= F.lit("2001-01-01")).select("l_partkey")
    both = early.intersect(late).select(
        F.lit("both_eras").alias("op"), F.col("l_partkey").alias("p_partkey")
    )
    only_early = early.subtract(late).select(
        F.lit("early_only").alias("op"), F.col("l_partkey").alias("p_partkey")
    )
    return shape(both.unionByName(only_early), SETOPS_SPEC)


SETOPS_SQL = sql_select(
    SETOPS_SPEC,
    """(
    SELECT 'both_eras' AS op, p_partkey FROM (
        SELECT l_partkey AS p_partkey FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT l_partkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    ) a
    UNION ALL
    SELECT 'early_only' AS op, p_partkey FROM (
        SELECT l_partkey AS p_partkey FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT l_partkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    ) b
) s""",
)


# ----------------------------------------------------------------- pivot

PIVOT_SPEC = [
    ("c_nationkey", "long"),
    ("URGENT", "f2"),
    ("HIGH", "f2"),
    ("MEDIUM", "f2"),
    ("NOT_SPECIFIED", "f2"),
    ("LOW", "f2"),
]

_PRIORITIES = {
    "1-URGENT": "URGENT",
    "2-HIGH": "HIGH",
    "3-MEDIUM": "MEDIUM",
    "4-NOT SPECIFIED": "NOT_SPECIFIED",
    "5-LOW": "LOW",
}


def nation_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation pivoted on order priority. `pivot()` with an
    EXPLICIT value list compiles to conditional aggregation in a single
    grouped pass — one scan, one shuffle (an implicit list would add a
    distinct-values job first; always pin the list at scale)."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    df = (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .select("c_nationkey", "o_orderpriority", cents.alias("cents"))
        .groupBy("c_nationkey")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .agg(exact_long_sum(F.col("cents")))
    )
    for raw, clean in _PRIORITIES.items():
        df = df.withColumn(
            clean, (F.col(f"`{raw}`").cast("double") / 100.0)
        )
    return shape(df, PIVOT_SPEC)


_PIVOT_COLS = ",\n        ".join(
    f"CAST(SUM(CASE WHEN o_orderpriority = '{raw}' THEN "
    f"CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 "
    f"AS {clean}"
    for raw, clean in _PRIORITIES.items()
)

PIVOT_SQL = sql_select(
    PIVOT_SPEC,
    f"""(
    SELECT c_nationkey,
        {_PIVOT_COLS}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
) s""",
)


# ------------------------------------------------------------------ unpivot

UNPIVOT_SPEC = [
    ("c_nationkey", "long"),
    ("priority", ""),
    ("revenue", "f2"),
]


def nation_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of the pivot: melt the 5 priority revenue columns
    back to (nation, priority, revenue) rows with the native
    `unpivot()` (Expand — one pass, rows x 5, no shuffle beyond the
    pivot's own; NULL cells are dropped to mirror relational UNPIVOT
    semantics)."""
    wide = nation_priority_pivot(spark, sf_dir)
    df = (
        wide.unpivot(
            ["c_nationkey"],
            [clean for clean in _PRIORITIES.values()],
            "priority",
            "revenue",
        )
        .filter(F.col("revenue").isNotNull())
        .orderBy("c_nationkey", "priority")
    )
    return shape(df, UNPIVOT_SPEC)


_UNPIVOT_ARMS = " UNION ALL ".join(
    f"SELECT c_nationkey, '{clean}' AS priority, {clean} AS revenue FROM wide"
    for clean in _PRIORITIES.values()
)

UNPIVOT_SQL = sql_select(
    UNPIVOT_SPEC,
    f"""(
    WITH wide AS (
        SELECT c_nationkey,
            {_PIVOT_COLS}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    )
    SELECT c_nationkey, priority, revenue
    FROM ({_UNPIVOT_ARMS}) u
    WHERE revenue IS NOT NULL
    ORDER BY c_nationkey, priority
) s""",
)


# --------------------------------------------------------------------- CUBE

CUBE_SPEC = [
    ("c_mktsegment", ""),
    ("o_orderpriority", ""),
    ("grouping_level", "long"),
    ("n_orders", "long"),
    ("revenue", "f2"),
]


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (market segment, order priority): all four grouping
    combinations — detail, two marginals, grand total — in ONE Expand
    pass (rows x 4 before partial aggregation), vs four separate scans.
    Complements the ROLLUP hierarchy query; GROUPING_ID separates
    subtotal NULLs from data NULLs."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    df = (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .select("c_mktsegment", "o_orderpriority", cents.alias("cents"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().alias("grouping_level"),
            F.count("*").alias("n_orders"),
            (exact_long_sum(F.col("cents")).cast("double") / 100.0).alias(
                "revenue"
            ),
        )
    )
    return shape(df, CUBE_SPEC)


CUBE_SQL = sql_select(
    CUBE_SPEC,
    """(
    SELECT c_mktsegment, o_orderpriority,
        GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority)
            AS grouping_level,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
            AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
) s""",
)


# ------------------------------------------------------- HLL approx distinct

HLL_SPEC = [
    ("event_type", ""),
    ("exact_users", "long"),
    ("hll_within_2pct", ""),
]


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs HyperLogLog++ distinct users per event type. The raw
    sketch estimate is engine-specific (Spark's HLL++ gives 151 on 150
    true distinct at rsd=1%), so what the oracle pins is the exact count
    plus a 2%-relative-error bound on the estimate — asserted TRUE on
    the oracle side. At 100 TB the sketch is the only viable
    distinct-count: fixed memory, mergeable across partitions (partial
    aggregation), no key-space shuffle."""
    ev = load_table(spark, sf_dir, "events")
    df = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        )
        .withColumn(
            "hll_within_2pct",
            F.abs(F.col("approx_users") - F.col("exact_users")) * 50
            <= F.col("exact_users"),
        )
        .orderBy("event_type")
    )
    return shape(df, HLL_SPEC)


HLL_SQL = sql_select(
    HLL_SPEC,
    """(
    SELECT event_type,
        COUNT(DISTINCT user_id) AS exact_users,
        TRUE AS hll_within_2pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
) s""",
)


# ----------------------------------------- approx percentile (scale path)

APCTL_SPEC = [
    ("event_type", ""),
    ("exact_median_centi", "f4"),
    ("approx_within_5pct", ""),
]


def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs approximate median per event type. `percentile_approx`
    (Greenwald-Khanna-style mergeable summary, accuracy=1000) is the
    100 TB path — fixed memory, partial-aggregatable — while the exact
    percentile needs all values per group. As with the HLL entry, the
    estimate is engine-specific, so the oracle pins a relative-error
    bound asserted TRUE."""
    ev = load_table(spark, sf_dir, "events")
    centi = F.round(F.col("value") * 100).cast("long")
    df = (
        ev.select("event_type", centi.alias("vc"))
        .groupBy("event_type")
        .agg(
            F.percentile("vc", F.lit(0.5)).alias("exact_median_centi"),
            F.percentile_approx("vc", F.lit(0.5), F.lit(1000)).alias("approx"),
        )
        .withColumn(
            "approx_within_5pct",
            F.abs(F.col("approx") - F.col("exact_median_centi")) * 20
            <= F.abs(F.col("exact_median_centi")),
        )
        .orderBy("event_type")
    )
    return shape(df, APCTL_SPEC)


APCTL_SQL = sql_select(
    APCTL_SPEC,
    """(
    SELECT event_type,
        quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5)
            AS exact_median_centi,
        TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
) s""",
)


# ------------------------------------------------------- funnel analysis

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_MIN = 1440  # next stage must follow within 24 h

FUNNEL_SPEC = [
    ("stage", ""),
    ("stage_idx", "long"),
    ("n_users", "long"),
]


def funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users counted at stage k iff their
    FIRST stage-k event strictly follows their entry into stage k-1
    within a 24-hour conversion window — the sequential-milestone
    semantics (a purchase before any click does not convert, and a
    purchase hours later does not count as converting from it). One conditional aggregate per stage keyed by
    user_id; each pass is a partial-aggregatable min, and the per-user
    milestone frame is ~|users| rows joined with the (pre-filtered)
    event scan — no windows, no self-join explosion at scale.

    The reference has no funnel surface; this extends the events
    analytics family (SURVEY.md §2 extension block).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stage0 = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    frames = [stage0]
    prev = stage0
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=1):
        nxt = (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(f"t{i - 1}"))
                & (
                    F.col("ts")
                    <= F.col(f"t{i - 1}") + F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        frames.append(nxt)
        prev = nxt
    rows = [
        f.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"),
            F.lit(i).cast("long").alias("stage_idx"),
            "n_users",
        )
        for i, (stage, f) in enumerate(zip(FUNNEL_STAGES, frames))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return shape(out.orderBy("stage_idx"), FUNNEL_SPEC)


FUNNEL_SQL = sql_select(
    FUNNEL_SPEC,
    f"""(
    WITH f0 AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
    ),
    f1 AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN f0 ON e.user_id = f0.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > f0.t0
          AND e.ts <= f0.t0 + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
        GROUP BY e.user_id
    ),
    f2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN f1 ON e.user_id = f1.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > f1.t1
          AND e.ts <= f1.t1 + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
        GROUP BY e.user_id
    )
    SELECT '{FUNNEL_STAGES[0]}' AS stage, 0 AS stage_idx,
           (SELECT COUNT(*) FROM f0) AS n_users
    UNION ALL
    SELECT '{FUNNEL_STAGES[1]}', 1, (SELECT COUNT(*) FROM f1)
    UNION ALL
    SELECT '{FUNNEL_STAGES[2]}', 2, (SELECT COUNT(*) FROM f2)
    ORDER BY stage_idx
) fu""",
)


ANALYTICS: dict[str, QuerySpec] = {
    "funnel_ordered_stages": QuerySpec(funnel_ordered, FUNNEL_SQL),
    "approx_percentile_check": QuerySpec(approx_percentile_check, APCTL_SQL),
    "revenue_rollup": QuerySpec(revenue_rollup, ROLLUP_SQL),
    "revenue_cube": QuerySpec(revenue_cube, CUBE_SQL),
    "nation_priority_unpivot": QuerySpec(nation_priority_unpivot, UNPIVOT_SQL),
    "customer_order_windows": QuerySpec(customer_order_windows, WINSUITE_SQL),
    "part_setops": QuerySpec(part_setops, SETOPS_SQL),
    "nation_priority_pivot": QuerySpec(nation_priority_pivot, PIVOT_SQL),
    "approx_distinct_users": QuerySpec(approx_distinct_users, HLL_SQL),
}


# ----------------------------------------------------- column profiling

PROFILE_SPEC = [
    ("col_name", ""),
    ("n_rows", "long"),
    ("n_nulls", "long"),
    ("n_distinct", "long"),
    ("min_repr", ""),
    ("max_repr", ""),
]

# (name, value-expr producing a cross-engine-stable VARCHAR repr)
_PROFILE_COLS = (
    ("event_id", "CAST(event_id AS VARCHAR)"),
    ("user_id", "CAST(user_id AS VARCHAR)"),
    ("event_type", "event_type"),
    ("ts", "strftime(ts, '%Y-%m-%d %H:%M:%S')"),
    # doubles never stringify raw (engine-dependent formatting):
    # profile the exact centi-int representation instead
    ("value_centi", "CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)"),
)


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the events table — row count,
    null count, exact distinct count, min/max — ONE scan for all
    columns (the aggregates compute side by side in a single
    aggregation; the wide 1-row result melts to one row per column
    with stack()). String reprs are normalized per column so both
    engines print identically (timestamps via a fixed format, doubles
    via their exact centi-integer).

    At 100 TB exact countDistinct per column is the expensive choice —
    the approx_distinct_users query carries the HLL alternative; a
    profiler would flip to approx per column. Exact here because the
    oracle proves the melt plumbing bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("user_id").cast("string").alias("user_id"),
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(F.col("value") * 100).cast("long").cast("string").alias("value_centi"),
    )
    aggs = []
    for name, _ in _PROFILE_COLS:
        aggs += [
            F.count(name).alias(f"{name}_nn"),
            F.countDistinct(name).alias(f"{name}_nd"),
            F.min(name).alias(f"{name}_mn"),
            F.max(name).alias(f"{name}_mx"),
        ]
    wide = b.agg(F.count("*").alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{name}', {name}_nn, {name}_nd, {name}_mn, {name}_mx"
        for name, _ in _PROFILE_COLS
    )
    df = wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, nn, n_distinct, min_repr, max_repr)",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("nn")).alias("n_nulls"),
        "n_distinct",
        "min_repr",
        "max_repr",
    )
    return shape(df, PROFILE_SPEC)


_PROFILE_SQL_BRANCHES = "\n    UNION ALL\n".join(
    f"""    SELECT '{name}' AS col_name, COUNT(*) AS n_rows,
        COUNT(*) - COUNT({expr}) AS n_nulls,
        COUNT(DISTINCT {expr}) AS n_distinct,
        MIN({expr}) AS min_repr, MAX({expr}) AS max_repr
    FROM events"""
    for name, expr in _PROFILE_COLS
)

PROFILE_SQL = sql_select(PROFILE_SPEC, f"(\n{_PROFILE_SQL_BRANCHES}\n) prof")

ANALYTICS["profile_events_columns"] = QuerySpec(profile_events, PROFILE_SQL)


# ------------------------------------- drift / winsorize / skew profile

DRIFT_SPEC = [
    ("event_type", ""),
    ("n_ref", "long"),
    ("n_cur", "long"),
    ("n_bins", "long"),
    ("chi2_ppm", "long"),
]


def _value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profiling as pf

    return shape(pf.value_drift_chi2(load_table(spark, sf_dir, "events")), DRIFT_SPEC)


def _drift_oracle() -> str:
    from ..operators import profiling as pf

    return sql_select(DRIFT_SPEC, pf.value_drift_chi2_sql("events"))


ANALYTICS["drift_value_chi2"] = QuerySpec(_value_drift, _drift_oracle())

WINSOR_SPEC = [
    ("event_type", ""),
    ("n", "long"),
    ("lo_cents", "long"),
    ("hi_cents", "long"),
    ("clipped_lo", "long"),
    ("clipped_hi", "long"),
    ("sum_cents_winsorized", "long"),
]


def _winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profiling as pf

    return shape(pf.winsorize_values(load_table(spark, sf_dir, "events")), WINSOR_SPEC)


def _winsor_oracle() -> str:
    from ..operators import profiling as pf

    return sql_select(WINSOR_SPEC, pf.winsorize_values_sql("events"))


ANALYTICS["winsorize_event_values"] = QuerySpec(_winsorize, _winsor_oracle())

SKEW_SPEC = [
    ("event_type", ""),
    ("n_rows", "long"),
    ("n_keys", "long"),
    ("max_key_rows", "long"),
    ("top1_permille", "long"),
    ("topn_permille", "long"),
]


def _key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profiling as pf

    return shape(
        pf.key_skew_diagnostics(load_table(spark, sf_dir, "events")), SKEW_SPEC
    )


def _skew_oracle() -> str:
    from ..operators import profiling as pf

    return sql_select(SKEW_SPEC, pf.key_skew_diagnostics_sql("events"))


ANALYTICS["skew_key_diagnostics"] = QuerySpec(_key_skew, _skew_oracle())

EMB_DRIFT_SPEC = [
    ("label", "long"),
    ("n_first", "long"),
    ("n_second", "long"),
    ("drift_q2", "long"),
]


def _embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profiling as pf

    return shape(
        pf.embedding_drift(load_table(spark, sf_dir, "embeddings")), EMB_DRIFT_SPEC
    )


def _emb_drift_oracle() -> str:
    from ..operators import profiling as pf

    return sql_select(EMB_DRIFT_SPEC, pf.embedding_drift_sql("embeddings"))


ANALYTICS["drift_embedding_centroids"] = QuerySpec(
    _embedding_drift, _emb_drift_oracle()
)
