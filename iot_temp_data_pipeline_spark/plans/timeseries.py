"""Time-series analytics over the events stream table: grouped OLS
trend/correlation from moment sums, and grid resampling with forward
fill — the operations a hypertable/timeseries engine exposes natively
(the reference's time handling stops at bucketed dimensions,
`models/marts/mart_temperature_readings.sql:81-86`; these are their
scale-native generalizations).

Both are single-pass, partial-aggregatable designs:
- trend: five integer moment sums per group (no window, no per-group
  collect) combined into slope/intercept/r once per group.
- resample: the hour grid is generated with `sequence()` (no driver
  loop), the per-hour sample is an aggregate, and the forward fill is
  a per-key ordered window (`last ignorenulls`) — partition-local sort,
  never a global one.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stats import exact_long_sum

from ..sources.catalog import load_table
from .registry import QuerySpec, shape, sql_select

_DEC = "decimal(38,0)"
_EPOCH = datetime.datetime(2024, 1, 1)


# ---------------------------------------------- grouped regression / corr

TREND_SPEC = [
    ("event_type", ""),
    ("n", "long"),
    ("slope_centi_per_day", "f4"),
    ("intercept_centi", "f4"),
    ("corr_xy", "f4"),
]


def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend + Pearson correlation of value vs time from
    five exact-integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the
    formulation every distributed engine uses because it is
    partial-aggregatable: one pass, one tiny shuffle. x = integer
    minutes since 2024-01-01, y = centi-value; the sums stay exact
    (int64 per row, decimal(38,0)/int128 accumulation), and the
    double divisions happen once per group with mirrored expression
    trees on both engines (native regr_slope/corr accumulate doubles
    incrementally and would drift). Slope reported per day."""
    ev = load_table(spark, sf_dir, "events")
    x = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lit(_EPOCH)))
        / F.lit(60_000_000)
    ).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    g = (
        ev.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            exact_long_sum(F.col("x")).alias("sx"),
            exact_long_sum(F.col("y")).alias("sy"),
            exact_long_sum(F.col("x") * F.col("y")).alias("sxy"),
            exact_long_sum(F.col("x") * F.col("x")).alias("sxx"),
            exact_long_sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den
    df = (
        g.select(
            "event_type",
            "n",
            (slope * 1440.0).alias("slope_centi_per_day"),
            (
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double")
            ).alias("intercept_centi"),
            (num / F.sqrt(den) / F.sqrt(deny)).alias("corr_xy"),
        )
        .orderBy("event_type")
    )
    return shape(df, TREND_SPEC)


TREND_SQL = sql_select(
    TREND_SPEC,
    """(
    WITH m AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM (
            SELECT event_type,
                   CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')
                        AS BIGINT) // 60000000 AS x,
                   CAST(ROUND(value * 100) AS BIGINT) AS y
            FROM events
        ) t
        GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1440.0
               AS slope_centi_per_day,
           (CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_centi,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
             / SQRT(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
    FROM m
    ORDER BY event_type
) s""",
)


# ------------------------------------------------- resample + forward fill

GRID_START = datetime.datetime(2024, 1, 1)
GRID_END = datetime.datetime(2024, 1, 30, 23)

RESAMPLE_SPEC = [
    ("event_type", ""),
    ("hour", ""),
    ("sampled_centi", "long"),
    ("filled_centi", "long"),
]


def resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the event stream onto an hourly grid per event type:
    sample = MAX(centi-value) within the hour (deterministic under
    timestamp ties), empty hours forward-fill from the last observed
    hour; leading gaps before the first observation stay NULL.

    Scale stance: the grid is `sequence()`-generated per key (no driver
    loop, no collect) — grid size = keys x hours, independent of event
    count; the hourly sample is one partial-aggregatable shuffle; the
    fill window partitions by key and sorts only within partitions. At
    100 TB the grid join stays a broadcast of hours x per-key rows."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.max(F.round(F.col("value") * 100).cast("long")).alias("sampled_centi"))
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(GRID_START), F.lit(GRID_END), F.expr("INTERVAL 1 HOUR")
                )
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = (
        grid.join(hourly, ["event_type", "hour"], "left")
        .withColumn("filled_centi", F.last("sampled_centi", ignorenulls=True).over(w))
        .orderBy("event_type", "hour")
    )
    return shape(df, RESAMPLE_SPEC)


RESAMPLE_SQL = sql_select(
    RESAMPLE_SPEC,
    """(
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               MAX(CAST(ROUND(value * 100) AS BIGINT)) AS sampled_centi
        FROM events
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, h.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT UNNEST(generate_series(
                TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30 23:00:00',
                INTERVAL 1 HOUR)) AS hour
        ) h
    )
    SELECT g.event_type, g.hour, hv.sampled_centi,
           LAST_VALUE(hv.sampled_centi IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_centi
    FROM grid g
    LEFT JOIN hourly hv ON g.event_type = hv.event_type AND g.hour = hv.hour
    ORDER BY g.event_type, g.hour
) s""",
)


TIMESERIES: dict[str, QuerySpec] = {
    "value_trend_by_type": QuerySpec(value_trend_by_type, TREND_SQL),
    "events_resample_hourly_ffill": QuerySpec(resample_hourly_ffill, RESAMPLE_SQL),
}


# ------------------------------------------------------- SCD2 history build

SCD2_SPEC = [
    ("user_id", "long"),
    ("state", ""),
    ("valid_from_us", "long"),
    ("valid_to_us", "long"),
    ("is_current", ""),
]


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change stream: collapse
    consecutive events with the same tracked state per user, then close
    each run with the next change's timestamp — (valid_from, valid_to]
    intervals, NULL valid_to marking the current row. This is dbt's
    snapshot materialization (the reference's stack supports it but its
    models never use it) built from two window passes.

    Scale stance: both windows partition by user_id and sort within the
    partition only — one shuffle total (the second window reuses the
    first's partitioning); no self-join, no driver state. Ordering is
    total via the (ts, event_id) tie-break, so runs are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_id", "ts", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(
            F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = (
        changes.withColumn("next_ts", F.lead("ts").over(w2))
        .select(
            "user_id",
            "state",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros("next_ts").alias("valid_to_us"),
            F.col("next_ts").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )
    return shape(df, SCD2_SPEC)


SCD2_SQL = sql_select(
    SCD2_SPEC,
    """(
    WITH changes AS (
        SELECT user_id, event_id, ts, event_type AS state
        FROM (
            SELECT *, LAG(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) AS prev_state
            FROM events
        ) t
        WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
        epoch_us(ts) AS valid_from_us,
        epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            AS valid_to_us,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            AS is_current
    FROM changes
    ORDER BY user_id, valid_from_us
) s""",
)


TIMESERIES["scd2_user_history"] = QuerySpec(scd2_user_history, SCD2_SQL)


# ----------------------------------------- continuous aggregate (rollup)

ROLLUP_CUTOFF = "2024-01-21"  # "already materialized" vs "newly arrived"

CAGG_SPEC = [
    ("event_date", "str"),
    ("event_type", ""),
    ("n", "long"),
    ("sum_centi", "long"),
    ("min_centi", "long"),
    ("max_centi", "long"),
    # avg is UNROUNDED: both engines derive it from the same exact
    # integers with the same two divisions, so the doubles are
    # bit-identical — while ROUND(x, 4) on a boundary half (e.g.
    # 30703/800 = 38.37875) goes HALF_UP in Spark's BigDecimal path but
    # down in DuckDB's binary-double path. Exact beats rounded here.
    ("avg_value", ""),
]


def continuous_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate, maintained INCREMENTALLY:
    the per-(day, type) rollup state for days before ROLLUP_CUTOFF is
    "already materialized" (computed as a separate partial-state frame,
    as a nightly job would have left it), the newly-arrived tail is
    aggregated on its own, and the two partial states MERGE by
    re-aggregation — sums add, counts add, mins/maxes fold, and avg is
    derived from merged sum/count at the end. Every aggregate carried in
    the state is decomposable/mergeable, which is the property that lets
    a 100 TB rollup refresh touch only new partitions instead of
    rescanning history (the dbt full-refresh anti-pattern the reference
    runs — `airflow/dags/iot_temperature_dag.py:238` — replaced by its
    incremental equivalent).

    The merge path is exact (integer sums), so the oracle — a plain
    one-shot GROUP BY over all days — must match bit-for-bit: the check
    proves incremental maintenance loses nothing.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("centi"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_date", "event_type").agg(
            F.count("*").alias("n"),
            F.sum("centi").alias("sum_centi"),
            F.min("centi").alias("min_centi"),
            F.max("centi").alias("max_centi"),
        )

    history = partial(base.filter(F.col("event_date") < ROLLUP_CUTOFF))
    fresh = partial(base.filter(F.col("event_date") >= ROLLUP_CUTOFF))
    merged = (
        history.unionByName(fresh)
        .groupBy("event_date", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_centi").alias("sum_centi"),
            F.min("min_centi").alias("min_centi"),
            F.max("max_centi").alias("max_centi"),
        )
        .withColumn(
            "avg_value",
            F.col("sum_centi").cast("double")
            / 100.0
            / F.col("n").cast("double"),
        )
    )
    return shape(merged, CAGG_SPEC)


CAGG_SQL = sql_select(
    CAGG_SPEC,
    """(
    SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
        COUNT(*) AS n,
        SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_centi,
        MIN(CAST(ROUND(value * 100) AS BIGINT)) AS min_centi,
        MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_centi,
        CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
            / CAST(COUNT(*) AS DOUBLE) AS avg_value
    FROM events
    GROUP BY 1, 2
) cagg""",
)

TIMESERIES["continuous_daily_rollup"] = QuerySpec(continuous_daily_rollup, CAGG_SQL)


# ------------------------------------------- time-RANGE moving aggregate

MOVAVG_SPEC = [
    ("event_id", "long"),
    ("event_type", ""),
    ("ts_s", "long"),
    ("n_7d", "long"),
    ("sum_centi_7d", "long"),
    ("avg_7d", ""),
]

MOVAVG_WINDOW_S = 7 * 86400  # trailing 7 days, inclusive


def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day moving aggregate per event type — a RANGE frame
    over event-time seconds (`rangeBetween`), the window feature the
    ROWS-frame suite can't express: each row aggregates every event of
    its type in [ts−7d, ts] regardless of row count. One shuffle on
    event_type + one sort; the frame slides without re-scanning (the
    engine maintains it incrementally). avg is unrounded — exact
    integer sum/count through identical division on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        # integer div, not double-div + cast: double division rounds
        # differently than DuckDB's cast on half-second values
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("centi"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_s")
        .rangeBetween(-MOVAVG_WINDOW_S, 0)
    )
    return shape(
        base.select(
            "event_id",
            "event_type",
            "ts_s",
            F.count("*").over(w).alias("n_7d"),
            F.sum("centi").over(w).alias("sum_centi_7d"),
            (
                F.sum("centi").over(w).cast("double")
                / 100.0
                / F.count("*").over(w).cast("double")
            ).alias("avg_7d"),
        ),
        MOVAVG_SPEC,
    )


MOVAVG_SQL = sql_select(
    MOVAVG_SPEC,
    f"""(
    SELECT event_id, event_type, ts_s,
        COUNT(*) OVER w AS n_7d,
        SUM(centi) OVER w AS sum_centi_7d,
        CAST(SUM(centi) OVER w AS DOUBLE) / 100.0
            / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_7d
    FROM (
        SELECT event_id, event_type,
            epoch_us(ts) // 1000000 AS ts_s,
            CAST(ROUND(value * 100) AS BIGINT) AS centi
        FROM events
    ) b
    WINDOW w AS (PARTITION BY event_type ORDER BY ts_s
                 RANGE BETWEEN {MOVAVG_WINDOW_S} PRECEDING AND CURRENT ROW)
) mv""",
)

TIMESERIES["events_moving_avg_7d"] = QuerySpec(moving_avg_7d, MOVAVG_SQL)


# ------------------------------------------- interval coalescing (islands)

INTERVAL_PAD_S = 30

MERGED_INTERVALS_SPEC = [
    ("user_id", "long"),
    ("island", "long"),
    ("start_s", "long"),
    ("end_s", "long"),
    ("n_events", "long"),
]


def merge_error_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing: each error event opens a
    ±30 s incident window; overlapping windows per user MERGE into one
    incident (the canonical alerting/maintenance-window primitive, and
    the same shape as merging duplicate-span excision ranges in a
    corpus). A row starts a new island iff its start exceeds the
    running MAX of all previous ends — the strictly-ordered prefix max
    handles nested intervals that a lag(end) formulation gets wrong.

    Scale shape: ONE per-user window (partition-local sort; users are
    many and small) then a hash aggregate on (user, island) — no
    self-join, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    s = F.expr("div(unix_micros(ts), 1000000)")
    ivals = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").cast("long").alias("user_id"),
        (s - INTERVAL_PAD_S).alias("start_s"),
        (s + INTERVAL_PAD_S).alias("end_s"),
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "end_s")
    prev_max_end = F.max("end_s").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ivals.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("start_s") > prev_max_end), 1
        )
        .otherwise(0)
        .cast("long"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    df = (
        islands.groupBy("user_id", "island")
        .agg(
            F.min("start_s").alias("start_s"),
            F.max("end_s").alias("end_s"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "island")
    )
    return shape(df, MERGED_INTERVALS_SPEC)


MERGED_INTERVALS_SQL = sql_select(
    MERGED_INTERVALS_SPEC,
    f"""(
    WITH mi_ivals AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
            epoch_us(ts) // 1000000 - {INTERVAL_PAD_S} AS start_s,
            epoch_us(ts) // 1000000 + {INTERVAL_PAD_S} AS end_s
        FROM events WHERE event_type = 'error'
    ),
    mi_flagged AS (
        SELECT user_id, start_s, end_s,
            CASE WHEN MAX(end_s) OVER (
                    PARTITION BY user_id ORDER BY start_s, end_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) IS NULL
                 OR start_s > MAX(end_s) OVER (
                    PARTITION BY user_id ORDER BY start_s, end_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 )
            THEN 1 ELSE 0 END AS new_island
        FROM mi_ivals
    ),
    mi_islands AS (
        SELECT user_id, start_s, end_s,
            SUM(new_island) OVER (
                PARTITION BY user_id ORDER BY start_s, end_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS island
        FROM mi_flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
        MIN(start_s) AS start_s, MAX(end_s) AS end_s,
        COUNT(*) AS n_events
    FROM mi_islands
    GROUP BY user_id, island
    ORDER BY user_id, island
) mi""",
)

TIMESERIES["merge_error_intervals"] = QuerySpec(
    merge_error_intervals, MERGED_INTERVALS_SQL
)


# ------------------------------------------------ time-weighted average

TWA_SPEC = [
    ("event_type", ""),
    ("n_events", "long"),
    ("span_s", "long"),
    ("twa_milli", "long"),
]


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULARLY sampled events (the
    hypertable `time_weight` primitive, last-observation-carried-forward
    integration): each reading holds its value until the next reading,
    so the average weights every value by its holding duration instead
    of letting burst periods dominate (what plain avg() gets wrong on
    irregular telemetry).

    Exact integer form: value in milli-units × holding seconds, summed
    as the integral numerator; one `lead` window per event_type
    (partition-local sort), one aggregate. Rows without a successor
    (each series' last) contribute no interval — the standard LOCF
    convention."""
    ev = load_table(spark, sf_dir, "events")
    s = F.expr("div(unix_micros(ts), 1000000)")
    vm = F.round(F.col("value") * 1000).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    rows = (
        ev.select("event_type", "ts", "event_id", s.alias("s"), vm.alias("vm"))
        .withColumn("next_s", F.lead("s").over(w))
        .withColumn("hold_s", F.col("next_s") - F.col("s"))
    )
    df = (
        rows.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("hold_s").alias("span_s"),
            F.expr("div(sum(vm * hold_s), sum(hold_s))").alias("twa_milli"),
        )
        .orderBy("event_type")
    )
    return shape(df, TWA_SPEC)


TWA_SQL = sql_select(
    TWA_SPEC,
    """(
    WITH twa_rows AS (
        SELECT event_type, vm,
            LEAD(s) OVER (PARTITION BY event_type ORDER BY ts, event_id) - s
                AS hold_s
        FROM (
            SELECT event_type, ts, event_id,
                epoch_us(ts) // 1000000 AS s,
                CAST(ROUND(value * 1000) AS BIGINT) AS vm
            FROM events
        )
    )
    SELECT event_type, COUNT(*) AS n_events,
        SUM(hold_s) AS span_s,
        SUM(vm * hold_s) // SUM(hold_s) AS twa_milli
    FROM twa_rows
    GROUP BY event_type
    ORDER BY event_type
) twa""",
)

TIMESERIES["time_weighted_avg"] = QuerySpec(time_weighted_avg, TWA_SQL)


# --------------------------------------------------- OHLC / M4 downsample

OHLC_SPEC = [
    ("event_type", ""),
    ("hour", "long"),
    ("open_milli", "long"),
    ("high_milli", "long"),
    ("low_milli", "long"),
    ("close_milli", "long"),
    ("n_events", "long"),
]


def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — simultaneously the M4
    visualization downsample (first/max/min/last per pixel bucket,
    the lossless-rendering aggregate) and the financial candlestick
    rollup. open/close are exact `min_by`/`max_by` on the total
    (ts, event_id) order, so ties are pinned; ONE map-side-combined
    aggregate, no window, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.round(F.col("value") * 1000).cast("long")
    # Total order within the hour: (microseconds, event_id) packed into
    # one decimal(38,0)/int128 key — a 10^12 multiplier leaves room for
    # any event_id below a trillion, so the key is collision-free even
    # when many events share a timestamp (a long-packed key was not:
    # id mod collisions would make min_by/max_by tie-ambiguous).
    okey = F.expr(
        "cast(unix_micros(ts) as decimal(38,0)) * 1000000000000 + event_id"
    )
    rows = ev.select(
        "event_type",
        F.expr("div(unix_micros(ts), 3600000000)").alias("hour"),
        vm.alias("vm"),
        okey.alias("okey"),
    )
    df = (
        rows.groupBy("event_type", "hour")
        .agg(
            F.min_by("vm", "okey").alias("open_milli"),
            F.max("vm").alias("high_milli"),
            F.min("vm").alias("low_milli"),
            F.max_by("vm", "okey").alias("close_milli"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "hour")
    )
    return shape(df, OHLC_SPEC)


OHLC_SQL = sql_select(
    OHLC_SPEC,
    """(
    SELECT event_type, hour,
        MIN_BY(vm, okey) AS open_milli,
        MAX(vm) AS high_milli,
        MIN(vm) AS low_milli,
        MAX_BY(vm, okey) AS close_milli,
        COUNT(*) AS n_events
    FROM (
        SELECT event_type,
            epoch_us(ts) // 3600000000 AS hour,
            CAST(ROUND(value * 1000) AS BIGINT) AS vm,
            epoch_us(ts)::HUGEINT * 1000000000000 + event_id AS okey
        FROM events
    )
    GROUP BY event_type, hour
    ORDER BY event_type, hour
) ohlc""",
)

TIMESERIES["events_ohlc_hourly"] = QuerySpec(events_ohlc_hourly, OHLC_SQL)
