"""DuckDB oracle SQL for the IoT pipeline chain.

One CTE chain mirrors the dbt model DAG byte-for-byte
(`stg_raw_temperature_readings` → `int_temperature_anomalies` →
`mart_temperature_readings` → summary CTEs); each oracle query is the
prelude plus a final SELECT. DuckDB only evaluates referenced CTEs, so
sharing the full prelude costs nothing.

Parity notes (SURVEY.md §2.9 / §7.4):
- temperature_celsius is DECIMAL(5,2)-validated then carried as DOUBLE
  (fixture temperatures are exactly 2-decimal, so the cast is lossless
  and Spark/DuckDB aggregates stay comparable).
- DuckDB `dayofweek` = Postgres `extract(dow)` (0=Sunday) — the Spark
  side subtracts 1 from `dayofweek()`.
- `extract(epoch from ts-ts)` → `epoch_us` arithmetic (keeps Postgres's
  fractional seconds; Spark side uses `unix_micros`).
- SUM over ints yields HUGEINT in DuckDB → every count/sum is CAST AS
  BIGINT by the shared column-spec layer (registry.py), matching Spark's
  LongType.
"""

from __future__ import annotations

from ..functions.stats import sql_exact_avg, sql_exact_stddev
from ..sources.readings import READINGS_SQL

_T_AVG = sql_exact_avg("temperature_celsius")
_T_STD = sql_exact_stddev("temperature_celsius")

_STAGING_SQL = """
staging AS (
    SELECT
        _dlt_id AS record_id,
        device_id,
        "timestamp" AS reading_timestamp,
        CASE WHEN temperature IS NOT NULL AND temperature BETWEEN -50 AND 100
             THEN CAST(CAST(temperature AS DECIMAL(5,2)) AS DOUBLE)
        END AS temperature_celsius,
        COALESCE(location, 'Unknown_Room') AS location,
        CASE WHEN location ILIKE '%_out%' OR location ILIKE '%outdoor%' THEN 'Outdoor'
             WHEN location ILIKE '%_in%' OR location ILIKE '%indoor%'
                  OR location ILIKE '%office%' THEN 'Indoor'
             ELSE 'Unknown'
        END AS environment_type,
        _dlt_load_id,
        _dlt_id
    FROM raw_readings
    WHERE _dlt_id IS NOT NULL
),
staged AS (
    SELECT *,
        CASE WHEN device_id IS NULL OR TRIM(device_id) = '' THEN FALSE
             WHEN reading_timestamp IS NULL THEN FALSE
             WHEN temperature_celsius IS NULL THEN FALSE
             ELSE TRUE
        END AS is_valid_record,
        ROUND(CAST(
            (CASE WHEN device_id IS NOT NULL AND TRIM(device_id) != '' THEN 0.4 ELSE 0 END)
          + (CASE WHEN reading_timestamp IS NOT NULL THEN 0.4 ELSE 0 END)
          + (CASE WHEN temperature_celsius IS NOT NULL THEN 0.2 ELSE 0 END)
        AS DOUBLE), 1) AS data_quality_score
    FROM staging
)
"""

_VALID_SQL = """
valid_readings AS (
    SELECT * FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY device_id, reading_timestamp
                ORDER BY _dlt_id DESC
            ) AS BIGINT) AS rn
        FROM staged
    ) t
    WHERE rn = 1 AND is_valid_record AND temperature_celsius IS NOT NULL
)
"""

# avg/stddev computed from exact integer sums (functions/stats.py) so the
# oracle's floats are bit-identical with Spark's — AVG/STDDEV over doubles
# are summation-order dependent and hit rounding-boundary halves.
_STATS_SQL = f"""
global_stats AS (
    SELECT
        {_T_AVG} AS global_mean_temp,
        {_T_STD} AS global_stddev_temp,
        COUNT(*) AS total_readings
    FROM valid_readings
),
device_stats AS (
    SELECT
        device_id,
        {_T_AVG} AS device_mean_temp,
        {_T_STD} AS device_stddev_temp,
        COUNT(*) AS device_reading_count,
        MIN(temperature_celsius) AS device_min_temp,
        MAX(temperature_celsius) AS device_max_temp
    FROM valid_readings
    GROUP BY device_id
    HAVING COUNT(*) >= 5
),
location_stats AS (
    SELECT
        location,
        {_T_AVG} AS location_mean_temp,
        {_T_STD} AS location_stddev_temp,
        COUNT(*) AS location_reading_count
    FROM valid_readings
    WHERE location IS NOT NULL
    GROUP BY location
    HAVING COUNT(*) >= 10
),
environment_stats AS (
    SELECT
        environment_type,
        {_T_AVG} AS environment_mean_temp,
        {_T_STD} AS environment_stddev_temp,
        COUNT(*) AS environment_reading_count
    FROM valid_readings
    WHERE environment_type IS NOT NULL
    GROUP BY environment_type
    HAVING COUNT(*) >= 5
)
"""


def _anomalies_sql(threshold: float) -> str:
    thr = threshold
    sub = threshold - 0.5
    return f"""
anomaly_calculations AS (
    SELECT
        vr.*,
        gs.global_mean_temp, gs.global_stddev_temp,
        ds.device_mean_temp, ds.device_stddev_temp, ds.device_reading_count,
        ls.location_mean_temp, ls.location_stddev_temp,
        es.environment_mean_temp, es.environment_stddev_temp,
        CASE WHEN gs.global_stddev_temp > 0
             THEN ABS(vr.temperature_celsius - gs.global_mean_temp) / gs.global_stddev_temp
             ELSE 0 END AS global_z_score,
        CASE WHEN ds.device_stddev_temp > 0 AND ds.device_reading_count >= 5
             THEN ABS(vr.temperature_celsius - ds.device_mean_temp) / ds.device_stddev_temp
        END AS device_z_score,
        CASE WHEN ls.location_stddev_temp > 0
             THEN ABS(vr.temperature_celsius - ls.location_mean_temp) / ls.location_stddev_temp
        END AS location_z_score,
        CASE WHEN es.environment_stddev_temp > 0
             THEN ABS(vr.temperature_celsius - es.environment_mean_temp) / es.environment_stddev_temp
        END AS environment_z_score
    FROM valid_readings vr
    CROSS JOIN global_stats gs
    LEFT JOIN device_stats ds ON vr.device_id = ds.device_id
    LEFT JOIN location_stats ls ON vr.location = ls.location
    LEFT JOIN environment_stats es ON vr.environment_type = es.environment_type
),
anomalies AS (
    SELECT *,
        CASE WHEN global_z_score > {thr} THEN TRUE ELSE FALSE END AS is_global_anomaly,
        CASE WHEN device_z_score > {sub} THEN TRUE ELSE FALSE END AS is_device_anomaly,
        CASE WHEN location_z_score > {sub} THEN TRUE ELSE FALSE END AS is_location_anomaly,
        CASE WHEN environment_z_score > {sub} THEN TRUE ELSE FALSE END AS is_environment_anomaly,
        CASE WHEN global_z_score > {thr} OR device_z_score > {sub}
                  OR location_z_score > {sub} OR environment_z_score > {sub}
             THEN TRUE ELSE FALSE END AS is_anomaly,
        GREATEST(
            COALESCE(global_z_score, 0), COALESCE(device_z_score, 0),
            COALESCE(location_z_score, 0), COALESCE(environment_z_score, 0)
        ) AS anomaly_score
    FROM anomaly_calculations
)
"""


_MART_SQL = """
mart AS (
    SELECT *,
        CASE WHEN temperature_celsius < 0 THEN 'Freezing'
             WHEN temperature_celsius BETWEEN 0 AND 15 THEN 'Cold'
             WHEN temperature_celsius BETWEEN 16 AND 25 THEN 'Comfortable'
             WHEN temperature_celsius BETWEEN 26 AND 35 THEN 'Warm'
             WHEN temperature_celsius > 35 THEN 'Hot'
             ELSE 'Unknown'
        END AS temperature_category,
        CAST(extract(hour FROM reading_timestamp) AS BIGINT) AS reading_hour,
        CAST(dayofweek(reading_timestamp) AS BIGINT) AS reading_day_of_week,
        CAST(reading_timestamp AS DATE) AS reading_date,
        CAST(extract(month FROM reading_timestamp) AS BIGINT) AS reading_month,
        CAST(extract(year FROM reading_timestamp) AS BIGINT) AS reading_year,
        CASE WHEN environment_type = 'Indoor' AND temperature_celsius < 15 THEN 'Cold_Indoor'
             WHEN environment_type = 'Indoor' AND temperature_celsius > 30 THEN 'Hot_Indoor'
             WHEN environment_type = 'Outdoor' AND temperature_celsius < 0 THEN 'Freezing_Outdoor'
             WHEN environment_type = 'Outdoor' AND temperature_celsius > 40 THEN 'Extreme_Heat_Outdoor'
             ELSE 'Normal'
        END AS environment_condition,
        CASE WHEN reading_timestamp >= CAST(DATE '2024-03-01' - 1 AS TIMESTAMP) THEN 'Recent'
             WHEN reading_timestamp >= CAST(DATE '2024-03-01' - 7 AS TIMESTAMP) THEN 'This_Week'
             WHEN reading_timestamp >= CAST(DATE '2024-03-01' - 30 AS TIMESTAMP) THEN 'This_Month'
             ELSE 'Historical'
        END AS data_freshness
    FROM anomalies
)
"""


def oracle_prelude(threshold: float = 3.0) -> str:
    """Full WITH-chain prelude; append a final SELECT to make a query."""
    return (
        "WITH "
        + READINGS_SQL.strip().rstrip(",")
        + ",\n"
        + _STAGING_SQL.strip()
        + ",\n"
        + _VALID_SQL.strip()
        + ",\n"
        + _STATS_SQL.strip()
        + ",\n"
        + _anomalies_sql(threshold).strip()
        + ",\n"
        + _MART_SQL.strip()
        + "\n"
    )
