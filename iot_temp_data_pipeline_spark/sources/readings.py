"""events → IoT raw-readings surrogate mapping (FIXTURES.md §4).

The reference's raw layer (`dlt_raw.raw_temperature_readings`) is produced
by dlt ingestion (`dlt_ingest/iot_temperature_pipeline.py:146-209`) with
columns `device_id, timestamp, temperature, location, _dlt_id,
_dlt_load_id` (plus synthetic sensor fields). The driver supplies an
`events` fixture instead of the Kaggle CSV, so this module maps it onto
the same shape deterministically:

  device_id   = 'DEV_' || user_id            (surrogate for py:152-154)
  timestamp   = ts
  temperature = value                        (py:160; double)
  location    = event_type || '_in'/'_out'   (surrogate for the
                location synthesis at py:163-166 — the suffix keeps the
                ilike-based environment classification at
                `models/staging/stg_raw_temperature_readings.sql:39-43`
                exercising both branches)
  _dlt_id      = CAST(event_id AS STRING)    (stable, unique → makes the
                dedup tie-break at `models/intermediate/
                int_temperature_anomalies.sql:10-16` deterministic,
                fixing the reference's random-_dlt_id nondeterminism,
                SURVEY.md §7.4 item 3)
  _dlt_load_id = CAST(event_id % 10 AS STRING)  (10 synthetic batches)

`READINGS_SQL` is the byte-for-byte DuckDB equivalent used as the leading
CTE of every oracle query, so the Spark and oracle inputs are identical
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table

READINGS_SQL = """
raw_readings AS (
    SELECT
        'DEV_' || CAST(user_id AS VARCHAR) AS device_id,
        ts AS "timestamp",
        value AS temperature,
        event_type || (CASE WHEN user_id % 2 = 0 THEN '_in' ELSE '_out' END) AS location,
        CAST(event_id AS VARCHAR) AS _dlt_id,
        CAST(event_id % 10 AS VARCHAR) AS _dlt_load_id
    FROM events
)
"""


def raw_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.concat(F.lit("DEV_"), F.col("user_id").cast("string")).alias("device_id"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("temperature"),
        F.concat(
            F.col("event_type"),
            F.when(F.col("user_id") % 2 == 0, F.lit("_in")).otherwise(F.lit("_out")),
        ).alias("location"),
        F.col("event_id").cast("string").alias("_dlt_id"),
        (F.col("event_id") % 10).cast("string").alias("_dlt_load_id"),
    )
