"""Staging model: raw readings → cleaned/validated readings.

Re-expresses `dbt_transform/models/staging/stg_raw_temperature_readings.sql`
(the whole model, lines 11-82) as one narrow projection — a single
Catalyst Project over the scan, so at 100 TB this is a zero-shuffle,
fully pushed-down map stage (filters + column pruning reach the parquet
reader).

Operator coverage (SURVEY.md §2.2): P1 null-guard, P2 rename projection,
P3 range-validated cast, P4 null default, P5 ilike categorization,
P6 validity flag, P7 weighted quality score, P8 processing timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import data_quality_score, environment_type, is_valid_record

MIN_TEMPERATURE = -50.0  # var('min_temperature'), dbt_project.yml:33-35
MAX_TEMPERATURE = 100.0  # var('max_temperature')


def _temperature_celsius(temperature: Column) -> Column:
    """Range-validated cast (P3): keep only values inside
    [min, max], cast numeric(5,2), else NULL —
    `stg_raw_temperature_readings.sql:28-33`. ANSI off → overflow would
    null, but the range guard makes overflow impossible (SURVEY.md §2.9).

    Carried as DOUBLE after the decimal(5,2) validation cast so every
    downstream aggregate (avg/stddev) stays comparable with the DuckDB
    oracle; the cast chain is lossless for in-range 2-decimal inputs."""
    return F.when(
        temperature.isNotNull()
        & temperature.between(MIN_TEMPERATURE, MAX_TEMPERATURE),
        temperature.cast("decimal(5,2)").cast("double"),
    )


def stg_raw_temperature_readings(
    raw: DataFrame, with_processing_timestamp: bool = True
) -> DataFrame:
    """raw columns: device_id, timestamp, temperature, location,
    _dlt_id, _dlt_load_id (FIXTURES.md §2 subset)."""
    temp_c = _temperature_celsius(F.col("temperature"))
    out = (
        # P1: `where _dlt_id is not null` (sql:11-14)
        raw.filter(F.col("_dlt_id").isNotNull())
        .select(
            F.col("_dlt_id").alias("record_id"),  # P2 (sql:17-26)
            F.col("device_id"),
            F.col("timestamp").alias("reading_timestamp"),
            temp_c.alias("temperature_celsius"),
            F.coalesce(F.col("location"), F.lit("Unknown_Room")).alias("location"),  # P4
            environment_type(F.col("location")).alias("environment_type"),  # P5
            F.col("_dlt_load_id"),
            F.col("_dlt_id"),
        )
        .withColumn(
            "is_valid_record",  # P6 (sql:64-69)
            is_valid_record(
                F.col("device_id"),
                F.col("reading_timestamp"),
                F.col("temperature_celsius"),
            ),
        )
        .withColumn(
            "data_quality_score",  # P7 (sql:72-76)
            data_quality_score(
                F.col("device_id"),
                F.col("reading_timestamp"),
                F.col("temperature_celsius"),
            ),
        )
    )
    if with_processing_timestamp:
        # P8 (sql:79) — nondeterministic; excluded from oracle-checked queries
        out = out.withColumn("dbt_processing_timestamp", F.current_timestamp())
    return out
