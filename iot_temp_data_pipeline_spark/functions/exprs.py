"""Column-factory analogs of the reference's Jinja macros and CASE blocks.

The reference expresses reusable logic as dbt macros that expand to SQL
text before execution (`dbt_transform/macros/calculate_anomaly_score.sql`,
SURVEY.md §2.11). The Spark analog is a plain Python function returning a
``Column`` — expanded at plan-construction time, optimized by Catalyst,
zero runtime dispatch cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def environment_type(location: Column) -> Column:
    """Pattern-based environment classification.

    Mirrors `models/staging/stg_raw_temperature_readings.sql:39-43`.
    NOTE: `_` inside the ilike patterns is a single-char wildcard in both
    Postgres and Spark — deliberately NOT escaped, for parity
    (SURVEY.md §2.9 `ilike` row). Evaluation order matters: `%_out%` is
    tested before `%_in%`.
    """
    return (
        F.when(location.ilike("%_out%") | location.ilike("%outdoor%"), "Outdoor")
        .when(
            location.ilike("%_in%")
            | location.ilike("%indoor%")
            | location.ilike("%office%"),
            "Indoor",
        )
        .otherwise("Unknown")
    )


def is_valid_record(
    device_id: Column, reading_timestamp: Column, temperature_celsius: Column
) -> Column:
    """Validity flag — `models/staging/stg_raw_temperature_readings.sql:64-69`."""
    return (
        F.when(device_id.isNull() | (F.trim(device_id) == ""), F.lit(False))
        .when(reading_timestamp.isNull(), F.lit(False))
        .when(temperature_celsius.isNull(), F.lit(False))
        .otherwise(F.lit(True))
    )


def data_quality_score(
    device_id: Column, reading_timestamp: Column, temperature_celsius: Column
) -> Column:
    """Weighted quality score 0.4/0.4/0.2 —
    `models/staging/stg_raw_temperature_readings.sql:72-76` (same weights the
    unused macro `calculate_data_quality_score` hardcodes).

    Postgres sums NUMERIC literals exactly; Spark sums doubles — the final
    round(…, 1) restores the exact {0, 0.2, 0.4, 0.6, 0.8, 1.0} domain the
    dbt tests assert (`models/staging/schema.yml:75-79`).
    """
    score = (
        F.when(device_id.isNotNull() & (F.trim(device_id) != ""), F.lit(0.4)).otherwise(0.0)
        + F.when(reading_timestamp.isNotNull(), F.lit(0.4)).otherwise(0.0)
        + F.when(temperature_celsius.isNotNull(), F.lit(0.2)).otherwise(0.0)
    )
    return F.round(score, 1)


def z_score(value: Column, mean: Column, stddev: Column, else_null: bool = True) -> Column:
    """Guarded z-score — macro `calculate_anomaly_score.sql:2-8` /
    `models/intermediate/int_temperature_anomalies.sql:90-116`.

    The reference is asymmetric: the *global* z falls back to 0 when
    stddev <= 0, the device/location/environment z's fall back to NULL.
    Preserved exactly via ``else_null``.
    """
    guarded = F.when(stddev > 0, F.abs(value - mean) / stddev)
    return guarded if else_null else guarded.otherwise(F.lit(0.0))


def temperature_category(temperature_celsius: Column) -> Column:
    """Bucketing — `models/marts/mart_temperature_readings.sql:72-79`.

    Inclusive BETWEEN leaves gaps (e.g. 15.5 → 'Unknown'); preserved
    deliberately for parity (SURVEY.md §7.4 item 6).
    """
    t = temperature_celsius
    return (
        F.when(t < 0, "Freezing")
        .when(t.between(0, 15), "Cold")
        .when(t.between(16, 25), "Comfortable")
        .when(t.between(26, 35), "Warm")
        .when(t > 35, "Hot")
        .otherwise("Unknown")
    )


def environment_condition(environment_type_col: Column, temperature_celsius: Column) -> Column:
    """Cross flag — `models/marts/mart_temperature_readings.sql:89-95`."""
    e, t = environment_type_col, temperature_celsius
    return (
        F.when((e == "Indoor") & (t < 15), "Cold_Indoor")
        .when((e == "Indoor") & (t > 30), "Hot_Indoor")
        .when((e == "Outdoor") & (t < 0), "Freezing_Outdoor")
        .when((e == "Outdoor") & (t > 40), "Extreme_Heat_Outdoor")
        .otherwise("Normal")
    )


def data_freshness(reading_timestamp: Column, run_date: Column) -> Column:
    """Freshness bucket — `models/marts/mart_temperature_readings.sql:98-103`.

    The reference compares against the wall clock (`current_date`), which is
    nondeterministic; ``run_date`` freezes it (SURVEY.md §7.4 item 3) — pass
    ``F.current_date()`` to reproduce reference behavior exactly.
    """
    ts = reading_timestamp
    return (
        F.when(ts >= F.date_sub(run_date, 1).cast("timestamp"), "Recent")
        .when(ts >= F.date_sub(run_date, 7).cast("timestamp"), "This_Week")
        .when(ts >= F.date_sub(run_date, 30).cast("timestamp"), "This_Month")
        .otherwise("Historical")
    )
