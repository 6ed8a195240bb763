"""Boundary-value parity pins (SURVEY.md §7.4 item 6): crafted rows
exercising the reference's quirky edges exactly —

- P9 temperature buckets use inclusive BETWEEN with gaps: 15.5 °C falls
  between 'Cold' ([0,15]) and 'Comfortable' ([16,25]) → 'Unknown'
  (`mart_temperature_readings.sql:72-79`)
- P5 ilike categorization: `_` is a single-char LIKE wildcard (NOT a
  literal underscore), and the Outdoor test runs FIRST, so 'xout' →
  Outdoor and 'Office_in' → Outdoor is impossible but 'shout' matches
  '%_out%' → Outdoor (`stg_raw_temperature_readings.sql:39-43`)
- P13 z-scores: else-0 for global vs else-NULL for the other
  granularities when stddev == 0
- dow off-by-one: Postgres extract(dow) 0=Sunday vs Spark dayofweek
  1=Sunday (`mart_temperature_readings.sql:83`)
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.functions.exprs import (
    environment_type,
    temperature_category,
    z_score,
)


def _cat(spark, temps):
    df = spark.createDataFrame([(float(t),) for t in temps], "t double")
    return [
        r["c"] for r in df.select(temperature_category(F.col("t")).alias("c")).collect()
    ]


def test_temperature_bucket_gaps(spark):
    # gaps of the inclusive-BETWEEN CASE: (15,16) and (25,26) and (35, ...]
    cats = _cat(spark, [-0.01, 0.0, 15.0, 15.5, 16.0, 25.0, 25.5, 26.0, 35.0, 35.01])
    assert cats == [
        "Freezing",
        "Cold",
        "Cold",
        "Unknown",  # the 15.5 gap — preserved, not "fixed"
        "Comfortable",
        "Comfortable",
        "Unknown",  # the 25.5 gap
        "Warm",
        "Warm",
        "Hot",
    ]


def _env(spark, locations):
    df = spark.createDataFrame([(loc,) for loc in locations], "l string")
    return [
        r["e"] for r in df.select(environment_type(F.col("l")).alias("e")).collect()
    ]


def test_ilike_underscore_is_wildcard(spark):
    # '%_out%': _ matches ANY single char → 'shout' is Outdoor; a plain
    # leading 'out...' has no preceding char → falls through to Indoor
    # ('%office%') or Unknown. Outdoor is tested before Indoor, so
    # 'Room_out_in' → Outdoor.
    assert _env(
        spark, ["Room_out", "shout", "outdoor deck", "Office_in", "Room_out_in", "out"]
    ) == ["Outdoor", "Outdoor", "Outdoor", "Indoor", "Outdoor", "Unknown"]


def test_z_score_else_semantics(spark):
    df = spark.createDataFrame([(10.0, 10.0, 0.0)], "v double, m double, s double")
    row = df.select(
        z_score(F.col("v"), F.col("m"), F.col("s"), else_null=False).alias("g"),
        z_score(F.col("v"), F.col("m"), F.col("s"), else_null=True).alias("d"),
    ).collect()[0]
    assert row["g"] == 0.0  # global: else 0
    assert row["d"] is None  # device/location/env: else NULL


def test_dow_offset_matches_postgres(spark):
    # 2024-01-07 was a Sunday: Postgres extract(dow) = 0
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 7, 12, 0),)], "ts timestamp"
    )
    dow = df.select((F.dayofweek("ts") - 1).alias("d")).collect()[0]["d"]
    assert dow == 0
