"""Parquet table catalog over the driver-provided fixtures (TESTDATA.md).

The reference's "catalog" is Postgres schemas created by dlt/dbt
(`dlt_raw`, `dbt_staging`, ... — SURVEY.md §1.1). Here every table is a
parquet directory/file; reads are columnar and Catalyst prunes columns
and pushes filters into the scan, which replaces the reference's
secondary B-tree indexes (`models/marts/mart_temperature_readings.sql:4-12`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamps in the fixtures are naive instants; DuckDB reads them
    # naive. A non-UTC session tz would shift every year()/date_format()
    # derivation on a caller-provided session, so pin it here at the
    # access path (runtime-settable, like the nanos conf below) rather
    # than trusting the session builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (older fixture
        # generations) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
        # (current), which Spark 4 reads as TIMESTAMP_NTZ. Normalize both
        # to plain TIMESTAMP so downstream epoch functions (unix_micros,
        # window, unix_timestamp) type-check identically either way:
        # - NANOS: Spark rejects by default (PARQUET_TYPE_ILLEGAL); read
        #   as long (runtime-settable legacy conf) and convert with
        #   integer `div` (double division loses precision: ns since
        #   2024 ≈ 1.7e18 > 2^53).
        # - NTZ: cast under the UTC session tz pinned above — wall-clock
        #   preserved, matching DuckDB's naive-timestamp reading.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so the SQL API can be
    used interchangeably with the DataFrame API (SURVEY.md §3.3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
