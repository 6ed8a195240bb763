"""S11 retention rewrite + S12 ANALYZE stats refresh
(`airflow/dags/iot_temperature_dag.py:249-305`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.maintenance import (
    apply_retention,
    materialize_and_analyze,
)


def test_apply_retention(spark):
    df = spark.range(10).select(
        F.col("id"),
        F.when(F.col("id") < 5, F.date_sub(F.current_date(), 200))
        .otherwise(F.current_date())
        .cast("timestamp")
        .alias("ingestion_timestamp"),
    )
    kept = apply_retention(df, days=90)
    assert kept.count() == 5
    assert kept.agg(F.min("id")).collect()[0][0] == 5


def test_materialize_and_analyze(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    stats = materialize_and_analyze(spark, df, "region_analyzed")
    # ANALYZE recorded table-level statistics in the catalog
    assert any("Statistics" in k for k in stats)
    spark.sql("DROP TABLE IF EXISTS region_analyzed")
