"""foreachBatch micro-batch pipeline — the Structured Streaming analog
of the reference's orchestrated run (SURVEY.md §3.1):

  FileSensor/cron  →  availableNow file source (core.py)
  dlt ingest       →  the streaming transform feeding this sink
  dbt full refresh →  each micro-batch APPENDS to the raw layer, then
                      recomputes staging → anomalies from the
                      accumulated raw and OVERWRITES the mart — the
                      exact `full_refresh: True` contract of
                      `airflow/dags/iot_temperature_dag.py:236-239`
  audit log (S6)   →  one row per micro-batch appended alongside

At scale the full-refresh step is the knowingly-quadratic part — the
reference made the same trade. The raw layer is partitioned by load so
an incremental variant can prune; the streaming dedup/window operators
(dedup.py, windows.py) are the truly-incremental alternatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.anomalies import int_temperature_anomalies
from ..operators.staging import stg_raw_temperature_readings


def refresh_marts(spark: SparkSession, raw_dir: str, mart_dir: str) -> None:
    """Full refresh: staging → anomaly mart from the accumulated raw."""
    raw = spark.read.parquet(raw_dir)
    mart = int_temperature_anomalies(stg_raw_temperature_readings(raw))
    mart.write.mode("overwrite").parquet(mart_dir)


def foreach_batch_refresh(raw_dir: str, mart_dir: str, audit_dir: str):
    """Build the foreachBatch callback. The batch DataFrame must carry
    the raw-readings columns (device_id, timestamp, temperature,
    location, _dlt_id, _dlt_load_id)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(raw_dir)
        # S6 audit row: one line per micro-batch (file-level log analog,
        # `dlt_ingest/iot_temperature_pipeline.py:83-102`).
        audit = batch_df.agg(
            F.lit(batch_id).alias("batch_id"),
            F.count("*").alias("n_rows"),
            F.countDistinct("device_id").alias("n_devices"),
            F.current_timestamp().alias("processed_at"),
        )
        audit.write.mode("append").parquet(audit_dir)
        refresh_marts(spark, raw_dir, mart_dir)

    return _process


def run_micro_batch_pipeline(
    sdf: DataFrame,
    raw_dir: str,
    mart_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the end-to-end micro-batch pipeline to completion."""
    query = (
        sdf.writeStream.foreachBatch(foreach_batch_refresh(raw_dir, mart_dir, audit_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
