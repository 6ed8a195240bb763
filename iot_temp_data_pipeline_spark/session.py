"""SparkSession builder with the semantics the engine depends on.

Settings mirror the Postgres behaviors the reference relied on
(SURVEY.md §7.4):

- ``spark.sql.session.timeZone=UTC``: the reference's TIMESTAMP columns
  are tz-naive Postgres timestamps (`sql/002_create_tables.sql:21`);
  pinning UTC makes Spark's session-tz timestamps behave identically and
  keeps DuckDB-oracle comparisons exact.
- ``spark.sql.ansi.enabled=false``: the reference coerces bad values to
  NULL (`to_datetime(..., errors='coerce')` at
  `dlt_ingest/iot_temperature_pipeline.py:157`; range-failed casts → NULL
  at `models/staging/stg_raw_temperature_readings.sql:28-33`). Spark 4
  defaults ANSI on (errors); we turn it off to reproduce null-on-error.
- AQE on: runtime broadcast-join conversion + skew splitting replace the
  manual tuning Postgres did with its cost-based optimizer.
- shuffle partitions sized for the local harness; a real cluster run
  should size this ~2-3× total cores (or rely on AQE coalescing, which
  is enabled here and shrinks post-shuffle partitions automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "iot-temp-data-pipeline-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture events.ts is parquet TIMESTAMP(NANOS); see sources/catalog.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's DataFrame debugging captures the Python call site
        # for EVERY DataFrame API call (a stack walk plus an extra py4j
        # round trip each) — profiled at ~30-40% of pure plan-build time
        # on the wide queries here. Error call-site attribution is a
        # debugger nicety; a production driver issuing thousands of
        # plan builds a day turns it off.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
