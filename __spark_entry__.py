"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``iot_temp_data_pipeline_spark.plans.registry``;
each entry pairs the Spark callable with its DuckDB oracle, shaped by a
shared column-spec layer so names/types/rounding match by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full z-score anomaly detection over deduplicated
    readings (scan → filter → cast → window dedup → 4 aggregations →
    broadcast joins → threshold flags) on sf0.001."""
    return REGISTRY["anomaly_scores_t2"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
