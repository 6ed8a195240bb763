"""JDBC source/sink (sources/jdbc.py) against the embedded Derby driver
that ships in pyspark's jars — the same Spark code path a Postgres URL
takes (`dlt_ingest/iot_temperature_pipeline.py:262-267` parity surface).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.sources.jdbc import (
    derby_memory_url,
    drop_derby_memory_db,
    jdbc_read,
    jdbc_write,
)


@pytest.fixture()
def derby_db():
    name = "sg_test_jdbc"
    yield name
    drop_derby_memory_db(name)


def test_roundtrip_types_and_rows(spark, derby_db):
    url = derby_memory_url(derby_db)
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 13).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
        (F.col("id") / 4.0).alias("d"),
    )
    jdbc_write(df, url, "t_roundtrip", create_table_column_types="s VARCHAR(20)")
    back = jdbc_read(spark, url, "t_roundtrip")
    assert back.count() == 100
    a = sorted(df.collect())
    b = sorted(back.collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_partitioned_read_parallel_and_complete(spark, derby_db):
    url = derby_memory_url(derby_db)
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 10).alias("m"))
    jdbc_write(df, url, "t_part")
    back = jdbc_read(
        spark,
        url,
        "t_part",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    # 4 range predicates → 4 scan partitions, no dropped/duplicated rows
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("k")).first()[0] == 999 * 1000 // 2


def test_parallel_read_requires_bounds(spark):
    with pytest.raises(ValueError, match="partition_column"):
        jdbc_read(spark, "jdbc:derby:memory:x", "t", num_partitions=4)
    with pytest.raises(ValueError, match="bounds"):
        jdbc_read(
            spark, "jdbc:derby:memory:x", "t", partition_column="k", num_partitions=4
        )


def test_write_bounds_connection_count(spark, derby_db):
    url = derby_memory_url(derby_db)
    df = spark.range(64).repartition(32).select(F.col("id").alias("k"))
    # 32 input partitions, max_connections=4 → write coalesces; table complete
    jdbc_write(df, url, "t_conn", max_connections=4)
    back = jdbc_read(spark, url, "t_conn")
    assert back.count() == 64


def test_append_mode(spark, derby_db):
    url = derby_memory_url(derby_db)
    df = spark.range(10).select(F.col("id").alias("k"))
    jdbc_write(df, url, "t_append", mode="overwrite")
    jdbc_write(df, url, "t_append", mode="append")
    assert jdbc_read(spark, url, "t_append").count() == 20


def test_filter_pushdown_reaches_jdbc_scan(spark, derby_db):
    url = derby_memory_url(derby_db)
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 5).alias("m"))
    jdbc_write(df, url, "t_push")
    back = jdbc_read(spark, url, "t_push").filter(F.col("k") >= 90).select("k")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the predicate must be in the JDBC scan's PushedFilters, not a
    # Spark-side Filter over a full-table pull
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,90)" in plan
    assert back.count() == 10
