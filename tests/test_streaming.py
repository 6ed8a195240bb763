"""Streaming behaviors NOT covered by the registry parity sweep:
exactly-once incremental file pickup across restarts (the S3 hash-skip
contract) and the foreachBatch full-refresh micro-batch pipeline
(SURVEY.md §2.10/§3.1). The four streaming registry queries themselves
are oracle-checked by test_registry_parity like every other query.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.sources.readings import raw_readings
from iot_temp_data_pipeline_spark.streaming.ingest import (
    KAGGLE_STREAM_SCHEMA,
    streamed_kaggle_ingest,
)
from iot_temp_data_pipeline_spark.streaming.pipeline import run_micro_batch_pipeline


def _write_kaggle_csv(spark, path: str, start: int, n: int) -> None:
    rows = [
        (
            start + i,
            f"__export__.temp_log_{start + i}_bd0a1b2c3d",
            "Room Admin" if i % 2 == 0 else "Room 809",
            "28-07-2025 10:%02d" % (i % 60),
            str(20.0 + i),
            "In" if i % 2 == 0 else "Out",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, schema=KAGGLE_STREAM_SCHEMA)
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def test_exactly_once_incremental_pickup(spark, tmp_path):
    """Re-running the stream with the same checkpoint processes ONLY
    files that arrived since the last run — the working version of the
    reference's stubbed hash-skip (`iot_temperature_pipeline.py:33-39`)."""
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    _write_kaggle_csv(spark, f"{landing}/drop1", 0, 10)
    os.rename(
        next(
            f"{landing}/drop1/{f}"
            for f in os.listdir(f"{landing}/drop1")
            if f.endswith(".csv")
        ),
        f"{landing}/part-a.csv",
    )
    out1 = streamed_kaggle_ingest(spark, f"{landing}/*.csv", sink, ckpt)
    assert out1.count() == 10

    # second drop lands; first file must NOT be reprocessed
    _write_kaggle_csv(spark, f"{landing}/drop2", 100, 5)
    os.rename(
        next(
            f"{landing}/drop2/{f}"
            for f in os.listdir(f"{landing}/drop2")
            if f.endswith(".csv")
        ),
        f"{landing}/part-b.csv",
    )
    out2 = streamed_kaggle_ingest(spark, f"{landing}/*.csv", sink, ckpt)
    assert out2.count() == 15
    assert out2.filter(F.col("event_id") >= 100).count() == 5


def test_foreach_batch_full_refresh(spark, sf_dir, tmp_path):
    """Micro-batch pipeline: raw append + audit row per batch + mart
    full refresh; the final mart equals the batch pipeline's answer over
    the same accumulated raw."""
    readings = raw_readings(spark, sf_dir).limit(500)
    src = str(tmp_path / "src")
    readings.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(readings.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    raw_dir = str(tmp_path / "raw")
    mart_dir = str(tmp_path / "mart")
    audit_dir = str(tmp_path / "audit")
    run_micro_batch_pipeline(
        stream, raw_dir, mart_dir, audit_dir, str(tmp_path / "ckpt")
    )

    raw = spark.read.parquet(raw_dir)
    assert raw.count() == 500

    audit = spark.read.parquet(audit_dir)
    assert audit.count() >= 2  # one row per micro-batch, ≥2 batches
    assert audit.agg(F.sum("n_rows")).collect()[0][0] == 500

    # full-refresh contract: mart == batch recompute over accumulated raw
    from iot_temp_data_pipeline_spark.operators.anomalies import (
        int_temperature_anomalies,
    )
    from iot_temp_data_pipeline_spark.operators.staging import (
        stg_raw_temperature_readings,
    )

    mart = spark.read.parquet(mart_dir)
    expected = int_temperature_anomalies(stg_raw_temperature_readings(raw))
    assert mart.count() == expected.count()
    assert sorted(mart.columns) == sorted(expected.columns)


def test_stateful_state_survives_checkpoint_restart(spark, tmp_path):
    """applyInPandasWithState recovery: a key whose duplicate versions
    arrive in SEPARATE runs (same checkpoint) must still converge to
    the overall winner — the per-key counter n continues from the
    recovered state store, not from zero."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from iot_temp_data_pipeline_spark.streaming.core import run_available_now
    from iot_temp_data_pipeline_spark.streaming.stateful import latest_wins_dedup

    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    schema = T.StructType(
        [
            T.StructField("device_id", T.StringType()),
            T.StructField("ts_micros", T.LongType()),
            T.StructField("temp_centi", T.LongType()),
            T.StructField("dlt_id", T.StringType()),
        ]
    )

    def drop(name, rows):
        with open(f"{landing}/{name}", "w") as f:
            f.write("device_id,ts_micros,temp_centi,dlt_id\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("header", True)
            .csv(landing)
        )
        run_available_now(latest_wins_dedup(stream), sink, ckpt)

    # run 1: version b (winner so far) and a second key
    drop("f1.csv", [("D1", 100, 210, "b"), ("D2", 100, 300, "a")])
    run()
    # run 2 (recovered state): late lower version a, then higher c
    drop("f2.csv", [("D1", 100, 205, "a"), ("D1", 100, 220, "c")])
    run()

    log = spark.read.parquet(sink)
    w = Window.partitionBy("device_id", "ts_micros").orderBy(F.desc("n"))
    final = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("device_id", "dlt_id", "temp_centi", "n")
    )
    got = {r["device_id"]: (r["dlt_id"], r["temp_centi"], r["n"]) for r in final.collect()}
    # D1 saw 3 rows across two runs -> n=3 proves state recovery; winner c
    assert got["D1"] == ("c", 220, 3)
    assert got["D2"] == ("a", 300, 1)


def test_streaming_cms_merges_multiple_partials(spark, sf_dir, tmp_path):
    """The streamed sketch must actually be a MERGE of per-micro-batch
    partials (>= 2 batches under maxFilesPerTrigger=2 over 4 landing
    files), and the merged cell table must equal the batch-built sketch
    cell-for-cell."""
    from pyspark.sql import types as T

    from iot_temp_data_pipeline_spark.operators import sketches as sk
    from iot_temp_data_pipeline_spark.plans.streaming_specs import _cms_token_input
    from iot_temp_data_pipeline_spark.streaming.core import materialize_landing

    landing, sink, ckpt = (
        str(tmp_path / "landing"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    materialize_landing(_cms_token_input(spark, sf_dir), landing)
    stream = (
        spark.readStream.schema(T.StructType([T.StructField("item", T.StringType())]))
        .option("header", True)
        .option("maxFilesPerTrigger", 2)
        .csv(landing)
    )

    def write_partial(batch_df, batch_id):
        (
            sk.cms_cells(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink)
        )

    q = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(sink)
    assert partials.select("batch_id").distinct().count() >= 2
    merged = partials.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    batch_cells = sk.cms_cells(_cms_token_input(spark, sf_dir))
    assert merged.exceptAll(batch_cells).count() == 0
    assert batch_cells.exceptAll(merged).count() == 0
