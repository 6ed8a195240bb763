"""Tests for sources/formats.py: the partition-pruned upsert must not
rewrite untouched partitions (the whole point at 100 TB), and the
JSONL reader's PERMISSIVE corrupt-record path must actually capture
malformed lines."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iot_temp_data_pipeline_spark.sources.formats import (
    merge_upsert_partitioned,
    read_jsonl,
)
from iot_temp_data_pipeline_spark.streaming.core import workdir


def _part_files(table_dir: str, part: str) -> dict[str, float]:
    d = os.path.join(table_dir, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_upsert_rewrites_only_touched_partitions(spark):
    base = spark.createDataFrame(
        [(i, f"d{i % 3}", i * 10) for i in range(30)],
        "id long, day string, v long",
    )
    work = workdir("upsert_test")
    table_dir = f"{work}/t"
    base.write.partitionBy("day").parquet(table_dir)
    before_d0 = _part_files(table_dir, "day=d0")
    before_d1 = _part_files(table_dir, "day=d1")

    updates = spark.createDataFrame(
        [(1, "d1", 999), (100, "d1", 111)], "id long, day string, v long"
    )
    touched = merge_upsert_partitioned(
        spark, table_dir, updates, key_cols=["id"], partition_col="day"
    )
    assert touched == ["d1"]
    # untouched partition: identical files, bit for bit location/mtime
    assert _part_files(table_dir, "day=d0") == before_d0
    # touched partition: rewritten
    assert _part_files(table_dir, "day=d1") != before_d1

    merged = spark.read.parquet(table_dir)
    assert merged.count() == 31  # 30 base − 1 replaced + 1 update + 1 insert
    assert merged.filter(F.col("id") == 1).select("v").first()[0] == 999
    assert merged.filter(F.col("id") == 100).select("v").first()[0] == 111
    # a d0 row is untouched
    assert merged.filter(F.col("id") == 3).select("v").first()[0] == 30


def test_jsonl_corrupt_records_captured(spark):
    work = workdir("jsonl_test")
    path = f"{work}/in"
    os.makedirs(path)
    with open(f"{path}/part-0.json", "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write("this is not json\n")
        f.write('{"id": 2, "name": "also ok"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    # Spark disallows querying ONLY the corrupt-record column of a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the parse first.
    df = read_jsonl(spark, path, schema).cache()
    assert df.filter(F.col("_corrupt_json").isNotNull()).count() == 1
    assert df.filter(F.col("id").isNotNull()).count() == 2


def test_custom_datasource_pushdown_prunes_partitions(spark):
    from pyspark.sql.datasource import EqualTo

    from iot_temp_data_pipeline_spark.sources.pydatasource import (
        SyntheticEventsReader,
        temp_centi_of,
    )

    r = SyntheticEventsReader({"n_rows": "1000", "n_partitions": "4"})
    unsupported = list(r.pushFilters([EqualTo(("event_id",), 5)]))
    assert unsupported == []  # fully handled
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(5, 6)]
    batches = list(r.read(parts[0]))
    rows = [t for b in batches for t in zip(*(c.to_pylist() for c in b.columns))]
    assert rows == [(5, "DEV_5", 1704067200000000 + 5 * 30_000_000, temp_centi_of(5))]


def test_custom_datasource_scan_roundtrip(spark):
    from iot_temp_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 3)
        .load()
    )
    assert df.count() == 500
    assert df.selectExpr("count(distinct device_id)").first()[0] == 50


def test_custom_datasource_writer_two_phase_commit(spark, tmp_path):
    import glob
    import json

    from iot_temp_data_pipeline_spark.sources import pydatasource

    pydatasource.register_writer(spark)
    out = str(tmp_path / "audit")
    df = spark.range(100).selectExpr("id", "id % 3 AS v").repartition(4)
    df.write.format("jsonl_audit").option("path", out).mode("append").save()
    files = sorted(glob.glob(f"{out}/part-*.jsonl"))
    rows = [json.loads(line) for f in files for line in open(f)]
    assert len(files) == 4
    assert len(rows) == 100
    assert sum(r["id"] for r in rows) == 4950
    # no temp litter after commit
    assert glob.glob(f"{out}/_tmp/*") == []
