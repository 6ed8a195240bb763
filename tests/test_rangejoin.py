"""Boundary semantics of the bucket-blocked range join
(operators/rangejoin.py): closed-open [start, end), multi-bucket
intervals, key isolation, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators.rangejoin import point_in_interval_join

W = 100  # bucket width for tests


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            ("a", 1, 100),   # == start -> IN
            ("a", 2, 249),   # == end-1 -> IN
            ("a", 3, 250),   # == end -> OUT
            ("a", 4, 99),    # < start -> OUT
            ("a", 5, 555),   # inside second interval (same bucket as start)
            ("b", 6, 150),   # right ts, wrong key -> OUT
        ],
        "key string, pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 10, 100, 250),  # spans buckets 1-2
            ("a", 11, 500, 560),  # inside bucket 5
            ("b", 12, 300, 400),
        ],
        "key string, iid long, s long, e long",
    )
    return points, intervals


def test_closed_open_and_keys(frames):
    points, intervals = frames
    out = point_in_interval_join(
        points, intervals, on=["key"], point_ts="ts", start="s", end="e",
        bucket_width=W,
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(1, 10), (2, 10), (5, 11)]


def test_wide_interval_many_buckets(spark):
    """An interval spanning many buckets matches points in every bucket
    exactly once (explode fanout, no duplicate pairs)."""
    points = spark.createDataFrame(
        [("k", i, t) for i, t in enumerate([0, 99, 100, 450, 999, 1000])],
        "key string, pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [("k", 1, 0, 1000)], "key string, iid long, s long, e long"
    )
    out = point_in_interval_join(
        points, intervals, on=["key"], point_ts="ts", start="s", end="e",
        bucket_width=W,
    )
    pids = sorted(r.pid for r in out.collect())
    assert pids == [0, 1, 2, 3, 4]  # 1000 == end -> excluded, no dups


def test_no_nested_loop(frames):
    points, intervals = frames
    plan = (
        point_in_interval_join(
            points, intervals, on=["key"], point_ts="ts", start="s", end="e",
            bucket_width=W,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
