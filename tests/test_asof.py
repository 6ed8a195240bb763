"""Boundary semantics of the as-of join operator (operators/asof.py):
inclusive equal-timestamp match, deterministic tie-break, left-outer
NULLs, and the forward direction — on a hand-built frame where every
expected match is known."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    # quotes: (key, ts, qid, px)
    quotes = spark.createDataFrame(
        [
            ("a", _ts(10), 1, 100.0),
            ("a", _ts(20), 2, 101.0),
            ("a", _ts(20), 3, 102.0),  # equal-ts tie: qid 3 must win
            ("a", _ts(40), 4, 103.0),
            ("b", _ts(15), 5, 200.0),
        ],
        "key string, ts timestamp, qid long, px double",
    )
    # trades: (key, ts, tid)
    trades = spark.createDataFrame(
        [
            ("a", _ts(5), 10),   # before any quote -> NULL match (backward)
            ("a", _ts(20), 11),  # equal ts -> inclusive, tie-break qid 3
            ("a", _ts(30), 12),  # between -> qid 3
            ("a", _ts(50), 13),  # after last -> qid 4
            ("b", _ts(15), 14),  # exact equal on other key -> qid 5
            ("c", _ts(15), 15),  # key with no quotes -> NULL
        ],
        "key string, ts timestamp, tid long",
    )
    return trades, quotes


def _collect(df):
    rows = df.select("tid", "r_qid", "r_px").orderBy("tid").collect()
    return {r.tid: (r.r_qid, r.r_px) for r in rows}


def test_backward_inclusive_tie_and_nulls(frames):
    trades, quotes = frames
    got = _collect(asof_join(trades, quotes, on=["key"], ts="ts", tie="qid"))
    assert got == {
        10: (None, None),
        11: (3, 102.0),
        12: (3, 102.0),
        13: (4, 103.0),
        14: (5, 200.0),
        15: (None, None),
    }


def test_forward_matches_next_quote(frames):
    trades, quotes = frames
    got = _collect(
        asof_join(trades, quotes, on=["key"], ts="ts", tie="qid", direction="forward")
    )
    # forward: first quote at-or-after; equal-ts tie -> SMALLEST qid (2)
    assert got == {
        10: (1, 100.0),
        11: (2, 101.0),
        12: (4, 103.0),
        13: (None, None),
        14: (5, 200.0),
        15: (None, None),
    }


def test_single_shuffle_plan(frames):
    """The union+window rewrite must cost ONE exchange on the key —
    not a nested-loop join (the naive non-equi formulation)."""
    trades, quotes = frames
    plan = (
        asof_join(trades, quotes, on=["key"], ts="ts", tie="qid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides co-planned
