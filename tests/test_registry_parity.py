"""Every registry query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY

from .oracle_compare import assert_matches_oracle, duckdb_con

ORACLE_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    assert_matches_oracle(spec.spark(spark, sf_dir), con, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
