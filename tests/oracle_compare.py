"""Local replica of the driver's Spark-vs-DuckDB compare.

Stricter than a tolerance check: after the in-query rounding, values are
expected representation-identical (atol/rtol 1e-12 only absorbs
last-ulp noise that could never flip a rounded digit).

ORDER-INSENSITIVE BY DESIGN: `normalize` sorts rows by all columns
before comparing, mirroring the driver's value-hash (which also sorts).
Several registry queries deliberately omit a cosmetic output orderBy on
that basis — `dedup_clusters_ngram` / `dedup_clusters_star` dropped a
measured-1.3 s global sort (plans/extensions.py). If this compare ever
becomes exact-order, those queries must regain their sorts."""

from __future__ import annotations

import decimal

import duckdb
import pandas as pd
from pandas.testing import assert_frame_equal

from iot_temp_data_pipeline_spark.sources.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: float(v) if isinstance(v, decimal.Decimal) else v
            )
    if len(df):
        order = df.astype(str).sort_values(by=list(df.columns)).index
        df = df.loc[order].reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    actual = normalize(spark_df.toPandas())
    expected = normalize(con.sql(sql).df())
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: {list(actual.columns)} vs {list(expected.columns)}"
    )
    assert len(actual) == len(expected), f"row count {len(actual)} vs {len(expected)}"
    # strict: stringified equality (mirrors the driver's value-hash; a
    # tolerance compare would hide rounding-boundary drift)
    if not actual.astype(str).equals(expected.astype(str)):
        # fall back to assert_frame_equal for a readable cell-level diff
        assert_frame_equal(
            actual, expected, check_dtype=False, check_exact=True
        )
        raise AssertionError("stringified frames differ (dtype-level drift)")
