"""Round-8 regression tests for the ADVICE r7 items: arbitrary-exponent
square-and-multiply in the band-tuning S-curve, the empty-digest guard
in the anomaly enrichment, and empty-query-set guards on every
driver-collect matmul/LUT kernel."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.operators.anomalies import (
    int_temperature_anomalies,
)
from iot_temp_data_pipeline_spark.operators.dedup import _pow2_col, _pow2_sql
from iot_temp_data_pipeline_spark.operators.pq import (
    M,
    SUBDIM,
    adc_topm,
)
from iot_temp_data_pipeline_spark.operators.similarity import (
    _hnm_partial_matmul,
    knn_brute_force_matmul,
)


# ------------------------------------------------- square-and-multiply

@pytest.mark.parametrize("e", [1, 2, 3, 4, 5, 6, 7, 8, 11, 16])
def test_pow_col_any_positive_exponent(spark, e):
    """_pow2_col must be x**e for ANY positive e (ADVICE r7: e=3 used
    to silently yield x^2), and the SQL twin must build the identical
    multiply tree so both engines agree bit-for-bit."""
    x = 0.7
    got_spark = spark.range(1).select(
        _pow2_col(F.lit(x), e).alias("p")
    ).collect()[0]["p"]
    got_sql = duckdb.sql(
        f"SELECT {_pow2_sql(f'CAST({x} AS DOUBLE)', e)} AS p"
    ).fetchone()[0]
    assert got_spark == pytest.approx(x**e, rel=1e-12)
    # bit-identical cross-engine: same tree, same IEEE order
    assert got_spark == got_sql


def test_pow_rejects_nonpositive_exponent():
    with pytest.raises(ValueError):
        _pow2_col(F.lit(1.0), 0)
    with pytest.raises(ValueError):
        _pow2_sql("x", -1)


# ------------------------------------------------- empty-digest guard

def test_anomalies_empty_input_returns_empty(spark):
    """An empty staging input must yield an empty anomalies frame, not
    StopIteration from the missing global digest row (ADVICE r7)."""
    stg = spark.createDataFrame(
        [],
        schema="device_id string, reading_timestamp timestamp,"
        " _dlt_id string, is_valid_record boolean,"
        " temperature_celsius double, location string,"
        " environment_type string",
    )
    out = int_temperature_anomalies(stg, cache=False)
    assert out.count() == 0
    assert "anomaly_score" in out.columns


# ------------------------------------------- empty-query matmul guards

def _tiny_emb(spark):
    # quantized_corpus shape; vec_ids 1..4, none divisible by 100 so the
    # query filter selects nothing
    return spark.createDataFrame(
        [(i, i % 2, [1] * 4, 4) for i in range(1, 5)],
        schema="vec_id long, label int, qvec array<bigint>, qnorm2 long",
    )


def test_knn_brute_force_matmul_empty_queries(spark):
    out = knn_brute_force_matmul(_tiny_emb(spark), query_mod=100, k=3)
    assert out.count() == 0
    assert out.columns == [
        "query_id", "neighbor_id", "neighbor_label", "cosine", "rank",
    ]


def test_hnm_partial_matmul_empty_queries(spark):
    emb = _tiny_emb(spark).withColumn("label", F.col("label").cast("long"))
    out = _hnm_partial_matmul(emb, query_mod=100)
    assert out.count() == 0
    assert out.columns == [
        "query_id", "q_label", "neighbor_id", "is_same", "cosine",
    ]


def test_adc_topm_numpy_empty_queries(spark):
    enc = spark.createDataFrame(
        [tuple([i] + [0] * M) for i in range(1, 4)],
        schema="vec_id long, "
        + ", ".join(f"c{j} int" for j in range(M)),
    )
    cb = [[(0, [0] * SUBDIM)] for _ in range(M)]
    queries = spark.createDataFrame(
        [], schema="query_id long, q_uvec array<bigint>"
    )
    out = adc_topm(enc, cb, queries, m=3, n_pairs=10**9, strategy="numpy")
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]
