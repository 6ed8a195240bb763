"""Salted two-phase aggregation / salted join equivalence on a skewed
key distribution (90% of rows share one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.functions.skew import (
    salted_aggregate,
    salted_broadcast_left_join,
)


def _skewed(spark, n=10_000):
    return spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["key"]: (r["cnt"], r["total"], r["mx"])
        for r in df.groupBy("key")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["key"]: (r["cnt"], r["total"], r["mx"])
        for r in salted_aggregate(
            df,
            "key",
            n_salts=8,
            partial_aggs={
                "p_cnt": F.count("*"),
                "p_total": F.sum("v"),
                "p_mx": F.max("v"),
            },
            final_aggs={
                "cnt": F.sum("p_cnt"),
                "total": F.sum("p_total"),
                "mx": F.max("p_mx"),
            },
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = big.select("key").distinct().withColumn(
        "dim_val", F.length("key").cast("long")
    )
    plain = sorted(
        (r["key"], r["v"], r["dim_val"])
        for r in big.join(small, "key", "left").collect()
    )
    salted = sorted(
        (r["key"], r["v"], r["dim_val"])
        for r in salted_broadcast_left_join(big, small, "key", n_salts=8).collect()
    )
    assert salted == plain
