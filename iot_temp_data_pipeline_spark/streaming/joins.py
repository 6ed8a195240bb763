"""Stream-stream interval join: each 'error' event joins every 'click'
by the same user in the preceding 10 minutes — the canonical
two-stream watermarked join (feature attribution, alert correlation).

Reference parity: the reference has no streaming joins (its joins are
batch dbt models, `dbt_transform/models/marts/*.sql`); this is the
Structured Streaming surface a real-time version of its pipeline would
need, expressed with Spark's native stream-stream join + watermarks.

At scale: both sides are watermarked, so the join buffers only rows
inside the watermark horizon in the partitioned state store — state is
bounded by (event rate × horizon), not by stream length. The join
hash-partitions both streams on user_id; the time-range predicate
bounds which buffered rows can still match and drives eviction.

Determinism for the oracle: the landing zone is written
range-partitioned by ts (file k = k-th time slice) and consumed one
file per micro-batch in path order, so event time advances with
processing time and a watermark delay comfortably above the join
horizon guarantees no matching partner is ever evicted early — the end
state equals the batch join, which is the DuckDB oracle.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table

_SIDE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("value_centi", T.LongType()),
    ]
)

JOIN_HORIZON = "10 minutes"
WATERMARK_DELAY = "2 hours"  # >> horizon + one-file disorder


def materialize_side(
    df: DataFrame, landing_dir: str, n_files: int = 4
) -> None:
    """Range-partition by ts so file k holds the k-th time slice, then
    stamp strictly increasing mtimes in path order: FileStreamSource
    orders files by MODIFICATION TIME, and parallel-written parts share
    near-identical mtimes, which makes replay order arbitrary — a later
    slice processed first advances the watermark past an earlier slice
    and its rows get dropped as late. With stamped mtimes the stream
    replays in coarse event-time order (maxFilesPerTrigger=1)."""
    (
        df.repartitionByRange(n_files, "ts_micros")
        .sortWithinPartitions("ts_micros")
        .write.mode("overwrite")
        .option("header", True)
        .csv(landing_dir)
    )
    base = time.time() - 3600
    parts = sorted(glob.glob(f"{landing_dir}/part-*.csv"))
    for k, path in enumerate(parts):
        os.utime(path, (base + k, base + k))


def side_stream(spark: SparkSession, landing_dir: str, prefix: str) -> DataFrame:
    sdf = (
        spark.readStream.schema(_SIDE_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(landing_dir)
        .withColumn("ts", F.timestamp_micros(F.col("ts_micros")))
        .withWatermark("ts", WATERMARK_DELAY)
    )
    return sdf.select(
        [F.col(c).alias(f"{prefix}{c}") for c in sdf.columns]
    )


def clicks_before_errors_stream(
    clicks: DataFrame, errors: DataFrame
) -> DataFrame:
    """errors ⋈ clicks on user within (err_ts − horizon, err_ts]; strict
    lower bound and inclusive upper mirror the batch oracle exactly."""
    cond = (
        (F.col("c_user_id") == F.col("e_user_id"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") > F.col("e_ts") - F.expr(f"INTERVAL {JOIN_HORIZON}"))
    )
    return errors.join(clicks, cond, "inner").select(
        F.col("e_event_id").alias("error_event_id"),
        F.col("e_user_id").alias("user_id"),
        F.col("e_ts_micros").alias("error_ts_us"),
        F.col("c_event_id").alias("click_event_id"),
        F.col("c_ts_micros").alias("click_ts_us"),
        F.col("c_value_centi").alias("click_value_centi"),
    )


def event_side(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == event_type).select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.unix_micros("ts").alias("ts_micros"),
        F.round(F.col("value") * 100).cast("long").alias("value_centi"),
    )


def clicks_before_errors_outer_stream(
    clicks: DataFrame, errors: DataFrame
) -> DataFrame:
    """LEFT OUTER variant: every error emits — joined rows as matches
    arrive, NULL-click rows once the watermark passes the error's
    event time (no click with c_ts <= e_ts can still arrive, so the
    unmatched verdict is final). State interplay: clicks are evicted
    when the watermark passes c_ts + horizon; errors when it passes
    e_ts — both bounded by the watermark delay, exactly as the inner
    join, plus the deferred NULL emission."""
    cond = (
        (F.col("c_user_id") == F.col("e_user_id"))
        & (F.col("c_ts") <= F.col("e_ts"))
        & (F.col("c_ts") > F.col("e_ts") - F.expr(f"INTERVAL {JOIN_HORIZON}"))
    )
    return errors.join(clicks, cond, "leftOuter").select(
        F.col("e_event_id").alias("error_event_id"),
        F.col("e_user_id").alias("user_id"),
        F.col("e_ts_micros").alias("error_ts_us"),
        F.col("c_event_id").alias("click_event_id"),
        F.col("c_ts_micros").alias("click_ts_us"),
    )
