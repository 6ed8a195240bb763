"""Point-in-interval range join via time-bucket blocking — the second
time-series operator (with the as-of join, operators/asof.py) Spark has
no native support for.

A direct `intervals.start <= point.ts AND point.ts < intervals.end`
join has no equi-key, so Spark plans BroadcastNestedLoop — O(P×I) and
only viable while one side broadcasts. The blocking rewrite makes it an
equi-join:

  * each interval is exploded to the fixed-width time buckets it
    overlaps (F.sequence — bounded fanout: width/bucket + 1 rows);
  * each point maps to its single bucket;
  * join on (keys…, bucket) — a plain hash join — then apply the exact
    range predicate as a residual filter.

A (point, interval) pair can only meet in the point's one bucket, so no
dedup is needed. Cost: O(P + I·f + matches) with fanout f ≈
interval_width / bucket_width; choosing bucket_width ≈ the typical
interval width keeps f ≈ 2. This is the interval-join strategy inside
dedicated engines (e.g. sorted-merge interval trees) re-expressed as a
shuffle-friendly Spark plan that inherits AQE sizing and skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

__all__ = ["point_in_interval_join", "clicks_in_error_windows"]


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys) with
    ``start <= point_ts < end``; all timestamp columns are integral
    (e.g. epoch micros). Returns points columns + intervals columns.
    ``bucket_width`` is in the same units; pick ≈ the typical interval
    width to bound the explode fanout."""
    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start) / bucket_width).cast("long"),
                ((F.col(end) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", (F.col(point_ts) / bucket_width).cast("long")
    )
    cond: Column = F.lit(True)
    for k in on + ["_bucket"]:
        cond = cond & (pts[k] == ivl[k])
    joined = pts.join(ivl, cond, "inner").filter(
        (ivl[start] <= pts[point_ts]) & (pts[point_ts] < ivl[end])
    )
    keep = [pts[c] for c in points.columns] + [
        ivl[c] for c in intervals.columns if c not in set(on)
    ]
    return joined.select(*keep)


# ------------------------------------------------- registry query + oracle

WINDOW_US = 30 * 60 * 1_000_000  # 30-minute incident windows


def clicks_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which clicks landed inside the 30 minutes after an error by the
    same user (incident-affected clicks). Intervals = [error_ts,
    error_ts + 30 min); bucket width = the window width, so each
    interval explodes to exactly 2 buckets."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_event_id"),
        F.unix_micros("ts").alias("click_ts_us"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("error_event_id"),
        F.unix_micros("ts").alias("win_start_us"),
        (F.unix_micros("ts") + WINDOW_US).alias("win_end_us"),
    )
    out = point_in_interval_join(
        clicks,
        errors,
        on=["user_id"],
        point_ts="click_ts_us",
        start="win_start_us",
        end="win_end_us",
        bucket_width=WINDOW_US,
    )
    return out.select(
        F.col("user_id").cast("long"),
        F.col("click_event_id").cast("long"),
        F.col("click_ts_us").cast("long"),
        F.col("error_event_id").cast("long"),
        F.col("win_start_us").cast("long"),
    )


RANGEJOIN_SQL = """
SELECT CAST(c.user_id AS BIGINT) AS user_id,
    CAST(c.event_id AS BIGINT) AS click_event_id,
    CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
    CAST(e.event_id AS BIGINT) AS error_event_id,
    CAST(epoch_us(e.ts) AS BIGINT) AS win_start_us
FROM events c
JOIN events e
  ON e.user_id = c.user_id
 AND epoch_us(e.ts) <= epoch_us(c.ts)
 AND epoch_us(c.ts) < epoch_us(e.ts) + 1800000000
WHERE c.event_type = 'click' AND e.event_type = 'error'
"""
