"""As-of (point-in-time) join — the classic time-series operator Spark
has no built-in for (reference parity: the reference's pipeline joins
each reading to per-group statistics computed as-of the load; this
generalizes that to event-time point-in-time matching, the operator a
training-data / feature-store pipeline needs for leakage-free feature
lookup).

Spark-first design — the UNION + WINDOW rewrite, not a join:

    left  (probe) rows and right (reference) rows are stacked into one
    frame tagged with `side`, sorted within each key by
    (ts, side, tie), and each probe row picks up the most recent
    reference row via last(col, ignorenulls=True) over the running
    window.

Why this shape at 100 TB: a naive as-of is a non-equi join — O(L×R)
pairs per key for a sort-merge-range plan Spark doesn't have, or a
BroadcastNestedLoop if expressed directly. The union rewrite is ONE
hash-partition shuffle on the key plus a per-partition sort: O((L+R)
log(L+R)) per key, the same cost profile as any windowed aggregation,
and it inherits AQE skew-splitting. No driver collect, no blowup.

Tie semantics (ASOF JOIN ... "backward", inclusive): a reference row at
exactly the probe timestamp matches (side orders reference rows first
within a timestamp); among equal-timestamp reference rows the one with
the largest tie-column wins. Both sides of the oracle pin the same
order, so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

__all__ = ["asof_join", "last_click_before_error"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    tie: str | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the columns of the single right row
    with the largest ``ts`` <= left.``ts`` (direction="backward"), or
    the smallest ``ts`` >= left.``ts`` (direction="forward"), within the
    same ``on`` key group. Right value columns are prefixed with
    ``right_prefix``; unmatched left rows keep NULLs (left-outer
    semantics).

    ``tie`` (a right-side column, e.g. a unique id) breaks
    equal-timestamp ties deterministically: largest wins for backward,
    smallest for forward.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    key_cols = set(on) | {ts}
    right_vals = [c for c in right.columns if c not in key_cols]
    left_vals = [c for c in left.columns if c not in key_cols]

    # side=0 sorts reference rows before probe rows at an equal
    # timestamp (inclusive match) for backward; forward flips the sort
    # so "first reference at or after" is again a running last().
    r = right.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie) if tie else F.lit(0)).alias("_tie"),
        F.col(ts).alias(f"{right_prefix}{ts}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_vals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_vals],
    )
    lf = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tie"),
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{right_prefix}{ts}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}")
            for c in right_vals
        ],
        *[F.col(c) for c in left_vals],
    )
    u = r.unionByName(lf)

    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tie").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched_cols = [f"{right_prefix}{ts}"] + [f"{right_prefix}{c}" for c in right_vals]
    out = u
    for c in matched_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).select(
        *on, F.col("_ts").alias(ts), *left_vals, *matched_cols
    )


# ------------------------------------------------- registry query + oracle

def last_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, attach to every 'error' event the most recent 'click'
    event at or before it (backward inclusive as-of, event_id
    tie-break). Timestamps are emitted as epoch microseconds so the
    engine comparison is exact-integer."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(errors, clicks, on=["user_id"], ts="ts", tie="event_id")
    return joined.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_centi"),
        F.col("r_event_id").cast("long").alias("click_event_id"),
        F.unix_micros("r_ts").alias("click_ts_us"),
        F.round(F.col("r_value") * 100).cast("long").alias("click_value_centi"),
    )


# Oracle: the identical union+window rewrite in portable SQL (DuckDB
# supports IGNORE NULLS); epoch_us() mirrors unix_micros().
ASOF_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(ts_us AS BIGINT) AS ts_us,
       CAST(value_centi AS BIGINT) AS value_centi,
       CAST(click_event_id AS BIGINT) AS click_event_id,
       CAST(click_ts_us AS BIGINT) AS click_ts_us,
       CAST(click_value_centi AS BIGINT) AS click_value_centi
FROM (
    SELECT user_id, event_id, ts_us, value_centi, side,
        last_value(r_event_id IGNORE NULLS) OVER win AS click_event_id,
        last_value(r_ts_us IGNORE NULLS) OVER win AS click_ts_us,
        last_value(r_value_centi IGNORE NULLS) OVER win AS click_value_centi
    FROM (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            CAST(NULL AS BIGINT) AS value_centi, 0 AS side,
            event_id AS r_event_id, epoch_us(ts) AS r_ts_us,
            CAST(ROUND(value * 100) AS BIGINT) AS r_value_centi
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            CAST(ROUND(value * 100) AS BIGINT) AS value_centi, 1 AS side,
            CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM events WHERE event_type = 'error'
    ) unioned
    WINDOW win AS (
        PARTITION BY user_id ORDER BY ts_us, side, r_event_id NULLS LAST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
) w
WHERE side = 1
"""
