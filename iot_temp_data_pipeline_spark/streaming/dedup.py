"""Streaming dedup — the Structured Streaming analog of the W1
row_number dedup (`models/intermediate/int_temperature_anomalies.sql:10-25`,
SURVEY.md §2.4/§2.10).

Batch W1 keeps the latest record per ``(device_id, reading_timestamp)``.
In a stream the same contract is ``dropDuplicates`` over the key with a
watermark on the event-time column: state for keys older than the
watermark is evicted, so memory is bounded no matter how long the stream
runs — the design decision the reference's full-refresh model never had
to make (SURVEY.md §7.4 item 5).

State sizing at scale: one state-store entry per distinct key inside the
watermark horizon, hash-partitioned by key across
``spark.sql.shuffle.partitions`` tasks — no driver accumulation, no
unbounded growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    sdf: DataFrame,
    event_time_col: str = "event_time",
    delay: str = "1 hour",
    keys: list[str] | None = None,
) -> DataFrame:
    """Exactly-one-row-per-key over a stream, late data bounded by
    ``delay``. ``keys`` defaults to all columns (exact-duplicate drop —
    first-wins == any-wins, deterministic). The event-time column must be
    among the keys for state eviction to apply."""
    if keys is None:
        keys = list(sdf.columns)
    return sdf.withWatermark(event_time_col, delay).dropDuplicates(keys)
