"""Event-time windowed aggregation with watermarking — the
beyond-reference streaming showcase (SURVEY.md §2.10: the reference's
time-bucket dimensions are window-like but it has no event-time
windows, no late-data story).

Append-mode semantics (what the oracle must model): a window is emitted
exactly once, when the watermark (``max(event_time) - delay``) passes
its end — late rows beyond the delay are dropped. With
``availableNow`` the final no-data batch advances the watermark to
``max - delay`` over the whole input, so the emitted set is the
deterministic prefix of finalized windows.

Scale: partial aggregation happens map-side per micro-batch; the state
store holds one entry per open (window × group) key, hash-partitioned;
watermark eviction keeps it bounded by the delay horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_stats(
    sdf: DataFrame,
    event_time_col: str = "event_time",
    window_duration: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Tumbling window × event_type counts + exact integer value sums
    (value pre-scaled to ``value_centi`` so sums are order-independent
    and engine-exact)."""
    win = F.window(event_time_col, window_duration)
    agg = (
        sdf.withWatermark(event_time_col, delay)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_centi").alias("sum_centi"),
            F.min("value_centi").alias("min_centi"),
            F.max("value_centi").alias("max_centi"),
        )
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_centi",
        "min_centi",
        "max_centi",
    )
