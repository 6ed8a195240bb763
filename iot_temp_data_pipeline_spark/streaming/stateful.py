"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10-§2.11: the reference has no stateful operators; this is
the extension surface the task brief calls `applyInPandasWithState for
custom stateful operators`).

Operator: per-device *running* sensor statistics. Every micro-batch in
which a device appears emits that device's cumulative
``(n, sum, min, max)`` so far — an update log. Because ``n`` is strictly
increasing per device, the final state of every device is recoverable
from the append-mode output as the max-``n`` row, and THAT is what the
DuckDB oracle checks (a plain GROUP BY over the whole input) — the
incremental path must converge to the batch answer regardless of how
files were split into micro-batches.

Values are pre-scaled integers (``temp_centi``) so cumulative sums are
exact and order-independent.

Scale: state is one tiny tuple per device, hash-partitioned across the
state store; Arrow moves each group's batch rows to Python in columnar
form (pandas), not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, sum_centi BIGINT, min_centi BIGINT, max_centi BIGINT"
OUTPUT_SCHEMA = (
    "device_id STRING, n BIGINT, sum_centi BIGINT, min_centi BIGINT, max_centi BIGINT"
)


def _update_device_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mn, mx = state.get if state.exists else (0, 0, None, None)
    for pdf in pdfs:
        c = pdf["temp_centi"]
        if len(c) == 0:
            continue
        n += int(len(c))
        total += int(c.sum())
        bmn, bmx = int(c.min()), int(c.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    if n > 0:
        state.update((n, total, mn, mx))
        yield pd.DataFrame(
            {
                "device_id": [key[0]],
                "n": [n],
                "sum_centi": [total],
                "min_centi": [mn],
                "max_centi": [mx],
            }
        )


def running_device_stats(sdf: DataFrame) -> DataFrame:
    """Attach the stateful operator to a stream with columns
    ``device_id`` and ``temp_centi``."""
    return sdf.groupBy("device_id").applyInPandasWithState(
        _update_device_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------- latest-wins dedup

LATEST_STATE_SCHEMA = "n BIGINT, best_dlt STRING, best_temp BIGINT"
LATEST_OUTPUT_SCHEMA = (
    "device_id STRING, ts_micros BIGINT, n BIGINT, dlt_id STRING, temp_centi BIGINT"
)


def _update_latest(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, best_dlt, best_temp = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += int(len(pdf))
        # lexicographic max dlt_id == W1's ORDER BY _dlt_id DESC winner
        idx = pdf["dlt_id"].astype(str).idxmax()
        dlt, temp = str(pdf["dlt_id"][idx]), int(pdf["temp_centi"][idx])
        if best_dlt is None or dlt > best_dlt:
            best_dlt, best_temp = dlt, temp
    if n > 0:
        state.update((n, best_dlt, best_temp))
        yield pd.DataFrame(
            {
                "device_id": [key[0]],
                "ts_micros": [int(key[1])],
                "n": [n],
                "dlt_id": [best_dlt],
                "temp_centi": [best_temp],
            }
        )


def latest_wins_dedup(sdf: DataFrame) -> DataFrame:
    """The TRUE streaming analog of W1 (`int_temperature_anomalies.sql:
    10-25`): keep the latest record (max ``dlt_id``) per
    ``(device_id, ts_micros)`` key, incrementally across micro-batches.
    Each batch emits the current winner + rows-seen count ``n``; since
    ``n`` is strictly increasing per key, the final winner per key is
    the max-``n`` emission — converging to the batch row_number dedup
    no matter how the input was split."""
    return sdf.groupBy("device_id", "ts_micros").applyInPandasWithState(
        _update_latest,
        LATEST_OUTPUT_SCHEMA,
        LATEST_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
