"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via the noop sink (no driver collect,
no disk write — measures scan+compute+shuffle only).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
from iot_temp_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "staging_readings",
    "dedup_valid_readings",
    "anomaly_scores_t2",
    "mart_readings",
    "summary_by_device",
    "summary_overall",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "window_temperature_deltas",
    "events_hourly_tumbling",
    "ingest_kaggle_transform",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "knn_brute_force_cosine",
    "knn_ivf_cosine",
    "text_stats",
    "multimodal_media_metadata",
    "streaming_ingest_kaggle",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footer caches once so per-query numbers
    # measure execution, not first-touch JIT
    REGISTRY["staging_readings"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        start = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - start, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
