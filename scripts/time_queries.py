"""Ad-hoc timing probe: bench.py's exact protocol (2 warm-ups, min of 2
measured, clearCache between runs) over a named subset of registry
queries. Usage: python scripts/time_queries.py q1 q2 ...  [SPARK_GRAFT_SF_DIR]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
from iot_temp_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="time_queries")

    def run(name: str) -> None:
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in names:
        for _ in range(2):
            run(name)
            spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - start)
            spark.catalog.clearCache()
        print(f"{name}: {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
