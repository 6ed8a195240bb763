"""Targeted min-of-N re-measurement of specific registry queries under
the bench.py protocol (noop sink, warm-ups, clearCache between runs),
with the matching DuckDB oracle timings — for confirming or refuting
wall-clock drift on individual rows without a full bench sweep.

Usage: python scripts/measure_subset.py q1 q2 ...   [N via $MEASURE_N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
from iot_temp_data_pipeline_spark.session import get_spark  # noqa: E402
from bench import duckdb_timings  # noqa: E402


def main() -> None:
    unknown = [n for n in sys.argv[1:] if n not in REGISTRY]
    if unknown:  # fail loudly — a typo must not read as "no drift"
        raise SystemExit(f"not in REGISTRY: {unknown}")
    names = list(sys.argv[1:])
    n_runs = int(os.environ.get("MEASURE_N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_subset")

    def run(name: str) -> None:
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # scheduling floor, same probe as bench.py
    for _ in range(2):
        spark.range(1).write.format("noop").mode("overwrite").save()
    floor = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor = min(floor, time.perf_counter() - t0)

    out: dict[str, dict] = {}
    for name in names:
        for _ in range(2):
            run(name)
            spark.catalog.clearCache()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run(name)
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs)}

    duck = duckdb_timings(sf_dir, names)
    for name in names:
        d = duck.get(name)
        o = out[name]
        o["duckdb"] = d
        if d:
            o["ratio"] = round(o["min"] / d, 2)
            o["fcr"] = round(max(0.0, o["min"] - floor) / d, 2)
    print(json.dumps({"floor": round(floor, 3), "queries": out}, indent=1))


if __name__ == "__main__":
    main()
