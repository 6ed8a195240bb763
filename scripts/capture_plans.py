"""Capture `.explain("formatted")` output for named registry queries
into plans/<round>/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (OPTIMIZATION_r*.md companion files).

Usage: python scripts/capture_plans.py <suffix> q1 q2 ...
       [SF dir via $SPARK_GRAFT_SF_DIR, default sf0.1 — plans are
       captured at the bench scale so Exchange counts / join strategy
       match what the bench measures; round dir via $SPARK_GRAFT_PLAN_DIR,
       default r12]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
from iot_temp_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:  # ADVICE r11: argv guard, not an IndexError
        raise SystemExit(__doc__)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in REGISTRY: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
