"""Round-8 scale probes (VERDICT r7 asks #5/#6 + protocol for the new
r8 operators):

- knn_sq8_rerank r-doubling at 100x: the 9.8x ratio was annotated as
  shortlist pair-bound (Q·r grew 100x); if that bound is real, doubling
  the rerank depth r should grow wall ~linearly in r, not blow up.
- streaming_mad_partials / streaming_cms_partials at 100x (first 100x
  rows for the streamed-partials queries).
- corpus_pipeline_full at 100x (the new flagship needs its row).
- every new r8 widening operator at 100x. The three retrieval ops are
  probed with the QUERY WORKLOAD HELD FIXED (query_mod scaled with the
  corpus so the query count stays constant — the "facts grow, dims
  don't" convention applied to the query set): growing queries 100x
  alongside the corpus multiplies pair work 10,000x and measures the
  brute-force contract, not plan scaling.

Reuses scale_probe's replica builder + timing protocol (warm-up run,
clearCache, one measured run).

Usage: python scripts/probe_r8.py [replication]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import BASE_SF, build_scaled, timed  # noqa: E402

from iot_temp_data_pipeline_spark.operators import retrieval_ext as rx  # noqa: E402
from iot_temp_data_pipeline_spark.operators import sq8  # noqa: E402
from iot_temp_data_pipeline_spark.session import get_spark  # noqa: E402

REGISTRY_ROWS = [
    "corpus_pipeline_full",
    "dedup_prefix_filter_join",
    "streaming_novelty_curve",
    "streaming_mad_partials",
    "streaming_cms_partials",
    "corpus_dedup_curve",
    "pmi_collocations",
    "quality_quantile_normalize",
]


def timed_call(spark, fn, *args, **kwargs) -> float:
    def run():
        fn(*args, **kwargs).write.format("noop").mode("overwrite").save()

    run()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="probe_r8")
    scaled_dir = f"/tmp/spark_graft_scale_x{replication}"
    if not os.path.exists(f"{scaled_dir}/lineitem.parquet"):
        build_scaled(spark, scaled_dir, replication)

    print(f"| query | sf0.1 (s) | sf0.1 x{replication} (s) | ratio |")
    print("|---|---|---|---|")
    for name in REGISTRY_ROWS:
        base = timed(spark, name, BASE_SF)
        big = timed(spark, name, scaled_dir)
        print(
            f"| {name} | {base:.2f} | {big:.2f} | {big / base:.1f}x |",
            flush=True,
        )

    # retrieval ops: fixed query workload (query_mod scales with corpus)
    fixed_q = [
        ("colbert_maxsim_topk", rx.maxsim_topk,
         {"query_mod": rx.MAXSIM_QUERY_MOD},
         {"query_mod": rx.MAXSIM_QUERY_MOD * replication}),
        ("matryoshka_recall_sweep", rx.matryoshka_recall,
         {"query_mod": rx.MATRYOSHKA_QUERY_MOD},
         {"query_mod": rx.MATRYOSHKA_QUERY_MOD * replication}),
        ("knn_label_filtered", rx.knn_label_filtered,
         {"query_mod": rx.FILTERED_QUERY_MOD},
         {"query_mod": rx.FILTERED_QUERY_MOD * replication}),
        ("maxsim_pooled_rerank", rx.maxsim_pooled_rerank,
         {"query_mod": rx.MAXSIM_QUERY_MOD},
         {"query_mod": rx.MAXSIM_QUERY_MOD * replication}),
    ]
    for name, fn, kw_base, kw_big in fixed_q:
        base = timed_call(spark, fn, spark, BASE_SF, **kw_base)
        big = timed_call(spark, fn, spark, scaled_dir, **kw_big)
        print(
            f"| {name} (fixed Q) | {base:.2f} | {big:.2f} |"
            f" {big / base:.1f}x |",
            flush=True,
        )

    # r-doubling at the big scale only: does wall grow ~linearly in r?
    for r in (25, 50):
        dt = timed_call(spark, sq8.knn_sq8_rerank, spark, scaled_dir, r=r)
        print(f"| knn_sq8_rerank x{replication} r={r} | — | {dt:.2f} | — |",
              flush=True)


if __name__ == "__main__":
    main()
