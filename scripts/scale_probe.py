"""Scaling probe: replicate the sf0.1 fixtures 10x (key-shifted, so
cardinalities scale too — 10x devices, docs, orders) into a temp dir,
then run headline queries at both scales and report the time ratio.

A shuffle- or plan-pathology (quadratic candidate blowup, driver
collect, broadcast overflow) shows up as a ratio >> 10; healthy
operators land near or below 10 (fixed per-job overhead amortizes).

Usage: python scripts/scale_probe.py [replication] [out.md] [only,names]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY
from iot_temp_data_pipeline_spark.session import get_spark
from iot_temp_data_pipeline_spark.sources.catalog import TABLES, load_table

BASE_SF = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000_000  # far above any fixture key

# per-table key columns to shift per replica (dimension tables that the
# queries treat as fixed-size lookup sides are replicated WITHOUT key
# shifts only when unreferenced keys would break joins — instead we keep
# dims at 1x, which matches how real warehouses scale: facts grow, dims don't)
FACT_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

QUERIES = [
    "staging_readings",
    "dedup_valid_readings",
    "anomaly_scores_t2",
    "summary_by_device",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume_customers",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_stats",
    "knn_ivf_cosine",
    "training_corpus_prep",
    "events_asof_last_click",
    "clicks_in_error_windows",
    "customer_order_windows",
    "revenue_rollup",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q21_suppliers_who_kept_waiting",
    "dedup_clusters_ngram",
    "value_trend_by_type",
    "events_resample_hourly_ffill",
    "quality_repetition_rules",
    "decontaminate_ngram_overlap",
    "domain_cap_sample",
    "kmeans_embedding_clusters",
    "tfidf_topk",
    "knn_lsh_cosine",
    "chunk_documents_cdc",
    "dedup_chunk_overlap",
    "pack_sequences_grid",
    "pack_sequences_sharded",
    "pagerank_dedup_graph",
    "domain_cap_threshold",
]


def build_scaled(spark, out_dir: str, replication: int) -> None:
    for name in TABLES:
        df = load_table(spark, BASE_SF, name)
        if name in FACT_SHIFTS:
            parts = []
            for i in range(replication):
                part = df
                for key in FACT_SHIFTS[name]:
                    part = part.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT))
                if name == "documents" and i > 0:
                    # Suffix every token with the replica index so replicas
                    # are NOT near-duplicates of each other: a verbatim 10x
                    # replication makes every doc have 9 true near-dups, so
                    # pair OUTPUT grows quadratically no matter how good the
                    # plan is — that measures dup density, not plan scaling.
                    part = part.withColumn(
                        "text",
                        F.regexp_replace("text", r"(\S+)", rf"$1_{i}"),
                    )
                parts.append(part)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        else:
            scaled = df  # dims stay 1x
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def timed(spark, name: str, sf_dir: str) -> float:
    def run():
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # JIT warm-up
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_md = sys.argv[2] if len(sys.argv) > 2 else None
    queries = QUERIES
    if len(sys.argv) > 3:
        queries = [q for q in sys.argv[3].split(",") if q in REGISTRY]
    spark = get_spark(app_name="scale_probe")
    scaled_dir = f"/tmp/spark_graft_scale_x{replication}"
    if not os.path.exists(f"{scaled_dir}/lineitem.parquet"):
        build_scaled(spark, scaled_dir, replication)

    lines = [
        f"| query | sf0.1 (s) | sf0.1 x{replication} (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name in queries:
        base = timed(spark, name, BASE_SF)
        big = timed(spark, name, scaled_dir)
        ratio = big / base if base > 0 else float("inf")
        lines.append(f"| {name} | {base:.2f} | {big:.2f} | {ratio:.1f}x |")
        print(lines[-1], flush=True)

    if out_md:
        with open(out_md, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
