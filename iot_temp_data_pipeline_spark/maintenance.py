"""Table maintenance: the reference's cleanup/ANALYZE tasks
(SURVEY.md §2.1 S11/S12, `airflow/dags/iot_temperature_dag.py:249-305`).

- S11 retention: Postgres `DELETE WHERE ingestion_timestamp <
  CURRENT_DATE - 90 days` → immutable-storage rewrite: filter + overwrite
  (at scale: partition the table by date so the rewrite prunes to the
  expiring partitions only, or use a Delta/Iceberg DELETE).
- S12 stats refresh: `ANALYZE <table>` → `ANALYZE TABLE … COMPUTE
  STATISTICS [FOR ALL COLUMNS]`, feeding Spark's CBO (row counts, sizes,
  per-column NDV/min/max). AQE re-plans at runtime anyway, so this is
  the batch-planning complement, exactly like Postgres's ANALYZE fed its
  cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_retention(
    df: DataFrame, ts_col: str = "ingestion_timestamp", days: int = 90
) -> DataFrame:
    """S11: keep only rows younger than the retention window (the
    rewrite-on-write form of the reference's DELETE)."""
    return df.filter(F.col(ts_col) >= F.date_sub(F.current_date(), days))


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """S9's index analog at join time: hash-bucketed table layout.

    Two tables bucketed identically on the join key co-locate their
    buckets, so the join runs with NO shuffle exchange on either side —
    the Spark equivalent of the reference's B-tree-indexed mart join
    access path (`models/marts/mart_temperature_readings.sql:4-12`), and
    the standard trick for repeated large-×-large joins at 100 TB (pay
    the shuffle once at write time, never again per query).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def materialize_and_analyze(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    all_columns: bool = True,
) -> dict[str, str]:
    """S12: persist a model as a catalog table and refresh optimizer
    statistics; returns the collected table stats for inspection."""
    df.write.mode("overwrite").saveAsTable(table)
    suffix = " FOR ALL COLUMNS" if all_columns else ""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS{suffix}")
    described = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return {r["col_name"]: str(r["data_type"]) for r in described if r["col_name"]}


def analyzed_column_stats(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    cols: list[str],
) -> DataFrame:
    """S12 as a queryable surface: materialize ``df`` as a catalog
    table, run `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS`
    (the exact analog of the reference's per-table `ANALYZE`,
    `airflow/dags/iot_temperature_dag.py:276-287`), and return the
    CBO's recorded statistics — table row count plus per-column
    null count and min/max — as a DataFrame.

    Row count, null counts, and min/max in Spark's catalog stats are
    exact aggregates, so they oracle-check against direct SQL over the
    source; `distinct_count` is a HyperLogLog estimate and is
    deliberately NOT exposed here (not exactly reproducible across
    engines)."""
    df.write.mode("overwrite").saveAsTable(table)
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats_line = next(
        r["data_type"] for r in detail if r["col_name"] == "Statistics"
    )
    # "NNN bytes, MMM rows"
    table_rows = int(stats_line.split(",")[1].strip().split(" ")[0])
    out = []
    for c in cols:
        info = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED {table} {c}").collect()
        }
        out.append((c, table_rows, int(info["num_nulls"]), info["min"], info["max"]))
    return spark.createDataFrame(
        out,
        schema="col_name string, table_rows long, num_nulls long, "
        "min_value string, max_value string",
    )


def compact_small_files(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files. The file-count pathology is
    the streaming/CDC sink's long-term failure mode (every micro-batch
    appends small files; listing + per-file open costs grow linearly);
    periodic compaction restores scan efficiency. Returns (files_before,
    files_after).

    At 100 TB this runs per partition directory (bounded work, like the
    upsert); here the whole dir is one unit. `coalesce` avoids a
    shuffle when reducing file count — the rewrite is scan + write."""
    import glob
    import math
    import os

    files = glob.glob(f"{table_dir}/*.parquet")
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(table_dir)
    tmp = table_dir.rstrip("/") + "__compact_tmp"
    df.coalesce(n_target).write.parquet(tmp)
    # atomic-ish swap (same filesystem): old dir replaced by compacted
    bak = table_dir.rstrip("/") + "__compact_old"
    os.rename(table_dir, bak)
    os.rename(tmp, table_dir)
    import shutil

    shutil.rmtree(bak)
    return len(files), len(glob.glob(f"{table_dir}/*.parquet"))
