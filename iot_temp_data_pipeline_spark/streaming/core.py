"""Streaming runtime helpers: landing-zone materialization and the
availableNow run-to-completion loop.

``trigger(availableNow=True)`` is the exact Spark analog of the
reference's cadence model (process everything currently in the landing
zone, then stop — `airflow/dags/iot_temperature_dag.py:202-222`): the
checkpoint's file-source log replaces both the FileSensor and the
(stubbed) SHA-256 hash-skip (`dlt_ingest/iot_temperature_pipeline.py:33-39`)
with exactly-once per-path tracking that survives restarts.

At scale: the file source lists the landing dir incrementally
(``maxFilesPerTrigger`` bounds per-batch work), each micro-batch is a
normal distributed job, and all operator state (dedup keys, window
aggregates, custom state) lives in the partitioned state store — nothing
accumulates on the driver.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


atexit.register(_cleanup_scratch)


def workdir(prefix: str) -> str:
    """Fresh scratch dir for a landing zone / sink / checkpoint triple.

    Prefers shared-memory tmpfs (/dev/shm) over /tmp when present:
    checkpoint commits fsync every micro-batch and the format roundtrips
    write real files, so scratch I/O latency lands directly on query
    wall-clock. On a production cluster this corresponds to pointing
    scratch/checkpoint at node-local SSD instead of a slow root volume
    (durable checkpoints belong on the DFS — overridable via
    SPARK_GRAFT_SCRATCH).

    Every dir handed out is removed at interpreter exit — tmpfs scratch
    is RAM-backed, so leaked dirs would otherwise accumulate shared
    memory across repeated runs on a long-lived host."""
    root = os.environ.get("SPARK_GRAFT_SCRATCH")
    if root is None and os.path.isdir("/dev/shm"):
        root = "/dev/shm"
    d = tempfile.mkdtemp(prefix=f"spark_graft_{prefix}_", dir=root)
    _SCRATCH_DIRS.append(d)
    return d


def materialize_landing(df: DataFrame, landing_dir: str, n_files: int = 4) -> None:
    """Write a batch DataFrame as an n-file CSV landing zone so the file
    source sees multiple files → multiple micro-batches under
    ``maxFilesPerTrigger`` (the 30-minute-drop simulation)."""
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("header", True)
        .csv(landing_dir)
    )


def run_available_now(
    sdf: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Run a streaming DataFrame to completion into a parquet sink."""
    query = (
        sdf.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def read_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
