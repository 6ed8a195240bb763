"""JDBC source/sink — the reference's Postgres load path, Spark-first.

The reference loads every dataset into Postgres (`dlt_ingest/
iot_temperature_pipeline.py:262-267` — `destination='postgres'`) and all
dbt models read from it. SURVEY.md §2.1 S7 keeps this repo parquet-first
but reserves JDBC "if Postgres parity is demanded"; this module is that
parity surface: a thin, scale-opinionated wrapper over Spark's built-in
JDBC relation provider, exercised end-to-end in tests and in the
`jdbc_roundtrip` registry query against the Derby embedded driver that
ships inside pyspark's jars (no external database needed — the SAME
code path serves Postgres by swapping the URL/driver, since Spark's
JDBCRelation handles dialect differences).

Scale design (100 TB stance):

- **Reads are partitioned.** A bare `spark.read.jdbc(url, table)` is a
  SINGLE connection pulling the whole table through one task — the
  classic JDBC scale-killer. `jdbc_read` requires callers either to
  accept that explicitly (`num_partitions=1`) or to supply a numeric
  `partition_column` + bounds so Spark issues `num_partitions` range
  predicates in parallel (`WHERE col >= lo AND col < hi`), each its own
  task/connection. Filters and column pruning push into the remote SQL
  (`PushedFilters` in the scan node), so the database does the
  selection, not the network.
- **Writes bound their connection count.** Every write task opens one
  connection; a 2000-partition DataFrame would open 2000. `jdbc_write`
  coalesces to `max_connections` (default 8 — a Postgres default
  `max_connections=100` budget shared with everything else) and batches
  inserts (`batchsize`, default 10k) so each round-trip carries a page
  of rows, not one.
- **Types are explicit where dialects are weak.** Spark's Derby dialect
  maps StringType → CLOB, which no sane warehouse schema wants;
  `create_table_column_types` forwards Spark's
  `createTableColumnTypes` option so callers pin VARCHAR widths (the
  same option fixes TEXT-vs-VARCHAR choices on Postgres).

Derby notes (test/CI backend only): `jdbc:derby:memory:<name>;create=true`
is an in-JVM database — visible to all local-mode executor threads,
freed on JVM exit (or explicitly via `drop_derby_memory_db`). The
embedded driver class lives in derbytools.jar, already on Spark's
classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_memory_url(db_name: str) -> str:
    """URL for an in-JVM Derby database (created on first touch)."""
    return f"jdbc:derby:memory:{db_name};create=true"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    *,
    max_connections: int = 8,
    batchsize: int = 10_000,
    create_table_column_types: str | None = None,
    driver: str | None = None,
    isolation_level: str = "READ_COMMITTED",
) -> None:
    """Append/overwrite ``df`` into a JDBC table with a bounded number
    of connections and paged inserts. ``create_table_column_types``
    pins DDL types (e.g. ``"name VARCHAR(25), comment VARCHAR(200)"``)
    where the dialect default is wrong (Derby/Postgres string → CLOB/
    TEXT)."""
    if df.rdd.getNumPartitions() > max_connections:
        # repartition, NOT coalesce: coalesce folds into the upstream
        # stage, so a 2000-partition join pipeline would compute at
        # max_connections-way parallelism; the extra shuffle keeps the
        # connection bound local to the insert stage only
        df = df.repartition(max_connections)
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .option("isolationLevel", isolation_level)
        .mode(mode)
    )
    if create_table_column_types:
        w = w.option("createTableColumnTypes", create_table_column_types)
    if driver:
        w = w.option("driver", driver)
    w.save()


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    fetchsize: int = 10_000,
    driver: str | None = None,
) -> DataFrame:
    """Read a JDBC table. With ``partition_column`` + bounds, Spark
    issues ``num_partitions`` parallel range scans; without them the
    read is one connection and ``num_partitions`` must be left at 1 —
    an explicit opt-in to the serial path, never a silent default for
    large tables."""
    if partition_column is None and num_partitions != 1:
        raise ValueError(
            "num_partitions > 1 requires partition_column + bounds "
            "(a parallel JDBC read needs range predicates)"
        )
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetchsize)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower/upper bounds")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    if driver:
        r = r.option("driver", driver)
    return r.load()


def drop_derby_memory_db(db_name: str) -> None:
    """Free an in-JVM Derby database (tests/cleanup). Derby signals a
    successful drop with SQLException 08006, which surfaces through
    py4j — treated as success."""
    import py4j.protocol
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    jvm = spark._jvm
    try:
        jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{db_name};drop=true"
        )
    except py4j.protocol.Py4JJavaError as e:
        # Derby signals a SUCCESSFUL drop via SQLException 08006; any
        # other failure (db in use, bad name) must surface, or a later
        # test reusing the name would silently see stale tables
        if "08006" not in str(e):
            raise
