"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ELT pipeline (mhassan-k/iot-temp-data-pipeline).

The reference is a dlt→Postgres→dbt→Airflow stack; every analytical
transform there is declarative SQL executed by Postgres
(see SURVEY.md §0). This package re-expresses those semantics as
idiomatic Spark DataFrame programs: each dbt model becomes a Python
function ``DataFrame -> DataFrame``, dbt ``ref()`` edges become function
composition inside one Catalyst plan, and Jinja macros become Python
functions returning ``Column`` expressions (compile-time expansion,
zero runtime cost).

Layout:
  session      SparkSession builder (UTC, ANSI off, AQE on)
  sources/     parquet catalog, CSV ingestion (dlt-layer analog),
               events→readings surrogate mapping
  functions/   Column-factory helpers (macro analogs), portable hashing,
               text + vector helpers
  operators/   the dbt models (staging / anomalies / marts) plus
               beyond-reference operators (dedup, similarity, text)
  plans/       named query registry + DuckDB oracle SQL (driver contract)
  streaming/   Structured Streaming variants (availableNow ingestion,
               watermark dedup, windowed aggregation)
"""

__version__ = "0.1.0"
