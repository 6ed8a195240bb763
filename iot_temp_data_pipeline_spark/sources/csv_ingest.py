"""Batch CSV ingestion — the dlt-layer analog (SURVEY.md §2.1/§2.3).

The reference's dlt pipeline (`dlt_ingest/iot_temperature_pipeline.py`)
is single-process row-at-a-time Python: glob → sha256 → skip-check →
pandas read with encoding fallback → per-row transform dicts → Postgres
INSERTs. Here the same semantics are distributed Spark:

- S1 directory glob      → `spark.read.csv(dir)` (or one path per file
                           for the per-file fallback loop)
- S2 encoding fallback   → try-in-order driver loop; Spark reads one
                           encoding per pass (py:107-123), malformed rows
                           surfaced via PERMISSIVE corrupt-record column
- S3 hash-skip           → LEFT ANTI join of file hashes against the
                           processing log (py:33-39,236-252; the
                           reference's `_get_processed_files` is a stub,
                           so its dedup never fires — ours does)
- S4 file metadata       → `input_file_name()` + `_metadata` hidden cols
- S5 row ids per file    → `row_number()` over a per-file window
- S6 audit log           → one-row-per-file aggregate
- I1 format dispatch     → driver-side schema inspection (py:126-143)
- I2-I5, I10-I12         → native column expressions (never Python UDFs)
- I6-I9 synthetic fields → `rand(seed)`/`randn(seed)` columns, documented
                           distribution-equivalent (not value-equal) to
                           the reference's numpy sequences (SURVEY §7.4.3)

At scale: ingestion is a single narrow map stage per file batch — no
shuffle except the optional per-file row_number window (partitioned by
file, so it parallelizes per file).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Encoding fallback order — `dlt_ingest/iot_temperature_pipeline.py:107-123`.
# Labels are the reference's pandas codec names; values are the Java
# charset names Spark's CSV reader accepts ("latin1"/"cp1252" are pandas
# aliases Java rejects, and Java has no BOM-stripping "utf-8-sig" codec —
# UTF-8 is its closest behavior).
ENCODINGS = (
    ("utf-8", "UTF-8"),
    ("utf-8-sig", "UTF-8"),
    ("latin1", "ISO-8859-1"),
    ("cp1252", "windows-1252"),
    ("iso-8859-1", "ISO-8859-1"),
)

KAGGLE_COLUMNS = {"id", "room_id/id", "noted_date", "temp", "out/in"}

DEVICE_TYPES = ["DHT22", "DS18B20", "SHT30", "BME280", "TMP36"]  # py:197-200
FIRMWARE_VERSIONS = ["v1.2.3", "v1.2.4", "v1.3.0", "v1.3.1", "v2.0.0"]  # py:198-201


def sha256_file(path: str) -> str:
    """File-level content hash, chunked — py:236-245."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def list_csv_files(landing_dir: str) -> list[str]:
    """S1 landing-zone glob — py:27-30."""
    return sorted(
        os.path.join(landing_dir, f)
        for f in os.listdir(landing_dir)
        if f.endswith(".csv")
    )


def read_csv_with_fallback(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """S2: try encodings in order until a read decodes cleanly.

    Returns (clean DataFrame, encoding used). Two failure signals per
    attempt (the Spark analog of pandas raising UnicodeDecodeError,
    py:107-123):

    - PERMISSIVE-mode corrupt-record rows (structural parse failures);
    - U+FFFD replacement characters in any column — Spark's charset
      decoder silently REPLACEs undecodable bytes instead of raising, so
      a latin-1 byte read as utf-8 would otherwise pass straight through
      as mojibake. Treating U+FFFD as a decode failure advances the
      chain to an encoding under which every byte is valid (latin1
      accepts all 256 byte values, so the loop always terminates). A
      genuine U+FFFD authored in a valid utf-8 file would also fall
      through — a documented deviation; the reference's pandas path
      cannot distinguish that case either once bytes are lost.

    Cost: one extra validation scan per attempted encoding per file —
    same shape as the reference's per-attempt full pandas decode.
    """
    last_err: Exception | None = None
    failed_charsets: set[str] = set()
    for enc, java_charset in ENCODINGS:
        # distinct pandas labels can map to the SAME Java charset
        # (utf-8-sig → UTF-8): retrying it must fail identically, so
        # skip the wasted full-file scan
        if java_charset in failed_charsets:
            continue
        try:
            df = (
                spark.read.option("header", True)
                .option("encoding", java_charset)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt_record")
                .csv(path)
            )
            bad = F.lit(False)
            for c in df.columns:
                if c == "_corrupt_record":
                    bad = bad | F.col(c).isNotNull()
                else:
                    bad = bad | F.col(c).contains("�")
            if df.filter(bad).limit(1).count():
                failed_charsets.add(java_charset)
                continue
            return df.drop("_corrupt_record"), enc
        except Exception as exc:  # pragma: no cover - IO errors
            last_err = exc
            failed_charsets.add(java_charset)
    raise ValueError(f"could not read {path} with any encoding: {last_err}")


def sanitize_columns(df: DataFrame) -> DataFrame:
    """I11 — `room_id/id` → `room_id_id` etc. (py:224-228)."""
    cleaned = [c.replace("/", "_").replace(" ", "_") for c in df.columns]
    return df.toDF(*cleaned)


def kaggle_transform(df: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """I2-I5 Kaggle-format transform as native expressions (py:146-170).

    Input columns (post-sanitize): id, room_id_id, noted_date, temp, out_in.
    ``passthrough`` columns are carried along unchanged.
    """
    return df.select(
        *[F.col(c) for c in passthrough],
        # I2 device-id synthesis: last `_` segment, first 8 chars, upper
        F.coalesce(
            F.when(
                F.col("id").isNotNull(),
                F.concat(
                    F.lit("IOT_TEMP_"),
                    F.upper(
                        F.substring(F.element_at(F.split(F.col("id"), "_"), -1), 1, 8)
                    ),
                ),
            ),
            F.lit("IOT_TEMP_UNKNOWN"),
        ).alias("device_id"),
        # I3 timestamp parse with coerce-to-null. try_to_timestamp gives
        # null-on-failure regardless of spark.sql.ansi.enabled — the session
        # is owned by the caller, so the parse must be session-independent
        # (reference: pd.to_datetime(..., errors='coerce'), py:157).
        F.try_to_timestamp(F.col("noted_date"), F.lit("dd-MM-yyyy HH:mm")).alias(
            "timestamp"
        ),
        # I4 float cast — try_cast: null-on-bad-value under ANSI too
        F.col("temp").try_cast("double").alias("temperature"),
        # I5 location synthesis: strip "Room ", Admin→Office, suffix _in/_out
        F.concat_ws(
            "_",
            F.regexp_replace(
                F.regexp_replace(F.col("room_id_id"), "Room ", ""), "Admin", "Office"
            ),
            F.lower(F.col("out_in")),
        ).alias("location"),
    )


def with_synthetic_sensor_fields(df: DataFrame, seed: int = 42) -> DataFrame:
    """I6-I9 synthetic humidity / battery / signal / device metadata.

    Distribution-equivalent to py:170-201 (same bases, scales and clips);
    exact numpy sequences are not reproducible distributed (SURVEY §7.4.3).
    """
    is_outdoor = F.lower(F.col("location")).contains("out")
    t = F.col("temperature")
    clip = lambda c, lo, hi: F.least(F.greatest(c, F.lit(lo)), F.lit(hi))  # noqa: E731
    humidity_base = F.when(is_outdoor, 65.0).otherwise(45.0)
    signal_base = F.when(is_outdoor, -45.0).otherwise(-55.0)
    pick = lambda opts, r: F.element_at(  # noqa: E731
        F.array(*[F.lit(o) for o in opts]),
        (F.floor(r * len(opts)) + 1).cast("int"),
    )
    return (
        df.withColumn(
            "humidity",
            F.round(
                clip(
                    humidity_base + (F.lit(25.0) - t) * 1.2 + F.randn(seed) * 8,
                    20.0,
                    95.0,
                ),
                1,
            ),
        )
        .withColumn(
            "battery_level",
            F.round(clip(F.lit(70.0) + F.rand(seed + 1) * 30 + F.randn(seed + 2) * 5, 10.0, 100.0), 1),
        )
        .withColumn(
            "signal_strength",
            F.round(clip(signal_base + F.randn(seed + 3) * 10, -90.0, -20.0), 1),
        )
        .withColumn("device_type", pick(DEVICE_TYPES, F.rand(seed + 4)))
        .withColumn("firmware_version", pick(FIRMWARE_VERSIONS, F.rand(seed + 5)))
    )


@dataclass
class IngestResult:
    readings: DataFrame  # standardized raw readings (FIXTURES.md §2 shape)
    audit_log: DataFrame  # one row per file (S6)
    skipped_files: list[str]  # hash-deduped (S3)


def ingest_directory(
    spark: SparkSession,
    landing_dir: str,
    processed_hashes: DataFrame | None = None,
    load_id: str | None = None,
    synthetic_fields: bool = False,
) -> IngestResult:
    """Full batch ingestion of a landing directory.

    ``processed_hashes``: single-column ``file_hash`` DataFrame (the
    processing log); already-seen files are skipped via a LEFT ANTI join
    of this batch's candidate (path, hash) list against the log. Only the
    surviving file *list* is collected (bounded by the batch's new-file
    count, per SURVEY §2.1 S3) — the processing log itself stays
    distributed, so a million-file history never lands in driver memory.
    """
    files = list_csv_files(landing_dir)
    hashes = {p: sha256_file(p) for p in files}

    skipped: list[str] = []
    if processed_hashes is not None and files:
        candidates = spark.createDataFrame(
            [(p, hashes[p]) for p in files],
            schema="file_path string, file_hash string",
        )
        fresh = {
            r["file_path"]
            for r in candidates.join(
                processed_hashes.select("file_hash"), "file_hash", "left_anti"
            )
            .select("file_path")
            .collect()
        }
        skipped = [p for p in files if p not in fresh]
        files = [p for p in files if p in fresh]

    # md5, not Python hash(): the fallback load id must agree across
    # processes (PYTHONHASHSEED randomizes str hashes per interpreter)
    load_id = load_id or hashlib.md5(
        "\x00".join(files).encode()
    ).hexdigest()[:12]
    parts: list[DataFrame] = []
    audit_rows: list[tuple] = []
    for path in files:
        df, enc = read_csv_with_fallback(spark, path)
        df = sanitize_columns(df)
        # S4/I11: the per-file audit row records the post-sanitize header
        # (the reference's file log stores per-file metadata alongside the
        # hash, `dlt_ingest/iot_temperature_pipeline.py:27-102`)
        sanitized_header = ",".join(df.columns)
        # I1 format dispatch — py:126-143
        raw_cols = set(df.columns)
        if {"id", "room_id_id", "noted_date", "temp", "out_in"} <= raw_cols:
            df = kaggle_transform(df)
        elif {"device_id", "timestamp", "temperature", "location"} <= raw_cols:
            df = df.select(
                "device_id",
                F.try_to_timestamp(F.col("timestamp")).alias("timestamp"),
                F.col("temperature").try_cast("double").alias("temperature"),
                "location",
            )
        else:
            raise ValueError(f"unrecognized CSV format in {path}: {sorted(raw_cols)}")

        if synthetic_fields:
            df = with_synthetic_sensor_fields(df)

        # I10 drop null-timestamp rows (py:204-207)
        df = df.na.drop(subset=["timestamp"])

        # S4/S5: file metadata + per-file row ids
        from pyspark.sql import Window

        file_hash = hashes[path]
        w = Window.partitionBy(F.lit(file_hash)).orderBy(
            F.col("timestamp"), F.col("device_id")
        )
        rn = F.row_number().over(w)
        df = (
            df.withColumn("row_number", rn)
            .withColumn(
                "file_record_id", F.concat_ws("_", F.lit(file_hash), rn.cast("string"))
            )
            .withColumn("file_name", F.lit(os.path.basename(path)))
            .withColumn("file_path", F.lit(path))
            .withColumn("file_size_bytes", F.lit(os.path.getsize(path)))
            .withColumn("file_hash", F.lit(file_hash))
            .withColumn("ingestion_timestamp", F.current_timestamp())
            .withColumn("_dlt_load_id", F.lit(load_id))
            .withColumn("_dlt_id", F.sha2(F.concat_ws("|", F.lit(file_hash), rn), 256))
        )
        parts.append(df)
        audit_rows.append(
            (
                os.path.basename(path),
                path,
                os.path.getsize(path),
                file_hash,
                "processed",
                enc,
                sanitized_header,
            )
        )

    schema = (
        "file_name string, file_path string, file_size_bytes long, "
        "file_hash string, status string, encoding string, "
        "sanitized_columns string"
    )
    audit = spark.createDataFrame(audit_rows, schema=schema)
    if parts:
        readings = parts[0]
        for p in parts[1:]:
            readings = readings.unionByName(p)
    else:
        readings = spark.createDataFrame([], schema="device_id string")
    return IngestResult(readings=readings, audit_log=audit, skipped_files=skipped)


def append_to_table(df: DataFrame, path: str) -> None:
    """S7 Postgres append sink analog: append-mode parquet."""
    df.write.mode("append").parquet(path)
