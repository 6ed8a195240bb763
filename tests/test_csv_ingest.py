"""File-based ingestion path (S1-S7, I1-I12): encoding fallback,
format dispatch, hash-skip, per-file metadata/row ids, audit log."""

from __future__ import annotations

import pytest

from iot_temp_data_pipeline_spark.sources.csv_ingest import (
    ingest_directory,
    list_csv_files,
    read_csv_with_fallback,
    sha256_file,
)

KAGGLE_CSV = """id,room_id/id,noted_date,temp,out/in
__export__.temp_log_196134_bd201015,Room Admin,08-12-2018 09:30,29,In
__export__.temp_log_196131_7bca51bc,Room Admin,08-12-2018 09:30,41,Out
__export__.temp_log_196127_522915e3,Room 809,not-a-date,31,In
__export__.temp_log_196128_abc,Room Admin,09-12-2018 10:00,,Out
"""


@pytest.fixture()
def landing(tmp_path):
    (tmp_path / "a.csv").write_text(KAGGLE_CSV, encoding="utf-8")
    # latin1-only bytes (0xe9 = é) exercise the encoding fallback chain
    (tmp_path / "b.csv").write_bytes(
        "id,room_id/id,noted_date,temp,out/in\n"
        "x_caf\xe9_19699,Room Admin,01-01-2019 00:00,22,In\n".encode("latin1")
    )
    return str(tmp_path)


def test_glob_and_hash(landing):
    files = list_csv_files(landing)
    assert [f.rsplit("/", 1)[1] for f in files] == ["a.csv", "b.csv"]
    h = sha256_file(files[0])
    assert len(h) == 64 and h == sha256_file(files[0])


def test_encoding_fallback(spark, landing):
    files = list_csv_files(landing)
    _, enc_a = read_csv_with_fallback(spark, files[0])
    assert enc_a == "utf-8"
    df_b, enc_b = read_csv_with_fallback(spark, files[1])
    # utf-8 decode of the 0xe9 byte yields U+FFFD, which the fallback
    # must treat as a decode failure and advance to latin1
    assert enc_b == "latin1"
    assert any("caf\xe9" in r["id"] for r in df_b.collect())


def test_ingest_directory_end_to_end(spark, landing):
    res = ingest_directory(spark, landing)
    rows = res.readings.collect()
    # a.csv: 4 data rows, 1 unparseable date dropped (I10) → 3; b.csv: 1
    assert len(rows) == 4
    by_id = {r["device_id"] for r in rows}
    # I2: last _-segment uppercased, 8 chars
    assert "IOT_TEMP_BD201015" in by_id and "IOT_TEMP_7BCA51BC" in by_id
    first = [r for r in rows if r["device_id"] == "IOT_TEMP_BD201015"][0]
    # I5: "Room " stripped, Admin→Office, lowercased suffix
    assert first["location"] == "Office_in"
    assert first["row_number"] >= 1
    assert first["file_name"] == "a.csv"
    assert len(first["file_hash"]) == 64
    assert first["file_record_id"].startswith(first["file_hash"])
    # null temp row survives with null temperature (range check is staging's job)
    assert any(r["temperature"] is None for r in rows)
    # S6 audit log: one row per file
    audit = {r["file_name"]: r for r in res.audit_log.collect()}
    assert set(audit) == {"a.csv", "b.csv"}
    assert all(r["status"] == "processed" for r in audit.values())


def test_hash_skip(spark, landing):
    first = ingest_directory(spark, landing)
    log = first.audit_log.select("file_hash")
    second = ingest_directory(spark, landing, processed_hashes=log)
    assert len(second.skipped_files) == 2
    assert second.readings.count() == 0


def test_synthetic_fields_bounds(spark, landing):
    res = ingest_directory(spark, landing, synthetic_fields=True)
    for r in res.readings.collect():
        assert 20.0 <= r["humidity"] <= 95.0
        assert 10.0 <= r["battery_level"] <= 100.0
        assert -90.0 <= r["signal_strength"] <= -20.0
        assert r["device_type"] in {"DHT22", "DS18B20", "SHT30", "BME280", "TMP36"}
        assert r["firmware_version"] in {"v1.2.3", "v1.2.4", "v1.3.0", "v1.3.1", "v2.0.0"}


def test_kaggle_transform_is_ansi_independent(spark, sf_dir):
    """The driver owns the SparkSession and runs ANSI-on; the coerce-to-
    null parse/cast semantics must not depend on session config
    (regression for the round-1 CANNOT_PARSE_TIMESTAMP crash). The full
    ANSI sweep is `SPARK_GRAFT_ANSI=true python -m pytest tests/`; this
    pins the known-sensitive path in the default run."""
    from iot_temp_data_pipeline_spark.plans.registry import REGISTRY

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = REGISTRY["ingest_kaggle_transform"].spark(spark, sf_dir)
        assert df.count() > 0  # would raise CANNOT_PARSE_TIMESTAMP before
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
