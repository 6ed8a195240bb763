"""dbt-test semantics over staging (SURVEY.md §5): the reference's
severity-error singular tests must PASS on fixture data, while the
not_null tests on range-nulled temperature are EXPECTED to fail —
mirroring how the real pipeline's dbt suite would behave."""

from __future__ import annotations

import pytest

from iot_temp_data_pipeline_spark.checks import assert_checks_pass, check_violations
from iot_temp_data_pipeline_spark.operators.staging import stg_raw_temperature_readings
from iot_temp_data_pipeline_spark.sources.readings import raw_readings


@pytest.fixture(scope="module")
def stg(spark, sf_dir):
    return stg_raw_temperature_readings(
        raw_readings(spark, sf_dir), with_processing_timestamp=False
    )


MUST_PASS = [
    "not_null_record_id",
    "unique_record_id",
    "not_null_device_id",
    "not_null_reading_timestamp",
    "not_null_location",
    "not_null_environment_type",
    "not_null_is_valid_record",
    "not_null_data_quality_score",
    "accepted_range_temperature",
    "accepted_range_quality_score",
    "accepted_values_environment_type",
    "accepted_values_is_valid_record",
    "env_domain_closure",
    "nonblank_device_id",
]


def test_reference_checks_pass(stg):
    assert_checks_pass(stg, MUST_PASS)


def test_all_checks_present(stg):
    rows = {r["check_name"] for r in check_violations(stg).collect()}
    assert set(MUST_PASS) <= rows
    assert "not_null_temperature_celsius" in rows


def test_observed_checks_match_audit_counts(spark, sf_dir):
    """The observe()-based counters (collected during a single write
    job) must equal the audit aggregation's counts."""
    from iot_temp_data_pipeline_spark.checks import (
        check_violations,
        with_observed_checks,
    )
    from iot_temp_data_pipeline_spark.operators.staging import (
        stg_raw_temperature_readings,
    )
    from iot_temp_data_pipeline_spark.sources.readings import raw_readings

    stg = stg_raw_temperature_readings(
        raw_readings(spark, sf_dir), with_processing_timestamp=False
    )
    observed, obs = with_observed_checks(stg)
    observed.write.format("noop").mode("overwrite").save()  # ONE pass
    metrics = obs.get

    audit = {
        r["check_name"]: r["violations"]
        for r in check_violations(stg).collect()
        if r["check_name"] != "unique_record_id"  # not row-local
    }
    assert metrics["rows_seen"] == stg.count()
    for name, violations in audit.items():
        assert metrics[name] == violations
