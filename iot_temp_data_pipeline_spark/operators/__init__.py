from .staging import stg_raw_temperature_readings
from .anomalies import int_temperature_anomalies
from .marts import mart_temperature_readings, pipeline_summary

__all__ = [
    "stg_raw_temperature_readings",
    "int_temperature_anomalies",
    "mart_temperature_readings",
    "pipeline_summary",
]
