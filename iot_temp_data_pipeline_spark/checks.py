"""dbt-style data-quality checks over the staging model (SURVEY.md §5).

The reference declares its tests in
`dbt_transform/models/staging/schema.yml:26-99`:

- ``not_null`` + ``unique`` on record_id (33-35)
- ``not_null`` on device_id, reading_timestamp, temperature_celsius,
  location, environment_type, is_valid_record, data_quality_score
- ``dbt_utils.accepted_range`` −50..100 on temperature (50-52) and
  0.0..1.0 on data_quality_score (77-79)
- ``accepted_values`` ['Indoor','Outdoor','Unknown'] on
  environment_type (63-64), [true,false] on is_valid_record (70-71)
- two custom singular tests (82-99): environment-type domain closure
  and non-blank device ids, ``severity: error``

A dbt test is a query expected to return zero rows. Here every check is
a violation predicate; `check_violations` evaluates ALL row-level checks
in ONE aggregate pass over staging (a single wide conditional-sum agg —
one job, no per-check scans), stacks the counts to rows, and unions the
one key-level check (unique record_id). Each entry carries both the
Spark Column and the DuckDB SQL text so the oracle is generated from
the same definition — no drift possible.

At 100 TB: one scan + one 15-column partial/final agg for all row
checks; the uniqueness check is a count-distinct-style shuffle on
record_id only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACCEPTED_ENVIRONMENTS = ("Indoor", "Outdoor", "Unknown")


@dataclass(frozen=True)
class Check:
    name: str
    # lazy Column factory (Columns can't be built before a session exists)
    violation: Callable[[], Column]  # True ⇒ the row violates the check
    violation_sql: str  # DuckDB text of the same predicate


def _row_checks() -> list[Check]:
    env_list = ", ".join(f"'{e}'" for e in ACCEPTED_ENVIRONMENTS)
    t = lambda: F.col("temperature_celsius")  # noqa: E731
    q = lambda: F.col("data_quality_score")  # noqa: E731
    return [
        Check(
            "not_null_record_id",
            lambda: F.col("record_id").isNull(),
            "record_id IS NULL",
        ),
        Check(
            "not_null_device_id",
            lambda: F.col("device_id").isNull(),
            "device_id IS NULL",
        ),
        Check(
            "not_null_reading_timestamp",
            lambda: F.col("reading_timestamp").isNull(),
            "reading_timestamp IS NULL",
        ),
        Check(
            "not_null_temperature_celsius",
            lambda: t().isNull(),
            "temperature_celsius IS NULL",
        ),
        Check(
            "not_null_location",
            lambda: F.col("location").isNull(),
            "location IS NULL",
        ),
        Check(
            "not_null_environment_type",
            lambda: F.col("environment_type").isNull(),
            "environment_type IS NULL",
        ),
        Check(
            "not_null_is_valid_record",
            lambda: F.col("is_valid_record").isNull(),
            "is_valid_record IS NULL",
        ),
        Check(
            "not_null_data_quality_score",
            lambda: q().isNull(),
            "data_quality_score IS NULL",
        ),
        Check(
            "accepted_range_temperature",
            lambda: t().isNotNull() & ~t().between(-50.0, 100.0),
            "temperature_celsius IS NOT NULL AND temperature_celsius NOT BETWEEN -50 AND 100",
        ),
        Check(
            "accepted_range_quality_score",
            lambda: q().isNotNull() & ~q().between(0.0, 1.0),
            "data_quality_score IS NOT NULL AND data_quality_score NOT BETWEEN 0 AND 1",
        ),
        Check(
            "accepted_values_environment_type",
            lambda: F.col("environment_type").isNotNull()
            & ~F.col("environment_type").isin(*ACCEPTED_ENVIRONMENTS),
            f"environment_type IS NOT NULL AND environment_type NOT IN ({env_list})",
        ),
        # accepted_values [true,false] on a boolean ⇒ only NULL violates
        Check(
            "accepted_values_is_valid_record",
            lambda: F.col("is_valid_record").isNull(),
            "is_valid_record IS NULL",
        ),
        # custom singular test 1 (schema.yml:82-90): domain closure incl. NULL
        Check(
            "env_domain_closure",
            lambda: ~F.col("environment_type").isin(*ACCEPTED_ENVIRONMENTS)
            | F.col("environment_type").isNull(),
            f"environment_type IS NULL OR environment_type NOT IN ({env_list})",
        ),
        # custom singular test 2 (schema.yml:92-99): non-blank device ids
        Check(
            "nonblank_device_id",
            lambda: F.col("device_id").isNotNull()
            & (F.trim(F.col("device_id")) == ""),
            "device_id IS NOT NULL AND TRIM(device_id) = ''",
        ),
    ]


ROW_CHECKS = _row_checks()


def check_violations(stg: DataFrame) -> DataFrame:
    """All checks → (check_name, violations). Zero violations on every
    row means the dbt suite would pass."""
    counts = stg.agg(
        *[
            F.sum(F.when(c.violation(), 1).otherwise(0)).cast("long").alias(c.name)
            for c in ROW_CHECKS
        ]
    )
    stack_args = ", ".join(f"'{c.name}', {c.name}" for c in ROW_CHECKS)
    stacked = counts.select(
        F.expr(
            f"stack({len(ROW_CHECKS)}, {stack_args}) AS (check_name, violations)"
        )
    )
    unique_rec = (
        stg.groupBy("record_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").cast("long").alias("violations"))
        .select(F.lit("unique_record_id").alias("check_name"), "violations")
    )
    return stacked.unionByName(unique_rec)


def check_violations_sql(staged_relation: str = "staged") -> str:
    """DuckDB mirror of :func:`check_violations` over the prelude's
    ``staged`` CTE."""
    selects = [
        f"SELECT '{c.name}' AS check_name, "
        f"CAST(SUM(CASE WHEN {c.violation_sql} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS violations FROM {staged_relation}"
        for c in ROW_CHECKS
    ]
    selects.append(
        "SELECT 'unique_record_id' AS check_name, CAST(COUNT(*) AS BIGINT) AS violations "
        f"FROM (SELECT record_id FROM {staged_relation} GROUP BY record_id "
        "HAVING COUNT(*) > 1) u"
    )
    return "(\n" + "\nUNION ALL\n".join(selects) + "\n) checks"


def assert_checks_pass(stg: DataFrame, names: list[str]) -> None:
    """dbt semantics: the named checks must have zero violations."""
    rows = check_violations(stg).filter(F.col("check_name").isin(*names)).collect()
    failing = {r["check_name"]: r["violations"] for r in rows if r["violations"] > 0}
    if failing:
        raise AssertionError(f"data-quality checks failed: {failing}")


def with_observed_checks(stg: DataFrame):
    """Attach the row checks as an `observe()` metric set: violation
    counters accumulate DURING whatever job consumes the DataFrame —
    zero extra passes, zero extra shuffles. This is the production
    monitoring form of the dbt checks (check_violations is the audit
    form): a pipeline writes its output once and reads its quality
    counters off the Observation for free. At 100 TB an extra audit
    scan is real money; observation is not. Returns (df, observation);
    call ``observation.get`` after an action has run."""
    from pyspark.sql import Observation

    obs = Observation("dq")
    df = stg.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        *[
            F.sum(F.when(c.violation(), 1).otherwise(0)).cast("long").alias(c.name)
            for c in ROW_CHECKS
        ],
    )
    return df, obs
