"""Waterfilling invariants for the mixture token-budget solver, checked
on the oracle side (DuckDB — no Spark session needed; Spark/oracle
equality itself is covered by test_registry_parity)."""

from __future__ import annotations

import duckdb

from iot_temp_data_pipeline_spark.operators.mixture import (
    BUDGET_DEN,
    BUDGET_NUM,
    mixture_token_budget_sql,
)

from .conftest import SF_DIR


def _solve():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    df = con.sql("SELECT * FROM " + mixture_token_budget_sql()).df()
    con.close()
    return df


def test_waterfilling_invariants():
    df = _solve()
    budget = df.avail_tokens.sum() * BUDGET_NUM // BUDGET_DEN
    # never allocate more than a domain has
    assert (df.alloc_tokens <= df.avail_tokens).all()
    # frozen domains are allocated exactly their availability
    frozen = df[df.frozen_round > 0]
    assert (frozen.alloc_tokens == frozen.avail_tokens).all()
    # total allocation within budget, and close to it (floor-division
    # remainders only: at most one token per domain per round)
    assert df.alloc_tokens.sum() <= budget
    assert budget - df.alloc_tokens.sum() <= 3 * len(df)
    # unfrozen domains received weight-proportional shares: alloc/w is
    # (near-)constant across unfrozen domains
    free = df[df.frozen_round == 0]
    if len(free) > 1:
        per_w = free.alloc_tokens // free.weight
        assert per_w.max() - per_w.min() <= 1
