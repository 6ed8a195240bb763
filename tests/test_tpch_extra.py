"""Plan-shape pins for the adapted TPC-H batch (plans/tpch_extra.py):
the join-heavy shapes must keep their dimension sides broadcast and
never degrade to nested-loop/cartesian plans, and the Q21 decorrelation
must stay a single-fact-shuffle plan."""

from __future__ import annotations

from iot_temp_data_pipeline_spark.plans.registry import REGISTRY
from tests.test_plan_shape import plan_of


def test_registry_has_tpch_extra_entries():
    for name in (
        "tpch_q2_min_cost_supplier",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_type_profit",
        "tpch_q11_important_stock",
        "tpch_q12_priority_by_returnflag",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_counts",
        "tpch_q20_part_promotion",
        "tpch_q21_suppliers_who_kept_waiting",
    ):
        assert name in REGISTRY
        assert REGISTRY[name].oracle is not None


def test_q9_dimensions_broadcast(spark, sf_dir):
    """Part and supplier⋈nation sides broadcast; the only non-broadcast
    join is lineitem⋈orders (fact-fact)."""
    plan = plan_of(REGISTRY["tpch_q9_product_type_profit"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q21_single_correlation_pass(spark, sf_dir):
    """The EXISTS/NOT EXISTS rewrite must stay hash joins — a
    correlated nested-loop over lineitem would be quadratic at scale."""
    plan = plan_of(REGISTRY["tpch_q21_suppliers_who_kept_waiting"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q7_shipdate_pushdown(spark, sf_dir):
    """The two-year shipdate window reaches the lineitem parquet scan."""
    plan = plan_of(REGISTRY["tpch_q7_volume_shipping"].spark(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]


def test_q15_max_is_broadcast_not_window(spark, sf_dir):
    """The MAX-revenue scalar re-joins as a 1-row broadcast (no global
    window sort over the aggregate output)."""
    plan = plan_of(REGISTRY["tpch_q15_top_supplier"].spark(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
