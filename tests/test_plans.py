"""Physical-plan regression tests — the optimizations we rely on must
be visible in the plan, not assumed: pushed filters, pruned schemas,
broadcast joins. Guards against future plan-shape regressions."""

from __future__ import annotations

import pytest

from etl_extractor_spark.plans.tpch import (
    q1_pricing_summary,
    q5_regional_revenue,
    q6_revenue_forecast,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: untouched columns must not be read
    assert "l_orderkey" not in plan.split("ReadSchema")[1]
    assert "l_partkey" not in plan.split("ReadSchema")[1]


def test_q6_range_predicates_reach_scan(spark, sf_dir):
    plan = _plan(q6_revenue_forecast(spark, sf_dir))
    # toString truncates long filter lists — check the leading set and
    # that a range predicate made it into the scan at all
    pushed = plan.split("PushedFilters:")[1].split(", ReadSchema")[0]
    assert "IsNotNull(l_shipdate)" in pushed
    assert "IsNotNull(l_discount)" in pushed
    assert "GreaterThanOrEqual(l_shipda" in pushed


def test_q5_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(q5_regional_revenue(spark, sf_dir))
    # 5 joins; at minimum the 4 dimension-side tables must broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_dim_query_no_shuffle_before_dedup_projection(spark, sf_dir):
    from etl_extractor_spark.plans.parity import dim_customer

    plan = _plan(dim_customer(spark, sf_dir))
    # dedup needs exactly one exchange; the projection itself must not
    assert plan.count("Exchange hashpartitioning") == 1
