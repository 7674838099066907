"""Plan shapes for the correlated-subquery queries: decorrelation must
produce hash joins, never per-row subquery execution or nested loops."""

from __future__ import annotations

from redshells_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return Q.QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q22_not_exists_is_anti_hash_join(spark):
    plan = _plan(spark, "q22_idle_customers")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q4_exists_is_semi_hash_join(spark):
    plan = _plan(spark, "q4_late_shipments_exists")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q17_no_nested_subquery_execution(spark):
    # manual decorrelation: one aggregate + joins, no per-row subquery
    plan = _plan(spark, "q17_small_quantity_revenue")
    assert "Subquery" not in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
