"""Plan-shape assertions for the TPC-H query-shape suite: the scale
properties each shape exists to demonstrate must be visible in the
physical plan — pushed scan ranges (Q6), top-k without a global sort
(Q10), semi/anti compilation of EXISTS/NOT EXISTS (Q21), map-side
rank pruning of the correlated min (Q2), broadcast-only star joins
(Q5), no cartesian anywhere."""

from __future__ import annotations

import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_range_pushed_to_scan(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q6_revenue_forecast"](spark, sf_dir))
    # the date range must sit on the RAW column inside PushedFilters —
    # not on a unix_micros() expression evaluated post-scan
    assert "GreaterThanOrEqual(l_shipdate," in plan
    assert "LessThan(l_shipdate," in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    # only the four referenced columns reach the scan
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in plan


def test_q10_topk_no_global_sort(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q10_returned_item_report"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan  # TakeOrdered subsumes sort+limit
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan  # range on the orders scan


def test_q21_exists_compiles_to_semi_anti(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q21_late_sole_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_correlated_min_prunes_map_side(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q2_min_balance_supplier"](spark, sf_dir))
    # rank-1 pruning runs before AND after the exchange
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


def test_q5_star_join_all_broadcast(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q5_regional_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan


def test_q19_disjunction_pushes_part_side(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    plan = _plan(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # Catalyst extracts the part-only disjunct (brand/size OR-chain)
    # and pushes it into the broadcast side's scan
    assert "Or(And(EqualTo(p_brand,Brand#1)" in plan
