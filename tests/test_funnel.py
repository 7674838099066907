"""Funnel / retention semantics on handcrafted event frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshells_spark.operators.funnel import (
    funnel_conversion,
    funnel_step_times,
    retention_cohorts,
)

SCHEMA = "user_id bigint, event_type string, __us bigint"


def test_funnel_greedy_ordering(spark):
    # u1 completes a->b->c in order; u2 has b before a (b must not count);
    # u3 reaches a only; u4 never enters the funnel.
    rows = [
        (1, "a", 10), (1, "b", 20), (1, "c", 30),
        (2, "b", 5), (2, "a", 10),          # b precedes a -> stops at a
        (3, "a", 100),
        (4, "c", 1),
    ]
    e = spark.createDataFrame(rows, SCHEMA)
    t = {r["user_id"]: r for r in funnel_step_times(e, ["a", "b", "c"]).collect()}
    assert set(t) == {1, 2, 3}
    assert (t[1]["step_1_us"], t[1]["step_2_us"], t[1]["step_3_us"]) == (10, 20, 30)
    assert t[2]["step_2_us"] is None
    assert t[3]["step_2_us"] is None


def test_funnel_greedy_witness_is_earliest(spark):
    # two b events after a: greedy picks the earlier; c after either works
    rows = [(1, "a", 10), (1, "b", 15), (1, "b", 50), (1, "c", 20)]
    e = spark.createDataFrame(rows, SCHEMA)
    row = funnel_step_times(e, ["a", "b", "c"]).collect()[0]
    assert row["step_2_us"] == 15 and row["step_3_us"] == 20


def test_funnel_conversion_rates(spark):
    rows = [
        (1, "a", 1), (1, "b", 2),
        (2, "a", 1), (2, "b", 2),
        (3, "a", 1),
        (4, "a", 1),
    ]
    e = spark.createDataFrame(rows, SCHEMA)
    out = {r["step_name"]: r for r in funnel_conversion(e, ["a", "b"]).collect()}
    assert out["a"]["users"] == 4 and out["a"]["conv_from_first"] == 1.0
    assert out["b"]["users"] == 2 and out["b"]["conv_from_first"] == 0.5


def test_retention_cohort_triangle(spark):
    week = 7 * 86_400 * 1_000_000
    rows = [
        # cohort week 0: u1 active weeks 0,1; u2 active week 0 only
        (1, "x", 0), (1, "x", week + 5),
        (2, "x", 10),
        # cohort week 1: u3 active weeks 1,2
        (3, "x", week + 1), (3, "x", 2 * week + 1),
    ]
    e = spark.createDataFrame(rows, SCHEMA).select("user_id", "__us")
    cells = {
        (r["cohort_week"], r["week_offset"]): (r["active_users"], r["cohort_size"], r["retention"])
        for r in retention_cohorts(e).collect()
    }
    assert cells[(0, 0)] == (2, 2, 1.0)
    assert cells[(0, 1)] == (1, 2, 0.5)
    assert cells[(1, 0)] == (1, 1, 1.0)
    assert cells[(1, 1)] == (1, 1, 1.0)
    assert (0, 2) not in cells


def test_funnel_no_window_over_full_stream(spark):
    # scale guard: the funnel plan must not contain a Window operator —
    # it is built purely from filtered aggregations + joins
    rows = [(1, "a", 1), (1, "b", 2)]
    e = spark.createDataFrame(rows, SCHEMA)
    plan = funnel_step_times(e, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
