"""As-of join and bucketed range join (operators/asof.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 25),
            (3, "a", 31),
            (4, "b", 5),
            (5, "b", 40),
            (6, "c", 7),
        ],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 100.0),
            ("a", 20, 200.0),
            ("a", 30, 300.0),
            ("b", 15, 150.0),
        ],
        "k string, rt long, payload double",
    )
    return left, right


def test_backward_inclusive(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    got = {r["lid"]: (r["rt"], r["payload"]) for r in out.collect()}
    # lid=1 matches the equal-time right row (inclusive); lid=4 and all
    # of k=c have no earlier right row -> dropped under how="inner"
    assert got == {1: (10, 100.0), 2: (20, 200.0), 3: (30, 300.0), 5: (15, 150.0)}


def test_left_join_keeps_unmatched(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", how="left")
    got = {r["lid"]: r["payload"] for r in out.collect()}
    assert got[4] is None and got[6] is None and len(got) == 6


def test_forward_direction(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", direction="forward"
    )
    got = {r["lid"]: r["rt"] for r in out.collect()}
    # nearest right row at-or-after each left time
    assert got == {1: 10, 2: 30, 4: 15}


def test_tolerance(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", tolerance=5
    )
    got = {r["lid"]: r["rt"] for r in out.collect()}
    # lid=2 (t=25, last rt=20) is within 5; lid=5 (t=40, rt=15) is not
    assert got == {1: 10, 2: 20, 3: 30}


def test_asof_single_shuffle_no_join(spark, sides):
    left, right = sides
    plan = asof_join(left, right, on="k", left_time="t", right_time="rt")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window carry-forward, not a join probe
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_bucketed_matches_broadcast(spark):
    points = spark.range(0, 500).select(
        F.col("id").alias("pid"), (F.col("id") * 7 % 400).cast("double").alias("x")
    )
    intervals = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 40.0, 120.0), (2, 100.0, 101.0), (3, 350.0, 400.0)],
        "iid long, lo double, hi double",
    )
    kw = dict(point_column="x", lo_column="lo", hi_column="hi")
    bucketed = range_join(points, intervals, bucket_width=64.0, **kw)
    naive = range_join(points, intervals, bucket_width=None, **kw)
    key = lambda r: (r["pid"], r["iid"])
    assert sorted(map(key, bucketed.collect())) == sorted(map(key, naive.collect()))
    assert bucketed.count() > 0


def test_range_join_closed_both(spark):
    points = spark.createDataFrame([(1, 10.0)], "pid long, x double")
    intervals = spark.createDataFrame([(0, 0.0, 10.0)], "iid long, lo double, hi double")
    kw = dict(point_column="x", lo_column="lo", hi_column="hi", bucket_width=8.0)
    assert range_join(points, intervals, closed="left", **kw).count() == 0
    assert range_join(points, intervals, closed="both", **kw).count() == 1


def test_range_join_refuses_unbounded_broadcast(spark):
    # the no-bucket path probes the intervals side and refuses to
    # launch a BroadcastNestedLoopJoin over a large one (scale guard)
    points = spark.createDataFrame([(1, 10.0)], "pid long, x double")
    intervals = spark.range(0, 50).select(
        F.col("id").alias("iid"),
        F.col("id").cast("double").alias("lo"),
        (F.col("id") + 1).cast("double").alias("hi"),
    )
    with pytest.raises(ValueError, match="max_broadcast_intervals"):
        range_join(
            points, intervals, "x", "lo", "hi",
            bucket_width=None, max_broadcast_intervals=10,
        )
    # under the cap the broadcast path still works
    ok = range_join(
        points, intervals, "x", "lo", "hi",
        bucket_width=None, max_broadcast_intervals=100,
    )
    assert ok.count() == 1


def test_range_join_bucketed_no_nested_loop(spark):
    points = spark.range(0, 100).select(F.col("id").cast("double").alias("x"))
    intervals = spark.createDataFrame(
        [(0, 0.0, 10.0)], "iid long, lo double, hi double"
    )
    plan = range_join(
        points, intervals, "x", "lo", "hi", bucket_width=16.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
