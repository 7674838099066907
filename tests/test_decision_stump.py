"""Exact decision stump: sklearn-free hand-verified fixtures."""

from __future__ import annotations

import pytest

from redshells_spark.ml.decision_stump import best_stump, melt_features


def test_perfect_split_found(spark):
    # y = 1 iff x > 5; z is noise — stump must pick x at threshold 5
    rows = [(float(x), float(x % 3), 1 if x > 5 else 0) for x in range(11)]
    df = spark.createDataFrame(rows, "x double, z double, y long")
    r = best_stump(df, ["x", "z"], "y").collect()[0]
    assert r["feature"] == "x" and r["threshold"] == 5.0
    assert (r["n_left"], r["n_right"], r["pos_left"], r["pos_right"]) == (6, 5, 0, 5)
    assert r["gini"] == 0.0 and r["accuracy"] == 1.0


def test_gini_hand_computed(spark):
    # x <= 1: (2 pos, 0 neg); x > 1: (1 pos, 2 neg)
    rows = [(0.0, 1), (1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)]
    df = spark.createDataFrame(rows, "x double, y long")
    r = best_stump(df, ["x"], "y").collect()[0]
    # best split is x <= 2 (pure halves): gini 0, accuracy 1
    assert r["threshold"] == 2.0 and r["gini"] == 0.0 and r["accuracy"] == 1.0


def test_tie_breaks_deterministic(spark):
    # two features identical -> lexicographically first feature wins
    rows = [(1.0, 1.0, 0), (2.0, 2.0, 1)]
    df = spark.createDataFrame(rows, "b double, a double, y long")
    r = best_stump(df, ["b", "a"], "y").collect()[0]
    assert r["feature"] == "a" and r["threshold"] == 1.0


def test_last_value_not_a_candidate(spark):
    # constant feature: its only split would leave right side empty
    rows = [(1.0, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "x double, y long")
    assert best_stump(df, ["x"], "y").count() == 0


def test_melt_shape(spark):
    df = spark.createDataFrame([(1.0, 2.0, 1)], "p double, q double, y long")
    m = melt_features(df, ["p", "q"], "y")
    assert m.count() == 2
    assert {r["feature"] for r in m.collect()} == {"p", "q"}


def test_empty_features_refused(spark):
    df = spark.createDataFrame([(1.0, 0)], "x double, y long")
    with pytest.raises(ValueError, match="feature_cols"):
        best_stump(df, [], "y")
