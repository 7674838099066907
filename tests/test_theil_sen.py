"""Theil-Sen robust trend: exactness, robustness, guards."""

from __future__ import annotations

import pyspark.sql.functions as F


def _pts(spark, rows):
    return spark.createDataFrame(rows, ["g", "tus", "v", "k"])


def test_exact_slope_on_line(spark):
    from redshells_spark.ml.theil_sen import theil_sen_trend

    # v = 2 * hours + 1 exactly
    rows = [("u", i * 3_600_000_000, 2.0 * i + 1.0, i) for i in range(6)]
    out = theil_sen_trend(_pts(spark, rows), "g", "tus", "v", "k").collect()[0]
    assert out["n_points"] == 6 and out["n_slopes"] == 15
    assert abs(out["slope"] - 2.0) < 1e-12


def test_robust_to_outlier(spark):
    from redshells_spark.ml.theil_sen import theil_sen_trend

    rows = [("u", i * 3_600_000_000, 1.0 * i, i) for i in range(9)]
    rows[4] = ("u", 4 * 3_600_000_000, 1000.0, 4)  # one wild outlier
    out = theil_sen_trend(_pts(spark, rows), "g", "tus", "v", "k").collect()[0]
    # OLS slope would be ~25; the median of slopes stays ~1
    assert abs(out["slope"] - 1.0) < 0.2


def test_max_points_excludes_group(spark):
    from redshells_spark.ml.theil_sen import theil_sen_trend

    rows = [("big", i * 1_000_000, float(i), i) for i in range(30)] + [
        ("ok", i * 1_000_000, float(i), i) for i in range(5)
    ]
    out = theil_sen_trend(
        _pts(spark, rows), "g", "tus", "v", "k", max_points=10
    ).collect()
    assert [r["g"] for r in out] == ["ok"]


def test_equal_timestamps_excluded(spark):
    from redshells_spark.ml.theil_sen import theil_sen_trend

    rows = [("u", 0, 1.0, 0), ("u", 0, 5.0, 1), ("u", 3_600_000_000, 2.0, 2)]
    out = theil_sen_trend(_pts(spark, rows), "g", "tus", "v", "k").collect()[0]
    # vertical pair (k=0,1) contributes no slope; two slopes remain
    assert out["n_slopes"] == 2
    assert abs(out["slope"] - (1.0 + (-3.0)) / 2) < 1e-12
