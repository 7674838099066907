"""Mean-shift changepoint: recovers a known shift, guards, exactness."""

from __future__ import annotations


def _series(spark, rows):
    return spark.createDataFrame(rows, ["g", "x", "ord", "ord2"])


def test_recovers_known_shift(spark):
    from redshells_spark.operators.changepoint import mean_shift_changepoint

    rows = [("u", 10.0, i, i) for i in range(12)] + [
        ("u", 50.0, i, i) for i in range(12, 20)
    ]
    out = mean_shift_changepoint(_series(spark, rows), "g", "x", ["ord", "ord2"])
    r = out.collect()[0]
    assert r["cp_pos"] == 12
    assert abs(r["mean_before"] - 10.0) < 1e-9
    assert abs(r["mean_after"] - 50.0) < 1e-9
    # SSE reduction = n1*n2/n * delta^2 = 12*8/20 * 1600 = 7680
    assert abs(r["gain"] - 7680.0) < 1e-6


def test_constant_series_gain_zero(spark):
    from redshells_spark.operators.changepoint import mean_shift_changepoint

    rows = [("u", 7.0, i, i) for i in range(10)]
    r = mean_shift_changepoint(_series(spark, rows), "g", "x", ["ord", "ord2"]).collect()[0]
    assert r["gain"] == 0.0
    assert r["cp_pos"] == 1  # tie-break: smallest split position


def test_min_points_excludes(spark):
    from redshells_spark.operators.changepoint import mean_shift_changepoint

    rows = [("short", 1.0, i, i) for i in range(3)] + [
        ("ok", float(i), i, i) for i in range(6)
    ]
    out = mean_shift_changepoint(_series(spark, rows), "g", "x", ["ord", "ord2"]).collect()
    assert [r["g"] for r in out] == ["ok"]


def test_partitioning_invariant(spark):
    from redshells_spark.operators.changepoint import mean_shift_changepoint

    rows = [("u%d" % (i % 5), float((i * 17) % 23), i, i) for i in range(200)]
    df = _series(spark, rows)
    a = sorted(map(tuple, mean_shift_changepoint(df, "g", "x", ["ord", "ord2"]).collect()))
    b = sorted(
        map(
            tuple,
            mean_shift_changepoint(df.repartition(11), "g", "x", ["ord", "ord2"]).collect(),
        )
    )
    assert a == b
