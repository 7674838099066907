"""profile_columns: hand-checked stats, null accounting, mixed types."""

from __future__ import annotations

from redshells_spark.data.profile import profile_columns


def test_profile_mixed_types(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (2, "a")],
        "x long, s string",
    )
    prof = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    px, ps = prof["x"], prof["s"]
    assert px["n_rows"] == 4 and px["n_nulls"] == 1 and px["n_distinct"] == 2
    assert px["min_num"] == 1.0 and px["max_num"] == 2.0
    assert abs(px["avg_num"] - 5 / 3) < 1e-12
    assert px["min_str"] is None
    assert ps["n_nulls"] == 1 and ps["n_distinct"] == 2
    assert ps["min_str"] == "a" and ps["max_str"] == "b"
    assert ps["min_num"] is None


def test_profile_single_scan(spark, sf_dir):
    ord_ = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = profile_columns(ord_, ["o_custkey", "o_orderstatus"])
    assert prof.count() == 2
    r = {x["column"]: x for x in prof.collect()}
    assert r["o_custkey"]["n_rows"] == ord_.count()
