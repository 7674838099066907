"""KMV distinct sketch: exact below k, sane error above k, mergeable-ish
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshells_spark.operators.sketches import kmv_distinct


def test_exact_when_under_k(spark):
    df = spark.createDataFrame([("g", i % 37) for i in range(500)], "g string, v long")
    out = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert out["n_hashes"] == 37
    assert out["kmv_estimate"] == 37.0  # sketch holds every hash → exact


def test_estimate_error_bounded(spark):
    # 5000 distinct values, k=256 → stderr ~1/sqrt(254) ≈ 6.3%; assert
    # within 4 sigma (deterministic given the fixed hash — this pins
    # the actual value's sanity, not a random draw)
    df = spark.createDataFrame([("g", i) for i in range(5000)], "g string, v long")
    out = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert out["n_hashes"] == 256
    assert abs(out["kmv_estimate"] - 5000) / 5000 < 0.25


def test_deterministic_and_duplicate_insensitive(spark):
    a = spark.createDataFrame([("g", i % 300) for i in range(3000)], "g string, v long")
    b = spark.createDataFrame([("g", i) for i in range(300)], "g string, v long")
    ra = kmv_distinct(a, ["g"], "v", k=64).collect()[0]
    rb = kmv_distinct(b, ["g"], "v", k=64).collect()[0]
    # same distinct set → identical sketch, duplicates invisible
    assert ra["kmv_estimate"] == rb["kmv_estimate"]


def test_groups_independent(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = kmv_distinct(ev, ["event_type"], "user_id", k=32)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    joined = {r["event_type"]: r for r in out.join(exact, on="event_type").collect()}
    for et, r in joined.items():
        assert abs(r["kmv_estimate"] - r["n"]) / max(r["n"], 1) < 0.6  # k=32 is coarse


def test_log_histogram_quantiles_exact_bins(spark):
    from redshells_spark.operators.sketches import log_histogram_quantiles

    # values 1..100; p50 -> rank 50 -> value 50 lives in bin [32,64)
    df = spark.createDataFrame([("g", v) for v in range(1, 101)], "g string, v bigint")
    out = {r["q"]: r for r in log_histogram_quantiles(df, ["g"], "v", [0.5, 0.99]).collect()}
    assert out[0.5]["est_lower_bound"] == 32
    assert out[0.99]["est_lower_bound"] == 64  # rank 99 -> 99 in [64,128)
    assert out[0.5]["n"] == 100


def test_log_histogram_power_of_two_boundary(spark):
    from redshells_spark.operators.sketches import log_histogram_quantiles

    # exact powers of two must bin as [2^k, 2^(k+1)) — the IEEE
    # floor(ln/ln2) formulation misplaces these
    df = spark.createDataFrame([("g", 8)], "g string, v bigint")
    r = log_histogram_quantiles(df, ["g"], "v", [1.0]).collect()[0]
    assert r["est_lower_bound"] == 8


def test_log_histogram_rejects_bad_quantiles(spark):
    import pytest as _pytest

    from redshells_spark.operators.sketches import log_histogram_quantiles

    df = spark.createDataFrame([("g", 1)], "g string, v bigint")
    with _pytest.raises(ValueError):
        log_histogram_quantiles(df, ["g"], "v", [0.0])


def test_kmv_rolling_distinct_exact_regime(spark):
    from redshells_spark.operators.sketches import kmv_rolling_distinct

    # day 0: users {1,2}; day 1: users {2,3}; day 2: {9}
    rows = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 9)]
    df = spark.createDataFrame(rows, "bk bigint, u bigint")
    out = {r["bucket"]: r["rolling_distinct_est"]
           for r in kmv_rolling_distinct(df, "bk", "u", window_buckets=2, k=64).collect()}
    # window [b-1, b]: day0 -> {1,2}; day1 -> {1,2,3}; day2 -> {2,3,9}
    assert out == {0: 2.0, 1: 3.0, 2: 3.0}


def test_kmv_rolling_distinct_only_present_buckets(spark):
    from redshells_spark.operators.sketches import kmv_rolling_distinct

    df = spark.createDataFrame([(0, 1), (5, 2)], "bk bigint, u bigint")
    buckets = {r["bucket"] for r in
               kmv_rolling_distinct(df, "bk", "u", window_buckets=3, k=8).collect()}
    assert buckets == {0, 5}


def test_kmv_distinct_global_exact_below_k(spark):
    from redshells_spark.operators.sketches import kmv_distinct_global

    df = spark.createDataFrame([(i % 40,) for i in range(500)], "u long")
    r = kmv_distinct_global(df, "u", k=256).collect()[0]
    # below k: the sketch holds every hash -> estimate IS the exact count
    assert r["n_hashes"] == 40 and r["kmv_estimate"] == 40.0


def test_kmv_distinct_global_estimate_above_k(spark):
    from redshells_spark.operators.sketches import kmv_distinct_global

    df = spark.createDataFrame([(i,) for i in range(5000)], "u long")
    r = kmv_distinct_global(df, "u", k=128).collect()[0]
    assert r["n_hashes"] == 128
    assert 5000 * 0.6 < r["kmv_estimate"] < 5000 * 1.6  # ~9% stderr at k=128
