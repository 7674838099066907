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
