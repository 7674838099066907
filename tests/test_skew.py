from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.skew import (
    key_skew_profile,
    salted_aggregate,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows
    hot = spark.range(900).select(F.lit("hot").alias("k"), F.col("id").cast("double").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(skewed, ["k"], {"n": "count", "s": "sum:v"}, num_salts=8).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": "median:v"})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(10)], "k string, label string"
    )
    plain = skewed.join(dim, on="k").groupBy("label").count()
    salted = salted_join(skewed, dim, on="k", num_salts=4).groupBy("label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_key_skew_profile(skewed):
    prof = key_skew_profile(skewed, "k", top_n=3)
    rows = prof.collect()
    assert rows[0]["k"] == "hot"
    assert rows[0]["share"] == pytest.approx(0.9)


def test_salted_join_row_parity_on_skewed_keys(spark):
    from pyspark.sql import functions as F

    from redshells_spark.operators.skew import salted_join

    # one hot key (90% of rows) + tail
    big = spark.createDataFrame(
        [(1 if i % 10 else i, float(i)) for i in range(2000)], "k long, v double"
    )
    small = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "k long, d string")
    got = salted_join(big, small, on=["k"], num_salts=8)
    want = big.join(small, on="k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # the hot key's rows really spread across salts (not all on one)
    from redshells_spark.operators.skew import F as _F  # noqa: F401

    salts = (
        big.filter(F.col("k") == 1)
        .withColumn("__salt", F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts >= 4
