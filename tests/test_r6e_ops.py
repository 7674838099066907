"""Batch-7 tests: exact order-statistic selection, VMR identities,
Simpson cross-multiplication semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_time_to_convert_order_stats(spark):
    from redshells_spark.queries import get_queries

    out = get_queries()["time_to_convert_quantiles"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert out["min_us"] <= out["p50_us"] <= out["p90_us"] <= out["max_us"]
    assert out["n_converted"] > 0


def test_dispersion_identity_poisson_like(spark):
    # constant per-user counts → sample variance 0 → VMR exactly 0
    rows = [("a", u) for u in range(20) for _ in range(3)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    c = df.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    a = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    vmr = a.select(
        F.expr("cast((n * sxx - sx * sx) * 10000 div ((n - 1) * sx) as bigint)").alias("v")
    ).collect()[0]["v"]
    assert vmr == 0


def test_simpson_cross_multiplication(spark):
    from redshells_spark.queries import get_queries

    rows = get_queries()["simpson_rate_check"](spark, "/root/testdata/sf0.001").collect()
    by = {r["stratum"]: r for r in rows}
    assert set(by) == {"pooled", "click", "view_purchase"}
    p = by["pooled"]
    # pooled cells are the stratum sums
    assert p["n0"] == by["click"]["n0"] + by["view_purchase"]["n0"]
    assert p["k1"] == by["click"]["k1"] + by["view_purchase"]["k1"]
    for r in rows:
        want = (r["k0"] * r["n1"] > r["k1"] * r["n0"]) - (r["k0"] * r["n1"] < r["k1"] * r["n0"])
        assert r["grp0_leads"] == want
