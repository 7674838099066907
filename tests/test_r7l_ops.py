"""Round-7 batch-12: robust estimation / series feature invariants."""

from __future__ import annotations

import pytest

import math

SF = "/root/testdata/sf0.001"


def test_hodges_lehmann_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from redshells_spark.queries import QUERIES
    from redshells_spark.queries._shared import _t
    from redshells_spark.timeutil import event_us

    r = QUERIES["hodges_lehmann_shift"](spark, SF).collect()[0]
    ev = _t(spark, SF, "events")
    ev = ev.withColumn("us", event_us(ev, "ts"))
    day = 86_400_000_000
    rows = (
        ev.groupBy(F.expr(f"us div {day}").cast("long").alias("t"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("p"),
            F.sum((F.col("event_type") == "click").cast("long")).alias("c"),
        )
        .collect()
    )
    # dense day domain == observed days here (events on every day)
    ps = [x["p"] for x in rows]
    cs = [x["c"] for x in rows]
    diffs = sorted(p - c for p in ps for c in cs)
    n = len(diffs)
    lower_median = diffs[(n - 1) // 2] if n % 2 == 1 else diffs[n // 2 - 1]
    assert r["n_pairs"] == n
    assert r["hl_shift"] == lower_median


def test_strength_features_bounded(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["series_strength_features"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["seasonal_strength_e6"] <= 1_000_000
        assert 0 <= r["trend_strength_e6"] <= 1_000_000 + 1
        assert r["n_days"] >= 7


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_bigram_entropy_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["bigram_entropy_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        # conditional entropy bounded by ln(vocab) (31-token corpus)
        assert 0.0 <= r["h_cond"] <= math.log(40)
        assert abs(r["perplexity"] - round(math.exp(r["h_cond"]), 4)) < 0.01
