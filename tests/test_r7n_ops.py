"""Round-7 batch-14: distributional-summary invariants."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_mean_ladder_ordering(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["generalized_means_by_segment"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # AM >= GM >= HM, strict unless all values equal
        assert r["mean_arith"] >= r["mean_geo"] - 1e-3
        assert r["mean_geo"] >= r["mean_harm"] - 1e-3
        assert r["cv"] > 0


def test_pareto_curve_monotone(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["pareto_share_curve"](spark, SF).collect()
    assert [r["pct"] for r in rows] == [1, 5, 10, 20, 50]
    prev_share, prev_n = -1, -1
    for r in rows:
        assert r["rev_share_e6"] >= prev_share
        assert r["n_top"] >= prev_n
        # top x% carries MORE than x% of revenue (concentration)
        assert r["rev_share_e6"] >= r["pct"] * 10_000 - 50_000
        prev_share, prev_n = r["rev_share_e6"], r["n_top"]


def test_lognormal_fit_identities(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["lognormal_spend_fit"](spark, SF).collect()[0]
    assert r["sigma"] > 0
    # implied mean exceeds implied median by the exp(sigma^2/2) factor
    assert r["implied_mean"] > r["implied_median"]
    assert (
        abs(
            r["implied_mean"] / r["implied_median"]
            - math.exp(r["sigma"] ** 2 / 2)
        )
        < 0.01
    )


def test_cvm_consistent_with_ks(spark):
    from redshells_spark.queries import QUERIES

    cvm = QUERIES["cvm_two_sample"](spark, SF).collect()[0]
    ks = QUERIES["ks_two_sample"](spark, SF).collect()[0]
    assert cvm["n1"] == ks["n1"] and cvm["n2"] == ks["n2"]
    assert cvm["cvm_t"] >= 0.0
    # L2 statistic bounded above by the sup-gap bound:
    # T <= n1 n2 /(n1+n2)^2 * (n1+n2) * D^2
    n1, n2 = cvm["n1"], cvm["n2"]
    bound = n1 * n2 / (n1 + n2) * ks["d_stat"] ** 2
    assert cvm["cvm_t"] <= bound + 1e-6
