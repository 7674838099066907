"""Round-7 batch-13: dependence / decomposition / decision invariants."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_tail_dependence_bounds(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["tail_dependence_lambda"](spark, SF).collect()[0]
    assert 0 <= r["lambda_u_e6"] <= 1_000_000
    assert 0 <= r["lambda_l_e6"] <= 1_000_000
    assert r["n_uu"] <= r["n_xu"]
    assert r["n_ll"] <= r["n_xl"]


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_mix_rate_effects_sum_to_total(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["mix_rate_decomposition"](spark, SF).collect()
    assert len(rows) == 5
    # sum of effects == sum w1 r1 - sum w0 r0 (reconstructed)
    total = sum(r["mix_effect"] + r["rate_effect"] + r["interaction"] for r in rows)
    lhs = sum(
        (r["w1_e6"] / 1e6) * r["r1"] - (r["w0_e6"] / 1e6) * r["r0"] for r in rows
    )
    assert abs(total - lhs) < 0.05  # e6 weight quantization slack


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_price_indices_bracket_fisher(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["price_indices_periods"](spark, SF).collect()[0]
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
    assert r["n_parts"] > 0
    assert 0.5 < r["fisher"] < 2.0  # stationary synthetic prices


def test_fs_weights_discriminate(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["fellegi_sunter_weights"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["m_e6"] <= 1_000_000
        assert 0 <= r["u_e6"] <= 1_000_000
        if r["log_weight"] is not None and r["field"] == "adj_lev_le2":
            # near-equal adjectives must be evidence FOR a match
            assert r["log_weight"] > 0


def test_ucb_exactly_one_pull(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["ucb_arm_indices"](spark, SF).collect()
    assert sum(r["pull_next"] for r in rows) == 1
    for r in rows:
        assert r["ucb"] >= r["mean_norm"]
        assert 0.0 <= r["mean_norm"] <= 1.0
