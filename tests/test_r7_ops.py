"""Unit gates for the round-7 experimentation / survival / distribution
operators: hand-computed fixtures pin the math, identity checks pin the
decompositions, and the registered queries get shape/sanity gates on
the sf0.001 testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ CUPED


def test_cuped_theta_and_adjustment(spark):
    # y = 2x + noise-free shift per variant: theta must be exactly 2,
    # rho2 exactly 1, and adjusted means equal across variants
    rows = [(0, x, 2 * x) for x in (10, 20, 30)] + [(1, x, 2 * x) for x in (12, 22, 32)]
    df = spark.createDataFrame(rows, "variant int, x long, y long")
    from redshells_spark.operators.experiment import cuped_adjusted

    out = {r["variant"]: r for r in cuped_adjusted(df, "variant", "x", "y").collect()}
    assert out[0]["theta"] == pytest.approx(2.0)
    assert out[0]["variance_reduction"] == pytest.approx(1.0)
    # adjustment removes the covariate shift entirely: both variants
    # land on the pooled regression line
    assert out[0]["adj_mean_post_cents"] == pytest.approx(out[1]["adj_mean_post_cents"])


# ------------------------------------------------------------ DiD


def test_diff_in_diff_hand_value(spark):
    # treat: pre mean 10, post mean 30 (+20); ctrl: pre 5, post 10 (+5)
    rows = (
        [("k", 1, 0, 10)] * 2
        + [("k", 1, 1, 30)] * 2
        + [("k", 0, 0, 5)] * 2
        + [("k", 0, 1, 10)] * 2
    )
    df = spark.createDataFrame(rows, "k string, treat int, post int, r long")
    from redshells_spark.operators.experiment import diff_in_diff

    row = diff_in_diff(df, ["k"], "treat", "post", "r").collect()[0]
    assert row["did_cents"] == pytest.approx(15.0)
    assert row["mean_treat_post"] == pytest.approx(30.0)


# ------------------------------------------------------------ IPS


def test_ips_uniform_identity(spark):
    # uniform target over a log whose behavior IS uniform: every weight
    # is exactly 1 (w_e6 = E6), so IPS == SNIPS == plain mean reward
    rows = [("a", 10), ("a", 20), ("b", 30), ("b", 40)]
    df = spark.createDataFrame(rows, "action string, r long")
    from redshells_spark.operators.experiment import ips_policy_value

    row = ips_policy_value(df, "action", "r", None, "uniform").collect()[0]
    assert row["max_w_e6"] == 1_000_000
    assert row["ips_value_cents"] == pytest.approx(25.0)
    assert row["snips_value_cents"] == pytest.approx(25.0)
    assert row["clip_frac"] == 0.0


def test_ips_greedy_reweights(spark):
    # greedy target on action 'a' (share 1/4): w = N/n_a = 4, IPS =
    # 4 * sum(r_a) / (N) = 4*10/4 = 10; SNIPS = mean reward of 'a'
    rows = [("a", 10), ("b", 30), ("b", 40), ("b", 50)]
    df = spark.createDataFrame(rows, "action string, r long")
    from redshells_spark.operators.experiment import ips_policy_value

    row = ips_policy_value(df, "action", "r", ["a"], "greedy").collect()[0]
    assert row["n_matched"] == 1
    assert row["max_w_e6"] == 4_000_000
    assert row["ips_value_cents"] == pytest.approx(10.0)
    assert row["snips_value_cents"] == pytest.approx(10.0)


# ------------------------------------------------------------ stratified ATE


def test_stratified_ate_exact_effect(spark):
    # two strata by x; within each stratum treated = control + 7
    rows = []
    for x, base in ((1, 100), (9, 200)):
        rows += [(1, base + 7, x), (1, base + 7, x), (0, base, x), (0, base, x)]
    df = spark.createDataFrame(rows, "treat int, y long, x long")
    from redshells_spark.operators.experiment import stratified_ate

    out = stratified_ate(df, "treat", "y", "x", n_strata=2).collect()
    assert all(r["diff_cents"] == pytest.approx(7.0) for r in out)
    assert out[0]["ate_cents"] == pytest.approx(7.0)
    assert out[0]["n_overlap"] == 8


# ------------------------------------------------------------ Kaplan-Meier


def test_kaplan_meier_hand_curve(spark):
    # classic tiny example: deaths at t=1 (n_risk 5) and t=3 (n_risk 3),
    # censor at t=2 and t=4, survivor at t=5 censored
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "t long, event int")
    from redshells_spark.operators.survival import kaplan_meier

    out = {r["t"]: r for r in kaplan_meier(df, "t", "event").collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == pytest.approx(0.8)
    assert out[3]["n_risk"] == 3
    assert out[3]["survival"] == pytest.approx(0.8 * (1 - 1 / 3), abs=1e-6)


def test_kaplan_meier_all_deaths_hits_zero(spark):
    df = spark.createDataFrame([(1, 1), (1, 1)], "t long, event int")
    from redshells_spark.operators.survival import kaplan_meier

    out = kaplan_meier(df, "t", "event").collect()
    assert out[0]["survival"] == 0.0


# ------------------------------------------------------------ modularity


def test_modularity_two_cliques(spark):
    # two disjoint 3-cliques, partitioned exactly by clique:
    # Q = sum_c (a_c/2m - (d_c/2m)^2) = 2*(6/12 - (6/12)^2) = 0.5
    from redshells_spark.operators.graph import partition_modularity, symmetrize_edges

    e = []
    for base, com in ((0, "x"), (10, "y")):
        e += [(f"n{base+i}", f"n{base+j}") for i in range(3) for j in range(3) if i < j]
    edges = symmetrize_edges(spark.createDataFrame(e, "src string, dst string"))
    cm = spark.createDataFrame(
        [(f"n{i}", "x") for i in range(3)] + [(f"n{10+i}", "y") for i in range(3)],
        "node string, community string",
    )
    out = {r["community"]: r for r in partition_modularity(edges, cm).collect()}
    assert out["__total__"]["q_term"] == pytest.approx(0.5)
    assert out["x"]["internal_arcs"] == 6 and out["x"]["degree_sum"] == 6


def test_modularity_random_partition_near_zero(spark):
    # a clique split across two communities scores lower than the
    # clique-aligned partition (and a single community scores exactly 0)
    from redshells_spark.operators.graph import partition_modularity, symmetrize_edges

    e = [(f"n{i}", f"n{j}") for i in range(4) for j in range(4) if i < j]
    edges = symmetrize_edges(spark.createDataFrame(e, "src string, dst string"))
    one = spark.createDataFrame([(f"n{i}", "all") for i in range(4)], "node string, community string")
    out = {r["community"]: r for r in partition_modularity(edges, one).collect()}
    assert out["__total__"]["q_term"] == pytest.approx(0.0)


# ------------------------------------------------------------ ACF


def test_autocorrelation_perfect_period(spark):
    # period-2 series: lag-2 correlation is exactly 1, lag-1 exactly -1
    rows = [(t, 10 if t % 2 == 0 else 20) for t in range(20)]
    df = spark.createDataFrame(rows, "t long, n long")
    from redshells_spark.operators.drift import lagged_autocorrelation

    out = {r["lag"]: r["acf"] for r in lagged_autocorrelation(df, "t", "n", 3).collect()}
    assert out[2] == pytest.approx(1.0)
    assert out[1] == pytest.approx(-1.0)


def test_autocorrelation_constant_series_null(spark):
    df = spark.createDataFrame([(t, 5) for t in range(10)], "t long, n long")
    from redshells_spark.operators.drift import lagged_autocorrelation

    out = lagged_autocorrelation(df, "t", "n", 2).collect()
    assert all(r["acf"] is None for r in out)


# ------------------------------------------------------------ Frechet


def test_frechet_zero_for_identical_groups(spark):
    rows = [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [1.0, 2.0]), (1, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    from redshells_spark.similarity.distribution import frechet_diagonal_distance

    out = frechet_diagonal_distance(df, "label").collect()
    assert len(out) == 1
    assert out[0]["fd2"] == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift_only(spark):
    # same (zero) variance, means shifted by (3, 4): FD^2 = 9 + 16 = 25
    rows = [(0, [0.0, 0.0]), (0, [0.0, 0.0]), (1, [3.0, 4.0]), (1, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    from redshells_spark.similarity.distribution import frechet_diagonal_distance

    out = frechet_diagonal_distance(df, "label").collect()[0]
    assert out["mean_dist2"] == pytest.approx(25.0, abs=1e-6)
    assert out["cov_dist2"] == pytest.approx(0.0, abs=1e-6)
    assert out["fd2"] == pytest.approx(25.0, abs=1e-6)


# ------------------------------------------------------------ registered queries


def test_brier_decomposition_identity(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["brier_decomposition"](spark, sf_dir).collect()
    row = rows[0]
    # Murphy identity brier = REL - RES + UNC holds exactly for the
    # BINNED forecaster; with continuous scores the gap equals the
    # within-bin score variance (+ a small covariance), bounded by the
    # bin width squared / 12 ~ 8.3e-4 for 0.1-wide uniform-ish bins
    lhs = row["brier"]
    rhs = row["reliability"] - row["resolution"] + row["uncertainty"]
    assert abs(lhs - rhs) < 5e-3
    assert 0.0 <= row["brier"] <= 1.0
    # uncertainty really is obar*(1-obar) of the pooled outcome rate
    n_tot = sum(r["n"] for r in rows)
    obar = sum(r["n"] * r["frac_pos"] for r in rows) / n_tot
    assert row["uncertainty"] == pytest.approx(obar * (1 - obar), abs=1e-5)


def test_heaps_law_fit_shape(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    out = QUERIES["heaps_law_fit"](spark, sf_dir).collect()
    toks = sorted(r["cum_tokens"] for r in out)
    vocab = sorted(r["cum_vocab"] for r in out)
    assert toks == [r["cum_tokens"] for r in sorted(out, key=lambda r: r["bucket"])]
    assert vocab[-1] >= vocab[0]
    beta = out[0]["heaps_beta"]
    # sublinear vocabulary growth; the synthetic corpus' ~31-token
    # vocabulary saturates in the first bucket, so beta == 0.0 there
    # is the correct Heaps fit, not a failure
    assert 0.0 <= beta < 1.0


def test_ips_query_policies(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    rows = {r["policy"]: r for r in QUERIES["ips_policy_value"](spark, sf_dir).collect()}
    assert set(rows) == {"uniform", "greedy_purchase"}
    for r in rows.values():
        assert r["n_logged"] > 0 and r["max_w_e6"] > 0
        assert not math.isnan(r["snips_value_cents"])


def test_kaplan_meier_query_monotone(spark, sf_dir):
    from redshells_spark.queries import QUERIES

    out = sorted(
        QUERIES["kaplan_meier_churn"](spark, sf_dir).collect(),
        key=lambda r: r["duration_hours"],
    )
    surv = [r["survival"] for r in out]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risks = [r["n_risk"] for r in out]
    assert all(a >= b for a, b in zip(risks, risks[1:]))
