"""Round-7 batch-3 operators: textbook-value and invariant tests for
the survival pair (Nelson-Aalen, log-rank), min-label propagation,
Katz walk counts, the Pareto-frontier skyline, and pinball loss."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ Nelson-Aalen


def test_nelson_aalen_textbook(spark):
    # durations 1,2,2,3 all observed: H(1)=1/4, H(2)=1/4+2/3, H(3)=...+1/1
    from redshells_spark.operators.survival import nelson_aalen

    d = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1), (3, 1)], "duration long, event long"
    )
    rows = {r["duration"]: r for r in nelson_aalen(d).collect()}
    assert rows[1]["n_risk"] == 4 and rows[1]["n_events"] == 1
    assert rows[1]["cum_hazard"] == pytest.approx(0.25, abs=1e-6)
    assert rows[2]["cum_hazard"] == pytest.approx(0.25 + 2 / 3, abs=1e-6)
    assert rows[3]["cum_hazard"] == pytest.approx(0.25 + 2 / 3 + 1.0, abs=1e-6)
    # variance: sum d/n^2 = 1/16 + 2/9 + 1
    assert rows[3]["hazard_se"] == pytest.approx(
        math.sqrt(1 / 16 + 2 / 9 + 1.0), abs=1e-5
    )


def test_nelson_aalen_censoring_reduces_risk_not_hazard(spark):
    from redshells_spark.operators.survival import nelson_aalen

    d = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1)], "duration long, event long"
    )
    rows = {r["duration"]: r for r in nelson_aalen(d).collect()}
    # at t=1: 3 at risk, 1 death (the censored row joins the risk set
    # but contributes no hazard); at t=2: 1 at risk
    assert rows[1]["n_risk"] == 3 and rows[1]["n_events"] == 1
    assert rows[1]["cum_hazard"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2]["cum_hazard"] == pytest.approx(1 / 3 + 1.0, abs=1e-6)


# ---------------------------------------------------------- log-rank


def test_log_rank_identical_groups_is_null_effect(spark):
    from redshells_spark.operators.survival import log_rank

    rows = [(t, 1, g) for t in (1, 2, 3, 4) for g in (0, 1)]
    d = spark.createDataFrame(rows, "duration long, event long, grp long")
    out = log_rank(d).collect()[0]
    # perfectly mirrored cohorts: observed == expected exactly
    assert out["o1"] == 4
    assert out["e1"] == pytest.approx(4.0, abs=1e-6)
    assert out["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_log_rank_hand_computed_two_times(spark):
    from redshells_spark.operators.survival import log_rank

    # g0 dies at t=1 (2 subjects), g1 dies at t=2 (2 subjects)
    d = spark.createDataFrame(
        [(1, 1, 0), (1, 1, 0), (2, 1, 1), (2, 1, 1)],
        "duration long, event long, grp long",
    )
    out = log_rank(d).collect()[0]
    # t=1: n1=2, n2=2, d=2 -> e1 = 2*2/4 = 1, v = 1*(2/4)*(2/4)*... wait
    # v = d*(n1/n)*(n2/n)*(n-d)/(n-1) = 2*(1/2)*(1/2)*(2/3) = 1/3
    # t=2: n1=0, n2=2, d=2 -> e1 = 0, v = 0
    assert out["o1"] == 2 and out["o2"] == 2
    assert out["e1"] == pytest.approx(1.0, abs=1e-6)
    assert out["var_lr"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["chi2"] == pytest.approx((2 - 1.0) ** 2 / (1 / 3), abs=1e-4)


# -------------------------------------------------- label propagation


def test_min_label_propagation_two_components(spark):
    from redshells_spark.operators.graph import (
        min_label_propagation,
        symmetrize_edges,
    )

    e = symmetrize_edges(
        spark.createDataFrame(
            [("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
        )
    )
    lab = {r["node"]: r["lab"] for r in min_label_propagation(e, rounds=3).collect()}
    assert lab == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_min_label_propagation_bounded_rounds_radius(spark):
    from redshells_spark.operators.graph import (
        min_label_propagation,
        symmetrize_edges,
    )

    # path a-b-c-d-e: after 1 round the min label only travels 1 hop
    e = symmetrize_edges(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
            "src string, dst string",
        )
    )
    lab1 = {
        r["node"]: r["lab"] for r in min_label_propagation(e, rounds=1).collect()
    }
    assert lab1 == {"a": "a", "b": "a", "c": "b", "d": "c", "e": "d"}


# ------------------------------------------------------- Katz counts


def test_katz_walk_counts_path_graph(spark):
    from redshells_spark.operators.graph import katz_walk_counts, symmetrize_edges

    # a-b-c (symmetrized): degrees a=1 b=2 c=1
    e = symmetrize_edges(
        spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    )
    k = {r["node"]: r for r in katz_walk_counts(e).collect()}
    assert (k["a"]["w1"], k["b"]["w1"], k["c"]["w1"]) == (1, 2, 1)
    # w2(i) = sum of neighbor degrees: a<-b:2, b<-a+c:2, c<-b:2
    assert (k["a"]["w2"], k["b"]["w2"], k["c"]["w2"]) == (2, 2, 2)
    # w3: a<-b's w2=2, b<-a+c: 2+2=4, c<-2
    assert (k["a"]["w3"], k["b"]["w3"], k["c"]["w3"]) == (2, 4, 2)
    assert k["b"]["katz_x64"] == 16 * 2 + 4 * 2 + 4


# ---------------------------------------------------------- skyline


def test_pareto_frontier_query_dominance(spark):
    # registered query invariant on real testdata: every kept point is
    # undominated, every dropped point is dominated by some kept point
    from redshells_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    kept = QUERIES["pareto_frontier_spend"](spark, sf).collect()
    o = spark.read.parquet(f"{sf}/orders.parquet")
    allpts = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("spend_e2"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .collect()
    )
    kset = {(r["spend_e2"], r["n_orders"]) for r in kept}

    def dominated(p, q):  # q dominates p
        return (
            q[0] >= p[0]
            and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1])
        )

    pts = [(r["spend_e2"], r["n_orders"]) for r in allpts]
    for p in kset:
        assert not any(dominated(p, q) for q in pts), p
    for p in pts:
        if p not in kset:
            assert any(dominated(p, q) for q in kset), p


# ------------------------------------------------------ pinball loss


def test_pinball_loss_asymmetry_hand_values(spark):
    # one over-prediction of 10 cents and one under-prediction of 10:
    # tau=0.1 charges under-forecast 1x and over-forecast 9x per cent
    from redshells_spark.queries import ORACLES, QUERIES

    assert "pinball_forecast_eval" in QUERIES and "pinball_forecast_eval" in ORACLES
    d = 10
    for tau10 in (1, 5, 9):
        over = (tau10 - 10) * (-d)  # v - f = -d
        under = tau10 * d
        assert over == (10 - tau10) * d and under == tau10 * d


def test_quantile_treatment_effect_decile_monotone(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["quantile_treatment_effect"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["decile"] for r in rows] == list(range(1, 10))
    qts = [r["q_treat_e2"] for r in rows]
    qcs = [r["q_ctrl_e2"] for r in rows]
    assert qts == sorted(qts) and qcs == sorted(qcs)
    for r in rows:
        assert r["qte_e2"] == r["q_treat_e2"] - r["q_ctrl_e2"]


# --------------------------------------------- Markov attribution


def test_markov_journey_transition_counts(spark):
    from redshells_spark.operators.markov import journey_transition_counts

    rows = [
        (1, "view", 10, 100), (1, "click", 20, 101), (1, "purchase", 30, 102),
        (2, "view", 10, 200), (2, "purchase", 20, 201),
        (3, "view", 10, 300),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, us long, event_id long"
    )
    cnt = {
        (r["src"], r["dst"]): r["c"]
        for r in journey_transition_counts(ev).collect()
    }
    assert cnt == {
        ("start", "view"): 3,
        ("view", "click"): 1,
        ("click", "conv"): 1,
        ("view", "conv"): 1,
        ("view", "null"): 1,
    }


def test_markov_removal_effects_hand_chain(spark):
    from redshells_spark.operators.markov import (
        journey_transition_counts,
        removal_effect_attribution,
    )

    rows = [
        (1, "view", 10, 100), (1, "click", 20, 101), (1, "purchase", 30, 102),
        (2, "view", 10, 200), (2, "purchase", 20, 201),
        (3, "view", 10, 300),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, us long, event_id long"
    )
    cnt = journey_transition_counts(ev)
    out = {
        r["channel"]: r
        for r in removal_effect_attribution(
            spark, cnt, ["view", "click"], horizon=16
        ).collect()
    }
    # base chain: P(conv) = 1/3 + 1/3 = 2/3; cutting click loses half
    # of it; cutting view loses everything
    assert out["view"]["pc_base"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["click"]["pc_removed"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["view"]["pc_removed"] == pytest.approx(0.0, abs=1e-9)
    assert out["view"]["removal_effect"] == pytest.approx(1.0, abs=1e-6)
    assert out["click"]["removal_effect"] == pytest.approx(0.5, abs=1e-6)
    assert out["view"]["attribution_share"] == pytest.approx(2 / 3, abs=1e-5)
    assert out["click"]["attribution_share"] == pytest.approx(1 / 3, abs=1e-5)


def test_rfm_segment_invariants(spark):
    from redshells_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["rfm_segmentation"](spark, sf).collect()
    n_cust = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for k in ("r_score", "f_score", "m_score"):
            assert 1 <= r[k] <= 5
