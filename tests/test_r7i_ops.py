"""Round-7 batch-9: nonparametric-test and survival invariants."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_wilcoxon_identities(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["wilcoxon_signed_rank"](spark, SF).collect()[0]
    n = r["n"]
    # W2+ is bounded by the total doubled rank sum 2*n(n+1)/2
    assert 0 <= r["w2_plus"] <= n * (n + 1)
    assert r["e_w2"] == n * (n + 1) // 2
    assert r["var12"] > 0
    assert r["reject_005"] == (1 if abs(r["z"]) > 1.96 else 0)


def test_cochran_q_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["cochran_q_event_types"](spark, SF).collect()
    assert len(rows) == 5
    q = rows[0]["cochran_q"]
    for r in rows:
        assert r["cochran_q"] == q  # replicated statistic
        assert 0 <= r["c_j"]
        assert r["df"] == r["k"] - 1
    if q is not None:
        assert q >= 0.0


def test_runs_test_consistency(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["runs_test_daily"](spark, SF).collect()[0]
    # runs bounded by sequence length; at least 1 run
    assert 1 <= r["runs"] <= r["n1"] + r["n2"]
    assert r["reject_005"] == (1 if abs(r["z"]) > 1.96 else 0)


def test_rmst_bounds_vs_km(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["rmst_churn"](spark, SF).collect()[0]
    # RMST is between 0 and tau; equals tau only if nobody churns
    assert 0.0 < r["rmst_hours"] <= r["tau_hours"]
    km = QUERIES["kaplan_meier_churn"](spark, SF).collect()
    # mean survival bounded below by tau * S(last event time)
    s_last = km[-1]["survival"]
    assert r["rmst_hours"] >= r["tau_hours"] * s_last - 1e-6


def test_ljung_box_nonneg_and_df(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["ljung_box_daily"](spark, SF).collect()[0]
    assert r["lb_stat"] >= 0.0
    assert r["df"] == 7
    assert r["sum_terms"] >= 0
    assert r["reject_005"] == (1 if r["lb_stat"] > 14.0671 else 0)
