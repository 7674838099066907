"""Unit gates for the round-7 session-2 experimentation tier:
hand-computed fixtures pin the math (trimmed means, SPRT boundaries,
Qini identities, Mann-Kendall textbook case, attribution reconciling
to the cent), plus registered-query sanity gates on sf0.001."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ trimmed / winsorized


def test_trimmed_winsorized_hand_value(spark):
    # 10 values 1..10, trim 10% each side -> drop 1 and 10:
    # trimmed mean = (2..9)/8 = 5.5; winsorized replaces 1->2, 10->9:
    # (2+2..9+9)/10 = (44+2+9)/10 = 5.5
    rows = [("g", v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, v long")
    from redshells_spark.operators.robust import trimmed_winsorized_means

    r = trimmed_winsorized_means(df, ["g"], "v", trim_pct=10).collect()[0]
    assert r["n"] == 10 and r["n_kept"] == 8
    assert r["v_lo"] == 2 and r["v_hi"] == 9
    assert r["trimmed_mean"] == pytest.approx(5.5)
    assert r["winsorized_mean"] == pytest.approx((44 + 2 + 9) / 10)


def test_trimmed_zero_trim_is_plain_mean(spark):
    rows = [("g", v) for v in (3, 7, 11)]
    df = spark.createDataFrame(rows, "g string, v long")
    from redshells_spark.operators.robust import trimmed_winsorized_means

    r = trimmed_winsorized_means(df, ["g"], "v", trim_pct=0).collect()[0]
    assert r["trimmed_mean"] == pytest.approx(7.0)
    assert r["winsorized_mean"] == pytest.approx(7.0)
    assert r["n_kept"] == 3


def test_trimmed_duplicates_span_cut(spark):
    # 1,2,2,2,3 with 20% trim: lo=1, kept ranks 1..3 -> all the 2s
    rows = [("g", v) for v in (1, 2, 2, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    from redshells_spark.operators.robust import trimmed_winsorized_means

    r = trimmed_winsorized_means(df, ["g"], "v", trim_pct=20).collect()[0]
    assert r["trimmed_mean"] == pytest.approx(2.0)
    assert r["v_lo"] == 2 and r["v_hi"] == 2
    assert r["winsorized_mean"] == pytest.approx(2.0)


# ------------------------------------------------------------ SPRT


def test_sprt_literals_and_boundaries():
    from redshells_spark.operators.sequential import sprt_llr_literals

    la, lb = sprt_llr_literals(0.45, 0.55)
    assert la == round(1e9 * math.log(0.55 / 0.45))
    assert lb == round(1e9 * math.log(0.45 / 0.55))
    assert la == -lb  # symmetric hypotheses


def test_sprt_monitor_crosses_h1(spark):
    # all-success periods drive the LLR up; with p1 > p0 the monitor
    # must eventually accept H1 and never accept H0
    rows = [(d, 100, 100) for d in range(30)]
    df = spark.createDataFrame(rows, "period long, t long, s long")
    from redshells_spark.operators.sequential import sprt_monitor

    out = sprt_monitor(df, "period", "t", "s", p0=0.45, p1=0.55).collect()
    decisions = [r["decision"] for r in out]
    assert "accept_h1" in decisions and "accept_h0" not in decisions
    # cumulative sum is strictly increasing for all-success input
    cums = [r["cum_llr_e9"] for r in out]
    assert all(b > a for a, b in zip(cums, cums[1:]))


def test_sprt_monitor_null_drift_continues(spark):
    # exactly-at-midpoint conversion (p=0.5 between 0.45/0.55 symmetric
    # hypotheses): llr is 0 every period -> perpetual 'continue'
    rows = [(d, 100, 50) for d in range(10)]
    df = spark.createDataFrame(rows, "period long, t long, s long")
    from redshells_spark.operators.sequential import sprt_monitor

    out = sprt_monitor(df, "period", "t", "s", p0=0.45, p1=0.55).collect()
    assert all(r["decision"] == "continue" for r in out)
    assert all(r["llr_e9"] == 0 for r in out)


# ------------------------------------------------------------ Qini


def test_qini_no_treatment_effect_is_zero(spark):
    # identical response rates in treat and control at every score ->
    # qini == 0 at every bucket
    rows = []
    for i in range(40):
        score = i % 4
        rows.append((i, 1, score, score % 2))  # treated
        rows.append((i + 100, 0, score, score % 2))  # control mirror
    df = spark.createDataFrame(rows, "uid long, treat int, score long, resp int")
    from redshells_spark.operators.experiment import qini_uplift_deciles

    out = qini_uplift_deciles(df, "treat", "score", "resp", n_buckets=4).collect()
    assert all(r["qini"] == pytest.approx(0.0) for r in out)
    # cumulative counts balanced by construction
    assert all(r["cum_n_t"] == r["cum_n_c"] for r in out)


def test_qini_last_bucket_is_total_increment(spark):
    rows = [(i, 1, 10 - i, 1 if i < 3 else 0) for i in range(10)] + [
        (100 + i, 0, 10 - i, 1 if i < 1 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "uid long, treat int, score long, resp int")
    from redshells_spark.operators.experiment import qini_uplift_deciles

    out = qini_uplift_deciles(df, "treat", "score", "resp", n_buckets=5).collect()
    last = out[-1]
    # with equal arm sizes the final qini is R_t - R_c = 3 - 1
    assert last["qini"] == pytest.approx(2.0)
    assert last["cum_n_t"] == 10 and last["cum_n_c"] == 10


# ------------------------------------------------------------ Mann-Kendall


def test_mann_kendall_monotone_series(spark):
    # strictly increasing, no ties: S = n(n-1)/2, z > 0, 'increasing'
    n = 10
    rows = [(t, t * 2) for t in range(n)]
    df = spark.createDataFrame(rows, "t long, v long")
    from redshells_spark.operators.drift import mann_kendall_trend

    r = mann_kendall_trend(df, "t", "v").collect()[0]
    assert r["s_stat"] == n * (n - 1) // 2
    assert r["var_s_x18"] == n * (n - 1) * (2 * n + 5)
    expected_z = (r["s_stat"] - 1) / math.sqrt(r["var_s_x18"] / 18.0)
    assert r["z"] == pytest.approx(expected_z, abs=1e-6)
    assert r["trend"] == "increasing"


def test_mann_kendall_constant_series_degenerate(spark):
    # all-tied series: var18 = 0 -> z NULL, trend 'none'
    rows = [(t, 5) for t in range(6)]
    df = spark.createDataFrame(rows, "t long, v long")
    from redshells_spark.operators.drift import mann_kendall_trend

    r = mann_kendall_trend(df, "t", "v").collect()[0]
    assert r["s_stat"] == 0 and r["var_s_x18"] == 0
    assert r["z"] is None and r["trend"] == "none"


# ------------------------------------------------------------ attribution


def test_attribution_reconciles_to_cent(spark):
    # 1 purchase of 1001 cents with 3 qualifying clicks: linear gives
    # 333/333/335 (remainder to last); first/last give full credit
    conv = spark.createDataFrame(
        [(1, 10_000_000_000, 900, 1001)], "user_id long, ts_us long, event_id long, c long"
    )
    touch = spark.createDataFrame(
        [(1, 9_000_000_000, 1), (1, 9_500_000_000, 2), (1, 9_900_000_000, 3)],
        "user_id long, ts_us long, event_id long",
    )
    from redshells_spark.operators.attribution import multi_touch_attribution

    out = multi_touch_attribution(
        conv, touch, cents_col="c", lookback_days=7
    ).collect()
    per_model = {}
    for r in out:
        per_model.setdefault(r["model"], 0)
        per_model[r["model"]] += r["credited_cents"]
    assert per_model["first_touch"] == 1001
    assert per_model["last_touch"] == 1001
    assert per_model["linear"] == 1001  # exact reconciliation
    n_linear = sum(r["n_touches_credited"] for r in out if r["model"] == "linear")
    assert n_linear == 3


def test_attribution_lookback_excludes_old_touches(spark):
    day_us = 86_400_000_000
    conv = spark.createDataFrame(
        [(1, 10 * day_us, 900, 500)], "user_id long, ts_us long, event_id long, c long"
    )
    touch = spark.createDataFrame(
        [(1, 1 * day_us, 1), (1, 9 * day_us, 2)],
        "user_id long, ts_us long, event_id long",
    )
    from redshells_spark.operators.attribution import multi_touch_attribution

    out = multi_touch_attribution(conv, touch, cents_col="c", lookback_days=7).collect()
    # only the day-9 touch qualifies; all three models credit it fully
    assert all(r["credited_cents"] == 500 for r in out)
    assert len(out) == 3


# ------------------------------------------------------------ Neyman


def test_neyman_allocation_sums_to_budget(spark):
    rows = [("a", v) for v in (10, 20, 30, 40)] + [("b", v) for v in (5, 5, 5, 5)] + [
        ("c", v) for v in (0, 100)
    ]
    df = spark.createDataFrame(rows, "s string, v long")
    from redshells_spark.data.sampling import neyman_allocation

    out = neyman_allocation(df, "s", "v", total_budget=100).collect()
    assert sum(r["allocation"] for r in out) == 100
    # zero-variance stratum draws nothing
    b = [r for r in out if r["stratum"] == "b"][0]
    assert b["s_value"] == 0.0 and b["allocation"] == 0
    # the high-spread stratum dominates: N_h * S_h = 2 * 70.71 vs 4 * 12.9
    c = [r for r in out if r["stratum"] == "c"][0]
    a = [r for r in out if r["stratum"] == "a"][0]
    assert c["allocation"] > a["allocation"]


# ------------------------------------------------------------ RD / delta / switchback


def test_regression_discontinuity_flat_sides(spark):
    # constant outcome on each side: slopes 0, intercepts = the side
    # means, jump visible as intercept difference
    rows = [(i, 2 + i % 3, 100) for i in range(9)] + [
        (100 + i, 6 + i % 3, 300) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "uid long, x long, y long")
    from redshells_spark.operators.experiment import regression_discontinuity

    out = {r["side"]: r for r in regression_discontinuity(df, "x", "y", bandwidth=5).collect()}
    # cutoff = (3*(2+3+4) + 3*(6+7+8)) div 18 = 90 div 18 = 5
    assert out["left"]["cutoff"] == 5
    assert out["left"]["intercept_cents"] == pytest.approx(100.0)
    assert out["right"]["intercept_cents"] == pytest.approx(300.0)
    assert out["left"]["slope_cents"] == pytest.approx(0.0)


def test_delta_method_ratio_zero_variance(spark):
    # every unit identical -> se exactly 0, ratio = x/y
    rows = [(i, 200, 4) for i in range(8)]
    df = spark.createDataFrame(rows, "uid long, x long, y long")
    from redshells_spark.operators.experiment import delta_method_ratio

    r = delta_method_ratio(df, "x", "y", "m").collect()[0]
    assert r["ratio_cents"] == pytest.approx(50.0)
    assert r["se_cents"] == pytest.approx(0.0)
    assert r["ci_lo_cents"] == pytest.approx(50.0)


def test_switchback_exact_bucket_means(spark):
    # two buckets per arm with known integer means
    hour = 3_600_000_000
    rows = (
        [(0 * hour + i, 100) for i in range(4)]  # bucket 0 (arm 0) mean 100
        + [(1 * hour + i, 200) for i in range(4)]  # bucket 1 (arm 1) mean 200
        + [(2 * hour + i, 300) for i in range(4)]  # bucket 2 (arm 0) mean 300
        + [(3 * hour + i, 400) for i in range(4)]  # bucket 3 (arm 1) mean 400
    )
    df = spark.createDataFrame(rows, "us long, c long")
    from redshells_spark.operators.experiment import switchback_readout

    out = {r["arm"]: r for r in switchback_readout(df, "us", "c").collect()}
    assert out[0]["mean_cents"] == pytest.approx(200.0)
    assert out[1]["mean_cents"] == pytest.approx(300.0)
    assert out[0]["n_buckets"] == 2 and out[0]["n_events"] == 8


def test_power_mde_shrinks_with_horizon(spark):
    counts = spark.createDataFrame(
        [(10000, 2000, 10)], "n_events long, n_success long, n_days long"
    )
    from redshells_spark.operators.experiment import power_mde_table

    out = power_mde_table(counts, [7, 14, 28]).collect()
    mdes = [r["mde_abs"] for r in out]
    assert mdes[0] > mdes[1] > mdes[2]  # more data -> smaller MDE
    assert out[0]["p_base"] == pytest.approx(0.2)
    # n_per_arm exact integer: (7 * (10000 div 10)) div 2
    assert out[0]["n_per_arm"] == 3500


# ------------------------------------------------------------ containment


def test_containment_equals_brute_force(spark):
    # exactness gate: prefix filter + positional bounds must lose NO
    # qualifying ordered pair vs the all-pairs containment join
    import itertools

    sets = {
        1: ["a", "b", "c", "d", "e"],
        2: ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"],  # contains 1
        3: ["a", "b", "c", "d", "x"],  # 4/5 of 1 in 3
        4: ["z", "y", "x", "w"],
        5: ["a", "b", "c", "d", "e"],  # duplicate of 1
    }
    rows = [(i, e) for i, els in sets.items() for e in els]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    from redshells_spark.dedup.ppjoin import (
        build_rank_sorted_sets,
        containment_pairs_from_rank_sorted,
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs_from_rank_sorted(
            build_rank_sorted_sets(df), 8, 10
        ).collect()
    }
    want = set()
    for a, b in itertools.permutations(sets, 2):
        inter = len(set(sets[a]) & set(sets[b]))
        if inter * 10 >= 8 * len(sets[a]):
            want.add((a, b))
    assert got == want
    assert (1, 2) in got and (2, 1) not in got  # asymmetry
    assert (1, 5) in got and (5, 1) in got  # exact dup both ways


def test_containment_cont_e4_exact(spark):
    rows = [(1, e) for e in "abcde"] + [(2, e) for e in "abcdefghij"]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    from redshells_spark.dedup.ppjoin import (
        build_rank_sorted_sets,
        containment_pairs_from_rank_sorted,
    )

    out = containment_pairs_from_rank_sorted(build_rank_sorted_sets(df), 8, 10).collect()
    r = [x for x in out if x["id_a"] == 1][0]
    assert r["inter"] == 5 and r["size_a"] == 5 and r["size_b"] == 10
    assert r["cont_e4"] == 10000


# ------------------------------------------------------------ EB shrinkage


def test_eb_shrinkage_pulls_small_n_to_prior(spark):
    # many well-measured entities at rate 0.5 (n=20), one 1/1 entity:
    # its shrunk rate must land near the prior mean, far below 1.0
    rows = [(f"g{i}", 10 + (i % 5) - 2, 20) for i in range(40)] + [("tiny", 1, 1)]
    df = spark.createDataFrame(rows, "g string, s long, n long")
    from redshells_spark.operators.shrinkage import eb_beta_binomial_shrinkage

    out = {r["g"]: r for r in eb_beta_binomial_shrinkage(df, ["g"], "s", "n").collect()}
    tiny = out["tiny"]
    assert tiny["raw_rate_e3"] == 1000
    assert tiny["shrunk_rate"] < 0.75  # pulled hard toward ~0.5
    big = out["g0"]
    assert abs(big["shrunk_rate"] - big["s"] / big["n"]) < 0.1


def test_eb_shrinkage_flat_prior_fallback(spark):
    # all rates identical -> v = 0 -> Beta(1,1) fallback
    rows = [(f"g{i}", 5, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s long, n long")
    from redshells_spark.operators.shrinkage import eb_beta_binomial_shrinkage

    out = eb_beta_binomial_shrinkage(df, ["g"], "s", "n").collect()
    assert all(r["alpha"] == 1.0 and r["beta"] == 1.0 for r in out)
    assert all(r["shrunk_rate"] == 0.5 for r in out)  # (1+5)/(2+10)


# ------------------------------------------------------------ group-sequential


def test_group_sequential_boundary_shape(spark):
    # boundaries shrink toward z_final as looks accumulate; stop fires
    # where |z| clears the inflated bound
    rows = []
    for look in range(4):
        rows.append((look, 1, 1000, 700))  # treated converts at 0.7
        rows.append((look, 0, 1000, 500))  # control at 0.5
    df = spark.createDataFrame(rows, "look long, arm long, nt long, ns long")
    from redshells_spark.operators.sequential import group_sequential_z

    out = group_sequential_z(df, "look", "arm", "nt", "ns").collect()
    bounds = [r["z_bound"] for r in out]
    assert bounds == sorted(bounds, reverse=True)  # sqrt(K/k) decreasing
    assert bounds[-1] == pytest.approx(1.959964, abs=1e-6)  # final look
    assert all(r["stop"] == 1 for r in out)  # effect is massive
    assert out[-1]["n1"] == 4000 and out[-1]["s0"] == 2000  # cumulative


def test_group_sequential_null_effect_no_stop(spark):
    rows = []
    for look in range(4):
        rows.append((look, 1, 1000, 500))
        rows.append((look, 0, 1000, 500))
    df = spark.createDataFrame(rows, "look long, arm long, nt long, ns long")
    from redshells_spark.operators.sequential import group_sequential_z

    out = group_sequential_z(df, "look", "arm", "nt", "ns").collect()
    assert all(r["stop"] == 0 for r in out)
    assert all(r["z"] == 0.0 for r in out)


# ------------------------------------------------------------ WAND BM25


def test_wand_equals_exact_bm25(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from redshells_spark.text.bm25 import bm25_topk, bm25_wand_topk

    terms = ("spark", "join", "hash")
    got = bm25_wand_topk(docs, terms, k=12).collect()
    want = bm25_topk(docs, terms, k=12).collect()
    assert got == want  # lossless pruning: identical ranking


def test_wand_floor_disables_when_seed_too_small(spark):
    # a term matching fewer than k docs cannot set the floor; the
    # result must still equal the exact ranking
    rows = [(1, "rare common"), (2, "common common"), (3, "common x"), (4, "x y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from redshells_spark.text.bm25 import bm25_topk, bm25_wand_topk

    terms = ("rare", "common")
    got = bm25_wand_topk(docs, terms, k=3).collect()
    want = bm25_topk(docs, terms, k=3).collect()
    assert got == want


# ------------------------------------------------------------ CUSUM / MASE


def test_cusum_closed_form_matches_recursion(spark):
    # the window closed form must equal Page's reset-at-zero recursion
    vals = [5, 5, 6, 4, 5, 9, 9, 10, 9, 5, 5]
    rows = [(t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "t long, v long")
    from redshells_spark.operators.changepoint import cusum_monitor

    out = cusum_monitor(df, "t", "v", slack=0).collect()
    mu0 = sum(vals) // len(vals)
    sp = sn = 0
    for r, v in zip(out, vals):
        sp = max(0, sp + (v - mu0))
        sn = max(0, sn + (mu0 - v))
        assert r["cusum_pos"] == sp and r["cusum_neg"] == sn


def test_cusum_flags_level_shift(spark):
    rows = [(t, 10) for t in range(20)] + [(20 + t, 40) for t in range(10)]
    df = spark.createDataFrame(rows, "t long, v long")
    from redshells_spark.operators.changepoint import cusum_monitor

    out = cusum_monitor(df, "t", "v").collect()
    # mu0 is the GLOBAL mean (20), so both regimes deviate from it:
    # the first day hasn't accumulated enough yet, the tail has
    assert out[0]["flag"] == 0
    assert out[-1]["flag"] == 1  # shift accumulates past 5*sqrt(mu0)
    # positive side reacts to the upward shift specifically
    assert out[-1]["cusum_pos"] > out[19]["cusum_pos"]


def test_mase_pure_weekly_signal(spark):
    # perfectly 7-periodic series: seasonal error 0, naive error > 0
    rows = [(t, 10 + (t % 7)) for t in range(28)]
    df = spark.createDataFrame(rows, "t long, v long")
    from redshells_spark.operators.drift import seasonal_naive_mase

    r = seasonal_naive_mase(df, "t", "v", season=7).collect()[0]
    assert r["sae_seasonal"] == 0 and r["sae_naive"] > 0
    assert r["mase"] == 0.0
    assert r["n_terms"] == 21  # 28 days minus the 7-day burn-in


# ------------------------------------------------------------ IV / LATE


def test_iv_wald_hand_value(spark):
    # encouraged arm takes up at 0.8, control at 0.2; outcome is
    # 100 cents per treated unit and 0 otherwise:
    # ITT = 80 - 20 = 60, first stage = 0.6, LATE = 100 exactly
    rows = []
    for i in range(10):
        d = 1 if i < 8 else 0
        rows.append((1, d, 100 * d))  # z=1
    for i in range(10):
        d = 1 if i < 2 else 0
        rows.append((0, d, 100 * d))  # z=0
    df = spark.createDataFrame(rows, "z long, d int, y long")
    from redshells_spark.operators.experiment import iv_wald_estimate

    r = iv_wald_estimate(df, "z", "d", "y").collect()[0]
    assert r["first_stage"] == pytest.approx(0.6)
    assert r["itt_cents"] == pytest.approx(60.0)
    assert r["late_cents"] == pytest.approx(100.0)


def test_iv_wald_null_instrument(spark):
    # identical take-up in both arms -> first stage 0 -> LATE NULL
    rows = [(z, 1, 100) for z in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "z long, d int, y long")
    from redshells_spark.operators.experiment import iv_wald_estimate

    r = iv_wald_estimate(df, "z", "d", "y").collect()[0]
    assert r["first_stage"] == 0.0 and r["late_cents"] is None
