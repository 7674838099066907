"""Round-7 batch-11: dedup meta-evaluation invariants."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_calibration_monotone_and_bounded(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["minhash_estimate_calibration"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["est_sixteenths"] <= 16
        assert 0 <= r["mean_exact_e6"] <= 1_000_000
        assert 0 <= r["mean_abs_err_e6"] <= 1_000_000
        assert r["n_pairs"] >= 1
    # estimator tracks exact jaccard: top bucket >= bottom bucket
    by_est = sorted(rows, key=lambda r: r["est_sixteenths"])
    if len(by_est) >= 2:
        assert by_est[-1]["mean_exact_e6"] >= by_est[0]["mean_exact_e6"]


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_dedup_agreement_set_algebra(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["dedup_method_agreement"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_both"] <= min(r["n_minhash"], r["n_ngram"])
        assert r["n_union"] == r["n_minhash"] + r["n_ngram"] - r["n_both"]
        assert 0 <= r["agreement_e6"] <= 1_000_000
