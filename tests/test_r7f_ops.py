"""Round-7 batch-6: distributional-distance / robust-statistics
invariants, plus numpy cross-checks for EMD, MMD, and Kendall tau."""

from __future__ import annotations

import pytest

import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_emd_matches_numpy_recomputation(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["emd_price_histogram"](spark, SF).collect()[0]
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"])
    flag = np.asarray(t["l_returnflag"])
    price = np.asarray(t["l_extendedprice"], dtype=np.float64)
    keep = (flag == "R") | (flag == "N")
    cents = np.floor(price[keep] * 100 + 0.5).astype(np.int64)
    is1 = (flag[keep] == "R").astype(np.int64)
    mn, mx = cents.min(), cents.max()
    bucket = (cents - mn) * 1000 // (mx - mn + 1)
    n1, n2 = int(is1.sum()), int((1 - is1).sum())
    h1 = np.bincount(bucket[is1 == 1], minlength=1000)
    h2 = np.bincount(bucket[is1 == 0], minlength=1000)
    cum1, cum2 = np.cumsum(h1), np.cumsum(h2)
    # unit-gap sum over ALL buckets == gap-weighted sum over present ones
    emd_num = int(np.abs(cum1 * n2 - cum2 * n1)[:-1].sum())
    assert r["n1"] == n1 and r["n2"] == n2
    assert r["emd_num"] == emd_num
    assert r["emd_buckets"] >= 0.0


def test_t_closeness_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["t_closeness_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["t_e6"] <= 1_000_000
        assert r["breach_02"] == (1 if r["t_e6"] > 200_000 else 0)


def test_mmd_matches_numpy(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["mmd_label_shift"](spark, SF).collect()[0]
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    lab = np.asarray(t["label"])
    emb = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    q = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
    m0, m1 = q[lab == 0], q[lab == 1]
    diff = m0.mean(axis=0) - m1.mean(axis=0)
    mmd2 = float(((diff / 1e6) ** 2).sum())
    assert r["n0"] == len(m0) and r["n1"] == len(m1)
    assert abs(r["mmd2"] - mmd2) < 1e-5
    assert r["mmd2"] >= 0.0


def test_cramers_v_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["cramers_v_matrix"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["chi2"] >= 0.0
        assert 0.0 <= r["cramers_v"] <= 1.0 + 1e-9


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_kendall_matches_numpy_bruteforce(spark):
    from redshells_spark.queries import QUERIES

    rows = {r["flag"]: r for r in QUERIES["kendall_tau_by_flag"](spark, SF).collect()}
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    flag = np.asarray(t["l_returnflag"])
    x = np.asarray(t["l_quantity"], dtype=np.int64)
    y = np.floor(np.asarray(t["l_discount"], dtype=np.float64) * 100 + 0.5).astype(np.int64)
    for f in np.unique(flag):
        xs, ys = x[flag == f], y[flag == f]
        sx = np.sign(xs[:, None] - xs[None, :])
        sy = np.sign(ys[:, None] - ys[None, :])
        prod = sx * sy
        conc = int((prod > 0).sum() // 2)
        disc = int((prod < 0).sum() // 2)
        r = rows[str(f)]
        assert r["conc"] == conc and r["disc"] == disc
        n = len(xs)
        n0 = n * (n - 1) // 2
        tiex = n0 - int((sx != 0).sum() // 2)
        tiey = n0 - int((sy != 0).sum() // 2)
        tau = (conc - disc) / math.sqrt(float(n0 - tiex) * float(n0 - tiey))
        assert abs(r["tau_b"] - round(tau, 6)) < 2e-6


def test_gpd_threshold_and_moments(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["gpd_tail_fit"](spark, SF).collect()[0]
    n_orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"]).num_rows
    # ~5% exceedances of a p95 threshold (ties can push it below)
    assert 0 < r["n_e"] <= 0.06 * n_orders
    assert r["mean_excess"] > 0
    assert r["beta"] > 0


def test_chao1_dominates_observed(spark):
    from redshells_spark.queries import QUERIES

    for r in QUERIES["chao1_vocab_richness"](spark, SF).collect():
        assert r["chao1"] >= r["s_obs"]
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["f1"] + r["f2"] <= r["s_obs"]


def test_friedman_rank_sum_identity(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["friedman_event_types"](spark, SF).collect()
    k = rows[0]["k"]
    n = rows[0]["n_users"]
    # doubled midranks per block sum to k(k+1) -> totals n*k*(k+1)
    assert sum(r["rank_sum_x2"] for r in rows) == n * k * (k + 1)
    assert all(r["chi2_friedman"] >= 0.0 for r in rows)
    assert rows[0]["df"] == k - 1


def test_bh_stepup_is_prefix_and_bounds(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["bh_fdr_return_rates"](spark, SF).collect()
    assert len(rows) == 25
    by_p = sorted(rows, key=lambda r: (r["p_e9"], r["nationkey"]))
    sig = [r["significant"] for r in by_p]
    # significance is a prefix of the p-sorted order (step-up property)
    assert sig == sorted(sig, reverse=True)
    for r in rows:
        assert 0 <= r["p_e9"] <= 1_000_000_000
        assert 0 <= r["thr_e9"] <= 50_000_000


def test_procrustes_bounds(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["procrustes_embedding_align"](spark, SF).collect()[0]
    assert -math.pi <= r["theta"] <= math.pi
    assert 0.0 <= r["congruence"] <= 1.0 + 1e-9
    assert r["residual"] >= 0.0
