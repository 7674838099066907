"""Round-7 batch-10: classical inference / transform invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_anova_matches_numpy(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["anova_order_totals"](spark, SF).collect()
    o = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(np.asarray(c["c_custkey"]).tolist(), np.asarray(c["c_mktsegment"]).tolist()))
    v = (np.floor(np.asarray(o["o_totalprice"]) * 100 + 0.5).astype(np.int64)) // 100
    g = np.array([seg[k] for k in np.asarray(o["o_custkey"]).tolist()])
    groups = [v[g == s] for s in sorted(set(g.tolist()))]
    n, k = len(v), len(groups)
    ssb = sum(len(x) * (x.mean() - v.mean()) ** 2 for x in groups)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
    f_np = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(rows[0]["f_stat"] - f_np) < 0.01
    assert rows[0]["df1"] == k - 1 and rows[0]["df2"] == n - k


def test_levene_w_nonneg(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["levene_variance_check"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["w_stat"] >= 0.0
        assert r["mean_absdev"] >= 0.0


def test_delong_se_and_auc_agree_with_exact_auc(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["auc_delong_ci"](spark, SF).collect()[0]
    exact = QUERIES["exact_auc"](spark, SF).collect()[0]
    assert abs(r["auc"] - exact["auc_e6"] / 1e6) < 2e-6
    assert 0.0 < r["se"] < 0.5


def test_t5_span_accounting(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["t5_span_corruption"](spark, SF).collect()
    assert rows
    tot_tokens = sum(r["n_tokens"] for r in rows)
    tot_masked = sum(r["n_masked"] for r in rows)
    # ~15% corruption (3-token spans at 1/20 start rate), generous band
    assert 0.08 < tot_masked / tot_tokens < 0.25
    for r in rows[:50]:
        # each maximal span covers >= 1 token; chained starts can make
        # a single span arbitrarily long, so only the lower bound holds
        assert r["n_spans"] <= r["n_masked"] <= r["n_tokens"]
        assert r["input_len"] == r["n_tokens"] - r["n_masked"] + r["n_spans"]
        assert r["target_len"] == r["n_masked"] + r["n_spans"] + 1
