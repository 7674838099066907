"""Round-7 batch-7: graph-analytics, diversity, and drift invariants."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lcc_bounds_and_consistency(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["local_clustering_coefficient"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["deg"] >= 2
        assert 0 <= r["lcc_e6"] <= 1_000_000
        assert r["lcc_e6"] == 2 * r["n_tri"] * 1_000_000 // (r["deg"] * (r["deg"] - 1))
        assert 0 <= r["avg_lcc_e6"] <= 1_000_000


def test_assortativity_in_range(spark):
    from redshells_spark.queries import QUERIES

    r = QUERIES["degree_assortativity"](spark, SF).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_directed_edges"] % 2 == 0  # symmetrized


def test_link_prediction_scores_sane(spark):
    from redshells_spark.queries import QUERIES, QueryFn  # noqa: F401

    rows = QUERIES["link_prediction_scores"](spark, SF).collect()
    assert rows
    # candidates must not be existing edges
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"])
    import collections

    per_order = collections.defaultdict(list)
    q = np.asarray(li["l_quantity"], dtype=np.float64)
    ok = np.asarray(li["l_orderkey"])
    pk = np.asarray(li["l_partkey"])
    for o, p, qq in zip(ok, pk, q):
        if qq >= 45:
            per_order[int(o)].append(int(p))
    edges = set()
    for parts in per_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    for r in rows:
        assert (r["a"], r["b"]) not in edges
        assert r["cn"] >= 1
        assert r["cn"] <= min(r["deg_a"], r["deg_b"])
        assert 0 < r["jaccard_e6"] <= 1_000_000
        assert r["aa_e9"] >= r["cn"] * int(1e9 / math.log(10000))  # loose floor


def test_yule_k_nonnegative(spark):
    from redshells_spark.queries import QUERIES

    for r in QUERIES["yule_k_diversity"](spark, SF).collect():
        assert r["yule_k"] >= 0.0
        assert r["vocab"] <= r["n_tokens"]


def test_burstiness_floor(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["token_burstiness_topk"](spark, SF).collect()
    assert rows
    prev = None
    for r in rows:
        assert r["df"] >= 20
        assert r["burstiness_e6"] >= 1_000_000  # tf >= df always
        if prev is not None:
            assert r["burstiness_e6"] <= prev
        prev = r["burstiness_e6"]


def test_page_hinkley_nonneg_and_alarm_rule(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["page_hinkley_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["ph_e6"] >= 0
        assert r["alarm"] == (1 if r["ph_e6"] > r["threshold_e6"] else 0)


def test_theils_u_bounds_and_asymmetry_columns(spark):
    from redshells_spark.queries import QUERIES

    rows = QUERIES["theils_u_matrix"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1e-6 <= r["u_a_given_b"] <= 1.0 + 1e-6
        assert -1e-6 <= r["u_b_given_a"] <= 1.0 + 1e-6
        assert r["ha_e9"] > 0 and r["hb_e9"] > 0
