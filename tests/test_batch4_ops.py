"""BFS / KMV set algebra / association rules semantics tests."""

from __future__ import annotations

from collections import deque

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.assoc import association_rules_pairs
from redshells_spark.operators.graph import k_hop_distances, symmetrize_edges
from redshells_spark.operators.sketches import kmv_set_algebra


def _bfs(adj, sources, k):
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= k:
            continue
        for v in adj.get(u, ()):  # noqa: PERF102
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_k_hop_matches_python_bfs(spark):
    import random

    rng = random.Random(3)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(80)}
    edges = [(a, b) for a, b in edges if a != b]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = [0, 1]
    expected = _bfs(adj, sources, 3)

    e = symmetrize_edges(spark.createDataFrame(edges, "src bigint, dst bigint"))
    s = spark.createDataFrame([(x,) for x in sources], "node bigint")
    got = {r["node"]: r["dist"] for r in k_hop_distances(e, s, k=3).collect()}
    assert got == expected


def test_k_hop_zero(spark):
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    s = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["dist"] for r in k_hop_distances(e, s, k=0).collect()}
    assert got == {1: 0}


def test_kmv_set_algebra_exact_regime(spark):
    # below k the sketch holds every hash -> estimates are exact
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = kmv_set_algebra(df, "g", "v", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g1"], r["g2"]) == ("a", "b")
    assert r["union_est"] == 40.0 and r["inter_est"] == 10.0
    assert r["jaccard_est"] == 0.25


def test_kmv_set_algebra_estimate_accuracy(spark):
    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1500, 4500)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    r = kmv_set_algebra(df, "g", "v", k=256).collect()[0]
    # union 4500, intersection 1500 — k=256 gives ~6% standard error
    assert abs(r["union_est"] - 4500) / 4500 < 0.25
    assert abs(r["inter_est"] - 1500) / 1500 < 0.4


def test_kmv_set_algebra_refuses_many_groups(spark):
    rows = [(f"g{i}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    with pytest.raises(ValueError, match="groups"):
        kmv_set_algebra(df, "g", "v", k=16, max_groups=10)


def test_association_rules_handcrafted(spark):
    # 4 baskets: {x,y} {x,y} {x,z} {y}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "b bigint, i string")
    out = {(r["item1"], r["item2"]): r for r in
           association_rules_pairs(df, "b", "i", min_pair_support=1).collect()}
    xy = out[("x", "y")]
    assert xy["pair_count"] == 2 and xy["count1"] == 3 and xy["count2"] == 3
    assert xy["support"] == 0.5
    assert xy["confidence_1_to_2"] == round(2 / 3, 4)
    assert xy["lift"] == round(2 * 4 / 9, 4)
    assert out[("x", "z")]["pair_count"] == 1


def test_association_rules_dedupes_within_basket(spark):
    rows = [(1, "x"), (1, "x"), (1, "y")]
    df = spark.createDataFrame(rows, "b bigint, i string")
    out = association_rules_pairs(df, "b", "i", min_pair_support=1).collect()
    assert len(out) == 1 and out[0]["pair_count"] == 1


def test_impute_with_group_median(spark):
    from redshells_spark.data.frame_ops import impute_with_group_median

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, None),
         ("b", 5, 7.0), ("b", 6, None), ("c", 7, None)],
        "g string, id long, v double",
    )
    out = impute_with_group_median(df, "v", ["g"], "id", flag_column="imp")
    got = {r["id"]: (r["v"], r["imp"]) for r in out.collect()}
    assert got[4] == (20.0, 1)      # a's lower median
    assert got[6] == (7.0, 1)       # b's only value
    assert got[1] == (10.0, 0)
    # group with NO non-null values stays null, flagged 0 (nothing to impute from)
    assert got[7] == (None, 0)


def test_temperature_mix_weights(spark):
    from redshells_spark.data.sampling import temperature_mix_weights

    df = spark.createDataFrame(
        [("big",)] * 400 + [("small",)] * 100, "src string"
    )
    got = {r["src"]: r["prob_e6"] for r in
           temperature_mix_weights(df, "src", temperature=2.0).collect()}
    # smallest group keeps everything; big thinned to sqrt(100/400)=0.5
    assert got == {"small": 1_000_000, "big": 500_000}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="temperature"):
        temperature_mix_weights(df, "src", temperature=0.5)


def test_target_encode_loo(spark):
    from redshells_spark.data.frame_ops import target_encode_loo

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)],
        "cat string, y double",
    )
    out = target_encode_loo(df, "cat", "y", output_column="te")
    got = {(r["cat"], r["y"]): r["te"] for r in out.collect()}
    # (sum - y) / (n - 1) at 1e6 fixed point
    assert got[("a", 1.0)] == 2_500_000  # (2+3)/2
    assert got[("a", 2.0)] == 2_000_000  # (1+3)/2
    assert got[("a", 3.0)] == 1_500_000
    assert got[("b", 5.0)] is None      # alone in category -> NULL, not fabricated


def test_target_encode_loo_smoothed(spark):
    from redshells_spark.data.frame_ops import target_encode_loo

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 0.0), ("b", 10.0)], "cat string, y double"
    )
    out = target_encode_loo(df, "cat", "y", output_column="te", prior_weight=1)
    got = {(r["cat"], r["y"]): r["te"] for r in out.collect()}
    mu = 10.0 / 3  # global mean
    # b alone: (0 + 1*mu)/(0 + 1) = mu
    assert abs(got[("b", 10.0)] - round(mu * 1_000_000)) <= 1


def test_kfold_column_group_coherent(spark):
    from redshells_spark.data.frame_ops import kfold_column

    import pytest as _pytest
    df = spark.createDataFrame([(i % 20, i) for i in range(200)], "g long, i long")
    out = kfold_column(df, "g", k=5)
    # same key -> same fold, every fold in range
    per_key = out.groupBy("g").agg(F.countDistinct("fold").alias("nf")).collect()
    assert all(r["nf"] == 1 for r in per_key)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) >= 3
    with _pytest.raises(ValueError, match="k must"):
        kfold_column(df, "g", k=1)


def test_exact_auc_against_pairwise_definition(spark):
    from redshells_spark.queries import get_queries  # noqa: F401  (query form tested at verify)

    # level-table AUC == the pairwise P(score_pos > score_neg) + 0.5 ties
    import itertools
    scores_pos = [3, 3, 5, 7]
    scores_neg = [1, 3, 4]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p, n in itertools.product(scores_pos, scores_neg))
    want = wins / (len(scores_pos) * len(scores_neg))

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rows = [(s, 1) for s in scores_pos] + [(s, 0) for s in scores_neg]
    df = spark.createDataFrame(rows, "s long, y long")
    lv = df.groupBy("s").agg(F.sum("y").alias("pos"),
                             F.sum(F.lit(1) - F.col("y")).alias("neg"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = lv.withColumn("cnb", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    t = c.agg(F.sum(F.col("pos") * (2 * F.col("cnb") + F.col("neg"))).alias("num2"),
              F.sum("pos").alias("p"), F.sum("neg").alias("n")).collect()[0]
    got = t["num2"] / (2 * t["p"] * t["n"])
    assert abs(got - want) < 1e-12
