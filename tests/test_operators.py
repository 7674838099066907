from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshells_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    elementwise_product,
    l2_normalize,
)
from redshells_spark.functions.scalar import clip, log_transform
from redshells_spark.operators.aggregates import (
    distinct_count,
    feature_importance_sumsq,
    group_count_filter,
    group_count_filter_via_join,
    min_max_avg_std,
    sum_embeddings_by_key,
    value_counts_id_map,
)
from redshells_spark.operators.joins import (
    anti_join_negative_sampling,
    blocked_pairwise_similarity,
    keyword_match_join,
    semi_join_isin,
)
from redshells_spark.operators.topk import per_group_topk, topk_threshold_similarity
from redshells_spark.operators.setops import union_concat


def test_dot_and_cosine(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    row = df.select(
        dot_product("a", "b").alias("d"), cosine_similarity("a", "b").alias("c")
    ).head()
    assert row["d"] == pytest.approx(11.0)
    assert row["c"] == pytest.approx(11.0 / (math.sqrt(5) * 5))


def test_elementwise_product_and_l2(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        l2_normalize("a").alias("n"), elementwise_product("a", "a").alias("p")
    ).head()
    assert row["n"] == pytest.approx([0.6, 0.8])
    assert row["p"] == pytest.approx([9.0, 16.0])


def test_l2_normalize_zero_vector_stays_zero(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "a array<double>")
    assert df.select(l2_normalize("a").alias("n")).head()["n"] == [0.0, 0.0]


def test_clip_and_log_transform(spark):
    df = spark.createDataFrame([(5.0,), (-2.0,), (None,)], "x double")
    got = [r["c"] for r in df.select(clip("x", 0.0, 3.0).alias("c")).collect()]
    assert got[:2] == [3.0, 0.0] and got[2] is None
    lt = df.select(log_transform("x", -2.0).alias("l")).collect()
    assert lt[0]["l"] == pytest.approx(math.log(5.0 + 2.0 + 2.0))
    assert lt[2]["l"] == pytest.approx(math.log(1.0))  # null → min-1 → log(2-1)... shifted


def test_group_count_filter_both_paths(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(2)], "k string, v int"
    )
    for fn in (group_count_filter, group_count_filter_via_join):
        out = fn(df, "k", min_count=3)
        assert set(r["k"] for r in out.collect()) == {"a"}
        assert out.count() == 5


def test_distinct_count_and_stats(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k int, v double")
    assert distinct_count(df, "k").head()[0] == 2
    stats = min_max_avg_std(df, "v").head()
    assert stats["min"] == 2.0 and stats["max"] == 6.0
    assert stats["avg"] == pytest.approx(4.0)
    assert stats["std"] == pytest.approx(math.sqrt(8 / 3))


def test_value_counts_id_map(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), ("c",)], "id string")
    out = {r["id"]: (r["count"], r["index"]) for r in value_counts_id_map(df, "id").collect()}
    assert out == {"a": (1, 1), "b": (2, 2), "c": (1, 3)}
    bounded = value_counts_id_map(df, "id", min_count=2)
    assert [r["id"] for r in bounded.collect()] == ["b"]


def test_sum_embeddings_by_key(spark):
    df = spark.createDataFrame(
        [("w", [1.0, 0.0]), ("w", [0.0, 1.0]), ("u", [2.0, 0.0])],
        "k string, e array<double>",
    )
    out = {r["k"]: r["embedding"] for r in sum_embeddings_by_key(df, "k", "e").collect()}
    assert out["w"] == pytest.approx([1 / math.sqrt(2), 1 / math.sqrt(2)])
    assert out["u"] == pytest.approx([1.0, 0.0])
    raw = {r["k"]: r["embedding"] for r in sum_embeddings_by_key(df, "k", "e", normalize=False).collect()}
    assert raw["w"] == pytest.approx([1.0, 1.0])


def test_feature_importance_sumsq(spark):
    df = spark.createDataFrame([([1.0, 3.0, 0.0],), ([1.0, 4.0, 0.5],)], "e array<double>")
    assert feature_importance_sumsq(df, "e", 2) == [0, 1]


def test_semi_join_isin(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    valid = spark.createDataFrame([(1,), (3,), (3,)], "k int")
    out = semi_join_isin(df, valid, on="k")
    assert sorted(r["k"] for r in out.collect()) == [1, 3]


def test_anti_join_negative_sampling(spark):
    pos = spark.createDataFrame(
        [(u, i) for u in range(10) for i in range(10) if (u + i) % 3 == 0], "u int, i int"
    )
    neg = anti_join_negative_sampling(pos, "u", "i", seed=7)
    n_pos = pos.count()
    assert 0 < neg.count() <= n_pos
    # no sampled pair is an observed positive
    assert neg.join(pos, on=["u", "i"], how="inner").count() == 0


def test_keyword_match_join(spark):
    docs = spark.createDataFrame(
        [(1, ["spark", "sql", "spark"]), (2, ["rust", "go"])], "doc_id int, tokens array<string>"
    )
    kws = spark.createDataFrame([("spark",), ("go",)], "keyword string")
    out = sorted((r["doc_id"], r["keyword"]) for r in keyword_match_join(docs, kws, "doc_id", "tokens").collect())
    assert out == [(1, "spark"), (2, "go")]


def test_blocked_pairwise_similarity(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])], "vec_id int, embedding array<double>"
    )
    out = {(r["id0"], r["id1"]): r["similarity"] for r in blocked_pairwise_similarity(emb).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)] == pytest.approx(0.0)
    assert out[(1, 3)] == pytest.approx(1.0)


def test_topk_threshold_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.8), ("a", 3, 0.7), ("b", 4, 0.95)], "g string, i int, s double"
    )
    top = topk_threshold_similarity(df, "s", 0.75, 2, tie_break=["i"])
    assert [r["i"] for r in top.collect()] == [4, 1]
    pg = per_group_topk(df, "g", "s", 2, tie_break=["i"])
    assert sorted(r["i"] for r in pg.collect()) == [1, 2, 4]


def test_union_concat(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, k int")
    assert union_concat(a, b).count() == 2
