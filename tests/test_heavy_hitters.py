"""top_k_frequent: parity with full groupBy, lossy-summary exactness,
certificate refusal on uncertifiable runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.operators.heavy_hitters import _mg_merge, top_k_frequent


def test_mg_merge_bounds_and_flags():
    c, lossy = _mg_merge({}, {"a": 5, "b": 3, "c": 1}, capacity=8)
    assert not lossy and c == {"a": 5, "b": 3, "c": 1}
    c, lossy = _mg_merge(c, {f"x{i}": 1 for i in range(10)}, capacity=4)
    assert lossy and len(c) <= 4
    assert c["a"] == 4  # decremented by the (cap+1)-th count (1)


def _exact_topk(df, col, k):
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
        .limit(k)
        .collect()
    )


def test_matches_full_groupby_on_documents(spark, sf_dir):
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    got = top_k_frequent(toks, "token", k=10).collect()
    want = _exact_topk(toks, "token", 10)
    assert [(r["token"], r["cnt"]) for r in got] == [(r["token"], r["cnt"]) for r in want]


def test_lossy_path_still_exact_when_certified(spark):
    # heavy head + long tail, capacity small enough to force decrements
    # in every partition, head counts far above N/(cap+1)
    rows = []
    for i in range(6):
        rows += [(f"hot{i}",)] * (4000 - 300 * i)
    rows += [(f"cold{j}",) for j in range(5000)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    got = top_k_frequent(df, "token", k=4, capacity=64)
    want = _exact_topk(df, "token", 4)
    assert [(r["token"], r["cnt"]) for r in got.collect()] == [
        (r["token"], r["cnt"]) for r in want
    ]


def test_certificate_refuses_uniform_data(spark):
    # all counts equal and tiny: nothing clears N/(cap+1) with a lossy
    # summary, so the operator must refuse rather than guess the tail
    rows = [(f"t{i}",) for i in range(3000)] * 2
    df = spark.createDataFrame(rows, "token string").repartition(4)
    with pytest.raises(ValueError, match="certificate"):
        top_k_frequent(df, "token", k=10, capacity=32)
    # fallback policy pays the full shuffle and is exact anyway
    got = top_k_frequent(df, "token", k=10, capacity=32, on_uncertified="fallback")
    want = _exact_topk(df, "token", 10)
    assert [(r["token"], r["cnt"]) for r in got.collect()] == [
        (r["token"], r["cnt"]) for r in want
    ]
    # best_effort returns whatever the candidates support (possibly < k)
    out = top_k_frequent(df, "token", k=10, capacity=32, on_uncertified="best_effort")
    assert out.count() <= 10
