from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.ann import (
    brute_force_topk,
    ivf_build_index,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries_df(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_brute_force_self_is_top1(queries_df, emb):
    out = brute_force_topk(queries_df, emb, k=3)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(5)}  # self-similarity = 1.0


def test_brute_force_exact_k(queries_df, emb):
    out = brute_force_topk(queries_df, emb, k=7)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 7 for r in counts)


def test_lsh_recall_of_self(queries_df, emb):
    out = lsh_topk(queries_df, emb, k=3, num_planes=16, num_blocks=4)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    # self always lands in the same bucket → rank-1 must be self
    assert top1 == {i: i for i in range(5)}


def test_ivf_topk_self_recall(queries_df, emb):
    indexed, centroids = ivf_build_index(emb, num_centroids=8)
    out = ivf_topk(queries_df, indexed, centroids, k=3, nprobe=2)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(5)}
