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


@pytest.mark.slow  # measured >=10s (round-9 tiering)
def test_ivf_topk_self_recall(queries_df, emb):
    indexed, centroids = ivf_build_index(emb, num_centroids=8)
    out = ivf_topk(queries_df, indexed, centroids, k=3, nprobe=2)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(5)}


def test_ivf_index_roundtrip_and_pruning(spark, emb, queries_df, tmp_path):
    """Persisted IVF index: results identical after save/load, and the
    centroid partitioning means a probe reads only its inverted lists
    (partition filters visible in the scan)."""
    from redshells_spark.similarity.ann import (
        ivf_build_index,
        ivf_topk,
        load_ivf_index,
        save_ivf_index,
    )

    indexed, centroids = ivf_build_index(emb, num_centroids=8)
    live = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(queries_df, indexed, centroids, k=3, nprobe=2).collect()
    }

    path = str(tmp_path / "ivf")
    save_ivf_index(indexed, centroids, path)
    loaded, centroids2 = load_ivf_index(spark, path)
    assert centroids2 == centroids
    reloaded = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(queries_df, loaded, centroids2, k=3, nprobe=2).collect()
    }
    assert reloaded == live

    # partition pruning: a centroid equality filter reaches the scan as
    # a partition filter, not a data filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        loaded.filter(F.col("centroid") == 3).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "centroid" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_embedding_delta_dedup_against_ivf_index(spark, emb, tmp_path):
    """Incremental embedding near-dup: a new batch probes the
    persisted IVF index; near-copies of indexed vectors are flagged
    with cosine ~1 while novel directions pass. Pure composition of
    ivf index persistence + probing + threshold."""
    import numpy as np

    from redshells_spark.similarity.ann import ivf_build_index, ivf_topk, load_ivf_index, save_ivf_index

    corpus = emb.filter(F.col("vec_id") < 400)
    indexed, centroids = ivf_build_index(corpus, num_centroids=8)
    path = str(tmp_path / "ivf_corpus")
    save_ivf_index(indexed, centroids, path)

    base = corpus.limit(1).collect()[0]
    near_copy = [float(v) * 1.001 for v in base["embedding"]]
    rng = np.random.default_rng(0)
    novel = [float(x) for x in rng.normal(size=len(near_copy))]
    new_batch = spark.createDataFrame(
        [(9001, near_copy), (9002, novel)], "query_id long, embedding array<double>"
    )

    loaded, cents = load_ivf_index(spark, path)
    hits = (
        ivf_topk(new_batch, loaded, cents, k=1, nprobe=4)
        .filter(F.col("score") >= 0.99)
        .collect()
    )
    flagged = {r["query_id"]: r["vec_id"] for r in hits}
    assert flagged.get(9001) == base["vec_id"]
    assert 9002 not in flagged
