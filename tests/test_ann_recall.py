"""ANN quality: recall@k of the approximate tiers vs brute force.

The scale path (LSH / IVF) is only useful if recall is quantified —
this pins it on the driver testdata so regressions in bucketing or
probing parameters are caught.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.allpairs import matmul_topk
from redshells_spark.similarity.ann import (
    brute_force_topk,
    ivf_build_index,
    ivf_topk,
    lsh_topk,
)

K = 10
N_QUERIES = 20


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries_df(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def truth(queries_df, emb):
    exact = brute_force_topk(queries_df, emb, k=K)
    return {
        (r["query_id"], r["vec_id"]) for r in exact.collect()
    }


def _recall(approx_df, truth) -> float:
    got = {(r["query_id"], r["vec_id"]) for r in approx_df.collect()}
    return len(got & truth) / len(truth)


def test_matmul_topk_is_exact(queries_df, emb, truth):
    fast = matmul_topk(queries_df, emb, k=K)
    assert _recall(fast, truth) == pytest.approx(1.0)  # BLAS path == Catalyst path


def test_lsh_recall(queries_df, emb, truth):
    approx = lsh_topk(queries_df, emb, k=K, num_planes=16, num_blocks=8)
    r = _recall(approx, truth)
    # 8 probes of 2-bit blocks on near-random 64-d vectors: a candidate
    # filter, not an exact search — but must beat random (K/500 ≈ 0.02)
    # by a wide margin and keep perfect self-recall
    assert r > 0.5, f"LSH recall@{K} = {r}"


def test_lsh_multiprobe_recall_dominates(queries_df, emb, truth):
    base = lsh_topk(queries_df, emb, k=K, num_planes=16, num_blocks=8)
    probed = lsh_topk(queries_df, emb, k=K, num_planes=16, num_blocks=8, multiprobe=1)
    r_base, r_probe = _recall(base, truth), _recall(probed, truth)
    # Hamming-1 probing can only add candidates → recall never drops,
    # and on this corpus it should be near-exact
    assert r_probe >= r_base
    assert r_probe > 0.9, f"multiprobe recall@{K} = {r_probe}"


def test_lsh_broadcast_and_distributed_paths_identical(queries_df, emb):
    # the single-scan broadcast-query path and the two-sided distributed
    # path share signature math and tie-breaks → bit-identical top-k
    kw = dict(k=K, num_planes=16, num_blocks=8, multiprobe=1)
    bcast = lsh_topk(queries_df, emb, **kw, broadcast_queries=True)
    dist = lsh_topk(queries_df, emb, **kw, broadcast_queries=False)
    a = {(r["query_id"], r["vec_id"], r["rank"]) for r in bcast.collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"]) for r in dist.collect()}
    assert a == b and len(a) > 0


def test_lsh_broadcast_guard_fails_loudly(queries_df, emb):
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        lsh_topk(queries_df, emb, k=K, dim=64, max_broadcast_rows=3).collect()


def test_ivf_recall(queries_df, emb, truth):
    indexed, centroids = ivf_build_index(emb, num_centroids=16)
    approx = ivf_topk(queries_df, indexed, centroids, k=K, nprobe=8)
    r = _recall(approx, truth)
    assert r > 0.5, f"IVF recall@{K} (nprobe=8/16) = {r}"


def test_assign_to_centroids_matches_numpy(emb):
    """Relational argmin assignment == numpy argmin (with index
    tie-break), and every corpus row gets exactly one centroid."""
    import numpy as np

    from redshells_spark.similarity.ann import assign_to_centroids

    sample = emb.filter(F.col("vec_id") < 300)
    cent_rows = (
        emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 500))
        .orderBy("vec_id").select("embedding").collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    out = assign_to_centroids(sample, centroids)
    got = {r["vec_id"]: r["centroid"] for r in out.collect()}
    assert len(got) == sample.count()

    C = np.array(centroids, dtype=np.float64)
    for r in sample.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        d = ((C - v) ** 2).sum(axis=1)
        assert got[r["vec_id"]] == int(np.argmin(d)), r["vec_id"]


def test_ivf_deterministic_recall(queries_df, emb, truth):
    from redshells_spark.similarity.ann import assign_to_centroids

    cent_rows = (
        emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 800))
        .orderBy("vec_id").select("embedding").collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    assigned = assign_to_centroids(emb, centroids)
    approx = ivf_topk(queries_df, assigned, centroids, k=K, nprobe=8)
    r = _recall(approx, truth)
    assert r > 0.5, f"deterministic-IVF recall@{K} = {r}"


def test_ivf_seed_centroids_deterministic_order(spark, sf_dir):
    from redshells_spark.similarity.ann import ivf_seed_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = ivf_seed_centroids(emb, num_centroids=8)
    b = ivf_seed_centroids(emb, num_centroids=8)
    assert a == b and len(a) == 8 and len(a[0]) == 64
    # prefix property: fewer centroids = prefix of more (rank order)
    c4 = ivf_seed_centroids(emb, num_centroids=4)
    assert a[:4] == c4


def test_registry_front_window(spark):
    from redshells_spark.queries import _FRONT, ORACLES, QUERIES, get_oracles, get_queries

    qs, os_ = get_queries(), get_oracles()
    assert list(qs)[: len(_FRONT)] == _FRONT
    assert set(qs) == set(QUERIES) and set(os_) == set(ORACLES)
    # every round-4 contract change sits inside the driver's 50-entry window
    assert all(name in list(qs)[:50] for name in _FRONT)


def test_registry_order_pinned_across_split():
    # the queries.py -> queries/ package split (round 4) must preserve
    # the exact registration order: the driver's CORRECTNESS gate reads
    # the first 50 entries of get_queries(). Pinned from the pre-split
    # single file.
    import json
    import os

    from redshells_spark.queries import get_oracles, get_queries

    want = json.load(
        open(os.path.join(os.path.dirname(__file__), "registry_order.json"))
    )
    assert list(get_queries()) == want["queries"]
    assert list(get_oracles()) == want["oracles"]
