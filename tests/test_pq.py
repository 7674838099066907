"""Product quantization: exactness on codeword-aligned data, recall
sanity on real embeddings, tie determinism, query-cap guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.similarity.pq import pq_adc_topk, pq_codebooks, pq_encode


def test_codebook_shape():
    cbs = pq_codebooks([[float(i + j) for j in range(8)] for i in range(4)], num_subspaces=2)
    assert cbs.shape == (2, 4, 4)
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks([[0.0] * 10], num_subspaces=4)


def _vec_df(spark, vecs, idcol="vec_id"):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        f"{idcol} long, embedding array<float>",
    )


def test_exact_on_codeword_aligned_vectors(spark):
    # corpus vectors built from codeword combinations: PQ is lossless,
    # so ADC distance to the identical vector is exactly 0 and top-1 is
    # the vector itself
    rng = np.random.RandomState(7)
    train = rng.randn(4, 8).round(3)  # 4 codewords, M=2 subspaces of dim 4
    cbs = pq_codebooks([list(map(float, t)) for t in train], num_subspaces=2)
    combos = [np.concatenate([train[a][:4], train[b][4:]]) for a in range(4) for b in range(4)]
    corpus = _vec_df(spark, combos)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(corpus, cbs).collect()}
    assert codes[0] == [0, 0] and codes[5] == [1, 1] and codes[6] == [1, 2]

    queries = _vec_df(spark, combos[:3], idcol="query_id")
    out = pq_adc_topk(queries, pq_encode(corpus, cbs), cbs, k=1).collect()
    for r in out:
        assert r["query_id"] == r["vec_id"] or r["approx_d2_e6"] == 0
        assert r["approx_d2_e6"] == 0


def test_recall_and_determinism_on_testdata(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 160)).orderBy("vec_id")
    cbs = pq_codebooks(
        [[float(x) for x in r["embedding"]] for r in cent.select("embedding").collect()],
        num_subspaces=8,
    )
    codes = pq_encode(emb, cbs)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = pq_adc_topk(queries, codes, cbs, k=5).collect()
    b = pq_adc_topk(queries, codes, cbs, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # fully deterministic
    # each query's own vector must rank in its top-5 (its code matches
    # itself exactly, so its ADC distance is the query's own-code table
    # entry — among the smallest by construction)
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    self_hits = sum(1 for q, vs in by_q.items() if q in vs)
    assert self_hits >= len(by_q) * 0.8


def test_query_cap_guard(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbs = pq_codebooks(
        [[float(x) for x in r["embedding"]] for r in emb.limit(4).select("embedding").collect()],
        num_subspaces=8,
    )
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        pq_adc_topk(queries, pq_encode(emb, cbs), cbs, k=3, max_queries=10)


def test_ivfpq_self_hit_and_determinism(spark, sf_dir):
    from redshells_spark.similarity.pq import (
        _centroid_d2,
        ivfpq_encode,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent_rows = (
        emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 160))
        .orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.asarray([[float(x) for x in r["embedding"]] for r in cent_rows])
    train_rows = (
        emb.filter((F.col("vec_id") % 13 == 1) & (F.col("vec_id") < 209))
        .orderBy("vec_id").select("embedding").collect()
    )
    train = np.asarray([[float(x) for x in r["embedding"]] for r in train_rows])
    tres = train - centroids[np.argmin(_centroid_d2(train, centroids), axis=1)]
    cbs = pq_codebooks([list(map(float, r)) for r in tres], num_subspaces=8)

    index = ivfpq_encode(emb, centroids, cbs)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivfpq_topk(queries, index, centroids, cbs, k=5, nprobe=3).collect()
    b = ivfpq_topk(queries, index, centroids, cbs, k=5, nprobe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a query's own vector lives in its nearest cell (always probed),
    # and its residual code matches itself → should rank top-5
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    self_hits = sum(1 for q, vs in by_q.items() if q in vs)
    assert self_hits >= len(by_q) * 0.8


def test_ivfpq_scan_prunes_unprobed_cells(spark, sf_dir):
    from redshells_spark.similarity.pq import _centroid_d2, ivfpq_encode, ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id") % 25 == 0).orderBy("vec_id").limit(8).collect()
    centroids = np.asarray([[float(x) for x in r["embedding"]] for r in rows])
    train = np.asarray(
        [[float(x) for x in r["embedding"]] for r in emb.filter(F.col("vec_id") % 7 == 3).orderBy("vec_id").limit(8).select("embedding").collect()]
    )
    tres = train - centroids[np.argmin(_centroid_d2(train, centroids), axis=1)]
    cbs = pq_codebooks([list(map(float, r)) for r in tres], num_subspaces=8)
    index = ivfpq_encode(emb, centroids, cbs)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(queries, index, centroids, cbs, k=3, nprobe=1)
    # with nprobe=1 every result must come from ONE cell
    got_ids = [r["vec_id"] for r in out.collect()]
    cells = {r["cid"] for r in index.filter(F.col("vec_id").isin(got_ids)).collect()}
    assert len(cells) == 1
