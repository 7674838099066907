"""Model persistence round-trips for the driver-side trainers — the
reference persists every fitted model through pickle targets; these
are the dependency-free equivalents. Loaded models must predict
identically to the originals."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_gcmc_model_roundtrip(spark, tmp_path):
    from redshells_spark.ml.gcmc import GCMCModel, build_gcmc_dataset, features_matrix, train_gcmc

    ratings = spark.createDataFrame(
        [(u, i, float(1 + (u + i) % 2)) for u in range(20) for i in range(10) if (u * i) % 3],
        "user_id int, item_id int, rating double",
    )
    edges, umap, imap = build_gcmc_dataset(ratings, test_size=0.2)
    feats = imap.select(
        "item_id", F.array((F.col("item_id") % 2).cast("double")).alias("features")
    )
    fmat = features_matrix(imap, feats, "item_id")
    model = train_gcmc(
        edges, umap.count(), imap.count(), encoder_hidden=8, encoder_size=4,
        epochs=5, item_features=fmat,
    )
    model.save(str(tmp_path / "gcmc"))
    loaded = GCMCModel.load(str(tmp_path / "gcmc"))

    u = np.array([0, 1, 2])
    i = np.array([1, 2, 3])
    np.testing.assert_array_equal(model.predict_local(u, i), loaded.predict_local(u, i))
    new_feats = np.array([[1.0], [0.0]])
    np.testing.assert_array_equal(
        model.item_embeddings_for_features([new_feats]),
        loaded.item_embeddings_for_features([new_feats]),
    )


def test_feature_aggregation_model_roundtrip(tmp_path):
    from redshells_spark.ml.feature_aggregation import FeatureAggregationSimilarityModel

    rng = np.random.default_rng(1)
    model = FeatureAggregationSimilarityModel(
        embeddings=rng.normal(size=(7, 3)), item_bias=rng.normal(size=5), history=[0.5, 0.2]
    )
    model.save(str(tmp_path / "fa"))
    loaded = FeatureAggregationSimilarityModel.load(str(tmp_path / "fa"))
    x = np.array([[1, 2], [3, 0]])
    y = np.array([[4, 5], [6, 0]])
    np.testing.assert_array_equal(
        model.predict_local(np.array([0, 1]), np.array([2, 3]), x, y),
        loaded.predict_local(np.array([0, 1]), np.array([2, 3]), x, y),
    )
    assert loaded.history == [0.5, 0.2]


def test_fasttext_roundtrip(spark, tmp_path):
    from redshells_spark.ml.fasttext import FastTextVectors

    docs = spark.createDataFrame(
        [(i, ["alpha", "beta", "gamma", "alpha"]) for i in range(30)],
        "doc_id long, tokens array<string>",
    )
    ft = FastTextVectors.fit(docs, vector_size=8, min_count=1, bucket=1000, seed=3)
    ft.save(str(tmp_path / "ft"))
    loaded = FastTextVectors.load(spark, str(tmp_path / "ft"))
    assert (loaded.min_n, loaded.max_n, loaded.bucket, loaded.seed) == (
        ft.min_n, ft.max_n, ft.bucket, ft.seed,
    )
    words = spark.createDataFrame([("alpha",), ("alphaz",)], ["word"])
    a = {(r["word"], tuple(np.round(r["vector"], 9)), r["oov"]) for r in ft.infer_vectors(words).collect()}
    b = {(r["word"], tuple(np.round(r["vector"], 9)), r["oov"]) for r in loaded.infer_vectors(words).collect()}
    assert a == b


def test_doc2vec_roundtrip(spark, tmp_path):
    from redshells_spark.ml.doc2vec import Doc2Vec

    docs = spark.createDataFrame(
        [(i, ["red", "green", "blue", "red"]) for i in range(20)],
        "doc_id long, tokens array<string>",
    )
    model = Doc2Vec.fit(docs, vector_size=6, min_count=1, epochs=2, seed=5)
    model.save(str(tmp_path / "d2v"))
    loaded = Doc2Vec.load(str(tmp_path / "d2v"))
    np.testing.assert_array_equal(model.word_vectors, loaded.word_vectors)
    assert model.word_index == loaded.word_index
    a = {r["doc_id"]: tuple(r["vector"]) for r in model.infer_vector(docs.limit(3)).collect()}
    b = {r["doc_id"]: tuple(r["vector"]) for r in loaded.infer_vector(docs.limit(3)).collect()}
    assert a == b


def test_scdv_roundtrip(spark, sf_dir, tmp_path):
    from redshells_spark.ml.scdv import SCDV

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.split(F.lower("text"), r"\s+").alias("tokens"))
        .limit(100)
    )
    model = SCDV.fit(docs, cluster_size=4, embedding_size=8, gmm_sample_size=500)
    model.save(str(tmp_path / "scdv"))
    loaded = SCDV.load(spark, str(tmp_path / "scdv"))
    assert loaded.sparsity_threshold == model.sparsity_threshold
    a = {r["doc_id"]: tuple(np.round(r["embedding"], 9)) for r in model.infer_vector(docs.limit(5)).collect()}
    b = {r["doc_id"]: tuple(np.round(r["embedding"], 9)) for r in loaded.infer_vector(docs.limit(5)).collect()}
    assert a == b
