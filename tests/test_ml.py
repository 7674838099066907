"""ML estimator/transformer tests — threshold-style assertions on
seeded synthetic data (reference test pattern 4, SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.classifiers import (
    build_prediction_model,
    optimize_classifier,
    register_prediction_model,
    train_classifier,
    validate_classifier,
)
from redshells_spark.ml.dimension_reduction import DimensionReductionModel
from redshells_spark.ml.matrix_factorization import (
    item_factors,
    mf_item_similarity,
    train_matrix_factorization,
)
from redshells_spark.ml.pairwise import (
    make_pairwise_features,
    predict_pairwise_similarity,
    train_pairwise_similarity,
)
from redshells_spark.ml.word2vec import doc_vectors_mean, train_word2vec, word_vectors


@pytest.fixture(scope="module")
def class_data(spark):
    # separable 2-feature data
    rows = [(float(i % 2), float(i % 2) * 2 + (i % 5) * 0.01, (i % 7) * 0.1) for i in range(200)]
    return spark.createDataFrame(rows, "y double, f1 double, f2 double")


def test_registry_build_and_register(spark):
    m = build_prediction_model("RandomForestClassifier", numTrees=5)
    assert m.getNumTrees == 5 or m.getOrDefault("numTrees") == 5
    register_prediction_model("MyLR", lambda **kw: build_prediction_model("LogisticRegression", **kw))
    assert build_prediction_model("MyLR") is not None
    with pytest.raises(KeyError):
        build_prediction_model("NopeModel")


def test_train_classifier_separable(class_data):
    model = train_classifier(class_data, ["f1", "f2"], "y", "LogisticRegression")
    preds = model.transform(class_data)
    acc = preds.filter(
        F.col("prediction") == F.col("label")
    ).count() / class_data.count()
    assert acc > 0.95


def test_validate_classifier(class_data):
    res = validate_classifier(class_data, ["f1", "f2"], "y", "LogisticRegression", cv=2)
    assert res["metric"] == "accuracy"
    assert res["avg"] > 0.9


def test_optimize_classifier(class_data):
    model, metric = optimize_classifier(
        class_data, ["f1", "f2"], "y", "LogisticRegression",
        param_grid={"regParam": [0.0, 0.1]},
    )
    assert metric > 0.9


@pytest.fixture(scope="module")
def ratings(spark):
    # low-rank structure: rating = (u % 3 == i % 3) → 5 else 1
    rows = [
        (u, i, 5.0 if u % 3 == i % 3 else 1.0)
        for u in range(30)
        for i in range(20)
        if (u * 20 + i) % 7 != 0  # drop a seventh as held-out (7 ∤ 20 → no full item column dropped)
    ]
    return spark.createDataFrame(rows, "user_id int, item_id int, rating double")


def test_als_reconstruction_rmse(ratings):
    mf = train_matrix_factorization(ratings, n_latent_factors=8, reg_param=0.05, max_iter=10)
    preds = mf.predict(ratings)
    rmse = preds.select(
        F.sqrt(F.avg(F.pow(F.col("prediction") - F.col("rating"), 2))).alias("rmse")
    ).head()["rmse"]
    assert rmse < 1.0  # mirrors reference's GCMC rmse<0.7-style threshold
    # predictions clipped to observed range
    mm = preds.agg(F.min("prediction"), F.max("prediction")).head()
    assert mm[0] >= 1.0 - 1e-9 and mm[1] <= 5.0 + 1e-9


def test_item_factors_and_similarity(ratings):
    mf = train_matrix_factorization(ratings, n_latent_factors=4, max_iter=5)
    factors = item_factors(mf, normalize=True)
    assert factors.count() == 20
    sims = mf_item_similarity(mf, threshold=0.8)
    pairs = {(r["id0"], r["id1"]) for r in sims.collect()}
    # same-residue items share structure → at least some high-sim pairs
    assert any((a % 3) == (b % 3) for a, b in pairs)


def test_service_scoped_users(spark):
    rows = [(s, u, i, float(1 + (u + i + s) % 5)) for s in range(2) for u in range(10) for i in range(8)]
    df = spark.createDataFrame(rows, "service_id int, user_id int, item_id int, rating double")
    mf = train_matrix_factorization(df, service_column="service_id", n_latent_factors=4, max_iter=3)
    # 2 services × 10 users → 20 distinct user factors
    assert mf.model.userFactors.count() == 20


@pytest.fixture(scope="module")
def corpus_tokens(spark):
    rows = [(i, ["alpha", "beta", "gamma", "alpha"] if i % 2 else ["delta", "epsilon", "delta"]) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_word2vec_and_doc_vectors(corpus_tokens):
    model = train_word2vec(corpus_tokens, vector_size=8, min_count=1, seed=1)
    wv = word_vectors(model)
    words = {r["word"] for r in wv.collect()}
    assert {"alpha", "beta", "delta"} <= words
    docs = doc_vectors_mean(corpus_tokens, model)
    row = docs.head()
    assert len(row["embedding"]) == 8
    # normalized
    norm = sum(x * x for x in row["embedding"]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-6)


def test_dimension_reduction(spark):
    df = spark.createDataFrame(
        [([1.0, 10.0, 0.1, 5.0],), ([2.0, 12.0, 0.2, 4.0],)], "embedding array<double>"
    )
    model = DimensionReductionModel.fit(df, top_n=2, normalize=False)
    assert model.selected_dims == [1, 3]
    out = model.transform(df).head()["embedding"]
    assert out == [10.0, 5.0]


def test_pairwise_features_and_training(spark):
    emb = spark.createDataFrame(
        [("i0", [1.0, 2.0]), ("i1", [3.0, 4.0]), ("i2", [-1.0, 0.5])],
        "vec_id string, embedding array<double>",
    )
    sim = spark.createDataFrame(
        [("i0", "i1", 1), ("i0", "i2", 0), ("i1", "i2", 0), ("i9", "i0", 1)],
        "item_id_0 string, item_id_1 string, similarity int",
    )
    feats = make_pairwise_features(sim, emb)
    rows = {(r["item_id_0"], r["item_id_1"]): r["feature"] for r in feats.collect()}
    assert ("i9", "i0") not in rows  # invalid id dropped (semi-join semantics)
    assert rows[("i0", "i1")] == pytest.approx([3.0, 8.0])
    model = train_pairwise_similarity(sim, emb, "LogisticRegression")
    preds = predict_pairwise_similarity(model, sim.select("item_id_0", "item_id_1"), emb)
    assert preds.count() == 3
    assert "prediction" in preds.columns
