"""Feature-aggregation similarity tests (reference
``test_feature_aggregation_similarity_model.py``: 3-row fixture,
masked zero-feature behavior)."""

from __future__ import annotations

import numpy as np
import pytest

from redshells_spark.ml.feature_aggregation import (
    train_feature_aggregation_similarity,
)


@pytest.fixture(scope="module")
def pairs(spark):
    # reference micro-fixture shape: indexed pairs, 0-padded feature
    # lists, target score (test .py:15-21)
    rows = [
        (1, 2, [1, 2], [1, 2], 1.0),
        (1, 3, [1, 2], [3, 4], -0.5),
        (2, 3, [1, 0], [3, 0], -0.5),
        (4, 5, [2, 3], [2, 3], 1.0),
        (4, 6, [2, 3], [4, 1], -0.2),
    ]
    return spark.createDataFrame(
        rows,
        "x_item_index int, y_item_index int, x_item_features array<int>, "
        "y_item_features array<int>, score double",
    )


@pytest.fixture(scope="module")
def model(pairs):
    return train_feature_aggregation_similarity(
        pairs, embedding_size=8, epochs=300, learning_rate=0.05, seed=5
    )


def test_training_reduces_loss(model):
    assert model.history[-1] < model.history[0]
    assert model.history[-1] < 0.2


def test_pad_embedding_stays_zero(model):
    assert np.allclose(model.embeddings[0], 0.0)  # masked zero-feature row


def test_identical_features_high_similarity(model):
    pred_same = model.predict_local(
        np.array([1]), np.array([2]), np.array([[1, 2]]), np.array([[1, 2]])
    )[0]
    pred_diff = model.predict_local(
        np.array([1]), np.array([3]), np.array([[1, 2]]), np.array([[3, 4]])
    )[0]
    assert pred_same > pred_diff
    assert -1.0 <= pred_same <= 1.0  # clipped


def test_distributed_predict_matches_local(spark, pairs, model):
    out = model.predict(pairs).toPandas().sort_values(["x_item_index", "y_item_index"])
    local = model.predict_local(
        out["x_item_index"].to_numpy(),
        out["y_item_index"].to_numpy(),
        np.array(list(out["x_item_features"])),
        np.array(list(out["y_item_features"])),
    )
    assert np.allclose(out["similarity"].to_numpy(), local, atol=1e-9)


def test_masked_embedding_for_all_pad_features(spark, sf_dir):
    """Reference test_feature_aggregation_similarity_model.py:31-34:
    embeddings of a feature row are the masked average; an all-zero
    (all-pad) feature row must yield the zero embedding."""
    import numpy as np

    from redshells_spark.ml.feature_aggregation import FeatureAggregationSimilarityModel

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(6, 4))
    emb[0] = 0.0
    model = FeatureAggregationSimilarityModel(
        embeddings=emb, item_bias=np.zeros(4), history=[]
    )
    out = model._avg(np.array([[1, 2], [0, 0]]))
    assert float((out[0] ** 2).sum()) != 0.0
    assert float((out[1] ** 2).sum()) == 0.0
