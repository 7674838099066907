"""Pairwise similarity trainer — §2.H ``train_pairwise_similarity``.

Reference ``train/train_pairwise_similarity_model.py:16-71``:
features = elementwise (Hadamard) product of the two items'
embeddings; binary label; rows whose ids miss the embedding map are
dropped (semi-join validity filters at ``:49-50``).
"""

from __future__ import annotations

from typing import Any

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import elementwise_product
from redshells_spark.operators.joins import lookup_join_embedding


def make_pairwise_features(
    similarity_data: DataFrame,
    item2embedding: DataFrame,
    item0_column: str = "item_id_0",
    item1_column: str = "item_id_1",
    label_column: str = "similarity",
    embedding_key: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """→ (item_id_0, item_id_1, feature: array<double>, label int).
    Inner joins drop invalid ids (reference's isin filters + dict
    lookups, ``train_pairwise_similarity_model.py:49-54``)."""
    joined = lookup_join_embedding(
        similarity_data, item2embedding, item0_column, embedding_key, embedding_column, "__e0"
    )
    joined = lookup_join_embedding(
        joined, item2embedding, item1_column, embedding_key, embedding_column, "__e1"
    )
    return joined.select(
        item0_column,
        item1_column,
        elementwise_product("__e0", "__e1").alias("feature"),
        F.col(label_column).cast("int").alias("label"),
    )


def train_pairwise_similarity(
    similarity_data: DataFrame,
    item2embedding: DataFrame,
    model_name: str = "GBTClassifier",
    model_params: dict[str, Any] | None = None,
    **feature_kwargs: Any,
) -> PipelineModel:
    """Fit the registry classifier on Hadamard-product pair features."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector

    from redshells_spark.ml.classifiers import build_prediction_model

    feats = make_pairwise_features(similarity_data, item2embedding, **feature_kwargs)
    vecs = feats.withColumn("features", array_to_vector("feature"))
    model = build_prediction_model(model_name, **(model_params or {}))
    from redshells_spark.ml.mllib_compat import strip_training_summary

    model.setFeaturesCol("features").setLabelCol("label")
    return strip_training_summary(Pipeline(stages=[model]).fit(vecs))


def predict_pairwise_similarity(
    model: PipelineModel,
    pairs: DataFrame,
    item2embedding: DataFrame,
    **feature_kwargs: Any,
) -> DataFrame:
    """→ pairs + ``probability``/``prediction`` via distributed
    transform (model broadcast by MLlib)."""
    from pyspark.ml.functions import array_to_vector

    feature_kwargs.setdefault("label_column", "similarity")
    feats = make_pairwise_features(
        pairs.withColumn(feature_kwargs["label_column"], F.lit(0)), item2embedding, **feature_kwargs
    )
    vecs = feats.withColumn("features", array_to_vector("feature"))
    return model.transform(vecs).drop("features", "feature", "rawPrediction", "label")
