from redshells_spark.ml.word2vec import train_word2vec, word_vectors
from redshells_spark.ml.dimension_reduction import DimensionReductionModel
from redshells_spark.ml.classifiers import (
    PREDICTION_MODEL_REGISTRY,
    build_prediction_model,
    register_prediction_model,
    train_classifier,
    validate_classifier,
    optimize_classifier,
)
from redshells_spark.ml.matrix_factorization import (
    train_matrix_factorization,
    item_factors,
    mf_item_similarity,
)
from redshells_spark.ml.pairwise import make_pairwise_features, train_pairwise_similarity
from redshells_spark.ml.scdv import SCDV
from redshells_spark.ml.lda import train_lda
from redshells_spark.ml.gcmc import (
    GCMCModel,
    aggregate_messages,
    build_gcmc_dataset,
    extend_gcmc_dataset,
    train_gcmc,
)
from redshells_spark.ml.feature_aggregation import (
    FeatureAggregationSimilarityModel,
    train_feature_aggregation_similarity,
)
from redshells_spark.ml.factorization_machine import (
    evaluate_auc,
    evaluate_rmse,
    train_factorization_machine,
)

__all__ = [
    "train_word2vec",
    "word_vectors",
    "DimensionReductionModel",
    "PREDICTION_MODEL_REGISTRY",
    "build_prediction_model",
    "register_prediction_model",
    "train_classifier",
    "validate_classifier",
    "optimize_classifier",
    "train_matrix_factorization",
    "item_factors",
    "mf_item_similarity",
    "make_pairwise_features",
    "train_pairwise_similarity",
    "SCDV",
    "train_lda",
    "GCMCModel",
    "aggregate_messages",
    "build_gcmc_dataset",
    "extend_gcmc_dataset",
    "train_gcmc",
    "FeatureAggregationSimilarityModel",
    "train_feature_aggregation_similarity",
    "evaluate_auc",
    "evaluate_rmse",
    "train_factorization_machine",
]
