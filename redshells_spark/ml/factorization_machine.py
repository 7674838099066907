"""Factorization machine — §2.H ``train_factorization_machine``.

Reference ``contrib/model/factorization_machine.py:20-203``: 2-way FM
for CTR, y = σ(b + Σwx + ½Σ[(xv)² − x²v²]), categorical features
indexed per ``{col}_{value}``, MSE + L2, AUC reporting.

Spark-first: ``pyspark.ml.classification.FMClassifier`` (identical
2-way model; distributed minibatch SGD/AdamW) with the feature
pipeline expressed as StringIndexer→OneHotEncoder→VectorAssembler —
the same ``{col}_{value}`` one-hot index space the reference builds by
hand at ``:165-186``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import FMClassifier
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.ml.mllib_compat import strip_training_summary


def build_fm_feature_pipeline(
    int_columns: Sequence[str], cat_columns: Sequence[str]
) -> list:
    stages = []
    encoded = list(int_columns)
    for c in cat_columns:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep")
        )
        stages.append(OneHotEncoder(inputCol=f"{c}__idx", outputCol=f"{c}__oh"))
        encoded.append(f"{c}__oh")
    stages.append(VectorAssembler(inputCols=encoded, outputCol="features", handleInvalid="keep"))
    return stages


def train_factorization_machine(
    train_data: DataFrame,
    int_columns: Sequence[str],
    cat_columns: Sequence[str],
    label_column: str = "label",
    embedding_size: int = 10,
    l2_weight: float = 1e-6,
    learning_rate: float = 1e-2,
    max_iter: int = 20,
    seed: int = 42,
) -> PipelineModel:
    fm = FMClassifier(
        featuresCol="features",
        labelCol=label_column,
        factorSize=embedding_size,
        regParam=l2_weight,
        stepSize=learning_rate,
        maxIter=max_iter,
        seed=seed,
    )
    stages = build_fm_feature_pipeline(int_columns, cat_columns) + [fm]
    # Spark 4.1 landmine (see ml/mllib_compat.py): the FM summary holds
    # the session -> ObservationManager, which breaks closure
    # serialization after ANY df.observe() ran in the session
    return strip_training_summary(Pipeline(stages=stages).fit(train_data))


def evaluate_auc(predictions: DataFrame, label_column: str = "label") -> float:
    """ROC-AUC (reference ``model/utils.py:8-10`` + FM's AUC reporting)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    ev = BinaryClassificationEvaluator(
        labelCol=label_column, rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    )
    return float(ev.evaluate(predictions))


def evaluate_rmse(
    predictions: DataFrame, label_column: str = "rating", prediction_column: str = "prediction"
) -> float:
    """RMSE (reference ``examples/matrix_factorization_example.py:114``)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    ev = RegressionEvaluator(
        labelCol=label_column, predictionCol=prediction_column, metricName="rmse"
    )
    return float(ev.evaluate(predictions))
