"""Classifier registry + train / validate / optimize — §2.H.

Reference: name→class registry with lazy imports and
``register_prediction_model``
(``factory/prediction_model_factory.py:6-52``), sklearn-API ``fit``
(``train/train_clasification_model.py:12-47``), k-fold
``cross_val_score`` (``train/utils/utils.py:24-37``), Optuna TPE search
(``train/utils/utils.py:40-58``).

Spark-first: the registry maps names to MLlib Estimator builders;
training is a Pipeline (StringIndexer for labels + VectorAssembler);
validation = CrossValidator; optimization is either
``optimize_classifier`` (TrainValidationSplit grid — cheap, parallel)
or ``optimize_classifier_tpe`` (the reference's 100-trial TPE study
shape, via :mod:`redshells_spark.ml.tpe`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.ml import Pipeline, PipelineModel
from redshells_spark.ml.mllib_compat import strip_training_summary
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame

PREDICTION_MODEL_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_prediction_model(name: str, builder: Callable[..., Any]) -> None:
    """Same extension API as the reference's
    ``register_prediction_model`` (``factory/prediction_model_factory.py:39-52``)."""
    PREDICTION_MODEL_REGISTRY[name] = builder


register_prediction_model("RandomForestClassifier", RandomForestClassifier)
register_prediction_model("GBTClassifier", GBTClassifier)
register_prediction_model("LogisticRegression", LogisticRegression)


def _boosted_tree_entry(ref_name: str, pkg_hint: str) -> Callable[..., Any]:
    """XGB/LGBM/CatBoost (the reference's lazily-imported entries,
    ``factory/prediction_model_factory.py:6-52``) need external Spark
    packages not present here. Asking for them by name fails loudly
    with the substitution spelled out — silently aliasing to GBT would
    hand back different semantics under the requested name. Opt into
    the in-box substitute with ``allow_fallback=True`` (params are
    forwarded to GBTClassifier where they exist)."""

    def build(*, allow_fallback: bool = False, **params: Any) -> Any:
        if not allow_fallback:
            raise ImportError(
                f"{ref_name} requires {pkg_hint}, which is not installed. "
                "Use model_name='GBTClassifier' (the in-box gradient-boosted "
                f"trees), or pass allow_fallback=True to run {ref_name!r} "
                "with GBTClassifier semantics explicitly."
            )
        gbt_params = {k: v for k, v in params.items() if GBTClassifier().hasParam(k)}
        return GBTClassifier(**gbt_params)

    return build


register_prediction_model("XGBClassifier", _boosted_tree_entry("XGBClassifier", "xgboost4j-spark"))
register_prediction_model("LGBMClassifier", _boosted_tree_entry("LGBMClassifier", "SynapseML"))
register_prediction_model("CatBoostClassifier", _boosted_tree_entry("CatBoostClassifier", "catboost-spark"))


def build_prediction_model(name: str, **params: Any) -> Any:
    if name not in PREDICTION_MODEL_REGISTRY:
        raise KeyError(f"unknown prediction model {name!r}; registered: {sorted(PREDICTION_MODEL_REGISTRY)}")
    return PREDICTION_MODEL_REGISTRY[name](**params)


def _pipeline(
    model: Any, feature_columns: Sequence[str], target_column: str
) -> Pipeline:
    stages = [
        StringIndexer(inputCol=target_column, outputCol="label", handleInvalid="keep"),
        VectorAssembler(inputCols=list(feature_columns), outputCol="features"),
        model,
    ]
    return Pipeline(stages=stages)


def train_classifier(
    train_data: DataFrame,
    feature_columns: Sequence[str],
    target_column: str,
    model_name: str = "GBTClassifier",
    model_params: dict[str, Any] | None = None,
) -> PipelineModel:
    """Fit registry model on (features, target) — reference
    ``TrainClassificationModel`` (``train/train_clasification_model.py:12-47``)."""
    model = build_prediction_model(model_name, **(model_params or {}))
    # summary stripped: keeps the SparkSession out of the model graph
    # (observe()-poisoned closure serialization — see mllib_compat.py)
    return strip_training_summary(
        _pipeline(model, feature_columns, target_column).fit(train_data)
    )


def validate_classifier(
    train_data: DataFrame,
    feature_columns: Sequence[str],
    target_column: str,
    model_name: str = "GBTClassifier",
    model_params: dict[str, Any] | None = None,
    cv: int = 3,
    binary: bool = False,
    seed: int = 42,
) -> dict[str, float]:
    """k-fold cross validation → metrics dict (reference
    ``validate_model``, ``train/utils/utils.py:24-37``)."""
    model = build_prediction_model(model_name, **(model_params or {}))
    pipe = _pipeline(model, feature_columns, target_column)
    evaluator = (
        BinaryClassificationEvaluator(metricName="areaUnderROC")
        if binary
        else MulticlassClassificationEvaluator(metricName="accuracy")
    )
    validator = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=ParamGridBuilder().build(),
        evaluator=evaluator,
        numFolds=cv,
        seed=seed,
    )
    fitted = validator.fit(train_data)
    return {
        "metric": evaluator.getMetricName(),
        "avg": float(fitted.avgMetrics[0]),
    }


def optimize_classifier(
    train_data: DataFrame,
    feature_columns: Sequence[str],
    target_column: str,
    model_name: str = "GBTClassifier",
    param_grid: dict[str, Sequence[Any]] | None = None,
    test_size: float = 0.25,
    binary: bool = False,
    seed: int = 42,
) -> tuple[PipelineModel, float]:
    """Hyperparameter search on a held-out split (reference
    ``optimize_model``'s Optuna objective = accuracy on a test split,
    ``train/utils/utils.py:40-58``; search spaces
    ``factory/optuna_param_factory.py:8-62``). Grid search via
    TrainValidationSplit; returns (best model, best metric)."""
    model = build_prediction_model(model_name)
    pipe = _pipeline(model, feature_columns, target_column)
    builder = ParamGridBuilder()
    grid_spec = param_grid or _default_grid(model)
    for pname, values in grid_spec.items():
        builder = builder.addGrid(model.getParam(pname), list(values))
    evaluator = (
        BinaryClassificationEvaluator(metricName="areaUnderROC")
        if binary
        else MulticlassClassificationEvaluator(metricName="accuracy")
    )
    tvs = TrainValidationSplit(
        estimator=pipe,
        estimatorParamMaps=builder.build(),
        evaluator=evaluator,
        trainRatio=1.0 - test_size,
        seed=seed,
        parallelism=4,
    )
    fitted = tvs.fit(train_data)
    return (
        strip_training_summary(fitted.bestModel),
        float(max(fitted.validationMetrics)),
    )


def optimize_classifier_tpe(
    train_data: DataFrame,
    feature_columns: Sequence[str],
    target_column: str,
    model_name: str = "GBTClassifier",
    param_rule: str | None = None,
    n_trials: int = 100,
    test_size: float = 0.25,
    binary: bool = False,
    seed: int = 42,
) -> tuple[dict[str, Any], float]:
    """TPE hyperparameter study → (best_params, best_value).

    Mirrors reference ``optimize_model`` (``train/utils/utils.py:40-58``):
    per trial, re-split train/test, sample params from the registered
    define-by-run space (``factory/optuna_param_factory.py:8-62``
    analogue — :mod:`redshells_spark.ml.tpe`), fit, and minimize
    1 − accuracy (or 1 − AUC when ``binary``). The study loop is
    driver-side; every fit/eval is a distributed Spark job. Unlike the
    reference's unseeded ``train_test_split``, the per-trial split is
    seeded (trial index folded into the seed) so studies are
    reproducible on a fixed input.
    """
    from redshells_spark.ml.tpe import Study, Trial, get_tpe_param

    rule = param_rule or f"{model_name}_default"
    evaluator = (
        BinaryClassificationEvaluator(metricName="areaUnderROC")
        if binary
        else MulticlassClassificationEvaluator(metricName="accuracy")
    )
    data = train_data.cache()
    trial_no = {"n": 0}

    def objective(trial: Trial) -> float:
        trial_no["n"] += 1
        params = get_tpe_param(rule, trial)
        tr, te = data.randomSplit(
            [1.0 - test_size, test_size], seed=seed * 1_000_003 + trial_no["n"]
        )
        fitted = strip_training_summary(
            _pipeline(
                build_prediction_model(model_name, **params),
                feature_columns,
                target_column,
            ).fit(tr)
        )
        return 1.0 - float(evaluator.evaluate(fitted.transform(te)))

    study = Study(seed=seed)
    study.optimize(objective, n_trials=n_trials)
    data.unpersist()
    return study.best_params, study.best_value


def _default_grid(model: Any) -> dict[str, Sequence[Any]]:
    """Compact analogues of the reference's Optuna spaces
    (``factory/optuna_param_factory.py:8-62``: depth/lr/estimators)."""
    if isinstance(model, (RandomForestClassifier,)):
        return {"maxDepth": [3, 5, 7], "numTrees": [20, 50]}
    if isinstance(model, (GBTClassifier,)):
        return {"maxDepth": [3, 5], "stepSize": [0.05, 0.1]}
    if isinstance(model, LogisticRegression):
        return {"regParam": [0.0, 0.01, 0.1]}
    return {}
