"""TPE study + classifier-optimization contracts.

Pins (a) the TPE sampler itself — on a known objective a seeded study
must concentrate samples near the optimum and beat pure random search
with the same budget; (b) the define-by-run param registry; (c) the
boosted-tree registry contract: external-package names fail loudly,
never silently alias.
"""

from __future__ import annotations

import numpy as np
import pytest

from redshells_spark.ml.classifiers import (
    build_prediction_model,
    optimize_classifier_tpe,
)
from redshells_spark.ml.tpe import (
    Study,
    Trial,
    create_study,
    get_tpe_param,
    register_tpe_param_rule,
)

# measured >=10s in the round-9 duration profile (pytest.ini tiering)
pytestmark = pytest.mark.slow


def _quadratic(trial: Trial) -> float:
    x = trial.suggest_uniform("x", -10.0, 10.0)
    return (x - 2.0) ** 2


def test_tpe_beats_random_on_quadratic():
    tpe = create_study(seed=7)
    tpe.optimize(_quadratic, n_trials=60)

    rng = np.random.default_rng(7)
    random_best = min((rng.uniform(-10, 10) - 2.0) ** 2 for _ in range(60))

    assert tpe.best_value < 0.05, tpe.best_params
    assert tpe.best_value <= random_best
    # later trials concentrate near the optimum: the mean distance of
    # the last 20 proposals to x*=2 is far below the uniform mean (~5)
    tail = [abs(t.params["x"] - 2.0) for t in tpe.trials[-20:]]
    assert float(np.mean(tail)) < 2.5


def test_tpe_reproducible():
    a, b = create_study(seed=11), create_study(seed=11)
    a.optimize(_quadratic, n_trials=25)
    b.optimize(_quadratic, n_trials=25)
    assert [t.params for t in a.trials] == [t.params for t in b.trials]
    assert a.best_value == b.best_value


def test_tpe_mixed_space_conditional():
    # define-by-run conditionals like the reference's booster-dependent
    # XGB space: params present only in some trials must still sample
    def objective(trial: Trial) -> float:
        kind = trial.suggest_categorical("kind", ["flat", "curved"])
        if kind == "flat":
            return 1.0
        x = trial.suggest_loguniform("lr", 1e-6, 1.0)
        n = trial.suggest_int("depth", 1, 9)
        return abs(np.log10(x) + 3) + abs(n - 4) * 0.1

    s = Study(seed=3)
    s.optimize(objective, n_trials=80)
    assert s.best_params["kind"] == "curved"
    assert 1e-4 < s.best_params["lr"] < 1e-2
    assert s.best_value < 0.8  # well below the flat branch's 1.0


def test_param_rules_registry():
    s = Study(seed=1)
    t = Trial(s, np.random.default_rng(1))
    params = get_tpe_param("GBTClassifier_default", t)
    assert 1 <= params["maxDepth"] <= 9
    assert 1e-3 <= params["stepSize"] <= 1.0

    with pytest.raises(KeyError, match="not registered"):
        get_tpe_param("NopeClassifier_default", t)

    register_tpe_param_rule("NopeClassifier_default", lambda tr: {"a": 1})
    assert get_tpe_param("NopeClassifier_default", t) == {"a": 1}


@pytest.mark.parametrize("name", ["XGBClassifier", "LGBMClassifier", "CatBoostClassifier"])
def test_boosted_tree_names_fail_loudly(name, spark):
    with pytest.raises(ImportError, match=name):
        build_prediction_model(name)
    # explicit opt-in gets the documented GBT substitute
    m = build_prediction_model(name, allow_fallback=True, maxDepth=3)
    assert type(m).__name__ == "GBTClassifier"
    assert m.getMaxDepth() == 3


def test_optimize_classifier_tpe_spark(spark):
    import pyspark.sql.functions as F

    # separable 2-feature problem; even a tiny study must fit it well
    df = (
        spark.range(400)
        .select(
            (F.rand(1) * 2 - 1).alias("f1"),
            (F.rand(2) * 2 - 1).alias("f2"),
        )
        .withColumn("target", (F.col("f1") + F.col("f2") > 0).cast("int"))
    )
    best_params, best_value = optimize_classifier_tpe(
        df,
        feature_columns=["f1", "f2"],
        target_column="target",
        model_name="LogisticRegression",
        n_trials=5,
        seed=5,
    )
    assert set(best_params) == {"regParam", "elasticNetParam"}
    assert best_value < 0.2  # ≥80% held-out accuracy
