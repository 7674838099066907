"""Binary classification with the model registry + validation +
hyper-parameter search (reference
``examples/binary_classification_example.py:50-55``: train, cross-
validate, optimize)."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("binary_classification_example")
    from pyspark.sql import functions as F

    from redshells_spark.ml.classifiers import (
        optimize_classifier,
        train_classifier,
        validate_classifier,
    )

    # label: was any part of the order shipped with high discount
    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    data = li.select(
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
        "l_quantity",
        "l_extendedprice",
        "l_tax",
    )
    features = ["l_quantity", "l_extendedprice", "l_tax"]

    model = train_classifier(data, features, "y", "RandomForestClassifier", {"numTrees": 20})
    preds = model.transform(data)
    acc = preds.filter(F.col("prediction") == F.col("label")).count() / data.count()
    print(f"train accuracy: {acc:.3f}")

    cv = validate_classifier(data, features, "y", "LogisticRegression", cv=3)
    print(f"cross-validation: {cv}")

    best, metric = optimize_classifier(
        data, features, "y", "LogisticRegression", param_grid={"regParam": [0.0, 0.01, 0.1]}
    )
    print(f"best held-out accuracy: {metric:.3f}")

    # TPE study (the reference's optimize_model shape — 100 trials in
    # production; a short seeded study here)
    from redshells_spark.ml.classifiers import optimize_classifier_tpe

    tpe_params, tpe_loss = optimize_classifier_tpe(
        data.limit(5000), features, "y", "LogisticRegression", n_trials=8, seed=7
    )
    print(f"TPE best params {tpe_params}, 1-accuracy {tpe_loss:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
