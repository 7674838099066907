"""Factorization machine CTR training + AUC (reference
``examples/factorization_machine_example.py:104-155``: Criteo FM with
log-transformed ints + categoricals)."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("factorization_machine_example")
    from pyspark.sql import functions as F

    from redshells_spark.functions.scalar import log_transform
    from redshells_spark.ml.factorization_machine import (
        evaluate_auc,
        train_factorization_machine,
    )

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    data = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        F.col("value").alias("I1_raw"),
        (F.col("user_id") % 20).cast("string").alias("C1"),
        F.get_json_object("props", "$.k").cast("int").alias("I2"),
    )
    vmin = data.agg(F.min("I1_raw")).head()[0]
    data = data.withColumn("I1", log_transform("I1_raw", vmin)).drop("I1_raw").na.fill(0)

    train, test = data.randomSplit([0.8, 0.2], seed=42)
    model = train_factorization_machine(
        train, int_columns=["I1", "I2"], cat_columns=["C1"],
        embedding_size=8, max_iter=20, learning_rate=0.05,
    )
    print(f"test AUC: {evaluate_auc(model.transform(test)):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
