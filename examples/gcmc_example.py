"""GCMC rating prediction (reference
``examples/graph_convolutional_matrix_completion_example.py:52-98``:
ML-100k, rating classes, test RMSE)."""

from __future__ import annotations

import numpy as np

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("gcmc_example")
    from pyspark.sql import functions as F

    from redshells_spark.ml.gcmc import build_gcmc_dataset, train_gcmc

    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    ratings = (
        li.select(
            F.col("l_suppkey").cast("int").alias("user_id"),
            F.col("l_partkey").cast("int").alias("item_id"),
            F.ceil(F.col("l_quantity") / 10.0).cast("double").alias("rating"),
        )
        .dropDuplicates(["user_id", "item_id"])
    )
    edges, user_map, item_map = build_gcmc_dataset(ratings, test_size=0.1)
    model = train_gcmc(
        edges, user_map.count(), item_map.count(),
        encoder_hidden=32, encoder_size=8, epochs=40, verbose=True,
    )
    test = edges.filter(~F.col("is_train"))
    preds = model.predict(test).toPandas()
    rmse = float(np.sqrt(np.mean((preds["prediction"] - preds["rating"]) ** 2)))
    print(f"test RMSE: {rmse:.4f} over {len(preds)} held-out edges")
    spark.stop()


if __name__ == "__main__":
    main()
