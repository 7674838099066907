"""ALS matrix factorization + RMSE + item-item similarity (reference
``examples/matrix_factorization_example.py:88-128``: Netflix MF with
rating clip and factor extraction)."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("matrix_factorization_example")
    from pyspark.sql import functions as F

    from redshells_spark.ml.factorization_machine import evaluate_rmse
    from redshells_spark.ml.matrix_factorization import (
        item_factors,
        mf_item_similarity,
        train_matrix_factorization,
    )

    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    ratings = li.select(
        F.col("l_suppkey").cast("int").alias("user_id"),
        F.col("l_partkey").cast("int").alias("item_id"),
        (F.col("l_quantity") / 10.0).alias("rating"),
    )
    train, test = ratings.randomSplit([0.9, 0.1], seed=42)
    mf = train_matrix_factorization(train, n_latent_factors=10, reg_param=0.05, max_iter=10)
    preds = mf.predict(test)
    print(f"test RMSE: {evaluate_rmse(preds):.4f}")
    factors = item_factors(mf, normalize=True)
    print(f"item factors: {factors.count()} rows, dim {len(factors.head()['embedding'])}")
    sims = mf_item_similarity(mf, threshold=0.9)
    print(f"high-similarity item pairs (cos ≥ 0.9): {sims.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
