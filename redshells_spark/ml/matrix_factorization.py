"""Matrix factorization — §2.H ``train_matrix_factorization`` /
``mf_similarity``.

Reference: biased MF r̂ = b_i + b_{u,s} + p_u·q_i with per-(service,
user) bias, two-phase TF training, clip to observed range
(``contrib/model/matrix_factorization_model.py:18-313``).

Spark-first: ``pyspark.ml.recommendation.ALS`` (distributed normal
equations, block-partitioned factor exchange). Semantic deltas,
documented: ALS has no explicit bias terms — we pre-center ratings by
the global mean (the dominant bias component) and restore it at
prediction; service-scoped users are encoded as (service, user)
composite ids, matching the reference's per-service user offsets
(``matrix_factorization_model.py:150-152``). Unknown ids →
``coldStartStrategy`` ('drop' = reference's NaN semantics at
``:240-262``). Predictions are clipped to the observed rating range.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.scalar import clip
from redshells_spark.functions.vector import l2_normalize


@dataclass
class MatrixFactorization:
    model: ALSModel
    rating_mean: float
    rating_min: float
    rating_max: float
    user_column: str
    item_column: str

    def predict(self, pairs: DataFrame) -> DataFrame:
        """→ pairs + ``prediction`` (mean-restored, clipped). Unknown
        user/item rows are dropped (reference returns NaN —
        ``matrix_factorization_model.py:240-262``)."""
        out = self.model.transform(pairs)
        restored = F.col("prediction") + F.lit(self.rating_mean)
        return out.withColumn(
            "prediction", clip(restored, self.rating_min, self.rating_max)
        ).dropna(subset=["prediction"])


def train_matrix_factorization(
    ratings: DataFrame,
    user_column: str = "user_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
    service_column: str | None = None,
    n_latent_factors: int = 20,
    reg_param: float = 1e-5,
    max_iter: int = 10,
    seed: int = 42,
) -> MatrixFactorization:
    df = ratings
    if service_column is not None:
        # reference scopes users per service via index offsets
        # (``matrix_factorization_model.py:150-152``); ALS needs
        # int-range ids, so densely index the (service, user) pairs
        from pyspark.sql import Window

        composite = df.select(service_column, user_column).distinct()
        composite = composite.withColumn(
            "__uid",
            F.row_number().over(Window.orderBy(service_column, user_column)),
        )
        df = (
            df.join(composite, on=[service_column, user_column])
            .drop(user_column)
            .withColumnRenamed("__uid", user_column)
        )
    stats = df.agg(
        F.avg(rating_column).alias("mean"),
        F.min(rating_column).alias("min"),
        F.max(rating_column).alias("max"),
    ).head()
    centered = df.withColumn("__r", F.col(rating_column) - F.lit(stats["mean"]))
    als = ALS(
        rank=n_latent_factors,
        regParam=reg_param,
        maxIter=max_iter,
        userCol=user_column,
        itemCol=item_column,
        ratingCol="__r",
        coldStartStrategy="drop",
        seed=seed,
    )
    model = als.fit(centered)
    return MatrixFactorization(
        model=model,
        rating_mean=float(stats["mean"]),
        rating_min=float(stats["min"]),
        rating_max=float(stats["max"]),
        user_column=user_column,
        item_column=item_column,
    )


def item_factors(mf: MatrixFactorization, normalize: bool = False) -> DataFrame:
    """→ (item_id, embedding) — reference ``get_item_factors(normalize)``
    (``matrix_factorization_model.py:264-278``)."""
    out = mf.model.itemFactors.select(
        F.col("id").alias("item_id"),
        F.col("features").cast("array<double>").alias("embedding"),
    )
    if normalize:
        out = out.withColumn("embedding", l2_normalize("embedding"))
    return out


def mf_item_similarity(
    mf: MatrixFactorization,
    threshold: float | None = None,
    normalize: bool = True,
    max_exact_items: int = 100_000,
) -> DataFrame:
    """Item-item similarity from MF factors (reference
    ``calculate_similarity_with_matrix_factorization.py:21-66``:
    blocked dot products of normalized factors, upper-triangular).

    Tiered by catalog size: up to ``max_exact_items`` items the exact
    BLAS all-pairs path runs (the operator is inherently O(n²) — the
    reference's own 1000-row block loop is too, so the exact tier is
    only for bounded catalogs). Bigger catalogs require an explicit
    ``threshold`` and route through LSH-bucketed candidates with exact
    verification (sub-quadratic; recall approximate, precision exact).
    ``threshold=None`` on a big catalog fails loudly instead of
    emitting n² rows through an unguarded driver collect."""
    from redshells_spark.similarity.allpairs import all_pairs_above_threshold
    from redshells_spark.similarity.ann import lsh_pairs_above_threshold

    factors = item_factors(mf, normalize=normalize)
    metric = "dot" if not normalize else "cosine"
    n = factors.limit(max_exact_items + 1).count()
    if n <= max_exact_items:
        return all_pairs_above_threshold(
            factors,
            id_column="item_id",
            embedding_column="embedding",
            threshold=threshold if threshold is not None else -1e18,
            metric=metric,
            max_broadcast_rows=max_exact_items,
        )
    if threshold is None:
        raise ValueError(
            f"mf_item_similarity: > {max_exact_items} items is n² pairs; "
            "pass an explicit threshold to use the LSH-bucketed path, or "
            "raise max_exact_items if the catalog is genuinely bounded"
        )
    return lsh_pairs_above_threshold(
        factors,
        threshold=threshold,
        id_column="item_id",
        embedding_column="embedding",
        metric=metric,
    )
