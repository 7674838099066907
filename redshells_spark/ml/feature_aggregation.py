"""Feature-aggregation similarity — §2.H
``train_feature_aggregation_similarity``.

Reference ``contrib/model/feature_aggregation_similarity_model.py:16-217``:
similarity(x, y) = clip(cos(avg emb of x's features, avg emb of y's
features) + bias_x + bias_y, -1, 1); feature index 0 is the mask/pad
(zero embedding, excluded from the average); Keras MSE training with
early stopping.

Spark-first: the embedding/bias tables live as numpy on the driver
during training (feature vocabularies are bounded) with hand-written
MSE gradients + Adam; inference is fully distributed — embedding
lookup = broadcast join on exploded feature ids, masked average =
groupBy, similarity = codegen vector expression.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.scalar import clip
from redshells_spark.functions.vector import cosine_similarity


@dataclass
class FeatureAggregationSimilarityModel:
    embeddings: np.ndarray  # (max_feature_index+1, d); row 0 = pad (zeros)
    item_bias: np.ndarray  # (max_item_index+1,)
    history: list

    def _avg(self, feats: np.ndarray) -> np.ndarray:
        emb = self.embeddings[feats]  # (B, F, d)
        mask = (feats > 0)[..., None]
        s = (emb * mask).sum(axis=1)
        cnt = np.maximum(mask.sum(axis=1), 1)
        return s / cnt

    def predict_local(
        self, x_idx: np.ndarray, y_idx: np.ndarray, x_feats: np.ndarray, y_feats: np.ndarray
    ) -> np.ndarray:
        xe, ye = self._avg(x_feats), self._avg(y_feats)
        nx = np.maximum(np.linalg.norm(xe, axis=1), 1e-12)
        ny = np.maximum(np.linalg.norm(ye, axis=1), 1e-12)
        cos = (xe * ye).sum(axis=1) / (nx * ny)
        return np.clip(cos + self.item_bias[x_idx] + self.item_bias[y_idx], -1.0, 1.0)

    def save(self, path: str) -> None:
        """npz persistence (pickle-model-target role, dependency-free)."""
        import os

        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "feature_aggregation_model.npz"),
            embeddings=self.embeddings,
            item_bias=self.item_bias,
            history=np.array(self.history, dtype=np.float64),
        )

    @classmethod
    def load(cls, path: str) -> "FeatureAggregationSimilarityModel":
        import os

        z = np.load(os.path.join(path, "feature_aggregation_model.npz"))
        return cls(
            embeddings=z["embeddings"], item_bias=z["item_bias"], history=list(z["history"])
        )

    def embedding_df(self, spark) -> DataFrame:
        rows = [(i, [float(x) for x in self.embeddings[i]]) for i in range(len(self.embeddings))]
        return spark.createDataFrame(rows, "feature_index int, feature_embedding array<double>")

    def bias_df(self, spark) -> DataFrame:
        rows = [(i, float(b)) for i, b in enumerate(self.item_bias)]
        return spark.createDataFrame(rows, "item_index int, bias double")

    def predict(
        self,
        pairs: DataFrame,
        x_index: str = "x_item_index",
        y_index: str = "y_item_index",
        x_features: str = "x_item_features",
        y_features: str = "y_item_features",
    ) -> DataFrame:
        """Distributed inference: explode → broadcast-join embeddings →
        masked average → cosine + biases, all JVM-side except nothing."""
        spark = pairs.sparkSession
        emb = F.broadcast(self.embedding_df(spark))
        bias = F.broadcast(self.bias_df(spark))

        def avg_side(df: DataFrame, feats: str, out: str) -> DataFrame:
            keyed = df.select("__pid", F.explode(feats).alias("feature_index")).filter(
                F.col("feature_index") > 0
            )
            joined = keyed.join(emb, on="feature_index")
            dim = self.embeddings.shape[1]
            zero = F.array_repeat(F.lit(0.0), dim)
            summed = joined.groupBy("__pid").agg(
                F.aggregate(
                    F.collect_list("feature_embedding"),
                    zero,
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("__sum"),
                F.count(F.lit(1)).alias("__n"),
            )
            return summed.select(
                "__pid",
                F.transform("__sum", lambda x: x / F.col("__n")).alias(out),
            )

        # __pid is only a stable join key if the three branches below
        # (xa, ya, outer join) all see the SAME materialization —
        # monotonically_increasing_id over a recomputed nondeterministic
        # upstream (shuffle/sample/limit) could assign different ids per
        # branch and join pairs to the wrong averaged embeddings.
        # localCheckpoint pins the ids once.
        with_id = pairs.withColumn(
            "__pid", F.monotonically_increasing_id()
        ).localCheckpoint()
        xa = avg_side(with_id, x_features, "__xe")
        ya = avg_side(with_id, y_features, "__ye")
        joined = (
            with_id.join(xa, on="__pid", how="left")
            .join(ya, on="__pid", how="left")
            .join(bias.withColumnsRenamed({"item_index": x_index, "bias": "__bx"}), on=x_index, how="left")
            .join(bias.withColumnsRenamed({"item_index": y_index, "bias": "__by"}), on=y_index, how="left")
        )
        sim = clip(
            cosine_similarity("__xe", "__ye")
            + F.coalesce("__bx", F.lit(0.0))
            + F.coalesce("__by", F.lit(0.0)),
            -1.0,
            1.0,
        )
        return joined.withColumn("similarity", sim).drop(
            "__pid", "__xe", "__ye", "__bx", "__by"
        )


def train_feature_aggregation_similarity(
    pairs: DataFrame,
    embedding_size: int = 16,
    max_feature_index: int | None = None,
    max_item_index: int | None = None,
    epochs: int = 100,
    learning_rate: float = 0.05,
    early_stop_rel: float = 1e-5,
    early_stopping_try_count: int = 1,
    early_stopping_decay: float = 2.0,
    seed: int = 42,
    x_index: str = "x_item_index",
    y_index: str = "y_item_index",
    x_features: str = "x_item_features",
    y_features: str = "y_item_features",
    score_column: str = "score",
) -> FeatureAggregationSimilarityModel:
    pdf = pairs.select(x_index, y_index, x_features, y_features, score_column).toPandas()
    xf = np.array(list(pdf[x_features]), dtype=int)
    yf = np.array(list(pdf[y_features]), dtype=int)
    xi = pdf[x_index].to_numpy()
    yi = pdf[y_index].to_numpy()
    score = pdf[score_column].to_numpy(dtype=float)
    if max_feature_index is None:
        max_feature_index = int(max(xf.max(), yf.max()))
    if max_item_index is None:
        max_item_index = int(max(xi.max(), yi.max()))

    rng = np.random.default_rng(seed)
    E = rng.normal(0, 0.1, (max_feature_index + 1, embedding_size))
    E[0] = 0.0
    bias = np.zeros(max_item_index + 1)
    mE = np.zeros_like(E); vE = np.zeros_like(E)
    mb = np.zeros_like(bias); vb = np.zeros_like(bias)
    b1, b2, eps = 0.9, 0.999, 1e-8
    from redshells_spark.ml.early_stopping import EarlyStopping

    early_stop = EarlyStopping(
        try_count=early_stopping_try_count,
        learning_rate=learning_rate,
        decay_speed=early_stopping_decay,
        threshold=early_stop_rel,
    )
    history: list[float] = []

    xmask = (xf > 0)[..., None]
    ymask = (yf > 0)[..., None]
    xcnt = np.maximum(xmask.sum(axis=1), 1)
    ycnt = np.maximum(ymask.sum(axis=1), 1)

    for epoch in range(1, epochs + 1):
        xe = (E[xf] * xmask).sum(axis=1) / xcnt
        ye = (E[yf] * ymask).sum(axis=1) / ycnt
        nx = np.maximum(np.linalg.norm(xe, axis=1, keepdims=True), 1e-12)
        ny = np.maximum(np.linalg.norm(ye, axis=1, keepdims=True), 1e-12)
        xn, yn = xe / nx, ye / ny
        cos = (xn * yn).sum(axis=1)
        pred = cos + bias[xi] + bias[yi]
        err = pred - score
        loss = float((err**2).mean())
        history.append(loss)

        g = (2.0 / len(err)) * err  # dL/dpred
        # bias grads
        gb = np.zeros_like(bias)
        np.add.at(gb, xi, g)
        np.add.at(gb, yi, g)
        # cosine grads: d cos / d xe = (yn - cos*xn)/nx
        gxe = g[:, None] * (yn - cos[:, None] * xn) / nx
        gye = g[:, None] * (xn - cos[:, None] * yn) / ny
        gE = np.zeros_like(E)
        np.add.at(gE, xf, (gxe / xcnt)[:, None, :] * xmask)
        np.add.at(gE, yf, (gye / ycnt)[:, None, :] * ymask)
        gE[0] = 0.0  # pad row stays zero

        for prm, gr, m_, v_ in ((E, gE, mE, vE), (bias, gb, mb, vb)):
            m_ *= b1; m_ += (1 - b1) * gr
            v_ *= b2; v_ += (1 - b2) * gr * gr
            prm -= learning_rate * (m_ / (1 - b1**epoch)) / (np.sqrt(v_ / (1 - b2**epoch)) + eps)
        E[0] = 0.0

        # reference early-stopping semantics: regression → restore
        # best params + Adam state, decay lr, spend a retry
        if len(history) > 5 and early_stop.does_stop(
            loss, [E, bias], [mE, mb], [vE, vb]
        ):
            break
        learning_rate = early_stop.learning_rate

    return FeatureAggregationSimilarityModel(embeddings=E, item_bias=bias, history=history)
