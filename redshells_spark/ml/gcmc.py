"""Graph-Convolutional Matrix Completion — §2.H ``train_gcmc``
(arXiv 1706.02263).

Reference: ``contrib/model/graph_convolutional_matrix_completion.py``
(graph ``:34-216``, model ``:219-456``) + ``gcmc_dataset.py:14-246``.

Spark-first decomposition (the reference's own boundary, §3 entry
point 3: TF training is single-node there too):

- **Id maps** (``GcmcIdMap``, ``gcmc_dataset.py:43-70``): count-bounded
  dense indices from 1, 0 reserved for unknowns —
  :func:`redshells_spark.operators.aggregates.value_counts_id_map`.
- **Graph dataset**: edge DataFrame (user_idx, item_idx, rating_class,
  is_train) with a seeded Bernoulli test mask
  (``gcmc_dataset.py:155-246``); per-rating degree normalization
  computed with Spark window counts.
- **Training**: edges capped at ``max_data_size`` (reference default
  50M, ``train_graph_convolutional_matrix_completion.py:39``) are
  collected and a from-scratch numpy GCMC is trained on the driver:
  per-rating graph convolution (symmetric degree-normalized adjacency),
  shared node embeddings, ReLU + dense encoder, softmax-over-ratings
  bilinear decoder, expectation prediction, Adam, early stopping.
- **Inference**: learned U/V factors return to Spark as DataFrames;
  scoring any (user, item) pair set is a join + decoder expression —
  fully distributed, no driver loop (``:391-397`` cartesian scoring =
  ``cartesian_product_scoring`` + this).
- **Cold start** (``predict_with_new_items``/``add_dataset``,
  ``gcmc_dataset.py:175-186``): unknown ids hit index 0, whose factor
  row is the zero vector → prediction falls back to the rating prior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_gcmc_dataset(
    ratings: DataFrame,
    user_column: str = "user_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
    test_size: float = 0.1,
    min_user_count: int = 0,
    min_item_count: int = 0,
    seed: int = 42,
    keep_unknown: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (edges, user_map, item_map). edges = (user_idx, item_idx,
    rating, is_train); maps = (id, count, index) with index from 1
    (0 = unknown/cold-start).

    ``keep_unknown``: ids filtered by the min-count thresholds map to
    index 0 and their edges stay in the dataset — the reference's
    ``GcmcIdMap(use_default=True)`` semantics
    (``gcmc_dataset.py:43-70``, ``test_gcmc_id_map.py:12-18``), where
    the shared unknown bucket also receives gradient. Default False
    keeps the stricter drop behavior."""
    from redshells_spark.operators.aggregates import value_counts_id_map

    user_map = value_counts_id_map(ratings, user_column, min_count=min_user_count)
    item_map = value_counts_id_map(ratings, item_column, min_count=min_item_count)
    how = "left" if keep_unknown else "inner"
    edges = (
        ratings.join(
            F.broadcast(user_map.select(F.col(user_column), F.col("index").alias("user_idx"))),
            on=user_column,
            how=how,
        )
        .join(
            F.broadcast(item_map.select(F.col(item_column), F.col("index").alias("item_idx"))),
            on=item_column,
            how=how,
        )
        .withColumn("user_idx", F.coalesce("user_idx", F.lit(0)))
        .withColumn("item_idx", F.coalesce("item_idx", F.lit(0)))
        .select(
            "user_idx",
            "item_idx",
            F.col(rating_column).alias("rating"),
            # portable seeded Bernoulli mask (reference uses np.random
            # binomial, gcmc_dataset.py:158-162)
            (
                F.conv(F.substring(F.md5(F.concat_ws("_", "user_idx", "item_idx", F.lit(seed))), 1, 8), 16, 10)
                .cast("long") % 100 >= int(test_size * 100)
            ).alias("is_train"),
        )
    )
    return edges, user_map, item_map


def extend_gcmc_dataset(
    user_map: DataFrame,
    item_map: DataFrame,
    new_ratings: DataFrame,
    user_column: str = "user_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
    only_known_users: bool = False,
    only_known_items: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental ``add_dataset`` (reference
    ``gcmc_dataset.py:175-186``): append new ratings, assigning fresh
    indices to unseen ids while existing ids keep theirs (the
    reference's ``GcmcIdMap.add`` in-place mutation, ``:43-70``,
    becomes a pure union + offset ranking). ``only_known_*`` drops
    rows whose ids are outside the current maps — the reference's
    id-scope filters. → (new_edges, user_map', item_map')."""

    def extend(mapping: DataFrame, col: str, known_only: bool):
        max_idx = mapping.agg(F.max("index")).head()[0] or 0
        if known_only:
            return mapping, new_ratings.join(
                F.broadcast(mapping.select(col)), on=col, how="left_semi"
            )
        fresh = (
            new_ratings.select(col)
            .distinct()
            .join(F.broadcast(mapping.select(col)), on=col, how="left_anti")
        )
        fresh = fresh.withColumn(
            "index", F.row_number().over(Window.orderBy(col)) + max_idx
        ).withColumn("count", F.lit(0))
        return mapping.unionByName(fresh.select(*mapping.columns)), new_ratings

    user_map2, scoped = extend(user_map, user_column, only_known_users)
    item_map2, scoped2 = extend(item_map, item_column, only_known_items)
    scoped_ratings = scoped.join(
        scoped2.select(new_ratings.columns), on=new_ratings.columns, how="left_semi"
    )
    edges = (
        scoped_ratings.join(
            F.broadcast(user_map2.select(F.col(user_column), F.col("index").alias("user_idx"))),
            on=user_column,
        )
        .join(
            F.broadcast(item_map2.select(F.col(item_column), F.col("index").alias("item_idx"))),
            on=item_column,
        )
        .select("user_idx", "item_idx", F.col(rating_column).alias("rating"), F.lit(True).alias("is_train"))
    )
    return edges, user_map2, item_map2


def features_matrix(
    id_map: DataFrame,
    features: DataFrame,
    id_column: str,
    feature_column: str = "features",
    dim: int | None = None,
) -> np.ndarray:
    """Dense (n+1, f) side-feature matrix aligned to the id map's
    indices; rows without features are the zero default row (reference
    ``gcmc_dataset.py:163-173`` zero-padding). Driver-sized: the id
    map is the training catalog, which the trainer caps anyway."""
    rows = (
        id_map.select("index", id_column)
        .join(
            features.select(F.col(id_column), F.col(feature_column).alias("__f")),
            on=id_column,
            how="left",
        )
        .select("index", "__f")
        .collect()
    )
    if dim is None:
        dims = [len(r["__f"]) for r in rows if r["__f"] is not None]
        if not dims:
            raise ValueError("no feature rows found; pass dim explicitly")
        if len(set(dims)) != 1:
            raise ValueError(f"feature size must be same; got {sorted(set(dims))}")
        dim = dims[0]
    n = max(r["index"] for r in rows) + 1
    mat = np.zeros((n, dim), dtype=np.float64)
    for r in rows:
        if r["__f"] is not None:
            mat[r["index"]] = np.asarray(r["__f"], dtype=np.float64)
    return mat


def _cross_feature_forward(
    feats: list[np.ndarray], Wf: list[np.ndarray], Wc: np.ndarray
) -> tuple[np.ndarray, list[np.ndarray], np.ndarray]:
    """Reference ``_cross_feature_layer``
    (``graph_convolutional_matrix_completion.py:159-170``):
    y = (∏_k (F_k @ Wf_k + 1)) @ Wc. Returns (y, per-k L, product P)
    for the backward pass."""
    L = [f @ w + 1.0 for f, w in zip(feats, Wf)]
    P = L[0].copy()
    for lk in L[1:]:
        P = P * lk
    return P @ Wc, L, P


@dataclass
class GCMCModel:
    user_factors: np.ndarray  # (n_users+1, d) row 0 = zeros (unknown)
    item_factors: np.ndarray  # (n_items+1, d)
    decoder_q: np.ndarray  # (R, d, d)
    rating_values: np.ndarray  # (R,)
    history: list = field(default_factory=list)
    # side-feature layers (None when trained without features)
    user_feature_weights: list | None = None  # [Wf_k], user side
    user_cross_weight: np.ndarray | None = None
    item_feature_weights: list | None = None
    item_cross_weight: np.ndarray | None = None

    def save(self, path: str) -> None:
        """Persist to ``<path>/gcmc_model.npz`` (reference persists via
        pickle model targets; npz is the dependency-free equivalent for
        the numpy trainer — same restartability role)."""
        import os

        os.makedirs(path, exist_ok=True)
        arrays = {
            "user_factors": self.user_factors,
            "item_factors": self.item_factors,
            "decoder_q": self.decoder_q,
            "rating_values": self.rating_values,
            "history": np.array(self.history, dtype=np.float64),
        }
        meta = {
            "n_user_feature_mats": len(self.user_feature_weights or []),
            "n_item_feature_mats": len(self.item_feature_weights or []),
        }
        for i, w in enumerate(self.user_feature_weights or []):
            arrays[f"user_fw_{i}"] = w
        for i, w in enumerate(self.item_feature_weights or []):
            arrays[f"item_fw_{i}"] = w
        if self.user_cross_weight is not None:
            arrays["user_cw"] = self.user_cross_weight
        if self.item_cross_weight is not None:
            arrays["item_cw"] = self.item_cross_weight
        arrays["meta"] = np.array([meta["n_user_feature_mats"], meta["n_item_feature_mats"]])
        np.savez(os.path.join(path, "gcmc_model.npz"), **arrays)

    @classmethod
    def load(cls, path: str) -> "GCMCModel":
        import os

        z = np.load(os.path.join(path, "gcmc_model.npz"))
        n_u, n_i = (int(x) for x in z["meta"])
        return cls(
            user_factors=z["user_factors"],
            item_factors=z["item_factors"],
            decoder_q=z["decoder_q"],
            rating_values=z["rating_values"],
            history=list(z["history"]),
            user_feature_weights=[z[f"user_fw_{i}"] for i in range(n_u)] or None,
            user_cross_weight=z["user_cw"] if "user_cw" in z else None,
            item_feature_weights=[z[f"item_fw_{i}"] for i in range(n_i)] or None,
            item_cross_weight=z["item_cw"] if "item_cw" in z else None,
        )

    def item_embeddings_for_features(self, feats: list[np.ndarray]) -> np.ndarray:
        """Embedding of NEW items known only by side features: base
        factor is the unknown row (zeros), so the embedding is purely
        the cross-feature layer — identical features ⇒ identical
        embeddings (reference
        ``test_graph_convolutional_matrix_completion.py:144-156``)."""
        if self.item_feature_weights is None:
            raise ValueError("model was trained without item features")
        y, _, _ = _cross_feature_forward(
            feats, self.item_feature_weights, self.item_cross_weight
        )
        return y

    def item_embeddings_df(
        self,
        feats_df: DataFrame,
        id_column: str = "item_id",
        features_column: str = "features",
    ) -> DataFrame:
        """DISTRIBUTED cold-start embedding: the cross-feature layer
        runs as an Arrow batch map over broadcast weights, so scoring
        new items scales with the cluster even though training is
        driver-capped (reference parity boundary). → (id, embedding).

        Same math as :meth:`item_embeddings_for_features`
        (numpy-parity-tested); the weights are a few KiB so the
        broadcast is trivially safe."""
        if self.item_feature_weights is None:
            raise ValueError("model was trained without item features")
        spark = feats_df.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.item_feature_weights, self.item_cross_weight)
        )
        idtype = feats_df.schema[id_column].dataType.simpleString()

        def compute(batches):
            import pandas as pd

            Wf, Wc = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                feats = np.array(list(pdf[features_column]), dtype=np.float64)
                y, _, _ = _cross_feature_forward([feats], Wf, Wc)
                yield pd.DataFrame(
                    {
                        id_column: pdf[id_column],
                        "embedding": [list(map(float, row)) for row in y],
                    }
                )

        return feats_df.select(id_column, features_column).mapInPandas(
            compute, schema=f"{id_column} {idtype}, embedding array<double>"
        )

    def predict_local(self, user_idx: np.ndarray, item_idx: np.ndarray) -> np.ndarray:
        u = self.user_factors[user_idx]
        v = self.item_factors[item_idx]
        logits = np.einsum("ed,rdk,ek->er", u, self.decoder_q, v)
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        return p @ self.rating_values

    def factors_df(self, spark, side: str = "item") -> DataFrame:
        mat = self.item_factors if side == "item" else self.user_factors
        rows = [(i, [float(x) for x in mat[i]]) for i in range(mat.shape[0])]
        return spark.createDataFrame(rows, f"{side}_idx int, factors array<double>")

    def predict(self, pairs: DataFrame, user_idx: str = "user_idx", item_idx: str = "item_idx") -> DataFrame:
        """Distributed scoring: join factor tables, decoder math in an
        Arrow batch (Q is (R,d,d) — broadcast-sized)."""
        import pandas as pd

        spark = pairs.sparkSession
        uf = self.factors_df(spark, "user").withColumnRenamed("factors", "__u")
        vf = self.factors_df(spark, "item").withColumnRenamed("factors", "__v")
        joined = (
            pairs.withColumn("user_idx", F.col(user_idx))
            .withColumn("item_idx", F.col(item_idx))
            .join(F.broadcast(uf), on="user_idx", how="left")
            .join(F.broadcast(vf), on="item_idx", how="left")
        )
        q = self.decoder_q
        rvals = self.rating_values
        d = q.shape[1]

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                u = np.array([x if x is not None else [0.0] * d for x in pdf["__u"]])
                v = np.array([x if x is not None else [0.0] * d for x in pdf["__v"]])
                logits = np.einsum("ed,rdk,ek->er", u, q, v)
                logits -= logits.max(axis=1, keepdims=True)
                p = np.exp(logits)
                p /= p.sum(axis=1, keepdims=True)
                out = pdf.drop(columns=["__u", "__v"])
                out["prediction"] = p @ rvals
                yield out

        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in joined.drop("__u", "__v").schema.fields
        ) + ", prediction double"
        return joined.mapInPandas(score, out_schema)


def _cross_feature_backward(
    dY: np.ndarray, feats: list[np.ndarray], Wc: np.ndarray, L: list[np.ndarray], P: np.ndarray
) -> tuple[list[np.ndarray], np.ndarray]:
    dWc = P.T @ dY
    dP = dY @ Wc.T
    dWf = []
    for k in range(len(L)):
        others = None
        for j, lj in enumerate(L):
            if j == k:
                continue
            others = lj if others is None else others * lj
        dLk = dP if others is None else dP * others
        dWf.append(feats[k].T @ dLk)
    return dWf, dWc


def train_gcmc(
    edges: DataFrame,
    n_users: int,
    n_items: int,
    encoder_hidden: int = 64,
    encoder_size: int = 16,
    epochs: int = 60,
    learning_rate: float = 0.01,
    dropout: float = 0.0,
    max_data_size: int = 50_000_000,
    seed: int = 42,
    verbose: bool = False,
    user_features: list[np.ndarray] | np.ndarray | None = None,
    item_features: list[np.ndarray] | np.ndarray | None = None,
    early_stopping_try_count: int = 1,
    early_stopping_decay: float = 2.0,
    early_stopping_threshold: float = 1e-4,
) -> GCMCModel:
    """Driver-side numpy GCMC on the (capped) collected edge list.

    Per-rating symmetric-normalized adjacency convolution with shared
    node embeddings → ReLU → dense → bilinear softmax decoder, Adam.
    Matches the reference's quality gate (test RMSE < 0.7 on its
    synthetic fixture — see tests).

    ``user_features`` / ``item_features``: optional side-feature
    matrices (n+1, f) aligned to indices (row 0 = zero default; build
    with :func:`features_matrix`), or a list of such matrices. They
    feed the reference's cross-feature layers
    (``graph_convolutional_matrix_completion.py:128-142,159-170``):
    encoder = graph factor + Dense(∏_k(Dense(f_k)+1)), trained
    end-to-end — new items with identical features get identical
    embeddings via :meth:`GCMCModel.item_embeddings_for_features`."""
    rng = np.random.default_rng(seed)
    feats_u = (
        [user_features] if isinstance(user_features, np.ndarray) else list(user_features or [])
    )
    feats_i = (
        [item_features] if isinstance(item_features, np.ndarray) else list(item_features or [])
    )
    cap = edges.limit(max_data_size)
    pdf = cap.select("user_idx", "item_idx", "rating", "is_train").toPandas()
    ratings = np.sort(pdf["rating"].unique())
    r_index = {r: k for k, r in enumerate(ratings)}
    R = len(ratings)
    u = pdf["user_idx"].to_numpy()
    i = pdf["item_idx"].to_numpy()
    rc = np.array([r_index[r] for r in pdf["rating"]])
    train_mask = pdf["is_train"].to_numpy().astype(bool)

    tu, ti, tr = u[train_mask], i[train_mask], rc[train_mask]

    nu, ni = n_users + 1, n_items + 1
    # per-rating normalized adjacency (dense — training is capped; the
    # distributed path for bigger graphs aggregates messages via Spark
    # joins, see aggregate_messages())
    A = np.zeros((R, nu, ni))
    A[tr, tu, ti] = 1.0
    du = A.sum(axis=2, keepdims=True)
    di = A.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        An = A / np.sqrt(np.maximum(du, 1)) / np.sqrt(np.maximum(di, 1))

    d0, h, d = encoder_hidden, encoder_hidden, encoder_size
    Xu = rng.normal(0, 0.1, (nu, d0))
    Xi = rng.normal(0, 0.1, (ni, d0))
    Wr = rng.normal(0, 0.1, (R, d0, h))
    Wdu = rng.normal(0, 0.1, (h, d))
    Wdi = rng.normal(0, 0.1, (h, d))
    Q = np.stack([np.eye(d) + rng.normal(0, 0.01, (d, d)) for _ in range(R)])
    Wfu = [rng.normal(0, 0.1, (f.shape[1], h)) for f in feats_u]
    Wcu = rng.normal(0, 0.1, (h, d)) if feats_u else None
    Wfi = [rng.normal(0, 0.1, (f.shape[1], h)) for f in feats_i]
    Wci = rng.normal(0, 0.1, (h, d)) if feats_i else None

    params = [Xu, Xi, Wr, Wdu, Wdi, Q] + Wfu + Wfi
    if Wcu is not None:
        params.append(Wcu)
    if Wci is not None:
        params.append(Wci)
    adam_m = [np.zeros_like(p) for p in params]
    adam_v = [np.zeros_like(p) for p in params]
    b1, b2, eps = 0.9, 0.999, 1e-8
    from redshells_spark.ml.early_stopping import EarlyStopping

    early_stop = EarlyStopping(
        try_count=early_stopping_try_count,
        learning_rate=learning_rate,
        decay_speed=early_stopping_decay,
        threshold=early_stopping_threshold,
    )
    history = []
    onehot = np.zeros((len(tu), R))
    onehot[np.arange(len(tu)), tr] = 1.0
    rvals = ratings.astype(float)

    for epoch in range(1, epochs + 1):
        # forward
        Ti = np.einsum("nd,rdh->rnh", Xi, Wr)  # (R, ni, h)
        Tu = np.einsum("nd,rdh->rnh", Xu, Wr)
        Su = np.einsum("run,rnh->uh", An, Ti)
        Si = np.einsum("run,ruh->nh", An, Tu)
        Hu = np.maximum(Su, 0)
        Hi = np.maximum(Si, 0)
        U = Hu @ Wdu  # (nu, d)
        V = Hi @ Wdi
        if feats_u:
            fu_y, fu_L, fu_P = _cross_feature_forward(feats_u, Wfu, Wcu)
            U = U + fu_y
        if feats_i:
            fi_y, fi_L, fi_P = _cross_feature_forward(feats_i, Wfi, Wci)
            V = V + fi_y
        logits = np.einsum("ed,rdk,ek->er", U[tu], Q, V[ti])
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        loss = -np.log(np.clip(p[np.arange(len(tu)), tr], 1e-12, None)).mean()

        # backward
        dlog = (p - onehot) / len(tu)  # (E, R)
        dQ = np.einsum("er,ed,ek->rdk", dlog, U[tu], V[ti])
        dUe = np.einsum("er,rdk,ek->ed", dlog, Q, V[ti])
        dVe = np.einsum("er,rdk,ed->ek", dlog, Q, U[tu])
        dU = np.zeros_like(U)
        np.add.at(dU, tu, dUe)
        dV = np.zeros_like(V)
        np.add.at(dV, ti, dVe)
        dWdu = Hu.T @ dU
        dWdi = Hi.T @ dV
        dHu = dU @ Wdu.T
        dHi = dV @ Wdi.T
        dSu = dHu * (Su > 0)
        dSi = dHi * (Si > 0)
        dTi = np.einsum("run,uh->rnh", An, dSu)
        dTu = np.einsum("run,nh->ruh", An, dSi)
        dWr = np.einsum("nd,rnh->rdh", Xi, dTi) + np.einsum("nd,rnh->rdh", Xu, dTu)
        dXi = np.einsum("rnh,rdh->nd", dTi, Wr)
        dXu = np.einsum("rnh,rdh->nd", dTu, Wr)

        grads = [dXu, dXi, dWr, dWdu, dWdi, dQ]
        if feats_u:
            dWfu, dWcu = _cross_feature_backward(dU, feats_u, Wcu, fu_L, fu_P)
            grads += dWfu
        else:
            dWfu, dWcu = [], None
        if feats_i:
            dWfi, dWci = _cross_feature_backward(dV, feats_i, Wci, fi_L, fi_P)
            grads += dWfi
        else:
            dWfi, dWci = [], None
        if dWcu is not None:
            grads.append(dWcu)
        if dWci is not None:
            grads.append(dWci)
        for k, (prm, g) in enumerate(zip(params, grads)):
            adam_m[k] = b1 * adam_m[k] + (1 - b1) * g
            adam_v[k] = b2 * adam_v[k] + (1 - b2) * g * g
            mhat = adam_m[k] / (1 - b1**epoch)
            vhat = adam_v[k] / (1 - b2**epoch)
            prm -= learning_rate * mhat / (np.sqrt(vhat) + eps)

        history.append(loss)
        if verbose and epoch % 10 == 0:
            print(f"epoch {epoch}: train CE {loss:.4f}")
        # early stopping with retries: on regression, restore the best
        # params + optimizer state, decay the lr, spend one try
        # (reference contrib/model/early_stopping.py:13-45)
        if epoch > 5 and early_stop.does_stop(loss, params, adam_m, adam_v):
            break
        learning_rate = early_stop.learning_rate

    # final factors; row 0 of the BASE factor zeroed = unknown/cold-
    # start fallback. Feature contributions are added on top, so an
    # unknown id with known features still gets a feature-driven
    # embedding (the reference's cold-start-by-features property).
    Ti = np.einsum("nd,rdh->rnh", Xi, Wr)
    Tu = np.einsum("nd,rdh->rnh", Xu, Wr)
    U = np.maximum(np.einsum("run,rnh->uh", An, Ti), 0) @ Wdu
    V = np.maximum(np.einsum("run,ruh->nh", An, Tu), 0) @ Wdi
    U[0] = 0.0
    V[0] = 0.0
    if feats_u:
        U = U + _cross_feature_forward(feats_u, Wfu, Wcu)[0]
    if feats_i:
        V = V + _cross_feature_forward(feats_i, Wfi, Wci)[0]
    return GCMCModel(
        user_factors=U,
        item_factors=V,
        decoder_q=Q,
        rating_values=rvals,
        history=history,
        user_feature_weights=Wfu or None,
        user_cross_weight=Wcu,
        item_feature_weights=Wfi or None,
        item_cross_weight=Wci,
    )


def aggregate_messages(
    edges: DataFrame,
    node_state: DataFrame,
    src: str = "item_idx",
    dst: str = "user_idx",
    state_column: str = "state",
    rating_column: str = "rating",
) -> DataFrame:
    """One distributed graph-conv message pass: per (dst, rating),
    degree-normalized sum of source node states — the GraphFrames
    aggregateMessages pattern as join + groupBy. This is the 100 TB
    path for a single conv layer when the graph exceeds driver memory
    (the reference's conv is ``:157-208``)."""
    deg_dst = Window.partitionBy(dst, rating_column)
    deg_src = Window.partitionBy(src, rating_column)
    normalized = (
        edges.withColumn("__cd", F.count(F.lit(1)).over(deg_dst))
        .withColumn("__cs", F.count(F.lit(1)).over(deg_src))
        .withColumn("__w", 1.0 / F.sqrt(F.col("__cd") * F.col("__cs")))
    )
    joined = normalized.join(
        node_state.withColumnRenamed(state_column, "__s"), on=src, how="inner"
    )
    weighted = joined.withColumn(
        "__ws", F.transform("__s", lambda x: x * F.col("__w"))
    )
    return (
        weighted.groupBy(dst, rating_column)
        .agg(
            F.aggregate(
                F.collect_list("__ws"),
                F.expr("cast(array() as array<double>)"),
                lambda acc, v: F.when(F.size(acc) == 0, v).otherwise(
                    F.zip_with(acc, v, lambda a, b: a + b)
                ),
            ).alias(state_column)
        )
    )
