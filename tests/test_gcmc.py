"""GCMC tests mirroring the reference's synthetic quality gate
(``test/contrib/model/test_graph_convolutional_matrix_completion.py:19-48``:
random sparse bipartite graph, assert test loss < 1.0, test RMSE < 0.7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshells_spark.ml.gcmc import (
    GCMCModel,
    aggregate_messages,
    build_gcmc_dataset,
    train_gcmc,
)


@pytest.fixture(scope="module")
def synthetic_ratings(spark):
    # reference fixture shape: ~101 users × 233 items, ratings {1, 2},
    # rating correlated with (user, item) block structure so the model
    # has signal to learn
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(6000):
        u = int(rng.integers(0, 101))
        i = int(rng.integers(0, 233))
        r = 2 if (u % 2 == i % 2) else 1
        rows.append((u, i, float(r)))
    return spark.createDataFrame(
        list({(u, i): (u, i, r) for u, i, r in rows}.values()),
        "user_id int, item_id int, rating double",
    )


@pytest.fixture(scope="module")
def trained(spark, synthetic_ratings):
    edges, user_map, item_map = build_gcmc_dataset(
        synthetic_ratings, test_size=0.1, seed=11
    )
    n_users = user_map.count()
    n_items = item_map.count()
    model = train_gcmc(
        edges, n_users, n_items, encoder_hidden=32, encoder_size=8,
        epochs=80, learning_rate=0.02, seed=11,
    )
    return edges, model


def test_dataset_shapes(spark, synthetic_ratings):
    edges, user_map, item_map = build_gcmc_dataset(synthetic_ratings, test_size=0.2, seed=3)
    assert edges.count() == synthetic_ratings.count()
    # indices dense from 1 (0 reserved for unknown)
    assert user_map.agg(F.min("index")).head()[0] == 1
    frac_test = edges.filter(~F.col("is_train")).count() / edges.count()
    assert 0.1 < frac_test < 0.3


def test_gcmc_learns_structure(trained):
    edges, model = trained
    test = edges.filter(~F.col("is_train")).toPandas()
    preds = model.predict_local(test["user_idx"].to_numpy(), test["item_idx"].to_numpy())
    rmse = float(np.sqrt(np.mean((preds - test["rating"].to_numpy()) ** 2)))
    # reference gate: test RMSE < 0.7 on its synthetic graph
    assert rmse < 0.7, f"test RMSE {rmse}"
    assert model.history[-1] < 1.0  # reference: loss < 1.0


def test_gcmc_distributed_predict_matches_local(spark, trained):
    edges, model = trained
    test = edges.filter(~F.col("is_train")).limit(200)
    out = model.predict(test).toPandas()
    local = model.predict_local(out["user_idx"].to_numpy(), out["item_idx"].to_numpy())
    assert np.allclose(out["prediction"].to_numpy(), local, atol=1e-9)


def test_gcmc_cold_start_prior(spark, trained):
    _, model = trained
    # unknown ids (index 0) → zero factors → uniform softmax → mean rating
    pairs = spark.createDataFrame([(0, 0)], "user_idx int, item_idx int")
    pred = model.predict(pairs).head()["prediction"]
    assert pred == pytest.approx(float(np.mean(model.rating_values)), abs=1e-6)


def test_extend_gcmc_dataset(spark):
    """Mirrors reference add_dataset id-scoping tests
    (``test_gcmc_graph_dataset_map.py:18-28``): known ids keep indices,
    new ids get appended ones, scope filters drop unknowns."""
    from redshells_spark.ml.gcmc import extend_gcmc_dataset

    base = spark.createDataFrame(
        [(1, 10, 1.0), (2, 11, 2.0)], "user_id int, item_id int, rating double"
    )
    edges, umap, imap = build_gcmc_dataset(base, test_size=0.0)
    u_before = {r["user_id"]: r["index"] for r in umap.collect()}

    new = spark.createDataFrame(
        [(1, 12, 1.0), (3, 10, 2.0)], "user_id int, item_id int, rating double"
    )
    edges2, umap2, imap2 = extend_gcmc_dataset(umap, imap, new)
    u_after = {r["user_id"]: r["index"] for r in umap2.collect()}
    assert all(u_after[k] == v for k, v in u_before.items())  # stable indices
    assert u_after[3] == max(u_before.values()) + 1  # appended
    assert edges2.count() == 2

    # scope filter: only known users → the (3, 10) row is dropped
    edges3, _, _ = extend_gcmc_dataset(umap, imap, new, only_known_users=True)
    assert edges3.count() == 1


def test_aggregate_messages(spark):
    edges = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 1.0), (2, 10, 2.0)],
        "user_idx int, item_idx int, rating double",
    )
    state = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "item_idx int, state array<double>"
    )
    out = aggregate_messages(edges, state)
    got = {(r["user_idx"], r["rating"]): r["state"] for r in out.collect()}
    # user 1, rating 1: two edges; item 10 deg=1, item 11 deg=1, user deg=2
    # weights 1/sqrt(2): state = [0.707, 0.707]
    assert got[(1, 1.0)] == pytest.approx([1 / np.sqrt(2), 1 / np.sqrt(2)])
    assert got[(2, 2.0)] == pytest.approx([1.0, 0.0])


def test_side_features_cold_start_parity(spark, synthetic_ratings):
    """Port of reference test_graph_convolutional_matrix_completion.py:
    144-156: items known only by side features get embeddings from the
    cross-feature layer, and identical features ⇒ identical
    embeddings. Also: training with features must keep learning
    (history decreases) and known items' embeddings change vs the
    featureless model."""
    from redshells_spark.ml.gcmc import features_matrix

    edges, user_map, item_map = build_gcmc_dataset(
        synthetic_ratings, test_size=0.1, seed=11
    )
    n_users, n_items = user_map.count(), item_map.count()
    # one side feature per item: its parity class, one-hot — the same
    # signal the synthetic ratings are built from
    feats = item_map.select(
        "item_id",
        F.when(F.col("item_id") % 2 == 0, F.array(F.lit(1.0), F.lit(0.0)))
        .otherwise(F.array(F.lit(0.0), F.lit(1.0)))
        .alias("features"),
    )
    fmat = features_matrix(item_map, feats, "item_id")
    assert fmat.shape == (n_items + 1, 2)
    assert (fmat[0] == 0).all()  # zero default row

    model = train_gcmc(
        edges, n_users, n_items, encoder_hidden=32, encoder_size=8,
        epochs=40, learning_rate=0.02, seed=11, item_features=fmat,
    )
    assert model.history[-1] < model.history[0]  # still learns

    # two new items with identical features → identical embeddings;
    # different features → different embeddings
    new_feats = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    emb = model.item_embeddings_for_features([new_feats])
    assert emb.shape == (3, 8)
    np.testing.assert_almost_equal(emb[0], emb[1])
    assert not np.allclose(emb[0], emb[2])


def test_distributed_cold_start_matches_local(spark, synthetic_ratings):
    """item_embeddings_df (Arrow batch map over broadcast weights) must
    reproduce item_embeddings_for_features (driver numpy) exactly, and
    its plan must actually be a mapInPandas stage — the distributed
    inference boundary the driver-capped trainer doesn't share."""
    from redshells_spark.ml.gcmc import features_matrix

    edges, user_map, item_map = build_gcmc_dataset(
        synthetic_ratings, test_size=0.1, seed=11
    )
    feats = item_map.select(
        "item_id",
        F.when(F.col("item_id") % 2 == 0, F.array(F.lit(1.0), F.lit(0.0)))
        .otherwise(F.array(F.lit(0.0), F.lit(1.0)))
        .alias("features"),
    )
    fmat = features_matrix(item_map, feats, "item_id")
    model = train_gcmc(
        edges, user_map.count(), item_map.count(), encoder_hidden=32,
        encoder_size=8, epochs=5, learning_rate=0.02, seed=11, item_features=fmat,
    )
    new_feats = np.array([[1.0, 0.0], [0.5, 0.5], [0.0, 1.0]])
    local = model.item_embeddings_for_features([new_feats])
    fdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(new_feats)],
        "item_id int, features array<double>",
    )
    dist_df = model.item_embeddings_df(fdf, "item_id", "features")
    plan = dist_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    dist = {r["item_id"]: r["embedding"] for r in dist_df.collect()}
    for i in range(3):
        np.testing.assert_allclose(dist[i], local[i], atol=1e-12)


def test_distributed_predict_is_map_in_pandas(spark, trained):
    edges, model = trained
    plan = (
        model.predict(edges.filter(~F.col("is_train")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan


def test_side_features_improve_or_hold_rmse(spark, synthetic_ratings):
    """With parity features encoding the exact rating rule, the
    featured model must stay within the reference RMSE gate."""
    from redshells_spark.ml.gcmc import features_matrix

    edges, user_map, item_map = build_gcmc_dataset(
        synthetic_ratings, test_size=0.1, seed=11
    )
    n_users, n_items = user_map.count(), item_map.count()
    feats = item_map.select(
        "item_id",
        F.when(F.col("item_id") % 2 == 0, F.array(F.lit(1.0), F.lit(0.0)))
        .otherwise(F.array(F.lit(0.0), F.lit(1.0)))
        .alias("features"),
    )
    fmat = features_matrix(item_map, feats, "item_id")
    model = train_gcmc(
        edges, n_users, n_items, encoder_hidden=32, encoder_size=8,
        epochs=80, learning_rate=0.02, seed=11, item_features=fmat,
    )
    test_edges = edges.filter(~F.col("is_train"))
    pred = model.predict(test_edges).toPandas()
    rmse = float(np.sqrt(((pred["prediction"] - pred["rating"]) ** 2).mean()))
    assert rmse < 0.7, rmse


def test_aggregate_messages_matches_numpy_convolution(spark):
    """The distributed message pass (the 100 TB conv path) must equal
    the numpy trainer's normalized-adjacency contraction on the same
    graph: for each rating r, Su = An[r] @ state."""
    rng = np.random.default_rng(3)
    n_users, n_items, d = 6, 5, 4
    edges_np = []
    for u in range(n_users):
        for i in range(n_items):
            if rng.random() < 0.5:
                edges_np.append((u, i, float(rng.integers(1, 3))))
    state_np = rng.normal(size=(n_items, d))

    edges = spark.createDataFrame(edges_np, "user_idx int, item_idx int, rating double")
    state = spark.createDataFrame(
        [(i, [float(x) for x in state_np[i]]) for i in range(n_items)],
        "item_idx int, state array<double>",
    )
    out = {
        (r["user_idx"], r["rating"]): np.array(r["state"])
        for r in aggregate_messages(edges, state).collect()
    }

    ratings = sorted({r for _, _, r in edges_np})
    A = np.zeros((len(ratings), n_users, n_items))
    for u, i, r in edges_np:
        A[ratings.index(r), u, i] = 1.0
    du = A.sum(axis=2, keepdims=True)
    di = A.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        An = A / np.sqrt(np.maximum(du, 1)) / np.sqrt(np.maximum(di, 1))
    for k, r in enumerate(ratings):
        expected = An[k] @ state_np  # (n_users, d)
        for u in range(n_users):
            if A[k, u].sum() == 0:
                assert (u, r) not in out
            else:
                np.testing.assert_allclose(out[(u, r)], expected[u], rtol=1e-9)


def test_keep_unknown_maps_submin_ids_to_zero(spark):
    """Reference GcmcIdMap(use_default=True) parity
    (test_gcmc_id_map.py:12-18): ids [0,0,1,2,3,3] with min_count=2 →
    indices [1,1,0,0,2,2] — sub-threshold ids share the unknown bucket
    0 and their edges remain."""
    ratings = spark.createDataFrame(
        [(u, 100, 1.0) for u in [0, 0, 1, 2, 3, 3]],
        "user_id int, item_id int, rating double",
    )
    edges, umap, imap = build_gcmc_dataset(
        ratings, test_size=0.0, min_user_count=2, keep_unknown=True
    )
    idx = {r["user_id"]: r["index"] for r in umap.collect()}
    assert idx == {0: 1, 3: 2}  # only ids meeting min_count get real indices
    got = sorted(
        (r["user_idx"],) for r in edges.select("user_idx").collect()
    )
    assert got == [(0,), (0,), (1,), (1,), (2,), (2,)]  # 1,2 → bucket 0, kept

    # default (strict) behavior drops them instead
    edges2, _, _ = build_gcmc_dataset(ratings, test_size=0.0, min_user_count=2)
    assert edges2.count() == 4
